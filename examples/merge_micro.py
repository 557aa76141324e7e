"""A/B: bitonic merge-into-sorted-beam vs full lax.sort, device-true.

The beam step's phase 5 keeps the top-ef of (sorted beam + candidate
block).  Round 3 used one lax.sort over [B, ef+G]; round 4 sorts only the
G candidates and merges with ops.topk.merge_sorted_topk (log2 network with
a halving drop phase).  This micro times BOTH formulations in a chained
lax.fori_loop (forced execution, iteration-count differencing — see
CLAUDE.md measurement gotcha) at build and serve shapes.

Run on the TPU:  python examples/merge_micro.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/granne_tpu_jax_cache")

sys.path.insert(0, ".")
from granne_tpu.ops.topk import merge_sorted_topk, sort_by_key  # noqa: E402


def timed(step, state, lo=8, hi=64):
    @jax.jit
    def chain(s, iters):
        def body(i, carry):
            out_d, out_p = step(*carry)
            # feed outputs back so nothing is elided
            d = carry[0].at[:, : out_d.shape[1]].min(out_d * 0.0 + out_d)
            return (d, carry[1], carry[2], carry[3])
        return jax.lax.fori_loop(0, iters, body, s)[0][0, 0]

    def run(k):
        t0 = time.time()
        float(chain(state, jnp.int32(k)))
        return time.time() - t0

    run(lo)
    run(hi)
    while True:
        t_lo, t_hi = run(lo), run(hi)
        delta = t_hi - t_lo
        if delta >= 0.25 or hi - lo >= 2**14:
            return delta / (hi - lo)
        hi = lo + min((hi - lo) * max(4, int(0.25 / max(delta, 1e-3)) + 1), 2**14)


def main():
    rng = np.random.default_rng(0)
    rows = []
    for name, B, ef, G in [
        ("build W=1024 ef=100 E*M=80", 1024, 100, 80),
        ("serve B=4096 ef=44 M=20", 4096, 44, 20),
        ("serve B=4096 ef=60 M=20", 4096, 60, 20),
    ]:
        beam_d = jnp.asarray(np.sort(rng.standard_normal((B, ef)).astype(np.float32), axis=1))
        beam_p = jnp.asarray(rng.integers(0, 2**20, (B, ef)).astype(np.int32))
        cand_d = jnp.asarray(rng.standard_normal((B, G)).astype(np.float32))
        cand_p = jnp.asarray(rng.integers(0, 2**20, (B, G)).astype(np.int32))
        state = (beam_d, beam_p, cand_d, cand_p)

        def step_sort(bd, bp, cd, cp):
            all_d = jnp.concatenate([bd, cd], axis=1)
            all_p = jnp.concatenate([bp, cp], axis=1)
            sd, sp = sort_by_key(all_d, all_p)
            return sd[:, :bd.shape[1]], sp[:, :bd.shape[1]]

        def step_merge(bd, bp, cd, cp):
            scd, scp = sort_by_key(cd, cp)
            sd, (sp,) = merge_sorted_topk(bd, (bp,), scd, (scp,), bd.shape[1])
            return sd, sp

        t_sort = timed(step_sort, state)
        t_merge = timed(step_merge, state)
        row = {
            "shape": name,
            "lax_sort_us": round(t_sort * 1e6, 1),
            "merge_us": round(t_merge * 1e6, 1),
            "speedup": round(t_sort / t_merge, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
