"""bf16 serve-cache win-or-retire, the "larger M" shape (VERDICT r4 #4).

The r4 bench loss (hnsw_bf16_cache 198.1k vs uncached 203.4k) was at the
200k / M=20 / ef=32 / expand=1 operating point.  r5_sweep covers
expand x ef at 1.2M; this covers the remaining untried axis: a WIDER
graph (M=32) at the 200k driver scale, where each expansion gathers 1+32
scattered rows uncached vs 1 fat cache row — the cache's descriptor
argument strengthens with M.

Output: one JSON object with cached/uncached recall+QPS at several ef.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("GT_FORCE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GT_FORCE_PLATFORM"])
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/granne_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

from granne_tpu import AngularVectors, BuildConfig, build_layers
from granne_tpu.models.brute import exact_topk
from granne_tpu.ops import distance as D
from granne_tpu.ops import frontier
from granne_tpu.ops.nbr_cache import make_neighbor_cache

N = int(os.environ.get("R5C_N", 200_000))
DIM = 100
M = int(os.environ.get("R5C_M", 32))
NQ = 4096
K = 10


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def recall_at_k(ids, gt):
    hits = sum(len(set(ids[i]) & set(gt[i])) for i in range(len(gt)))
    return hits / (len(gt) * gt.shape[1])


def timed_qps(step_fn, q, captures=(), reps=12, lo=4):
    @jax.jit
    def chain(q0, caps, iters):
        def body(i, carry):
            qq, acc = carry
            _ids, d = step_fn(qq, *caps)
            probe = d.reshape(-1)[0]
            z = jnp.where(jnp.isfinite(probe), probe, 1.0) * 0.0
            qq = jax.tree_util.tree_map(lambda leaf: leaf + z.astype(leaf.dtype), q0)
            return qq, acc + z
        return jax.lax.fori_loop(0, iters, body, (q0, jnp.float32(0)), unroll=False)[1]

    def run(k):
        t0 = time.time()
        float(chain(q, captures, jnp.int32(k)))
        return time.time() - t0

    run(lo)
    B = jax.tree_util.tree_leaves(q)[0].shape[0]
    while True:
        t_lo, t_hi = run(lo), run(reps)
        if t_hi - t_lo > 0.25:
            return B * (reps - lo) / (t_hi - t_lo)
        reps, lo = reps * 4, lo * 4


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(42)
    centers = rng.standard_normal((1000, DIM)).astype(np.float32)
    vecs = (centers[rng.integers(0, 1000, N)]
            + 0.35 * rng.standard_normal((N, DIM))).astype(np.float32)
    queries = (centers[rng.integers(0, 1000, NQ)]
               + 0.35 * rng.standard_normal((NQ, DIM))).astype(np.float32)
    elements = AngularVectors.from_raw(vecs)
    qd = jax.device_put(D.normalize(jnp.asarray(queries)))
    gt = np.asarray(exact_topk(elements.vectors, qd, K)[0])

    cfg = BuildConfig(num_neighbors=M, max_search=100, wave_size=1024, expand=4,
                      neighbor_cache=True, build_max_iters=32)
    log(f"building M={M} graph...")
    t0 = time.time()
    layers = build_layers(elements, cfg)
    for a in layers.layers:
        float(jnp.sum(a[:: max(1, a.shape[0] // 64)]))
    log(f"build {time.time() - t0:.1f}s")

    el16 = elements.as_bf16()
    q16 = el16.prepare_queries(qd)
    tab = make_neighbor_cache(layers.layers[-1], el16, rows=N)
    out = {"run": "r5_cache_m32", "n": N, "m": M, "rows": []}
    for ef in [32, 44, 60]:
        kw = dict(ef=ef, num_neighbors=K, expand=1, descent_ef=4,
                  max_iters=max(8, ef - 6))
        row = {"ef": ef}
        for name, tb in [("cached", tab), ("uncached", None)]:
            ids, _ = frontier.search_layers(layers.layers, el16, q16,
                                            nbr_vecs=tb, **kw)
            rec = recall_at_k(np.asarray(ids), gt)
            qps = timed_qps(
                lambda qq, ly, e, t, kw=kw: frontier.search_layers(
                    ly, e, qq, nbr_vecs=t, **kw),
                q16, (layers.layers, el16, tab if name == "cached" else None))
            row[name] = {"recall": round(rec, 4), "qps": round(qps, 1)}
            log(f"M={M} ef={ef} {name}: {row[name]}")
        out["rows"].append(row)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
