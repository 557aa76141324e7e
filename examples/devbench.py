"""Device-true microbenchmarks: run an op in a chained lax.fori_loop inside
ONE dispatch, and difference two iteration counts so compile/RPC overheads
cancel.  The per-iteration time is pure device time — immune to the
tunnel's async dispatch semantics that make host-side timing of sub-30ms
kernels meaningless.
"""

import sys, os, time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/granne_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np
from functools import partial


def device_time_per_iter(op, ks0, lo=4, hi=24):
    """op(ks) -> out array; returns seconds/iter of pure device time."""

    @partial(jax.jit, static_argnames=("iters",))
    def run(ks0, *, iters):
        def body(i, carry):
            ks, acc = carry
            out = op(ks)
            probe = out.reshape(-1)[0]
            return ks0 + (probe == jnp.inf).astype(ks0.dtype), acc + probe

        return jax.lax.fori_loop(0, iters, body, (ks0, jnp.float32(0)))

    for it in (lo, hi):  # compile both
        jax.block_until_ready(run(ks0, iters=it))
    t0 = time.perf_counter()
    jax.block_until_ready(run(ks0, iters=lo))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(run(ks0, iters=hi))
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (hi - lo)


def main():
    from granne_tpu.ops.pallas import ivf_score

    rng = np.random.default_rng(0)
    d, cap = 128, 64
    for L, S, k in ((256, 2048, 8192), (512, 1024, 4096), (1024, 512, 2048)):
        blocks = jax.random.normal(jax.random.PRNGKey(L), (k, L, d), jnp.bfloat16)
        qg = jnp.asarray(rng.standard_normal((S, cap, d)), jnp.bfloat16)
        ks0 = jnp.asarray(rng.integers(0, k - 1, S), jnp.int32)
        xla = lambda ks: jnp.einsum(
            "sld,scd->scl", jnp.take(blocks, ks, axis=0), qg,
            preferred_element_type=jnp.float32)
        p1 = lambda ks: ivf_score.ivf_score_slots(blocks, ks, qg)
        pg = lambda ks: ivf_score.ivf_score_slots_grouped(blocks, ks, qg)
        t_x = device_time_per_iter(xla, ks0)
        t_1 = device_time_per_iter(p1, ks0)
        t_g = device_time_per_iter(pg, ks0)
        print(f"DEVICE L={L} S={S}: xla {t_x*1e3:.3f}ms  "
              f"p1 {t_1*1e3:.3f}ms ({t_x/t_1:.2f}x)  "
              f"pG {t_g*1e3:.3f}ms ({t_x/t_g:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
