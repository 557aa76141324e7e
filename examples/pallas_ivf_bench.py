"""Measure the grouped Pallas IVF scorer vs the XLA gather+einsum path.

Times (a) the raw slot-scoring kernels and (b) end-to-end
IvfIndex.search_batch with GT_PALLAS_IVF on/off, at a realistic config.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/granne_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np


def timeit(fn, iters=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from granne_tpu.index.ivf import IvfIndex
    from granne_tpu.ops.pallas import ivf_score

    rng = np.random.default_rng(0)
    # d must be 128-aligned for the manual-DMA kernel (lane tiling)
    n, d, B = 600_000, 128, 1024
    k, L = 2048, 256
    key = jax.random.PRNGKey(0)
    vecs = np.asarray(jax.random.normal(key, (n, d), jnp.float32))
    print("building ivf...", flush=True)
    ivf = IvfIndex.build(vecs, n_clusters=k, kmeans_iters=4, cluster_cap=L)
    q = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))

    # raw kernel comparison at a representative slot population
    S, cap = 2048, 64
    keys = jnp.asarray(rng.integers(0, k, S), jnp.int32)
    qg = jnp.asarray(rng.standard_normal((S, cap, d)), jnp.bfloat16)
    blocks = ivf.blocks.astype(jnp.bfloat16)

    xla_fn = jax.jit(lambda b, k_, q_: jnp.einsum(
        "sld,scd->scl", jnp.take(b, k_, axis=0), q_,
        preferred_element_type=jnp.float32))
    t_xla = timeit(lambda: xla_fn(blocks, keys, qg))
    t_p1 = timeit(lambda: ivf_score.ivf_score_slots(blocks, keys, qg))
    t_pg = timeit(lambda: ivf_score.ivf_score_slots_grouped(blocks, keys, qg))
    print(f"raw S={S} cap={cap} L={L}: xla {t_xla*1e3:.2f}ms  "
          f"pallas-1slot {t_p1*1e3:.2f}ms  pallas-grouped {t_pg*1e3:.2f}ms  "
          f"grouped speedup vs xla: {t_xla/t_pg:.2f}x")

    # end-to-end: XLA vs plain-score pallas vs fused score+topk pallas
    for nprobe in (8, 16):
        os.environ["GT_PALLAS_IVF_TOPK"] = "0"
        t_off = timeit(lambda: ivf.search_batch(q, 10, nprobe=nprobe, use_pallas=False), iters=5)
        t_on = timeit(lambda: ivf.search_batch(q, 10, nprobe=nprobe, use_pallas=True), iters=5)
        os.environ["GT_PALLAS_IVF_TOPK"] = "1"
        t_fused = timeit(lambda: ivf.search_batch(q, 10, nprobe=nprobe, use_pallas=False), iters=5)
        print(f"end-to-end nprobe={nprobe}: xla {B/t_off:,.0f} qps  "
              f"pallas-score {B/t_on:,.0f} qps ({t_off/t_on:.2f}x)  "
              f"pallas-FUSED-topk {B/t_fused:,.0f} qps ({t_off/t_fused:.2f}x)")


if __name__ == "__main__":
    main()


def large_l_raw():
    """Raw scoring at large L (config5-style blocks): XLA must materialize
    the [S, L, d] gather; the pallas kernels stream blocks once."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from granne_tpu.ops.pallas import ivf_score

    rng = np.random.default_rng(0)
    d, cap = 128, 64
    for L, S, k in ((512, 1024, 4096), (1024, 512, 2048)):
        key = jax.random.PRNGKey(L)
        blocks = jax.random.normal(key, (k, L, d), jnp.bfloat16)
        keys = jnp.asarray(rng.integers(0, k, S), jnp.int32)
        qg = jnp.asarray(rng.standard_normal((S, cap, d)), jnp.bfloat16)
        xla_fn = jax.jit(lambda b, k_, q_: jnp.einsum(
            "sld,scd->scl", jnp.take(b, k_, axis=0), q_,
            preferred_element_type=jnp.float32))
        t_xla = timeit(lambda: xla_fn(blocks, keys, qg))
        t_p1 = timeit(lambda: ivf_score.ivf_score_slots(blocks, keys, qg))
        t_pg = timeit(lambda: ivf_score.ivf_score_slots_grouped(blocks, keys, qg))
        print(f"raw L={L} S={S} d={d}: xla {t_xla*1e3:.2f}ms  p1 {t_p1*1e3:.2f}ms "
              f"({t_xla/t_p1:.2f}x)  pG {t_pg*1e3:.2f}ms ({t_xla/t_pg:.2f}x)")
