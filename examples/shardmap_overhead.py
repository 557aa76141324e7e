"""Bound the shard_map dispatch overhead on the real chip (VERDICT r2 #9).

ShardedIvf with a 1-device mesh runs the exact single-device grouped scorer
inside shard_map + an all_gather over a singleton axis; plain IvfIndex runs
it without the wrapper.  The device-true time ratio bounds what the mesh
machinery itself costs — the only multi-chip number measurable with one chip.

Usage: python examples/shardmap_overhead.py   # one JSON line on stdout
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("GT_FORCE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GT_FORCE_PLATFORM"])
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/granne_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("SO_N", "1200000"))
D = int(os.environ.get("SO_D", "100"))
Q = int(os.environ.get("SO_Q", "4096"))
NPROBE = int(os.environ.get("SO_NPROBE", "4"))
K = 10


def dev_time(fn, q, captures=(), reps_pair=(20, 120)):
    """Forced-execution timing: chained fori inside one jit, value fetch,
    iteration-count differencing (CLAUDE.md measurement gotcha).

    ``captures`` (index arrays etc.) ride as jit ARGUMENTS — a closure
    embeds them as constants in the remote-compile request, which the
    tunnel rejects (HTTP 413) at 1.2M-row sizes."""

    from functools import partial

    @partial(jax.jit, static_argnames=("iters",))
    def run(qq, caps, *, iters):
        def body(i, carry):
            q_c, acc = carry
            ids, d = fn(q_c, *caps)
            z = jnp.where(jnp.isfinite(d[0, 0]), d[0, 0], 1.0) * 0.0
            return qq + z, acc + z

        return jax.lax.fori_loop(0, iters, body, (qq, jnp.float32(0)))[1]

    lo, hi = reps_pair
    for it in (lo, hi):
        float(run(q, captures, iters=it))
    t0 = time.perf_counter()
    float(run(q, captures, iters=lo))
    tl = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(q, captures, iters=hi))
    th = time.perf_counter() - t0
    return (th - tl) / (hi - lo)


def main():
    from granne_tpu.index.ivf import IvfIndex
    from granne_tpu.parallel.mesh import make_mesh
    from granne_tpu.parallel.sharded_ivf import ShardedIvf

    rng = np.random.default_rng(42)
    centers = rng.standard_normal((1000, D)).astype(np.float32)
    assign = rng.integers(0, 1000, N)
    vecs = (centers[assign] + 0.35 * rng.standard_normal((N, D))).astype(np.float32)
    queries = (
        centers[rng.integers(0, 1000, Q)] + 0.35 * rng.standard_normal((Q, D))
    ).astype(np.float32)

    print(f"building IVF over {N}x{D} ...", file=sys.stderr, flush=True)
    plain = IvfIndex.build(vecs)
    qd = jax.device_put(jnp.asarray(queries))

    t_plain = dev_time(
        lambda q, iv: iv.search_batch(q, K, nprobe=NPROBE), qd, (plain,)
    )
    print(f"plain IvfIndex: {t_plain*1e3:.2f} ms/batch = {Q/t_plain:,.0f} QPS",
          file=sys.stderr, flush=True)

    mesh = make_mesh(1)
    sharded = ShardedIvf.from_ivf(plain, mesh=mesh)

    import dataclasses

    arr_fields = ("centroids", "blocks", "block_ids", "block_scales", "centroid_valid")
    sh_caps = tuple(getattr(sharded, f) for f in arr_fields)

    def shard_step(q, *caps):
        ix = dataclasses.replace(sharded, **dict(zip(arr_fields, caps)))
        return ix.search_batch(q, K, nprobe=NPROBE)

    t_shard = dev_time(shard_step, qd, sh_caps)
    print(f"ShardedIvf S=1: {t_shard*1e3:.2f} ms/batch = {Q/t_shard:,.0f} QPS",
          file=sys.stderr, flush=True)

    print(json.dumps({
        "n": N, "d": D, "batch": Q, "nprobe": NPROBE,
        "plain_ms_per_batch": round(t_plain * 1e3, 3),
        "sharded_s1_ms_per_batch": round(t_shard * 1e3, 3),
        "shard_map_overhead_factor": round(t_shard / t_plain, 4),
    }))


if __name__ == "__main__":
    main()
