"""Multi-chip scaling measurement on the virtual CPU mesh (VERDICT r2 #9).

The environment has ONE physical TPU chip, so absolute multi-chip QPS can't
be measured.  What CAN be quantified:

1. (this script, CPU) ShardedIvf / ShardedGranne end-to-end serving time on
   a 1-device vs an 8-device virtual CPU mesh over the SAME data and query
   stream.  All 8 virtual devices timeshare the VM's single core, so the
   wall-time ratio t8/t1 is the *total-work + ICI-merge overhead factor* of
   sharding: on real hardware with 8 chips, expected QPS scaling is
   ~ 8 / (t8/t1).

2. (examples/shardmap_overhead.py, TPU) ShardedIvf with S=1 vs plain
   IvfIndex on the real chip bounds the shard_map dispatch overhead.

Usage:  python examples/mesh_scaling.py           # writes one JSON line
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

N = int(os.environ.get("MS_N", "65536"))
D = int(os.environ.get("MS_D", "64"))
Q = int(os.environ.get("MS_Q", "2048"))
K = 10


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    from granne_tpu import AngularVectors, BuildConfig
    from granne_tpu.parallel.mesh import make_mesh
    from granne_tpu.parallel.sharded import ShardedGranne
    from granne_tpu.parallel.sharded_ivf import ShardedIvf

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((N, D)).astype(np.float32)
    queries = vecs[rng.integers(0, N, Q)] + 0.05 * rng.standard_normal(
        (Q, D)
    ).astype(np.float32)
    queries = queries.astype(np.float32)

    results = {"n": N, "d": D, "q": Q}

    # --- ShardedIvf: same data, same nprobe, 1 vs 8 virtual devices ------
    for s in (1, 8):
        mesh = make_mesh(s)
        ivf = ShardedIvf.build(vecs, mesh=mesh, n_clusters=256, kmeans_iters=5)
        t, (ids, _) = timed(
            lambda q: ivf.search_batch(q, K, nprobe=8), jax.numpy.asarray(queries)
        )
        # recall vs exact (sanity that both operating points are equivalent)
        results[f"ivf_s{s}"] = {"seconds_per_batch": round(t, 4), "qps": round(Q / t, 1)}
        print(f"ivf S={s}: {t*1e3:.1f} ms/batch  ({Q/t:,.0f} QPS-equivalent)",
              file=sys.stderr)
    results["ivf_overhead_factor"] = round(
        results["ivf_s8"]["seconds_per_batch"] / results["ivf_s1"]["seconds_per_batch"], 3
    )

    # --- ShardedGranne: same data + config, 1 vs 8 virtual devices -------
    cfg = BuildConfig(num_neighbors=16, max_search=40, wave_size=1024,
                      show_progress=False)
    for s in (1, 8):
        mesh = make_mesh(s)
        idx = ShardedGranne.build(AngularVectors, vecs, cfg, mesh=mesh)
        t, (ids, _) = timed(
            lambda q: idx.search_batch(q, max_search=40, num_neighbors=K),
            jax.numpy.asarray(queries),
        )
        results[f"hnsw_s{s}"] = {"seconds_per_batch": round(t, 4), "qps": round(Q / t, 1)}
        print(f"hnsw S={s}: {t*1e3:.1f} ms/batch  ({Q/t:,.0f} QPS-equivalent)",
              file=sys.stderr)
    results["hnsw_overhead_factor"] = round(
        results["hnsw_s8"]["seconds_per_batch"] / results["hnsw_s1"]["seconds_per_batch"], 3
    )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
