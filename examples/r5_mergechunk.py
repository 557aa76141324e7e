"""merge_chunk sweep for the capped+cached 1.2M build.

r4's reorder_qps build (39.6 s) differed from r5_sweep's measured 126 s
warm at the same nominal config in two ways: it timed WITHOUT forcing
execution (lazy block_until_ready — fake-fast) and it used
merge_chunk=4096 instead of the default 1024.  This isolates the real
lever: warm forced-execution builds at merge_chunk {1024, 2048, 4096},
clustered 1.2M, capped + neighbor cache.  merge_chunk bounds the row
chunks of the cache-fed merges (builder._merge_rows_chunked): bigger
chunks mean fewer sequential lax.map steps per merge at the cost of a
larger pairwise working set.
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

N = int(os.environ.get("R5MC_N", 1_200_000))
DIM = 100
CHUNKS = [int(c) for c in os.environ.get("R5MC_CHUNKS", "1024,4096").split(",")]


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(42)
    centers = rng.standard_normal((1000, DIM)).astype(np.float32)
    vecs = (centers[rng.integers(0, 1000, N)]
            + 0.35 * rng.standard_normal((N, DIM))).astype(np.float32)
    queries = (centers[rng.integers(0, 1000, 4096)]
               + 0.35 * rng.standard_normal((4096, DIM))).astype(np.float32)
    elements = AngularVectors.from_raw(vecs)
    qd = jax.device_put(D.normalize(jnp.asarray(queries)))
    gt = np.asarray(exact_topk(elements.vectors, qd, 10)[0])
    el16 = elements.as_bf16()
    q16 = el16.prepare_queries(qd)

    out = {"run": "r5_mergechunk", "n": N, "rows": []}
    for mc in CHUNKS:
        cfg = BuildConfig(num_neighbors=20, max_search=100, wave_size=1024,
                          expand=4, neighbor_cache=True, build_max_iters=32,
                          merge_chunk=mc)
        times = []
        for rep in range(2):
            t0 = time.time()
            layers = build_layers(elements, cfg)
            for a in layers.layers:
                float(jnp.sum(a[:: max(1, a.shape[0] // 64)]))
            times.append(time.time() - t0)
            if rep == 0:
                del layers
        tab = make_neighbor_cache(layers.layers[-1], el16, rows=N)
        ids, _ = frontier.search_layers(layers.layers, el16, q16, nbr_vecs=tab,
                                        ef=60, num_neighbors=10, expand=2,
                                        descent_ef=4)
        hits = sum(len(set(np.asarray(ids)[i]) & set(gt[i])) for i in range(4096))
        row = {"merge_chunk": mc, "build_seconds_cold": round(times[0], 1),
               "build_seconds_warm": round(times[1], 1),
               "vec_per_s_warm": round(N / times[1]),
               "recall_ef60_e2": round(hits / 40960, 4)}
        out["rows"].append(row)
        log(f"r5mc {row}")
        del layers, tab
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
