"""Capped-vs-uncapped recall parity on pure-random 1.2M, r2's metric.

r5_sweep's random-dataset recall columns use HELD-OUT random queries —
at d=100, 1.2M a far harder metric (GT neighbors sit at cos ~0.4 with no
cluster structure to navigate; recall ~0.03) than round 2's parity
baseline, which served SELF-queries (examples/build_sweep_forced.py:67,
recall ~0.50).  This re-measures the capped (build_max_iters=32) vs
uncapped graphs on the r2 metric so the parity claim is comparable
round-over-round: self-queries (first 4096 elements), recall@10 vs exact
f32 GT, ef=60 expand=2 descent=4.
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
from granne_tpu.ops import frontier
from granne_tpu.ops.nbr_cache import make_neighbor_cache

N = int(os.environ.get("R5RS_N", 1_200_000))
DIM = 100
NQ = 4096
K = 10


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(42)
    vecs = rng.standard_normal((N, DIM)).astype(np.float32)
    elements = AngularVectors.from_raw(vecs)
    qd = elements.vectors[:NQ]  # self-queries, r2's metric
    log("exact GT...")
    gt = np.asarray(exact_topk(elements.vectors, qd, K)[0])
    el16 = elements.as_bf16()
    q16 = el16.prepare_queries(qd)

    out = {"run": "r5_random_self", "n": N, "d": DIM, "metric": "self-query r@10, ef=60 E=2",
           "rows": []}
    for cap in [32, None]:
        cfg = BuildConfig(num_neighbors=20, max_search=100, wave_size=1024,
                          expand=4, neighbor_cache=True, build_max_iters=cap)
        t0 = time.time()
        layers = build_layers(elements, cfg)
        for a in layers.layers:
            float(jnp.sum(a[:: max(1, a.shape[0] // 64)]))
        dt = time.time() - t0
        tab = make_neighbor_cache(layers.layers[-1], el16, rows=N)
        ids, _ = frontier.search_layers(
            layers.layers, el16, q16, nbr_vecs=tab, ef=60, num_neighbors=K,
            expand=2, descent_ef=4)
        hits = sum(len(set(np.asarray(ids)[i]) & set(gt[i])) for i in range(NQ))
        rec = hits / (NQ * K)
        row = {"cap": cap, "build_seconds": round(dt, 1),
               "vec_per_s": round(N / dt), "self_recall_at_10": round(rec, 4)}
        out["rows"].append(row)
        log(f"r5rs {row}")
        del layers, tab
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
