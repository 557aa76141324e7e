"""Build-quality A/B: bitonic merge (r4 default) vs full lax.sort (pre-r4).

r5_random_self measured 0.423-0.436 self-query recall@10 on pure-random
1.2M where round 2 recorded 0.495 at the same nominal config.  The r4
bitonic merge-into-sorted-beam is parity-tested IDENTICAL to lax.sort on
small inputs (tests/test_frontier.py::test_packed_merge_fallback_parity),
but graph construction compounds millions of merges — this rebuilds the
same dataset with the beam forced onto the lax.sort fallback
(frontier.PACKED_MERGE_MAX_ROWS = 1 + jax.clear_caches()) and compares
final graph quality under an IDENTICAL serving path.  If the two graphs
measure equal, the r2 number is cross-round protocol drift, not an r4
regression.
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

N = int(os.environ.get("R5AB_N", 1_200_000))
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
    qd = elements.vectors[:NQ]
    log("exact GT...")
    gt = np.asarray(exact_topk(elements.vectors, qd, K)[0])
    el16 = elements.as_bf16()
    q16 = el16.prepare_queries(qd)
    cfg = BuildConfig(num_neighbors=20, max_search=100, wave_size=1024,
                      expand=4, neighbor_cache=True, build_max_iters=32)

    out = {"run": "r5_merge_ab", "n": N, "metric": "self r@10 ef=60 E=2", "rows": []}
    default_rows = frontier.PACKED_MERGE_MAX_ROWS
    for merge in ["bitonic", "lax_sort"]:
        frontier.PACKED_MERGE_MAX_ROWS = default_rows if merge == "bitonic" else 1
        jax.clear_caches()  # static-arg jit caches don't key on the global
        t0 = time.time()
        layers = build_layers(elements, cfg)
        for a in layers.layers:
            float(jnp.sum(a[:: max(1, a.shape[0] // 64)]))
        dt = time.time() - t0
        # serve both graphs with the SAME (default bitonic) path
        frontier.PACKED_MERGE_MAX_ROWS = default_rows
        jax.clear_caches()
        tab = make_neighbor_cache(layers.layers[-1], el16, rows=N)
        ids, _ = frontier.search_layers(
            layers.layers, el16, q16, nbr_vecs=tab, ef=60, num_neighbors=K,
            expand=2, descent_ef=4)
        hits = sum(len(set(np.asarray(ids)[i]) & set(gt[i])) for i in range(NQ))
        row = {"build_merge": merge, "build_seconds": round(dt, 1),
               "self_recall_at_10": round(hits / (NQ * K), 4)}
        out["rows"].append(row)
        log(f"r5ab {row}")
        del layers, tab
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
