"""bf16 serving + exact f32 rerank, and the serve-cache win-or-retire sweep.

Two questions (round-4 asks #2-adjacent and #4):

1. Does reranking the final beam against the f32 originals
   (``search_layers(rerank=True, rerank_with=el_f32)``) let the bf16
   flagship row hit the 0.95 bar at a smaller ef (=> higher QPS)?
2. Is there ANY serving shape where the neighbor-vector cache beats the
   uncached bf16 path (expand>=2, ef>=60, B=4096)?  It has lost at the
   bench shape three rounds running; win here or get retired from the
   headline path (VERDICT r3 weak #5).

Output: one JSON line: per-(ef, variant) recall + device-true QPS.
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

N = int(os.environ.get("BR_N", 200_000))
DIM = 100
M = 20
BUILD_EF = 100
NQ = int(os.environ.get("BR_QUERIES", 4096))
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
    log("computing f32 ground truth...")
    gt = np.asarray(exact_topk(elements.vectors, qd, K)[0])

    cfg = BuildConfig(num_neighbors=M, max_search=BUILD_EF, wave_size=1024,
                      expand=4)
    log("building f32 graph...")
    t0 = time.time()
    layers = build_layers(elements, cfg)
    for a in layers.layers:
        float(jnp.sum(a[:: max(1, a.shape[0] // 64)]))
    log(f"build {time.time() - t0:.1f}s")

    el16 = elements.as_bf16()
    q16 = el16.prepare_queries(qd)
    out = {"run": "bf16_rerank", "n": N, "d": DIM, "queries": NQ, "rows": []}

    # --- 1. rerank-vs-plain at descending ef ------------------------------
    # (f32_cache.py already measured plain bf16-cache 0.9249 @ ef=24; the
    # open question is whether rerank's ~+0.009 reaches 0.95 by ef=28)
    for ef in [28]:
        for rr in [False, True]:
            kw = dict(ef=ef, num_neighbors=K, expand=1, descent_ef=4,
                      max_iters=max(8, ef - 6))
            if rr:
                kw.update(rerank=True)
                ids, _ = frontier.search_layers(
                    layers.layers, el16, q16, rerank_with=elements, **kw)
            else:
                ids, _ = frontier.search_layers(layers.layers, el16, q16, **kw)
            rec = recall_at_k(np.asarray(ids), gt)
            row = {"variant": "bf16+rerank_f32" if rr else "bf16",
                   "ef": ef, "recall": round(rec, 4)}
            if rec >= 0.95:
                if rr:
                    qps = timed_qps(
                        lambda qq, ly, el, el32, kw=kw: frontier.search_layers(
                            ly, el, qq, rerank_with=el32, **kw),
                        q16, (layers.layers, el16, elements))
                else:
                    qps = timed_qps(
                        lambda qq, ly, el, kw=kw: frontier.search_layers(
                            ly, el, qq, **kw),
                        q16, (layers.layers, el16))
                row["qps"] = round(qps, 1)
            out["rows"].append(row)
            log(f"bf16_rerank {row}")

    # --- 2. serve-cache win-or-retire shapes ------------------------------
    tab16 = make_neighbor_cache(layers.layers[-1], el16, rows=N)
    for ef, expand in [(60, 2), (60, 4), (80, 2)]:
        for cached in [False, True]:
            kw = dict(ef=ef, num_neighbors=K, expand=expand, descent_ef=4)
            tb = tab16 if cached else None
            ids, _ = frontier.search_layers(
                layers.layers, el16, q16, nbr_vecs=tb, **kw)
            rec = recall_at_k(np.asarray(ids), gt)
            qps = timed_qps(
                lambda qq, ly, el, tb, kw=kw: frontier.search_layers(
                    ly, el, qq, nbr_vecs=tb, **kw),
                q16, (layers.layers, el16, tab16 if cached else None))
            row = {"variant": "cache" if cached else "plain", "ef": ef,
                   "expand": expand, "recall": round(rec, 4),
                   "qps": round(qps, 1)}
            out["rows"].append(row)
            log(f"cache_sweep {row}")

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
