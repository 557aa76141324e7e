"""Round-5 ask #1: prove the round-4 stack at 1.2M in one recorded artifact.

Everything round 4 proved only at the 200k driver config, re-measured at
n=1.2M (BASELINE configs 1-2, the SIFT/GloVe-1M class):

  (a) HNSW bf16 operating point with the bitonic merge — ef sweep to the
      recall@10 >= 0.95 bar, device-true QPS at the bar;
  (b) the i8-rtn dequantized + exact-rerank serving stack (rerank_queries
      = the unrounded f32 unit query, round-5 exactness fix);
  (c) WARM build vec/s capped (build_max_iters=32 + neighbor cache) AND
      uncapped, each with a recall column from its own graph — the r4
      reorder_qps 39.6s/30k figure had no recall attached;
  (d) the bf16 serve-cache win-or-retire A/B (VERDICT r4 #4): cached vs
      uncached at expand {1,2} x ef {44, 60}, B=4096, at 1.2M.

Two datasets: clustered seed-42 (the GloVe-class headline case) and pure
random (the known-hard case; recall parity column only).

Semantics bar: the reference recall harness at 1M scale
(/root/reference/src/index/tests.rs:50-62).  Output: JSON lines appended
to SCALE_RUNS_r5.jsonl by the caller (stdout is one JSON object).
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
from granne_tpu.elements.angular_int import AngularIntVectors
from granne_tpu.models.brute import exact_topk
from granne_tpu.ops import distance as D
from granne_tpu.ops import frontier
from granne_tpu.ops.nbr_cache import make_neighbor_cache

N = int(os.environ.get("R5_N", 1_200_000))
DIM = 100
M = 20
BUILD_EF = 100
NQ = int(os.environ.get("R5_QUERIES", 4096))
K = 10
SKIP_RANDOM = os.environ.get("R5_SKIP_RANDOM", "0") == "1"
SKIP_UNCAPPED = os.environ.get("R5_SKIP_UNCAPPED", "0") == "1"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def recall_at_k(ids, gt):
    hits = sum(len(set(ids[i]) & set(gt[i])) for i in range(len(gt)))
    return hits / (len(gt) * gt.shape[1])


def timed_qps(step_fn, q, captures=(), reps=12, lo=4):
    """Device-true QPS: chained in-jit loop, forced fetch, count differencing
    (CLAUDE.md measurement gotcha — block_until_ready is lazy here)."""

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


def force(layers):
    for a in layers.layers:
        float(jnp.sum(a[:: max(1, a.shape[0] // 64)]))


def make_data(kind, rng):
    if kind == "clustered":
        centers = rng.standard_normal((1000, DIM)).astype(np.float32)
        vecs = (centers[rng.integers(0, 1000, N)]
                + 0.35 * rng.standard_normal((N, DIM))).astype(np.float32)
        queries = (centers[rng.integers(0, 1000, NQ)]
                   + 0.35 * rng.standard_normal((NQ, DIM))).astype(np.float32)
    else:
        vecs = rng.standard_normal((N, DIM)).astype(np.float32)
        queries = rng.standard_normal((NQ, DIM)).astype(np.float32)
    return vecs, queries


def build_timed(elements, cfg, warm):
    """Build; if warm, build TWICE and report the second (programs compiled)."""
    t0 = time.time()
    layers = build_layers(elements, cfg)
    force(layers)
    cold = time.time() - t0
    if not warm:
        return layers, cold, cold
    del layers
    t0 = time.time()
    layers = build_layers(elements, cfg)
    force(layers)
    return layers, time.time() - t0, cold


def serve_recall(layers, el, q, gt, *, ef, tab=None, expand=1,
                 rerank_with=None, rerank_queries=None, max_iters=None):
    kw = dict(ef=ef, num_neighbors=K, expand=expand, descent_ef=4,
              max_iters=max_iters if max_iters else max(8, ef - 6))
    if rerank_with is not None:
        kw["rerank"] = True
        ids, _ = frontier.search_layers(
            layers.layers, el, q, nbr_vecs=tab, rerank_with=rerank_with,
            rerank_queries=rerank_queries, **kw)
    else:
        ids, _ = frontier.search_layers(layers.layers, el, q, nbr_vecs=tab, **kw)
    return recall_at_k(np.asarray(ids), gt), kw


def serve_qps(layers, el, q, *, tab=None, rerank_with=None, rerank_queries=None, kw=None):
    if rerank_with is not None:
        return timed_qps(
            lambda qq, ly, e, tb, r8, rq, kw=kw: frontier.search_layers(
                ly, e, qq, nbr_vecs=tb, rerank_with=r8, rerank_queries=rq, **kw),
            q, (layers.layers, el, tab, rerank_with, rerank_queries))
    if tab is not None:
        return timed_qps(
            lambda qq, ly, e, tb, kw=kw: frontier.search_layers(
                ly, e, qq, nbr_vecs=tb, **kw),
            q, (layers.layers, el, tab))
    return timed_qps(
        lambda qq, ly, e, kw=kw: frontier.search_layers(ly, e, qq, **kw),
        q, (layers.layers, el))


def main():
    log(f"devices: {jax.devices()}")
    out = {"run": "r5_sweep", "n": N, "d": DIM, "queries": NQ, "rows": []}

    def emit(row):
        out["rows"].append(row)
        log(f"r5 {json.dumps(row)}")

    cfg_capped = BuildConfig(num_neighbors=M, max_search=BUILD_EF, wave_size=1024,
                             expand=4, neighbor_cache=True, build_max_iters=32)
    cfg_uncapped = BuildConfig(num_neighbors=M, max_search=BUILD_EF, wave_size=1024,
                               expand=4, neighbor_cache=True)

    for kind in (["clustered"] if SKIP_RANDOM else ["clustered", "random"]):
        rng = np.random.default_rng(42)
        vecs, queries = make_data(kind, rng)
        elements = AngularVectors.from_raw(vecs)
        qd = jax.device_put(D.normalize(jnp.asarray(queries)))
        log(f"[{kind}] exact f32 ground truth...")
        gt = np.asarray(exact_topk(elements.vectors, qd, K)[0])
        el16 = elements.as_bf16()
        q16 = el16.prepare_queries(qd)

        # ---- (c) builds with recall columns --------------------------------
        warm = kind == "clustered"  # warm-timing double build on the headline set
        log(f"[{kind}] capped build (max_iters=32 + cache){' x2 warm' if warm else ''}...")
        layers, t_warm, t_cold = build_timed(elements, cfg_capped, warm=warm)
        tab16 = make_neighbor_cache(layers.layers[-1], el16, rows=N)
        rec_c, _ = serve_recall(layers, el16, q16, gt, ef=60, tab=tab16)
        emit({"dataset": kind, "what": "build_capped", "seconds_warm": round(t_warm, 1),
              "seconds_cold": round(t_cold, 1), "vec_per_s_warm": round(N / t_warm),
              "recall_ef60_bf16_cache": round(rec_c, 4)})

        if kind == "clustered":
            # ---- (a) HNSW bf16 operating point at the bar ------------------
            best = None
            for ef in [36, 40, 44, 48, 56, 64]:
                rec, kw = serve_recall(layers, el16, q16, gt, ef=ef, tab=tab16)
                emit({"dataset": kind, "what": "hnsw_bf16_cache", "ef": ef,
                      "recall": round(rec, 4)})
                if rec >= 0.95 and best is None:
                    best = (ef, rec, kw)
            if best:
                ef, rec, kw = best
                qps = serve_qps(layers, el16, q16, tab=tab16, kw=kw)
                emit({"dataset": kind, "what": "hnsw_bf16_cache_op", "ef": ef,
                      "recall": round(rec, 4), "qps": round(qps, 1)})

            # ---- (d) bf16 cache win-or-retire A/B --------------------------
            for expand in [1, 2]:
                for ef in [44, 60]:
                    rec_cached, kwc = serve_recall(layers, el16, q16, gt, ef=ef,
                                                   tab=tab16, expand=expand)
                    qps_cached = serve_qps(layers, el16, q16, tab=tab16, kw=kwc)
                    rec_plain, kwp = serve_recall(layers, el16, q16, gt, ef=ef,
                                                  tab=None, expand=expand)
                    qps_plain = serve_qps(layers, el16, q16, tab=None, kw=kwp)
                    emit({"dataset": kind, "what": "bf16_cache_ab", "expand": expand,
                          "ef": ef,
                          "cached": {"recall": round(rec_cached, 4), "qps": round(qps_cached, 1)},
                          "uncached": {"recall": round(rec_plain, 4), "qps": round(qps_plain, 1)}})

            # ---- (b) i8-rtn dequantized + exact rerank ---------------------
            el8 = AngularIntVectors.from_raw(vecs, rounding="nearest")
            el8dq = el8.dequantized()
            qdq = el8dq.prepare_queries(qd)
            tab8 = make_neighbor_cache(layers.layers[-1], el8dq, rows=N)
            best8 = None
            for ef in [44, 48, 56, 64, 72]:
                rec, kw = serve_recall(layers, el8dq, qdq, gt, ef=ef, tab=tab8,
                                       rerank_with=el8, rerank_queries=qd)
                emit({"dataset": kind, "what": "i8rtn_dq_rerank", "ef": ef,
                      "recall": round(rec, 4)})
                if rec >= 0.95 and best8 is None:
                    best8 = (ef, rec, kw)
            if best8:
                ef, rec, kw = best8
                qps = serve_qps(layers, el8dq, qdq, tab=tab8, rerank_with=el8,
                                rerank_queries=qd, kw=kw)
                emit({"dataset": kind, "what": "i8rtn_dq_rerank_op", "ef": ef,
                      "recall": round(rec, 4), "qps": round(qps, 1)})
            del el8, el8dq, qdq, tab8

        del tab16

        # ---- (c cont.) uncapped build + its recall column ------------------
        if not SKIP_UNCAPPED:
            log(f"[{kind}] uncapped build...")
            del layers
            layers_u, t_u, t_u_cold = build_timed(elements, cfg_uncapped, warm=warm)
            tab_u = make_neighbor_cache(layers_u.layers[-1], el16, rows=N)
            rec_u, _ = serve_recall(layers_u, el16, q16, gt, ef=60, tab=tab_u)
            emit({"dataset": kind, "what": "build_uncapped",
                  "seconds_warm": round(t_u, 1), "seconds_cold": round(t_u_cold, 1),
                  "vec_per_s_warm": round(N / t_u),
                  "recall_ef60_bf16_cache": round(rec_u, 4)})
            del layers_u, tab_u
        else:
            del layers
        del elements, el16, q16, qd

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
