"""Headline benchmark: QPS/chip at recall@10 >= 0.95, cosine ANN.

Method (BASELINE.md): on a synthetic GloVe-100d stand-in (zero-egress env),
build all three engines of the framework —

  * HNSW   (granne-parity wave-built graph, batched frontier search)
  * IVF    (cluster-centric MXU scoring — the TPU-native large-scale engine)
  * brute  (exact MXU full scan with approx_max_k)

— find each engine's operating point clearing recall@10 >= 0.95 vs exact
ground truth, and measure steady-state QPS with device-resident queries.
The headline value is the best engine's QPS (the framework serves the same
API whichever engine backs it); per-engine numbers are in `detail`.

``vs_baseline`` divides by the measured QPS of the single-core C++ scalar
HNSW (granne_tpu/native/codec.cpp — the reference's hot loop,
/root/reference/src/index/mod.rs:999-1037) on the same graph at the same
ef: the "single-core granne" denominator of BASELINE.json, measured because
the reference publishes no numbers.

Prints exactly one JSON line on stdout; progress goes to stderr.
"""

import argparse
import ctypes
import json
import os
import sys
import time

import numpy as np

N = int(os.environ.get("BENCH_N", 200_000))
D = int(os.environ.get("BENCH_D", 100))
M = int(os.environ.get("BENCH_M", 20))
BUILD_EF = int(os.environ.get("BENCH_BUILD_EF", 100))
N_QUERIES = int(os.environ.get("BENCH_QUERIES", 4096))
QUERY_BATCH = int(os.environ.get("BENCH_BATCH", 1024))
WAVE = int(os.environ.get("BENCH_WAVE", 1024))
EXPAND = int(os.environ.get("BENCH_EXPAND", 4))
BUILD_ITERS = int(os.environ.get("BENCH_BUILD_ITERS", 0)) or None
BUILD_CACHE = os.environ.get("BENCH_BUILD_CACHE", "") == "1"
TARGET_RECALL = float(os.environ.get("BENCH_TARGET_RECALL", 0.95))
SKIP_HNSW = os.environ.get("BENCH_SKIP_HNSW", "") == "1"
K = 10


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Real-dataset loaders (BASELINE configs 1-3; zero-egress env means the
# default run is synthetic, but any standard ANN dataset present on disk is
# used directly: GloVe .txt(.gz), *vecs binary, .npy)
# ---------------------------------------------------------------------------


def _load_vecs(path, max_rows=None):
    """fvecs/bvecs/ivecs: each row = int32 dim + dim values (f32/u8/i32)."""
    dtype = {"fvecs": np.float32, "bvecs": np.uint8, "ivecs": np.int32}[
        path.rsplit(".", 1)[1]
    ]
    with open(path, "rb") as f:
        dim = int(np.fromfile(f, np.int32, 1)[0])
    itemsize = np.dtype(dtype).itemsize
    row_bytes = 4 + dim * itemsize
    n = os.path.getsize(path) // row_bytes
    if max_rows is not None:
        n = min(n, max_rows)
    raw = np.fromfile(path, np.uint8, n * row_bytes).reshape(n, row_bytes)
    return raw[:, 4:].copy().view(dtype).reshape(n, dim)


def load_dataset(path, max_rows=None):
    """GloVe .txt(.gz) / .fvecs / .bvecs / .npy -> float32 [n, d]."""
    if path.endswith((".fvecs", ".bvecs")):
        return _load_vecs(path, max_rows).astype(np.float32)
    if path.endswith(".npy"):
        a = np.load(path, mmap_mode="r")
        return np.asarray(a[:max_rows] if max_rows else a, np.float32)
    import gzip

    op = gzip.open if path.endswith(".gz") else open
    rows = []
    with op(path, "rt") as f:
        for line in f:
            parts = line.rstrip("\n").split(" ")
            rows.append(np.asarray(parts[1:], np.float32))
            if max_rows and len(rows) >= max_rows:
                break
    return np.stack(rows)


def recall_at_k(ids, gt):
    return float(np.mean([len(set(ids[i]) & set(gt[i])) / K for i in range(len(gt))]))


# ---------------------------------------------------------------------------
# Round-over-round regression guard: BENCH_r03's build metric silently
# collapsed 7.8x (cold-compile wall time landing in the timing window);
# any >2x swing in a recorded metric must be loud, not silent.
# ---------------------------------------------------------------------------

_SWING_KEYS = ("qps", "build_seconds", "build_vectors_per_s")


def swing_alarms(old_detail, new_detail, threshold=2.0, path=""):
    """Flag metrics that moved >threshold x between two bench `detail` dicts.

    Only true metrics (_SWING_KEYS) are compared — operating-point knobs
    (ef, nprobe) legitimately move.  Returns a list of human-readable
    alarm strings; empty means no swing.
    """
    alarms = []
    for key in sorted(set(old_detail) & set(new_detail)):
        ov, nv = old_detail[key], new_detail[key]
        if isinstance(ov, dict) and isinstance(nv, dict):
            alarms += swing_alarms(ov, nv, threshold, f"{path}{key}.")
        elif key in _SWING_KEYS and isinstance(ov, (int, float)) and isinstance(nv, (int, float)):
            if ov > 0 and nv > 0:
                r = nv / ov
                if r > threshold or r < 1.0 / threshold:
                    alarms.append(f"{path}{key}: {ov} -> {nv} ({r:.2f}x)")
    return alarms


def check_against_last_round(detail):
    """Compare this run's detail against the newest BENCH_r*.json beside
    this script; return (alarms, reference_name)."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    benches = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    if not benches:
        return [], None
    ref = benches[-1]
    try:
        with open(ref) as f:
            prev = json.load(f)
    except (OSError, json.JSONDecodeError):
        return [], None
    # the driver wraps the bench line: {"n":…, "cmd":…, "parsed": {…}}
    if isinstance(prev, dict) and "parsed" in prev:
        prev = prev["parsed"]
    prev_detail = prev.get("detail") if isinstance(prev, dict) else None
    if not isinstance(prev_detail, dict):
        return [], None
    return swing_alarms(prev_detail, detail), os.path.basename(ref)


def parse_args():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default=os.environ.get("BENCH_DATA"),
                    help="base vectors: GloVe .txt(.gz), .fvecs/.bvecs, or .npy; "
                         "synthetic clustered stand-in when absent")
    ap.add_argument("--queries", default=os.environ.get("BENCH_QUERY_DATA"),
                    help="query vectors (same formats); defaults to holding out "
                         "the last BENCH_QUERIES rows of --data")
    ap.add_argument("--gt", default=os.environ.get("BENCH_GT"),
                    help="ground-truth .ivecs (ANN-benchmarks convention); "
                         "computed exactly on device when absent")
    ap.add_argument("--max-rows", type=int, default=N,
                    help="cap on base rows read from --data (default BENCH_N)")
    return ap.parse_args()


def main():
    args = parse_args()
    import jax

    if os.environ.get("GT_FORCE_PLATFORM"):
        # CPU smoke-test escape hatch. No compilation cache here: AOT
        # machine-feature mismatch between cached CPU programs can SIGILL.
        jax.config.update("jax_platforms", os.environ["GT_FORCE_PLATFORM"])
    else:
        jax.config.update("jax_compilation_cache_dir", "/tmp/granne_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from granne_tpu import AngularVectors, BuildConfig, build_layers
    from granne_tpu.index.ivf import IvfIndex
    from granne_tpu.models.brute import BruteForceIndex, _brute_topk
    from granne_tpu.ops import distance as Dops
    from granne_tpu.ops import frontier

    log(f"devices: {jax.devices()}")
    global N, D
    dataset = "synthetic"
    gt_file = None
    if args.data:
        dataset = os.path.basename(args.data)
        log(f"loading {args.data} ...")
        vecs = load_dataset(args.data, args.max_rows)
        if args.queries:
            queries = load_dataset(args.queries, N_QUERIES)[:N_QUERIES]
        else:
            # hold out the tail as queries (disjoint from the base set)
            vecs, queries = vecs[:-N_QUERIES], vecs[-N_QUERIES:]
        N, D = vecs.shape
        if args.gt:
            gt_file = _load_vecs(args.gt)[: len(queries), :K].astype(np.int64)
        log(f"dataset: n={N} d={D} queries={len(queries)}")
    else:
        rng = np.random.default_rng(42)
        n_clusters = 1000
        centers = rng.standard_normal((n_clusters, D)).astype(np.float32)
        assign = rng.integers(0, n_clusters, N)
        vecs = (centers[assign] + 0.35 * rng.standard_normal((N, D))).astype(np.float32)
        queries = (
            centers[rng.integers(0, n_clusters, N_QUERIES)]
            + 0.35 * rng.standard_normal((N_QUERIES, D))
        ).astype(np.float32)

    elements = AngularVectors.from_raw(vecs)
    qd = jax.device_put(Dops.normalize(jnp.asarray(queries)))  # device-resident
    qn = np.asarray(qd)

    # ground truth: exact f32 top-k (a bf16 GT would correlate with the
    # bf16-served engines' rounding and bias their recall upward)
    log("computing ground truth...")
    from granne_tpu.models.brute import exact_topk

    bf = BruteForceIndex.build(vecs)
    if gt_file is not None:
        gt = gt_file
    else:
        gt = np.asarray(exact_topk(elements.vectors, qd, K)[0])

    from functools import partial

    def timed_qps(step_fn, q, captures=(), reps=12, lo=4):
        """Device-true QPS.

        On the tunnel-attached backend ``block_until_ready`` is lazy and
        host-side dispatch loops measure dispatch rate, not execution.  So:
        run ``step_fn`` (q -> (ids, dists)) in a CHAINED ``lax.fori_loop``
        inside one jit (each iteration's input depends on the previous
        output, so nothing can be elided), force execution with a scalar
        fetch, and difference two iteration counts so the fixed
        compile/RPC/fetch overhead cancels.
        """

        # big arrays (index, elements) must be ARGUMENTS, not closures —
        # closures embed them as constants in the remote-compile request.
        # ``iters`` is a TRACED scalar (dynamic trip count): one compiled
        # program serves every rep count, so the rep count can be raised
        # adaptively until the timing delta clears the tunnel's RPC noise
        # (at tiny configs a fixed 8-rep delta is microseconds of device
        # time and the differencing returns garbage).
        @jax.jit
        def chain(q0, caps, iters):
            def body(i, carry):
                qq, acc = carry
                _ids, d = step_fn(qq, *caps)
                probe = d.reshape(-1)[0]
                z = jnp.where(jnp.isfinite(probe), probe, 1.0) * 0.0
                qq = jax.tree_util.tree_map(lambda leaf: leaf + z.astype(leaf.dtype), q0)
                return qq, acc + z
            return jax.lax.fori_loop(
                0, iters, body, (q0, jnp.float32(0)), unroll=False
            )[1]

        def run(k):
            t0 = time.time()
            float(chain(q, captures, jnp.int32(k)))
            return time.time() - t0

        run(lo)  # compile + warm
        run(reps)
        B = jax.tree_util.tree_leaves(q)[0].shape[0]
        MIN_DELTA = 0.25  # seconds of device time the differencing must span
        while True:
            t_lo = run(lo)
            t_hi = run(reps)
            delta = t_hi - t_lo
            if delta >= MIN_DELTA or reps - lo >= 2**16:
                return B * (reps - lo) / max(delta, 1e-9)
            # scale the rep count toward the target delta (x4 floor)
            grow = 4 if delta <= 0 else min(64, max(4, int(MIN_DELTA / max(delta, 1e-3)) + 1))
            reps = lo + min((reps - lo) * grow, 2**16)

    detail = {}

    # ---- brute (exact engine) ----
    ids = np.asarray(_brute_topk(bf.vectors, qd.astype(jnp.bfloat16), k=K, recall_target=0.95)[0])
    rec = recall_at_k(ids, gt)
    qps = timed_qps(lambda qq, bv: _brute_topk(bv, qq.astype(jnp.bfloat16), k=K, recall_target=0.95), qd, (bf.vectors,))
    detail["brute"] = {"recall_at_10": round(rec, 4), "qps": round(qps, 1)}
    log(f"brute: recall={rec:.4f} qps={qps:.0f}")

    # ---- IVF ----
    # warm timing: the first build pays XLA compiles (~30-60s/program over
    # the tunnel, volatile cache); a second identical build times execution.
    # BENCH_r03's build figures were compile-noise-dominated (7.8x swing at
    # an identical config); `build_seconds` is now always WARM and
    # `build_compile_seconds` carries the cold-minus-warm delta.
    def ivf_build():
        t0 = time.time()
        ix = IvfIndex.build(
            vecs,
            n_clusters=max(64, min(8192, N // 300)),
            kmeans_iters=10,
            cluster_cap=256,
        )
        return ix, time.time() - t0

    _, ivf_cold_s = ivf_build()
    ivf, ivf_build_s = ivf_build()
    log(f"ivf build: warm {ivf_build_s:.1f}s (cold {ivf_cold_s:.1f}s)")
    best_ivf = None
    for nprobe in [4, 8, 16, 32, 64]:
        ids, _ = ivf.search_batch(qn, K, nprobe=nprobe)
        rec = recall_at_k(np.asarray(ids), gt)
        if rec >= TARGET_RECALL:
            qps = timed_qps(lambda qq, iv, np_=nprobe: iv.search_batch(qq, K, nprobe=np_), qd, (ivf,))
            best_ivf = {"recall_at_10": round(rec, 4), "qps": round(qps, 1), "nprobe": nprobe,
                        "build_seconds": round(ivf_build_s, 1),
                        "build_compile_seconds": round(max(0.0, ivf_cold_s - ivf_build_s), 1)}
            break
    if best_ivf:
        detail["ivf"] = best_ivf
        log(f"ivf: {best_ivf}")

    # ---- HNSW (granne-parity engine) + CPU baseline on its graph ----
    vs_baseline = None
    hnsw_ef = None
    if not SKIP_HNSW:
        log(f"building hnsw: n={N} M={M} ef={BUILD_EF} ...")
        cfg = BuildConfig(num_neighbors=M, max_search=BUILD_EF, wave_size=WAVE, expand=EXPAND, build_max_iters=BUILD_ITERS, neighbor_cache=BUILD_CACHE)

        def hnsw_build():
            t0 = time.time()
            ls = build_layers(elements, cfg)
            # force execution before stopping the clock (block_until_ready
            # is lazy on the tunnel backend; only a value fetch truly waits)
            for a in ls.layers:
                float(jnp.sum(a[:: max(1, a.shape[0] // 64)]))
            return ls, time.time() - t0

        # warm timing (see the IVF note): first build compiles, second times
        # execution — the build is deterministic, so both graphs are equal.
        _, cold_s = hnsw_build()
        layers, build_s = hnsw_build()
        compile_s = max(0.0, cold_s - build_s)
        log(f"hnsw build: warm {build_s:.1f}s ({N / build_s:.0f} vec/s; cold {cold_s:.1f}s)")

        best_hnsw = None
        for ef in [20, 30, 40, 60, 80, 120]:
            ids, _ = frontier.search_layers(
                layers.layers, elements, qd, ef=ef, num_neighbors=K, expand=4
            )
            rec = recall_at_k(np.asarray(ids), gt)
            log(f"hnsw ef={ef}: recall={rec:.4f}")
            if rec >= TARGET_RECALL:
                qps = timed_qps(
                    lambda qq, ly, el, e=ef: frontier.search_layers(
                        ly, el, qq, ef=e, num_neighbors=K, expand=4
                    ),
                    qd,
                    (layers.layers, elements),
                )
                best_hnsw = {
                    "recall_at_10": round(rec, 4),
                    "qps": round(qps, 1),
                    "ef": ef,
                    "build_seconds": round(build_s, 1),
                    "build_compile_seconds": round(compile_s, 1),
                    "build_vectors_per_s": round(N / build_s, 1),
                }
                hnsw_ef = ef
                break
        if best_hnsw:
            detail["hnsw"] = best_hnsw
            log(f"hnsw: {best_hnsw}")

        # bf16 serving copy: search is random-gather bound, so halving the
        # element bytes ~doubles QPS; measure its recall on the same graph
        # tuned operating shape (examples/hnsw_tune.py): expand=1, 4-entry
        # seeded descent, max_iters ~ ef-6 (caps straggler iterations)
        el16 = elements.as_bf16()
        q16 = el16.prepare_queries(qd)
        best16 = None
        for ef in [32, 40, 44, 48, 60, 80, 120]:
            kw16 = dict(ef=ef, num_neighbors=K, expand=1, descent_ef=4,
                        max_iters=max(8, ef - 6))
            ids, _ = frontier.search_layers(layers.layers, el16, q16, **kw16)
            rec = recall_at_k(np.asarray(ids), gt)
            log(f"hnsw-bf16 ef={ef}: recall={rec:.4f}")
            if rec >= TARGET_RECALL:
                qps = timed_qps(
                    lambda qq, ly, el, kw=kw16: frontier.search_layers(ly, el, qq, **kw),
                    q16,
                    (layers.layers, el16),
                )
                best16 = {"recall_at_10": round(rec, 4), "qps": round(qps, 1), "ef": ef}
                break
        if best16:
            detail["hnsw_bf16"] = best16
            log(f"hnsw-bf16: {best16}")
            if best_hnsw and best16["qps"] > best_hnsw["qps"]:
                hnsw_ef = best16["ef"]
                detail["hnsw"] = {**best16,
                                  "build_seconds": best_hnsw["build_seconds"],
                                  "build_vectors_per_s": best_hnsw["build_vectors_per_s"],
                                  "serve_dtype": "bf16"}

        # bf16 + neighbor-vector cache (ops.nbr_cache): one contiguous row
        # gather per expanded beam node instead of M scattered vector rows;
        # costs N * pad128(M*d) * 2 bytes HBM (0.8 GB at 200k, M=20, d=100)
        from granne_tpu.ops.nbr_cache import make_neighbor_cache

        tab16 = make_neighbor_cache(layers.layers[-1], el16, rows=N)
        bestc = None
        for ef in [32, 40, 44, 48, 60, 80, 120]:
            kwc = dict(ef=ef, num_neighbors=K, expand=1, descent_ef=4,
                       max_iters=max(8, ef - 6))
            ids, _ = frontier.search_layers(
                layers.layers, el16, q16, nbr_vecs=tab16, **kwc
            )
            rec = recall_at_k(np.asarray(ids), gt)
            log(f"hnsw-bf16-cache ef={ef}: recall={rec:.4f}")
            if rec >= TARGET_RECALL:
                qps = timed_qps(
                    lambda qq, ly, el, tb, kw=kwc: frontier.search_layers(
                        ly, el, qq, nbr_vecs=tb, **kw
                    ),
                    q16,
                    (layers.layers, el16, tab16),
                )
                bestc = {"recall_at_10": round(rec, 4), "qps": round(qps, 1), "ef": ef}
                break
        if bestc:
            detail["hnsw_bf16_cache"] = bestc
            log(f"hnsw-bf16-cache: {bestc}")
            if detail.get("hnsw") and bestc["qps"] > detail["hnsw"]["qps"]:
                hnsw_ef = bestc["ef"]
                detail["hnsw"] = {**bestc,
                                  "build_seconds": best_hnsw["build_seconds"],
                                  "build_vectors_per_s": best_hnsw["build_vectors_per_s"],
                                  "serve_dtype": "bf16+nbr_cache"}
        del tab16

        # int8 serving copy (config-2 parity path): 4x fewer gathered bytes.
        # int8 gets its OWN sweep (VERDICT r3 #2): the bf16-tuned shape
        # (expand=1, tight iter cap) starves the noisier int8 beam; int8
        # wants wider expansion and uncapped iterations.  The best row is
        # recorded even when below the bar so regressions are visible.
        from granne_tpu import AngularIntVectors

        el8 = AngularIntVectors.from_raw(vecs)
        q8 = el8.prepare_queries(qd)

        def sweep(name, shapes, search_kw_of, queries, captures, nbr_tab=None):
            """Sweep (ef, shape) rows; return the first at-bar row QPS-timed,
            else the best-recall row (recall recorded, no QPS).  ``nbr_tab``
            rides as a jit ARGUMENT, never a closure (closures embed the
            0.8 GB table as a constant in the remote-compile request)."""
            best = None
            for shape in shapes:
                kw = search_kw_of(shape)
                ids, _ = frontier.search_layers(
                    *captures, queries, nbr_vecs=nbr_tab, **kw
                )
                rec = recall_at_k(np.asarray(ids), gt)
                log(f"{name} {shape}: recall={rec:.4f}")
                if best is None or rec > best[0]:
                    best = (rec, shape)
                if rec >= TARGET_RECALL:
                    if nbr_tab is not None:
                        qps = timed_qps(
                            lambda qq, ly, el, tb, kw=kw: frontier.search_layers(
                                ly, el, qq, nbr_vecs=tb, **kw
                            ),
                            queries,
                            captures + (nbr_tab,),
                        )
                    else:
                        qps = timed_qps(
                            lambda qq, ly, el, kw=kw: frontier.search_layers(
                                ly, el, qq, **kw
                            ),
                            queries,
                            captures,
                        )
                    return {"recall_at_10": round(rec, 4), "qps": round(qps, 1), **shape}
            return {"recall_at_10": round(best[0], 4), **best[1], "below_bar": True}

        best8 = sweep(
            "hnsw-i8",
            [{"ef": ef, "expand": e} for ef in [30, 40, 60, 80] for e in ([4] if ef < 60 else [4, 2])],
            lambda s: dict(ef=s["ef"], num_neighbors=K, expand=s["expand"], descent_ef=4),
            q8,
            (layers.layers, el8),
        )
        detail["hnsw_i8"] = best8
        log(f"hnsw-i8: {best8}")
        if detail.get("hnsw") and "qps" in best8 and best8["qps"] > detail["hnsw"]["qps"]:
            hnsw_ef = best8["ef"]
            detail["hnsw"] = {**best8,
                              "build_seconds": best_hnsw["build_seconds"],
                              "build_vectors_per_s": best_hnsw["build_vectors_per_s"],
                              "serve_dtype": "int8"}

        # int8 dequantized-serving path (VERDICT r3 #2, closed round 4):
        # int8 stays the STORAGE format; serving dequantizes once to bf16
        # unit rows (AngularIntVectors.dequantized) so the whole traversal
        # (descent + seeds + cached bottom beam) rides the single-gather
        # bf16 path, and the final beam is re-scored exactly against the
        # int8 container (rerank_with=el8, rerank_queries=qd: one [B, ef]
        # int8 gather scored vs the UNROUNDED f32 unit query, ~2% QPS,
        # +0.009 recall@10).  The int8 container's own traversal caps
        # at ~52k QPS (two-gather descent + int8 dots); this path measured
        # 157.7k @ 0.9500 with RTN codes (examples/i8_fast.py).
        def sweep_dq(name, el8_, efs):
            el8dq = el8_.dequantized()
            qdq = el8dq.prepare_queries(qd)
            tab = make_neighbor_cache(layers.layers[-1], el8dq, rows=N)
            best = None
            for ef in efs:
                kw = dict(ef=ef, num_neighbors=K, expand=1, descent_ef=4,
                          max_iters=max(8, ef - 6), rerank=True)
                ids, _ = frontier.search_layers(
                    layers.layers, el8dq, qdq, nbr_vecs=tab,
                    rerank_with=el8_, rerank_queries=qd, **kw)
                rec = recall_at_k(np.asarray(ids), gt)
                log(f"{name} ef={ef}: recall={rec:.4f}")
                if best is None or rec > best[0]:
                    best = (rec, ef)
                if rec >= TARGET_RECALL:
                    qps = timed_qps(
                        lambda qq, ly, el, tb, e8, rq, kw=kw: frontier.search_layers(
                            ly, el, qq, nbr_vecs=tb, rerank_with=e8,
                            rerank_queries=rq, **kw),
                        qdq,
                        (layers.layers, el8dq, tab, el8_, qd),
                    )
                    return {"recall_at_10": round(rec, 4), "qps": round(qps, 1),
                            "ef": ef}
            return {"recall_at_10": round(best[0], 4), "ef": best[1],
                    "below_bar": True}

        best8c = sweep_dq("hnsw-i8-cache", el8, [56, 80, 96, 120])
        detail["hnsw_i8_cache"] = best8c
        log(f"hnsw-i8-cache: {best8c}")
        if detail.get("hnsw") and "qps" in best8c and best8c["qps"] > detail["hnsw"]["qps"]:
            hnsw_ef = best8c["ef"]
            detail["hnsw"] = {**best8c,
                              "build_seconds": best_hnsw["build_seconds"],
                              "build_vectors_per_s": best_hnsw["build_vectors_per_s"],
                              "serve_dtype": "int8-dq+nbr_cache+rerank"}

        # round-to-nearest codes: same int8 storage format, ~half the RMS
        # quantization error (brute ceiling 0.9585 vs trunc's 0.9528,
        # examples/i8_gap.py) — the headline int8 serving row.
        el8r = AngularIntVectors.from_raw(vecs, rounding="nearest")
        best8r = sweep_dq("hnsw-i8-rtn", el8r, [40, 44, 48, 56, 60, 80])
        best8r["quantizer"] = "nearest"
        detail["hnsw_i8_rtn"] = best8r
        log(f"hnsw-i8-rtn: {best8r}")
        if detail.get("hnsw") and "qps" in best8r and best8r["qps"] > detail["hnsw"]["qps"]:
            hnsw_ef = best8r["ef"]
            detail["hnsw"] = {**best8r,
                              "build_seconds": best_hnsw["build_seconds"],
                              "build_vectors_per_s": best_hnsw["build_vectors_per_s"],
                              "serve_dtype": "int8-rtn-dq+nbr_cache+rerank"}
        del el8r

        # single-core C++ scalar baseline on the same graph
        from granne_tpu.native import get_lib

        lib = get_lib()
        if lib is not None and hnsw_ef is not None:
            arrays = [np.ascontiguousarray(a) for a in layers.as_numpy()]
            vec_np = np.ascontiguousarray(np.asarray(elements.vectors))
            n_base = min(N_QUERIES, 500)
            out_ids = np.empty((n_base, K), np.int32)
            out_d = np.empty((n_base, K), np.float32)
            ptrs = (ctypes.c_void_p * len(arrays))(
                *[a.ctypes.data_as(ctypes.c_void_p).value for a in arrays]
            )
            qb = np.ascontiguousarray(qn[:n_base])
            t0 = time.time()
            lib.gt_search_f32(
                vec_np.ctypes.data_as(ctypes.c_void_p), N, D,
                ctypes.cast(ptrs, ctypes.c_void_p), len(arrays), M,
                qb.ctypes.data_as(ctypes.c_void_p), n_base, hnsw_ef, K, 1,
                out_ids.ctypes.data_as(ctypes.c_void_p),
                out_d.ctypes.data_as(ctypes.c_void_p),
            )
            cpu_qps = n_base / (time.time() - t0)
            cpu_rec = recall_at_k(out_ids, gt[:n_base])
            detail["cpu_1core_hnsw"] = {"recall_at_10": round(cpu_rec, 4), "qps": round(cpu_qps, 1)}
            log(f"cpu 1-core: recall={cpu_rec:.4f} qps={cpu_qps:.0f}")

    # headline = best engine meeting the bar
    candidates = [v for v in detail.values() if v.get("recall_at_10", 0) >= TARGET_RECALL and "qps" in v]
    best = max(candidates, key=lambda v: v["qps"]) if candidates else None
    value = best["qps"] if best else 0.0
    cpu = detail.get("cpu_1core_hnsw", {}).get("qps")
    if cpu:
        vs_baseline = round(value / cpu, 2)

    out = {
        "metric": f"QPS/chip at recall@10>={TARGET_RECALL} ({dataset} {D}d, n={N}, cosine)",
        "value": value,
        "unit": "qps",
        "vs_baseline": vs_baseline,
        "detail": detail,
    }
    alarms, ref_name = check_against_last_round(detail)
    if alarms:
        out["warnings"] = [f"vs {ref_name}: {a}" for a in alarms]
        for w in out["warnings"]:
            log(f"SWING ALARM {w}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
