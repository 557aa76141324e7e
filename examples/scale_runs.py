"""Large-scale capability runs for BASELINE.json configs 3-5.

  config3: DEEP-10M-class workload — 10M x 96d f32 cosine, large batched
           query streams (IVF engine, QPS vs batch size).
  config4: extensible index — build an HNSW index, append 20% more
           elements onto it, verify recall holds and new elements are
           findable (reference: append-after-build,
           /root/reference/src/index/tests.rs:503-566).
  config5: 100M x 96d int8 — the billion-vector mmap analogue: host-DRAM
           dataset, chunked streaming build, HBM-resident int8 serving,
           plus the host-tiered (TieredIvf) path.

Run on the real TPU:  python examples/scale_runs.py config3
Results are printed as one JSON line per run (appended to stdout).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def log(m):
    print(m, file=sys.stderr, flush=True)


def recall_at_k(ids, gt, k):
    return float(np.mean([len(set(ids[i]) & set(gt[i, :k])) / k for i in range(len(gt))]))


def make_clustered(n, d, n_queries, seed=42, chunk=4_000_000, dtype=np.float32):
    """Clustered synthetic data (same family as bench.py).

    Vectors are generated ON DEVICE (host RNG at 100M rows would take ~1 h
    on this VM's single core); only the int8/f32 result crosses back.
    """
    import jax
    import jax.numpy as jnp
    from granne_tpu.ops.distance import quantize_i8

    rng = np.random.default_rng(seed)
    n_centers = 1000
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    centers_d = jnp.asarray(centers)

    @jax.jit
    def gen_chunk(key):
        ka, kb = jax.random.split(key)
        a = jax.random.randint(ka, (chunk,), 0, n_centers)
        x = centers_d[a] + 0.35 * jax.random.normal(kb, (chunk, d), jnp.float32)
        return quantize_i8(x) if dtype == np.int8 else x

    out = np.empty((n, d), dtype)
    key = jax.random.PRNGKey(seed)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        key, sub = jax.random.split(key)
        out[lo:hi] = np.asarray(gen_chunk(sub))[: hi - lo]
        log(f"[gen] {hi}/{n}")
    q = centers[rng.integers(0, n_centers, n_queries)] + 0.35 * rng.standard_normal(
        (n_queries, d)
    ).astype(np.float32)
    return out, q.astype(np.float32)


def setup_jax():
    import jax

    if os.environ.get("GT_FORCE_PLATFORM"):
        # CPU smoke runs; the cache is TPU-only (AOT machine-feature mismatch)
        jax.config.update("jax_platforms", os.environ["GT_FORCE_PLATFORM"])
    else:
        jax.config.update("jax_compilation_cache_dir", "/tmp/granne_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    log(f"devices: {jax.devices()}")
    return jax


def timed_qps(jax, fn, n_queries, reps=3):
    """Device-true QPS: block_until_ready is lazy on the tunnel backend, so
    force each rep's execution with a value fetch and subtract the
    single-fetch RPC overhead via a zero-work baseline."""
    import numpy as _np

    r = fn()
    _np.asarray(jax.tree_util.tree_leaves(r)[0][:1])  # warm + force
    # fetch-only overhead baseline (~RPC round trip)
    t0 = time.time()
    for _ in range(reps):
        _np.asarray(jax.tree_util.tree_leaves(r)[0][:1])
    t_fetch = (time.time() - t0) / reps
    t0 = time.time()
    for _ in range(reps):
        out = fn()
        _np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
    dt = (time.time() - t0) / reps - t_fetch
    return n_queries / max(dt, 1e-9)


def config3(args):
    jax = setup_jax()
    import jax.numpy as jnp

    from granne_tpu.index.ivf_big import build_ivf_f32_chunked, exact_topk_over_blocks
    from granne_tpu.ops import distance as D

    N, Dm, K = args.n, 96, 10
    vecs, queries = make_clustered(N, Dm, 8192, dtype=np.float32)

    t0 = time.time()
    ivf = build_ivf_f32_chunked(
        vecs, n_clusters=args.clusters, kmeans_iters=8, cluster_cap=args.cap, log=log
    )
    build_s = time.time() - t0
    log(f"[config3] ivf build: {build_s:.0f}s ({N / build_s:.0f} vec/s incl. transfers)")
    del vecs

    qd = jax.device_put(D.normalize(jnp.asarray(queries)))
    gt, _ = exact_topk_over_blocks(ivf, qd[:1024], K)
    log("[config3] ground truth done")

    detail = {"build_seconds": round(build_s, 1), "n": N}
    best = None
    for nprobe in (4, 6, 8, 12, 16, 24, 32, 48, 64, 96):
        ids, _ = ivf.search_batch(qd[:1024], K, nprobe=nprobe)
        rec = recall_at_k(np.asarray(ids), gt, K)
        log(f"[config3] nprobe={nprobe}: recall={rec:.4f}")
        if rec >= 0.95:
            best = nprobe
            detail["recall_at_10"] = round(rec, 4)
            break
    if best is None:
        raise SystemExit("no operating point reached recall 0.95")

    for B in (1024, 4096, 8192):
        qps = timed_qps(
            jax, lambda b=B: ivf.search_batch(qd[:b], K, nprobe=best), B
        )
        detail[f"qps_b{B}"] = round(qps, 1)
        log(f"[config3] B={B}: {qps:.0f} qps")
    detail["nprobe"] = best
    print(json.dumps({"config": "config3_deep10m_f32_stream", **detail}), flush=True)


def config4(args):
    jax = setup_jax()
    import jax.numpy as jnp

    from granne_tpu import AngularVectors, BuildConfig, build_layers
    from granne_tpu.models.brute import exact_topk
    from granne_tpu.ops import distance as D
    from granne_tpu.ops import frontier

    app = args.append_n if args.append_n else args.n // 5
    N0, N1, Dm, K = args.n, args.n + app, 100, 10
    vecs, queries = make_clustered(N1, Dm, 2048, dtype=np.float32)
    elements = AngularVectors.from_raw(vecs)
    qd = jax.device_put(D.normalize(jnp.asarray(queries)))

    def force(stack):
        # block_until_ready is LAZY on the tunnel backend (CLAUDE.md):
        # only a value fetch proves the build actually finished
        for a in stack.layers:
            float(jnp.sum(a[:: max(1, a.shape[0] // 64)]))

    cfg = BuildConfig(num_neighbors=20, max_search=100, wave_size=1024, expand=4,
                      build_max_iters=args.max_iters)
    t0 = time.time()
    state = build_layers(elements, cfg, num_elements=N0)
    force(state)
    base_s = time.time() - t0
    log(f"[config4] base build {N0}: {base_s:.0f}s ({N0 / base_s:.0f} vec/s)")

    gt0 = exact_topk(elements.vectors[:N0], qd, K)[0]

    def hnsw_recall(layers, gt, ef):
        ids, _ = frontier.search_layers(layers.layers, elements, qd, ef=ef, num_neighbors=K, expand=4)
        return recall_at_k(np.asarray(ids), gt, K)

    rec_before = hnsw_recall(state, gt0, args.ef)
    log(f"[config4] recall before append: {rec_before:.4f}")

    t0 = time.time()
    state = build_layers(elements, cfg, num_elements=N1, state=state,
                         consume_state=True)
    force(state)
    append_s = time.time() - t0
    log(f"[config4] append {N1 - N0}: {append_s:.0f}s ({(N1 - N0) / append_s:.0f} vec/s)")

    gt1 = exact_topk(elements.vectors, qd, K)[0]
    rec_after = hnsw_recall(state, gt1, args.ef)

    # new elements are findable: self-query a sample of appended elements
    sample = np.random.default_rng(0).integers(N0, N1, 512)
    sq = elements.prepare_queries(jnp.asarray(np.asarray(vecs[sample], np.float32)))
    sids, _ = frontier.search_layers(state.layers, elements, sq, ef=40, num_neighbors=1, expand=4)
    self_recall = float(np.mean(np.asarray(sids)[:, 0] == sample))

    log(f"[config4] recall after append: {rec_after:.4f}, self-recall(new)={self_recall:.4f}")
    print(
        json.dumps(
            {
                "config": "config4_extensible_append",
                "n_base": N0,
                "n_appended": N1 - N0,
                "ef": args.ef,
                "build_max_iters": args.max_iters,
                "recall_at_10_before": round(rec_before, 4),
                "recall_at_10_after": round(rec_after, 4),
                "self_recall_new_elements": round(self_recall, 4),
                "base_build_seconds": round(base_s, 1),
                "append_seconds": round(append_s, 1),
                "append_vectors_per_s": round((N1 - N0) / append_s, 1),
            }
        ),
        flush=True,
    )


def config5(args):
    jax = setup_jax()
    import jax.numpy as jnp

    from granne_tpu.index.ivf_big import build_ivf_i8_chunked, exact_topk_over_blocks
    from granne_tpu.ops import distance as D
    from granne_tpu.parallel.tiering import TieredIvf

    N, Dm, K = args.n, 96, 10
    t0 = time.time()
    x_i8, queries = make_clustered(N, Dm, 4096, dtype=np.int8)
    log(f"[config5] generated {N} int8 vectors in {time.time() - t0:.0f}s "
        f"({x_i8.nbytes / 1e9:.1f} GB host)")

    t0 = time.time()
    ivf = build_ivf_i8_chunked(
        x_i8,
        n_clusters=args.clusters,
        cluster_cap=args.cap,
        kmeans_iters=6,
        device_resident=True,
        log=log,
    )
    build_s = time.time() - t0
    log(f"[config5] chunked build: {build_s:.0f}s ({N / build_s:.0f} vec/s)")

    qd = jax.device_put(D.normalize(jnp.asarray(queries)))
    gt, _ = exact_topk_over_blocks(ivf, qd[:512], K, block_chunk=1024)
    log("[config5] exact int8 ground truth done")

    detail = {"n": N, "build_seconds": round(build_s, 1),
              "hbm_blocks_gb": round(int(np.prod(ivf.blocks.shape)) / 1e9, 2)}
    best = None
    # ungrouped chunked path for the sweep: bounded [64, nprobe, L, d] gathers
    for nprobe in (16, 24, 32, 48, 64, 96, 128, 192):
        ids, _ = ivf.search_batch(qd[:512], K, nprobe=nprobe, grouped=False, query_chunk=64)
        rec = recall_at_k(np.asarray(ids), gt, K)
        log(f"[config5] nprobe={nprobe}: recall={rec:.4f}")
        if rec >= 0.95:
            best = nprobe
            detail["recall_at_10"] = round(rec, 4)
            break
    if best is None:
        raise SystemExit("no operating point reached recall 0.95")
    detail["nprobe"] = best

    # grouped (cluster-centric) at small B, ungrouped-chunked at large B —
    # both keep the scratch gather under ~1 GB next to the ~10 GB index
    try:
        qps = timed_qps(
            jax,
            lambda: ivf.search_batch(qd[:256], K, nprobe=best, grouped=True, group_cap=32),
            256,
        )
        detail["qps_hbm_b256_grouped"] = round(qps, 1)
        log(f"[config5] HBM grouped B=256: {qps:.0f} qps")
    except Exception as e:  # at 100M + high nprobe the grouped gather can
        log(f"[config5] grouped B=256 skipped ({type(e).__name__}: HBM)")  # exceed HBM

    for B in (1024, 4096):
        qps = timed_qps(
            jax,
            lambda b=B: ivf.search_batch(qd[:b], K, nprobe=best, grouped=False, query_chunk=64),
            B,
        )
        detail[f"qps_hbm_b{B}"] = round(qps, 1)
        log(f"[config5] HBM ungrouped B={B}: {qps:.0f} qps")

    # tiered path: blocks live in host DRAM, fetched per batch (mmap analog).
    # Throughput here is bounded by the H2D tunnel of this environment
    # (~80 MB/s); on a real TPU VM host DMA is ~100x that.
    if args.tiered_full:
        tiered = TieredIvf(
            centroids=ivf.centroids,
            host_blocks=np.asarray(ivf.blocks),
            host_block_ids=np.asarray(ivf.block_ids),
            host_block_scales=np.asarray(ivf.block_scales),
            n_total=ivf.n_total,
        )
        t0 = time.time()
        tids, _ = tiered.search_batch(np.asarray(queries[:256]), K, nprobe=best)
        tiered_s = time.time() - t0
        trec = recall_at_k(tids, gt[:256], K)
        detail["tiered_qps_b256"] = round(256 / tiered_s, 1)
        detail["tiered_recall_at_10"] = round(trec, 4)
        log(f"[config5] tiered: {256 / tiered_s:.0f} qps recall={trec:.4f}")

    print(json.dumps({"config": "config5_100m_int8", **detail}), flush=True)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    c3 = sub.add_parser("config3")
    c3.add_argument("--n", type=int, default=10_000_000)
    c3.add_argument("--clusters", type=int, default=8192)
    c3.add_argument("--cap", type=int, default=256)
    c4 = sub.add_parser("config4")
    c4.add_argument("--n", type=int, default=500_000)
    c4.add_argument("--ef", type=int, default=60)
    c4.add_argument("--append-n", type=int, default=None, dest="append_n",
                    help="elements appended after the base build (default n/5; "
                         "the 10M spec appends 1M)")
    c4.add_argument("--max-iters", type=int, default=None, dest="max_iters",
                    help="build_max_iters (the round-2 fast-builder cap; 32 "
                         "matches the benched 1.2M configuration)")
    c5 = sub.add_parser("config5")
    c5.add_argument("--n", type=int, default=100_000_000)
    c5.add_argument("--clusters", type=int, default=24576)
    c5.add_argument("--cap", type=int, default=512)
    c5.add_argument("--tiered-full", action="store_true", dest="tiered_full")
    args = p.parse_args()
    {"config3": config3, "config4": config4, "config5": config5}[args.cmd](args)


if __name__ == "__main__":
    main()
