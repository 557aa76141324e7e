"""Reorder at scale: cost + measured serving effect (VERDICT r2 #5).

The reference's rationale for `Granne::reorder` is cache/page locality of
the element store during graph descent (reorder.rs:12-14).  This script
measures, on a REAL built graph at 1.2M:

  1. compute_order wall time (trails now run in ONE on-device dispatch);
  2. TPU serving QPS before/after reorder (device-true timing) — HBM gathers
     are DMA-descriptor-bound, so the expected delta is ~0; measured, not
     assumed;
  3. single-core C++ scalar serving QPS before/after on the same graphs —
     the host/mmap serving path the reference optimizes for, where memory
     locality is load-bearing;
  4. trails cost at 10M on a synthetic graph (scaling of the transform).

Output: one JSON line.  Env: RQ_N (default 1.2M), RQ_SKIP_10M=1.
"""

import ctypes
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("GT_FORCE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GT_FORCE_PLATFORM"])
else:
    # TPU only: the CPU backend can SIGILL on this cache (AOT machine mismatch)
    jax.config.update("jax_compilation_cache_dir", "/tmp/granne_tpu_jax_cache")

from functools import partial

import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("RQ_N", "1200000"))
D = 100
M = 20
EF = 44
K = 10
Q = 4096


def dev_time_qps(fn, q, extra, reps_pair=(20, 120)):
    @partial(jax.jit, static_argnames=("iters",))
    def run(qq, ex, *, iters):
        def body(i, carry):
            q_c, acc = carry
            ids, d = fn(q_c, *ex)
            z = jnp.where(jnp.isfinite(d[0, 0]), d[0, 0], 1.0) * 0.0
            nxt = jax.tree_util.tree_map(
                lambda leaf: leaf + z.astype(leaf.dtype), qq
            )
            return nxt, acc + z

        return jax.lax.fori_loop(0, iters, body, (qq, jnp.float32(0)))[1]

    lo, hi = reps_pair
    for it in (lo, hi):
        float(run(q, extra, iters=it))
    t0 = time.perf_counter()
    float(run(q, extra, iters=lo))
    tl = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(q, extra, iters=hi))
    th = time.perf_counter() - t0
    per_batch = (th - tl) / (hi - lo)
    return q.shape[0] / per_batch


def cpu_qps(lib, layers, vec_np, queries, ef, n_queries=300):
    arrays = [np.ascontiguousarray(a) for a in layers.as_numpy()]
    out_ids = np.empty((n_queries, K), np.int32)
    out_d = np.empty((n_queries, K), np.float32)
    ptrs = (ctypes.c_void_p * len(arrays))(
        *[a.ctypes.data_as(ctypes.c_void_p).value for a in arrays]
    )
    qb = np.ascontiguousarray(queries[:n_queries])
    t0 = time.time()
    lib.gt_search_f32(
        vec_np.ctypes.data_as(ctypes.c_void_p), vec_np.shape[0], D,
        ctypes.cast(ptrs, ctypes.c_void_p), len(arrays), M,
        qb.ctypes.data_as(ctypes.c_void_p), n_queries, ef, K, 1,
        out_ids.ctypes.data_as(ctypes.c_void_p),
        out_d.ctypes.data_as(ctypes.c_void_p),
    )
    return n_queries / (time.time() - t0), out_ids


def main():
    from granne_tpu import AngularVectors, BuildConfig, build_layers
    from granne_tpu.index import reorder as R
    from granne_tpu.native import get_lib
    from granne_tpu.ops import distance as Dops, frontier

    out = {"run": "reorder_qps", "n": N, "d": D, "m": M}
    rng = np.random.default_rng(42)
    centers = rng.standard_normal((1000, D)).astype(np.float32)
    assign = rng.integers(0, 1000, N)
    vecs = (centers[assign] + 0.35 * rng.standard_normal((N, D))).astype(np.float32)
    queries = (
        centers[rng.integers(0, 1000, Q)] + 0.35 * rng.standard_normal((Q, D))
    ).astype(np.float32)

    elements = AngularVectors.from_raw(vecs)
    cfg = BuildConfig(
        num_neighbors=M, max_search=100, wave_size=1024, expand=4,
        neighbor_cache=True, build_max_iters=32, merge_chunk=4096,
    )
    print(f"building {N} x {D} ...", file=sys.stderr, flush=True)
    t0 = time.time()
    layers = build_layers(elements, cfg)
    out["build_seconds"] = round(time.time() - t0, 1)
    print(f"build: {out['build_seconds']}s", file=sys.stderr, flush=True)

    el16 = elements.as_bf16()
    qd = jax.device_put(Dops.normalize(jnp.asarray(queries)))
    q16 = el16.prepare_queries(qd)

    def search(qq, ly_and_el):
        ly, el = ly_and_el
        return frontier.search_layers(
            list(ly), el, qq, ef=EF, num_neighbors=K, expand=1, descent_ef=4,
            max_iters=38,
        )

    qps_before = dev_time_qps(
        lambda qq, ly, el: search(qq, (ly, el)), q16, (tuple(layers.layers), el16)
    )
    print(f"tpu before: {qps_before:,.0f} QPS", file=sys.stderr, flush=True)
    out["tpu_qps_before"] = round(qps_before, 1)

    # --- reorder ---------------------------------------------------------
    t0 = time.time()
    order = R.compute_order(layers, el16)
    out["compute_order_seconds"] = round(time.time() - t0, 2)
    print(f"compute_order: {out['compute_order_seconds']}s", file=sys.stderr, flush=True)
    t0 = time.time()
    new_layers, new_elements, order = R.reorder_index(layers, elements, order)
    out["apply_seconds"] = round(time.time() - t0, 2)

    nel16 = new_elements.as_bf16()
    nq16 = nel16.prepare_queries(qd)
    qps_after = dev_time_qps(
        lambda qq, ly, el: search(qq, (ly, el)), nq16,
        (tuple(new_layers.layers), nel16),
    )
    print(f"tpu after: {qps_after:,.0f} QPS", file=sys.stderr, flush=True)
    out["tpu_qps_after"] = round(qps_after, 1)
    out["tpu_delta_pct"] = round(100 * (qps_after / qps_before - 1), 2)

    # parity: results map back through the permutation
    ids_a, _ = search(q16[:256], (tuple(layers.layers), el16))
    ids_b, _ = search(nq16[:256], (tuple(new_layers.layers), nel16))
    mapped = np.asarray(order)[np.asarray(ids_b)]
    overlap = np.mean([
        len(set(mapped[i]) & set(np.asarray(ids_a)[i])) / K for i in range(256)
    ])
    out["top10_overlap_after_remap"] = round(float(overlap), 4)

    # --- host single-core serving (the reference's locality story) -------
    lib = get_lib()
    if lib is not None:
        vec_np = np.ascontiguousarray(np.asarray(elements.vectors))
        nvec_np = np.ascontiguousarray(np.asarray(new_elements.vectors))
        qn = np.asarray(Dops.normalize(jnp.asarray(queries)))
        c_before, _ = cpu_qps(lib, layers, vec_np, qn, 60)
        c_after, _ = cpu_qps(lib, new_layers, nvec_np, qn, 60)
        out["cpu_qps_before"] = round(c_before, 1)
        out["cpu_qps_after"] = round(c_after, 1)
        out["cpu_delta_pct"] = round(100 * (c_after / c_before - 1), 2)
        print(f"cpu before/after: {c_before:.0f} / {c_after:.0f} QPS",
              file=sys.stderr, flush=True)

    # --- trails cost at 10M (synthetic graph; transform scaling) ---------
    if os.environ.get("RQ_SKIP_10M") != "1":
        from granne_tpu.index.graph import LayerStack

        n10 = 10_000_000
        print("10M trails timing (synthetic graph) ...", file=sys.stderr, flush=True)
        g = jax.random.normal(jax.random.PRNGKey(1), (n10, 32), jnp.bfloat16)
        el10 = AngularVectors.from_normalized(
            Dops.normalize(g.astype(jnp.float32)).astype(jnp.bfloat16)
        )
        rng2 = np.random.default_rng(1)
        counts = [100, 10_000, 1_000_000, n10]
        arrays = [
            jnp.asarray(rng2.integers(0, c, (c, M)).astype(np.int32))
            for c in counts
        ]
        stack10 = LayerStack(layers=tuple(arrays), counts=tuple(counts))
        t0 = time.time()
        trails = R._entrypoint_trails(stack10, el10)
        out["trails_10m_seconds"] = round(time.time() - t0, 1)
        out["trails_10m_shape"] = list(trails.shape)
        print(f"10M trails: {out['trails_10m_seconds']}s", file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
