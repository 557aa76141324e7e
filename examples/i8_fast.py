"""Measure the dequantized int8 serving path (round-4 ask #2, final form).

``AngularIntVectors.dequantized()`` turns the int8 storage into a bf16
unit-vector serving copy once at load, so the whole traversal (descent,
seeds, cached bottom beam) runs on the fast single-gather bf16 path; the
final beam is re-scored EXACTLY against the int8 storage
(``search_layers(rerank=True, rerank_with=el8)``).  The int8 container's
own traversal caps at ~52k QPS (two-gather descent + int8 dots,
examples/f32_cache.py); the bf16 container serves the same graph at ~197k.

Output: one JSON line; rows for RTN and trunc codes at several ef.
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

N = int(os.environ.get("I8F_N", 200_000))
DIM = 100
M = 20
BUILD_EF = 100
NQ = int(os.environ.get("I8F_QUERIES", 4096))
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

    out = {"run": "i8_fast", "n": N, "d": DIM, "queries": NQ, "rows": []}

    for quant in ["nearest", "trunc"]:
        el8 = AngularIntVectors.from_raw(vecs, rounding=quant)
        el8dq = el8.dequantized()
        qdq = el8dq.prepare_queries(qd)
        tab = make_neighbor_cache(layers.layers[-1], el8dq, rows=N)
        efs = [44, 48, 56, 60] if quant == "nearest" else [56, 80]
        for ef in efs:
            for rr in ([True, False] if ef == 48 else [True]):
                kw = dict(ef=ef, num_neighbors=K, expand=1, descent_ef=4,
                          max_iters=max(8, ef - 6))
                if rr:
                    kw["rerank"] = True
                    ids, _ = frontier.search_layers(
                        layers.layers, el8dq, qdq, nbr_vecs=tab,
                        rerank_with=el8, **kw)
                else:
                    ids, _ = frontier.search_layers(
                        layers.layers, el8dq, qdq, nbr_vecs=tab, **kw)
                rec = recall_at_k(np.asarray(ids), gt)
                row = {"quant": quant, "ef": ef,
                       "rerank": rr, "recall": round(rec, 4)}
                if rec >= 0.95 or (ef == 48 and not rr):
                    if rr:
                        qps = timed_qps(
                            lambda qq, ly, el, tb, e8, kw=kw:
                            frontier.search_layers(
                                ly, el, qq, nbr_vecs=tb, rerank_with=e8, **kw),
                            qdq, (layers.layers, el8dq, tab, el8))
                    else:
                        qps = timed_qps(
                            lambda qq, ly, el, tb, kw=kw:
                            frontier.search_layers(ly, el, qq, nbr_vecs=tb, **kw),
                            qdq, (layers.layers, el8dq, tab))
                    row["qps"] = round(qps, 1)
                out["rows"].append(row)
                log(f"i8_fast {row}")
        del tab, el8, el8dq, qdq

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
