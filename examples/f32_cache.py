"""A/B the f32 neighbor-cache against bf16-cache(+rerank) at serving shapes.

The rerank pass fixes bf16 near-tie misordering but pays a [B, ef]
scattered gather — measured ~2x QPS tax at ef=48 (examples/i8_serve.py:
50.9k vs the ~95-120k the traversal alone should run at).  A
``cache_dtype="f32"`` table embeds EXACT rows instead (2x row bytes, zero
extra descriptors); since the hot loop is DMA-descriptor-bound, fat rows
should be nearly free.  Rows measured here:

  1. int8 RTN codes + f32 cache (exact dequant rows) at ef 40-56
  2. f32 elements + f32 cache at ef 24-32 (flagship: does exact scoring
     lower the ef needed for 0.95?)
  3. same shapes with the bf16 cache, same-process, for a clean A/B

Output: one JSON line with all rows.
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

N = int(os.environ.get("F32C_N", 200_000))
DIM = 100
M = 20
BUILD_EF = 100
NQ = int(os.environ.get("F32C_QUERIES", 4096))
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

    out = {"run": "f32_cache", "n": N, "d": DIM, "queries": NQ, "rows": []}

    def measure(tag, el, q, tab, ef, rerank=False):
        kw = dict(ef=ef, num_neighbors=K, expand=1, descent_ef=4,
                  max_iters=max(8, ef - 6))
        if rerank:
            kw["rerank"] = True
        ids, _ = frontier.search_layers(layers.layers, el, q, nbr_vecs=tab, **kw)
        rec = recall_at_k(np.asarray(ids), gt)
        row = {"variant": tag, "ef": ef, "recall": round(rec, 4)}
        qps = timed_qps(
            lambda qq, ly, e, tb, kw=kw: frontier.search_layers(
                ly, e, qq, nbr_vecs=tb, **kw),
            q, (layers.layers, el, tab))
        row["qps"] = round(qps, 1)
        out["rows"].append(row)
        log(f"f32_cache {row}")
        return rec

    # --- 1+3. int8 RTN: f32 cache vs bf16 cache(+rerank), same process ----
    el8 = AngularIntVectors.from_raw(vecs, rounding="nearest")
    q8 = el8.prepare_queries(jnp.asarray(queries))
    tab_f = make_neighbor_cache(layers.layers[-1], el8, rows=N, cache_dtype="f32")
    for ef in [40, 44, 48, 56]:
        measure("i8rtn+f32cache", el8, q8, tab_f, ef)
    del tab_f
    tab_b = make_neighbor_cache(layers.layers[-1], el8, rows=N)
    measure("i8rtn+bf16cache", el8, q8, tab_b, 48)
    measure("i8rtn+bf16cache+rerank", el8, q8, tab_b, 48, rerank=True)
    del tab_b, el8, q8

    # --- 2. f32 elements + f32 cache at low ef ----------------------------
    q32 = elements.prepare_queries(qd)
    tab32 = make_neighbor_cache(layers.layers[-1], elements, rows=N,
                                cache_dtype="f32")
    for ef in [24, 28, 32]:
        measure("f32+f32cache", elements, q32, tab32, ef)
    del tab32
    el16 = elements.as_bf16()
    q16 = el16.prepare_queries(qd)
    tab16 = make_neighbor_cache(layers.layers[-1], el16, rows=N)
    for ef in [24, 32]:
        measure("bf16+bf16cache", el16, q16, tab16, ef)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
