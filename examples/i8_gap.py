"""Decompose the int8 HNSW serving recall gap (round-4 ask #2).

At the bench config (200k x 100d clustered, f32-built graph) bf16 serving
reaches 0.9627 @ ef=32 while the int8 neighbor-cache path needs ef=120 for
0.95 — a 6x QPS tax.  Three error sources stack; this harness measures each:

  (1) REPRESENTATION: the brute-force recall ceiling of dequantized int8
      rows scored in f32 against the f32 ground truth.  Measured twice:
      with the reference's truncating quantizer (``as i8``,
      /root/reference/src/elements/angular_int.rs:39) and with
      round-to-nearest codes (same int8 storage format, ~half the RMS
      quantization error, no bias).
  (2) TRAVERSAL CONTAINMENT: does the ef-wide beam contain the true
      neighbors?  Measured by exact f32 re-ranking of the full final beam.
  (3) FINAL RANKING: the gap between (2) and the recall of the beam's own
      (bf16-cache-scored) top-10 ordering.

Output: one JSON line with ceilings + a per-ef table for both quantizers.
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

N = int(os.environ.get("I8GAP_N", 200_000))
DIM = 100
M = 20
BUILD_EF = 100
NQ = int(os.environ.get("I8GAP_QUERIES", 4096))
K = 10
EFS = [32, 40, 48, 60, 80]


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def recall_at_k(ids, gt):
    hits = sum(len(set(ids[i]) & set(gt[i])) for i in range(len(gt)))
    return hits / (len(gt) * gt.shape[1])


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

    out = {"run": "i8_gap", "n": N, "d": DIM, "queries": NQ}

    # ---- (1) representation ceilings -----------------------------------
    x = jnp.asarray(vecs)
    max_abs = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    denom = jnp.where(max_abs > 0.0, max_abs, 127.0)
    scaled = x * 127.0 / denom
    codes = {
        "trunc": jnp.trunc(scaled).astype(jnp.int8),
        "round": jnp.round(scaled).astype(jnp.int8),
    }
    ceilings = {}
    for name, c in codes.items():
        el8 = AngularIntVectors.from_quantized(c)
        unit = el8.vectors.astype(jnp.float32) * el8.inv_norms[:, None]
        ids = np.asarray(exact_topk(unit, qd, K)[0])
        ceilings[name] = round(recall_at_k(ids, gt), 4)
        log(f"ceiling[{name}] = {ceilings[name]}")
    out["brute_ceiling"] = ceilings

    # ---- build ONE f32 graph; both quantizers serve it ------------------
    cfg = BuildConfig(num_neighbors=M, max_search=BUILD_EF, wave_size=1024,
                      expand=4)
    log("building f32 graph (shared by all serving paths)...")
    t0 = time.time()
    layers = build_layers(elements, cfg)
    for a in layers.layers:
        float(jnp.sum(a[:: max(1, a.shape[0] // 64)]))
    log(f"build {time.time() - t0:.1f}s")

    # ---- (2)+(3): per-ef beam recall and exact-reranked recall ----------
    for name, c in codes.items():
        el8 = AngularIntVectors.from_quantized(c)
        q8 = el8.prepare_queries(jnp.asarray(queries))
        tab8 = make_neighbor_cache(layers.layers[-1], el8, rows=N)
        unit_rows = el8.vectors.astype(jnp.float32) * el8.inv_norms[:, None]
        qf32 = D.normalize(jnp.asarray(queries))

        @jax.jit
        def rerank(beam_ids, qn, rows=unit_rows):
            g = jnp.take(rows, jnp.clip(beam_ids, 0, rows.shape[0] - 1), axis=0)
            dots = jnp.einsum("bkd,bd->bk", g, qn,
                              preferred_element_type=jnp.float32)
            dd = jnp.where(beam_ids >= 0, 1.0 - dots, np.inf)
            idx = jnp.argsort(dd, axis=-1)[:, :K]
            return jnp.take_along_axis(beam_ids, idx, axis=-1)

        rows = []
        for ef in EFS:
            kw = dict(ef=ef, num_neighbors=ef, expand=1, descent_ef=4,
                      max_iters=max(8, ef - 6))
            ids, _ = frontier.search_layers(layers.layers, el8, q8,
                                            nbr_vecs=tab8, **kw)
            beam = np.asarray(ids)
            rec_plain = recall_at_k(beam[:, :K], gt)
            rec_rerank = recall_at_k(np.asarray(rerank(ids, qf32)), gt)
            rows.append({"ef": ef, "recall": round(rec_plain, 4),
                         "recall_reranked": round(rec_rerank, 4)})
            log(f"{name} ef={ef}: beam-top10 {rec_plain:.4f}  "
                f"exact-rerank {rec_rerank:.4f}")
        out[f"sweep_{name}"] = rows
        del tab8

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
