"""Exact brute-force index: MXU-scored full scan.

No reference counterpart (granne never brute-forces) — but on TPU a dense
[B, d] x [d, n] contraction at bf16 scores hundreds of thousands of vectors
per query batch near MXU speed, which beats graph traversal outright for n
up to a few million (measured on v5e: ~380k QPS bf16 / ~600k QPS int8
storage at n=200k, d=100, B=1024 — vs ~6k QPS for the single-core scalar
HNSW loop).  Serves as (a) the exact engine at small/medium scale,
(b) ground-truth generator for recall harnesses, and (c) the per-cluster
scorer design underlying IVF.

Top-k uses ``lax.approx_max_k`` — the TPU-native partial-reduction top-k
(recall_target tunable, default 0.95 per-op which in practice costs <1%
recall@10 after the k-way merge).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import distance as D


@partial(jax.jit, static_argnames=("k", "recall_target"))
def _brute_topk(xb, q, *, k, recall_target):
    dots = jax.lax.dot_general(
        q, xb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    v, i = jax.lax.approx_max_k(dots, k, recall_target=recall_target)
    return i.astype(jnp.int32), jnp.maximum(0.0, 1.0 - v)


@partial(jax.jit, static_argnames=("k",))
def _exact_chunk_topk(xb_f32, q, *, k):
    dots = jax.lax.dot_general(
        q, xb_f32, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    v, i = jax.lax.top_k(dots, k)
    return i.astype(jnp.int32), v


def exact_topk(x, q, k: int, *, chunk: int = 262144):
    """Exact cosine ground truth: f32 scores + ``lax.top_k``, no approx_max_k
    recall_target and no bf16 ranking noise.  Chunked over the database so a
    multi-million-row scan never materializes a [B, n] score matrix.

    ``x``: f32[n, d] unit-norm rows (np or device array); ``q``: f32[B, d]
    unit-norm queries.  Returns (ids int64[B, k], dists f32[B, k]).
    """
    n = x.shape[0]
    B = q.shape[0]
    q = jnp.asarray(q, jnp.float32)
    best_v = np.full((B, k), -np.inf, np.float32)
    best_i = np.full((B, k), -1, np.int64)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        if isinstance(x, jax.Array):
            xc = jax.lax.dynamic_slice_in_dim(x, lo, hi - lo, axis=0)
        else:
            xc = jnp.asarray(np.asarray(x[lo:hi], np.float32))
        if hi - lo < chunk:  # pad to a single compiled shape; mask below
            xc = jnp.concatenate(
                [xc, jnp.zeros((chunk - (hi - lo), x.shape[1]), jnp.float32)]
            )
        i_c, v_c = _exact_chunk_topk(xc, q, k=k)
        i_np = np.asarray(i_c, np.int64)
        v_np = np.array(v_c)  # writable copy (np.asarray of a device buffer is read-only)
        v_np[i_np >= hi - lo] = -np.inf
        all_v = np.concatenate([best_v, v_np], axis=1)
        all_i = np.concatenate([best_i, i_np + lo], axis=1)
        pos = np.argsort(-all_v, kind="stable", axis=1)[:, :k]
        best_v = np.take_along_axis(all_v, pos, axis=1)
        best_i = np.take_along_axis(all_i, pos, axis=1)
    return best_i, np.maximum(0.0, 1.0 - best_v)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BruteForceIndex:
    """Exact cosine top-k over unit-norm rows (bf16 MXU compute)."""

    vectors: jax.Array  # bf16[n_pad, d] or i8[n_pad, d]
    scale: jax.Array  # f32[n_pad] per-row scale to undo storage quantization
    n_total: int = field(metadata=dict(static=True))

    @classmethod
    def build(cls, raw_vectors: np.ndarray, *, storage: str = "bfloat16") -> "BruteForceIndex":
        """storage: 'bfloat16' (default) or 'int8' (half the HBM traffic)."""
        x = D.normalize(jnp.asarray(np.asarray(raw_vectors, np.float32)))
        n = x.shape[0]
        pad = (-n) % 128
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), jnp.float32)], axis=0)
        if storage == "int8":
            xi = D.quantize_i8(x)
            inv = D.inv_norms_i8(xi)
            return cls(vectors=xi, scale=inv, n_total=n)
        return cls(
            vectors=x.astype(jnp.bfloat16),
            scale=jnp.ones((x.shape[0],), jnp.float32),
            n_total=n,
        )

    def search_batch(self, queries, num_neighbors: int = 10, *, recall_target: float = 0.95):
        q = queries.astype(jnp.float32) if isinstance(queries, jax.Array) else jnp.asarray(
            np.asarray(queries, np.float32)
        )
        q = D.normalize(q)
        if self.vectors.dtype == jnp.int8:
            ids, dists = _brute_topk_i8(
                self.vectors, self.scale, q, k=num_neighbors, recall_target=recall_target
            )
        else:
            ids, dists = _brute_topk(
                self.vectors, q.astype(jnp.bfloat16), k=num_neighbors, recall_target=recall_target
            )
        ids = jnp.where(ids < self.n_total, ids, -1)
        return ids, dists


@partial(jax.jit, static_argnames=("k", "recall_target"))
def _brute_topk_i8(xi, inv_norm, q, *, k, recall_target):
    # int8 storage read, bf16 MXU passes; cosine = dot * inv_norm (query is
    # unit norm in f32; its bf16 cast noise is shared across candidates)
    dots = jax.lax.dot_general(
        q.astype(jnp.bfloat16),
        xi.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    cos = dots * inv_norm[None, :]
    v, i = jax.lax.approx_max_k(cos, k, recall_target=recall_target)
    return i.astype(jnp.int32), jnp.maximum(0.0, 1.0 - v)
