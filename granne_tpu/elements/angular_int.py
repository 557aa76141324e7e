"""int8 quantized cosine element container.

Reference parity: ``/root/reference/src/elements/angular_int.rs`` — f32 rows
are max-abs scaled into [-127, 127] and stored as int8 (``:25-45``); distance
is ``max(0, 1 - r / (|x| |y|))`` with an int32-accumulated dot
(``:47-60``, ``math.rs:59-89``).  On TPU the int8 dot runs on the MXU with
``preferred_element_type=int32``; element norms are precomputed once at ingest
instead of per pair.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import distance as D


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class IntQueries:
    """Prepared int8 query batch: quantized vectors + reciprocal norms.

    A tiny pytree (not a bare tuple) so generic code can ask ``.shape``
    (the neighbor-cache beam path keys on ``queries.shape[-1]``) while the
    int8 distance kernels keep unpacking ``qv, qn = queries``.

    ``unit`` (optional) is the UNQUANTIZED unit-norm query in f32.  The
    reference quantizes queries into the element space
    (``angular_int.rs:25-45``) because its rows are int8; but the
    neighbor-vector cache rows here are already bf16 *unit* vectors derived
    from the int8 storage, so cached scoring can use the exact query and
    pay zero quantization error on the query side — int8 stays the storage
    format exactly as in the reference (``angular_int.rs:47-60``), and the
    cached path becomes the bf16 math with int8-provenance rows.
    ``prepare_queries`` fills it from the raw f32 query; paths that only
    have int8 rows as queries (build merges) fill it with the row's unit
    form.  Scoring paths downcast ``unit`` to the row dtype themselves
    (``score_block``/``query_lanes``), so it is held in f32 — the exact
    rerank (``rerank_dists``) reads it at full precision.
    """

    vecs: jax.Array  # int8[B, d]
    inv_norms: jax.Array  # float32[B]
    unit: jax.Array | None = None  # f32[B, d] unit-norm, exact query

    @property
    def shape(self):
        return self.vecs.shape

    def __iter__(self):
        return iter((self.vecs, self.inv_norms))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AngularIntVectors:
    """Dense int8 vectors + precomputed reciprocal norms."""

    vectors: jax.Array  # int8[n, d]
    inv_norms: jax.Array  # float32[n], 0.0 for zero rows
    # quantizer used at ingest ("trunc" | "nearest"); extend() reuses it so
    # appended rows never mix rounding modes with the existing codes
    rounding: str = field(default="trunc", metadata=dict(static=True))

    # -- construction ------------------------------------------------------

    @classmethod
    def from_raw(cls, raw, rounding: str = "trunc") -> "AngularIntVectors":
        """Quantize f32 [n, d] rows (``angular_int.rs:27-45``).

        ``rounding="nearest"`` stores round-to-nearest codes (same int8
        format, ~half the quantization error — see ops.distance.quantize_i8);
        the default truncates for bit parity with the reference.
        """
        arr = jnp.asarray(np.asarray(raw, dtype=np.float32))
        if arr.ndim != 2:
            raise ValueError(f"expected [n, d] array, got shape {arr.shape}")
        q = D.quantize_i8(arr, rounding=rounding)
        return cls(vectors=q, inv_norms=D.inv_norms_i8(q), rounding=rounding)

    @classmethod
    def from_quantized(cls, vectors) -> "AngularIntVectors":
        v = jnp.asarray(vectors, jnp.int8)
        return cls(vectors=v, inv_norms=D.inv_norms_i8(v))

    def dequantized(self):
        """A bf16 unit-vector serving copy (``AngularVectors``): int8 stays
        the storage/distribution format (angular_int.rs:47-60 — 4x smaller
        artifacts); dequantizing ONCE at load moves traversal (descent +
        seed scoring) onto the fast single-gather bf16 path.  Measured: the
        int8 container's two-gather descent (codes + inv_norms) plus int8
        dots cap serving at ~52k QPS where the same graph serves at ~197k
        through a bf16 container (examples/f32_cache.py).  Pair with
        ``search_layers(rerank=True, rerank_with=<this int container>,
        rerank_queries=<f32 unit queries>)`` for the exact-f32 final
        ordering (without ``rerank_queries`` the rerank keeps the bf16
        traversal query's rounding — the rows are exact, the query is not)."""
        from .angular import AngularVectors

        unit = (self.vectors.astype(jnp.float32)
                * self.inv_norms[:, None]).astype(jnp.bfloat16)
        return AngularVectors(vectors=unit)

    # -- container protocol ------------------------------------------------

    def __len__(self) -> int:
        return int(self.vectors.shape[0])

    @property
    def dim(self) -> int:
        return int(self.vectors.shape[1])

    def get(self, ids: jax.Array) -> jax.Array:
        return jnp.take(self.vectors, jnp.clip(ids, 0, self.vectors.shape[0] - 1), axis=0)

    def _get_inv_norms(self, ids: jax.Array) -> jax.Array:
        return jnp.take(self.inv_norms, jnp.clip(ids, 0, self.inv_norms.shape[0] - 1), axis=0)

    def prepare_queries(self, raw: jax.Array):
        raw = jnp.asarray(raw, jnp.float32)
        q = D.quantize_i8(raw)
        # unit is kept in f32: cached traversal casts it down to the row
        # dtype anyway, and the exact-rerank path (rerank_dists) needs the
        # full-precision query for its f32 final ordering
        return IntQueries(q, D.inv_norms_i8(q), unit=D.normalize(raw))

    def dist_ids_to_queries(self, ids: jax.Array, queries) -> jax.Array:
        qv, qn = queries
        return D.i8_dist_gathered(self.get(ids), self._get_inv_norms(ids), qv, qn)

    def pairwise_from_ids(self, ids: jax.Array) -> jax.Array:
        return D.i8_pairwise_gathered(self.get(ids), self._get_inv_norms(ids))

    def pairwise_from_vecs(self, vecs: jax.Array) -> jax.Array:
        """Pairwise distances for pre-gathered UNIT-NORM rows [B, C, d]
        (the cache-fed merge path — cache rows are bf16-normalized, see
        ``cache_rows``)."""
        return D.angular_pairwise_gathered(vecs)

    def queries_from_ids(self, ids: jax.Array):
        v = self.get(ids)
        inv = self._get_inv_norms(ids)
        # the "exact" query form available here is the row's own dequantized
        # unit vector; kept in f32 like prepare_queries' unit (scoring paths
        # downcast to the row dtype themselves)
        unit = v.astype(jnp.float32) * inv[..., None]
        return IntQueries(v, inv, unit=unit)

    # -- neighbor-vector cache hooks (ops.nbr_cache) ------------------------
    #
    # The cache stores bf16 NORMALIZED rows (int8 value x inv_norm): a unit
    # vector, so cached scoring is one dot + the query-side norm — the same
    # math shape as the f32/bf16 path.  int8 stays the storage/distribution
    # format (reference: src/elements/angular_int.rs:47-60); the cache is a
    # serving-time accelerator built from it, exactly as the f32 path's
    # cache is bf16-of-f32.

    def cache_rows(self, ids: jax.Array) -> jax.Array:
        v = self.get(ids).astype(jnp.float32)
        inv = self._get_inv_norms(ids)
        return (v * inv[..., None]).astype(jnp.bfloat16)

    def cache_rows_exact(self, ids: jax.Array) -> jax.Array:
        """f32 unit rows for a cache_dtype="f32" table: the EXACT dequantized
        int8 value — cached scoring then carries only the int8 quantization
        error (no bf16 cast), matching the rerank pass's precision with
        zero extra gathers."""
        v = self.get(ids).astype(jnp.float32)
        return v * self._get_inv_norms(ids)[..., None]

    def score_block(self, block: jax.Array, queries) -> jax.Array:
        """Distance for pre-gathered normalized rows: block [B, K, d] unit
        bf16 rows x queries -> f32[B, K].

        With an exact query (``queries.unit``) this is unit x unit: dist =
        max(0, 1 - dot) — no query-side quantization error (the rows keep
        int8 provenance; the storage format is unchanged).  Without it
        (legacy callers) the int8-quantized query is used and rescaled.
        """
        if queries.unit is not None:
            dots = jnp.einsum(
                "bkd,bd->bk",
                block,
                queries.unit.astype(block.dtype),
                preferred_element_type=jnp.float32,
            )
            return jnp.maximum(0.0, 1.0 - dots)
        qv, qn = queries
        dots = jnp.einsum(
            "bkd,bd->bk",
            block,
            qv.astype(block.dtype),
            preferred_element_type=jnp.float32,
        )
        cos = dots * qn[:, None]
        return jnp.maximum(0.0, 1.0 - cos)

    def query_lanes(self, queries) -> jax.Array:
        """Raw query lanes for the fused Pallas flat scorer: the exact unit
        query when present, else int8 values cast to bf16 (<= 127, exactly
        representable).  Must stay consistent with ``dist_from_dots_q``."""
        if queries.unit is not None:
            return queries.unit.astype(jnp.bfloat16)
        qv, _qn = queries
        return qv.astype(jnp.bfloat16)

    def dist_from_dots_q(self, dots: jax.Array, queries) -> jax.Array:
        """Distance from raw <normalized row, query lane> dots (see
        ``query_lanes``): unit x unit needs no rescale; the quantized-query
        form scales by the query-side reciprocal norm."""
        if queries.unit is not None:
            return jnp.maximum(0.0, 1.0 - dots.astype(jnp.float32))
        _qv, qn = queries
        return jnp.maximum(0.0, 1.0 - dots.astype(jnp.float32) * qn[:, None])

    def rerank_dists(self, ids: jax.Array, queries) -> jax.Array:
        """Exact f32 re-scoring of a final beam [B, K] for the rerank path
        (ops.frontier.search_layers(rerank=True)).

        Traversal scores are bf16 (cache rows) or int8-dot; near-tied
        distances misorder in the final top-10.  Re-scoring the ~ef beam
        entries once in f32 — dequantized int8 unit rows x the UNQUANTIZED
        f32 unit query — recovers that ordering for one extra [B, K] int8
        gather + a tiny contraction.  int8 stays the storage format
        (reference: angular_int.rs:47-60); measured at the bench config this
        lifts recall@10 by ~0.009 at fixed ef (examples/i8_gap.py).
        """
        v = self.get(ids).astype(jnp.float32)
        rows = v * self._get_inv_norms(ids)[..., None]  # [B, K, d] f32 unit
        u = getattr(queries, "unit", None)
        if u is not None:
            q = u.astype(jnp.float32)
        elif hasattr(queries, "ndim"):  # plain [B, d] unit queries: the
            # dequantized-serving path (``dequantized()``) traverses with
            # AngularVectors queries but reranks against the int8 storage
            q = queries.astype(jnp.float32)
        else:
            qv, qn = queries
            q = qv.astype(jnp.float32) * qn[:, None]
        dots = jnp.einsum("bkd,bd->bk", rows, q, preferred_element_type=jnp.float32)
        return jnp.maximum(0.0, 1.0 - dots)

    def self_dist(self, ids: jax.Array) -> jax.Array:
        # dist(x, x) = max(0, 1 - |x|^2/|x|^2) = 0 unless x == 0 -> 1.
        inv = self._get_inv_norms(ids)
        return jnp.where(inv > 0.0, 0.0, 1.0)

    def permute(self, order) -> "AngularIntVectors":
        order = jnp.asarray(order, jnp.int32)
        return dataclasses.replace(
            self,
            vectors=jnp.take(self.vectors, order, axis=0),
            inv_norms=jnp.take(self.inv_norms, order, axis=0),
        )

    def extend(self, raw) -> "AngularIntVectors":
        arr = jnp.asarray(np.asarray(raw, dtype=np.float32))
        q = D.quantize_i8(arr, rounding=self.rounding)
        return dataclasses.replace(
            self,
            vectors=jnp.concatenate([self.vectors, q], axis=0),
            inv_norms=jnp.concatenate([self.inv_norms, D.inv_norms_i8(q)], axis=0),
        )

    def dist(self, i: int, j: int) -> float:
        r = jnp.dot(
            self.vectors[i].astype(jnp.int32),
            self.vectors[j].astype(jnp.int32),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        cos = r * self.inv_norms[i] * self.inv_norms[j]
        return float(jnp.maximum(0.0, 1.0 - cos))
