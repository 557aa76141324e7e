"""f32 cosine ("angular") element container.

Reference parity: ``/root/reference/src/elements/angular.rs`` — vectors are
L2-normalized on ingest (``angular.rs:55-61``) so the distance is
``max(0, 1 - dot)`` (``angular.rs:63-74``).  Storage is a dense
``float32[n, d]`` HBM tensor (the TPU-native replacement for
``FixedWidthSliceVector<f32>``, ``src/slice_vector/mod.rs:42-45``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import distance as D


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AngularVectors:
    """Dense unit-norm f32 vectors with batched cosine distance."""

    vectors: jax.Array  # float32[n, d], rows unit-norm (or zero)

    # -- construction ------------------------------------------------------

    @classmethod
    def from_raw(cls, raw) -> "AngularVectors":
        """Build from unnormalized f32 data [n, d]; normalizes each row."""
        arr = jnp.asarray(np.asarray(raw, dtype=np.float32))
        if arr.ndim != 2:
            raise ValueError(f"expected [n, d] array, got shape {arr.shape}")
        return cls(vectors=D.normalize(arr))

    @classmethod
    def from_normalized(cls, vectors) -> "AngularVectors":
        return cls(vectors=jnp.asarray(vectors, jnp.float32))

    def as_bf16(self) -> "AngularVectors":
        """A bfloat16 serving copy: HNSW search is random-row-gather bound
        on TPU, so halving the element bytes ~doubles search throughput at
        a small recall cost (dots still accumulate in f32).  Build with the
        f32 container; serve with this one."""
        return dataclasses.replace(self, vectors=self.vectors.astype(jnp.bfloat16))

    # -- container protocol ------------------------------------------------

    def __len__(self) -> int:
        return int(self.vectors.shape[0])

    @property
    def dim(self) -> int:
        return int(self.vectors.shape[1])

    def get(self, ids: jax.Array) -> jax.Array:
        return jnp.take(self.vectors, jnp.clip(ids, 0, self.vectors.shape[0] - 1), axis=0)

    def prepare_queries(self, raw: jax.Array) -> jax.Array:
        # normalize in f32, then match the element dtype (bf16 serving copy)
        return D.normalize(jnp.asarray(raw, jnp.float32)).astype(self.vectors.dtype)

    def dist_ids_to_queries(self, ids: jax.Array, queries: jax.Array) -> jax.Array:
        return D.angular_dist_gathered(self.get(ids), queries)

    def pairwise_from_ids(self, ids: jax.Array) -> jax.Array:
        return D.angular_pairwise_gathered(self.get(ids))

    def pairwise_from_vecs(self, vecs: jax.Array) -> jax.Array:
        """Pairwise distances for pre-gathered rows [B, C, d] (the
        cache-fed merge path, ops.nbr_cache.rows_to_vecs)."""
        return D.angular_pairwise_gathered(vecs)

    def queries_from_ids(self, ids: jax.Array) -> jax.Array:
        return self.get(ids)

    # -- neighbor-vector cache hooks (ops.nbr_cache) ------------------------

    def cache_rows(self, ids: jax.Array) -> jax.Array:
        """bf16 vector rows for the neighbor cache (halves cache bytes; the
        random gathers the cache accelerates are issue-bound, and bf16
        serving measures equal-or-better recall at 1M scale, BASELINE.md)."""
        return self.get(ids).astype(jnp.bfloat16)

    def cache_rows_exact(self, ids: jax.Array) -> jax.Array:
        """f32 rows for a cache_dtype="f32" table (exact cached scoring;
        build the table from the f32 container, serve with any copy)."""
        return self.get(ids).astype(jnp.float32)

    def score_block(self, block: jax.Array, queries: jax.Array) -> jax.Array:
        """Distance for pre-gathered raw rows: block [B, K, d] x [B, d]."""
        return D.angular_dist_gathered(block, queries.astype(block.dtype))

    def dist_from_dots(self, dots: jax.Array) -> jax.Array:
        """Distance from raw dot products (unit-norm rows): max(0, 1-dot).
        Used by the Pallas tiled-cache scorer (ops/pallas/nbr_score)."""
        return jnp.maximum(0.0, 1.0 - dots.astype(jnp.float32))

    def rerank_dists(self, ids: jax.Array, queries: jax.Array) -> jax.Array:
        """f32 re-scoring of a final beam [B, K] for
        ``ops.frontier.search_layers(rerank=True)``.  On the f32 container
        this is exact; on the bf16 serving copy it re-runs the same bf16
        rows with f32 accumulation (rerank against the f32 container via
        ``rerank_with`` for a precision gain)."""
        rows = self.get(ids).astype(jnp.float32)
        q = queries.astype(jnp.float32)
        dots = jnp.einsum("bkd,bd->bk", rows, q, preferred_element_type=jnp.float32)
        return jnp.maximum(0.0, 1.0 - dots)

    def self_dist(self, ids: jax.Array) -> jax.Array:
        v = self.get(ids)
        dots = jnp.sum(v * v, axis=-1)
        return jnp.maximum(0.0, 1.0 - dots)

    def permute(self, order) -> "AngularVectors":
        order = jnp.asarray(order, jnp.int32)
        return dataclasses.replace(self, vectors=jnp.take(self.vectors, order, axis=0))

    def extend(self, raw) -> "AngularVectors":
        """Functional append (``ExtendableElementContainer``, mod.rs:48-55)."""
        new = D.normalize(jnp.asarray(np.asarray(raw, dtype=np.float32)))
        return dataclasses.replace(self, vectors=jnp.concatenate([self.vectors, new], axis=0))

    # -- convenience -------------------------------------------------------

    def dist(self, i: int, j: int) -> float:
        """Scalar distance between stored elements (API parity helper)."""
        vi = self.vectors[i]
        vj = self.vectors[j]
        return float(jnp.maximum(0.0, 1.0 - jnp.dot(vi, vj)))
