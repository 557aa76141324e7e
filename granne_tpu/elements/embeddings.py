"""SumEmbeddings element type: bag-of-embeddings vectors.

Reference parity: ``/root/reference/src/elements/embeddings/mod.rs`` — an
element is a list of term ids; its vector is the sum of the corresponding
embedding rows, computed on the fly and normalized (``:124-143, 161-175``).
The reference packs term lists as 3-byte ints in a CSR slice vector to save
RAM (``:18-23``); the TPU-native layout is a dense padded int32 term tensor
[n, T] (-1 padding) so the element vector materializes as
gather -> masked sum -> normalize, all fused by XLA.

Also here: the locality reorder keys (``embeddings/reorder.rs:32-56``) and
the offline parsing ETL (``embeddings/parsing.rs``) lives in
``granne_tpu.elements.embeddings_etl``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import distance as D


def pad_term_lists(term_lists, width: int | None = None) -> np.ndarray:
    """Ragged python lists -> dense int32 [n, T] with -1 padding."""
    if width is None:
        width = max((len(t) for t in term_lists), default=1)
        width = max(width, 1)
    out = np.full((len(term_lists), width), -1, np.int32)
    for i, terms in enumerate(term_lists):
        t = list(terms)[:width]
        out[i, : len(t)] = t
    return out


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SumEmbeddings:
    """

    embeddings: f32[V, d] term embedding table (not normalized).
    terms: int32[n, T] per-element term ids, -1 padding.
    """

    embeddings: jax.Array
    terms: jax.Array

    @classmethod
    def from_parts(cls, embeddings, term_lists) -> "SumEmbeddings":
        emb = jnp.asarray(np.asarray(embeddings, np.float32))
        if isinstance(term_lists, np.ndarray) and term_lists.ndim == 2:
            terms = jnp.asarray(term_lists.astype(np.int32))
        else:
            terms = jnp.asarray(pad_term_lists(term_lists))
        return cls(embeddings=emb, terms=terms)

    # -- vector materialization (mod.rs:124-143) ---------------------------

    def _sum_vectors(self, term_rows: jax.Array) -> jax.Array:
        """int32[..., T] term ids -> f32[..., d] normalized summed vectors."""
        mask = term_rows >= 0
        safe = jnp.clip(term_rows, 0, self.embeddings.shape[0] - 1)
        vecs = jnp.take(self.embeddings, safe, axis=0)
        summed = jnp.sum(jnp.where(mask[..., None], vecs, 0.0), axis=-2)
        return D.normalize(summed)

    def create_embedding(self, term_ids) -> np.ndarray:
        """Vector for an ad-hoc term list (``create_embedding``, mod.rs:97-120)."""
        row = jnp.asarray(pad_term_lists([list(term_ids)], self.terms.shape[1]))
        return np.asarray(self._sum_vectors(row)[0])

    def get_terms(self, idx: int) -> list[int]:
        row = np.asarray(self.terms[idx])
        return [int(t) for t in row if t >= 0]

    # -- container protocol ------------------------------------------------

    def __len__(self) -> int:
        return int(self.terms.shape[0])

    @property
    def dim(self) -> int:
        return int(self.embeddings.shape[1])

    def get(self, ids: jax.Array) -> jax.Array:
        safe = jnp.clip(ids, 0, self.terms.shape[0] - 1)
        return self._sum_vectors(jnp.take(self.terms, safe, axis=0))

    def prepare_queries(self, raw: jax.Array) -> jax.Array:
        return D.normalize(jnp.asarray(raw, jnp.float32))

    def dist_ids_to_queries(self, ids: jax.Array, queries: jax.Array) -> jax.Array:
        return D.angular_dist_gathered(self.get(ids), queries)

    def pairwise_from_ids(self, ids: jax.Array) -> jax.Array:
        return D.angular_pairwise_gathered(self.get(ids))

    def queries_from_ids(self, ids: jax.Array) -> jax.Array:
        return self.get(ids)

    def self_dist(self, ids: jax.Array) -> jax.Array:
        v = self.get(ids)
        return jnp.maximum(0.0, 1.0 - jnp.sum(v * v, axis=-1))

    # -- neighbor-vector cache hooks (ops.nbr_cache) ------------------------
    # For SumEmbeddings the cache is a double win: besides collapsing the
    # beam's 1+M scattered gathers into one row read, it *materializes* the
    # on-the-fly gather+sum+normalize that every distance otherwise pays.

    def cache_rows(self, ids: jax.Array) -> jax.Array:
        return self.get(ids).astype(jnp.bfloat16)

    def score_block(self, block: jax.Array, queries: jax.Array) -> jax.Array:
        return D.angular_dist_gathered(block, queries.astype(block.dtype))

    def pairwise_from_vecs(self, vecs: jax.Array) -> jax.Array:
        return D.angular_pairwise_gathered(vecs)

    def dist_from_dots(self, dots: jax.Array) -> jax.Array:
        return jnp.maximum(0.0, 1.0 - dots.astype(jnp.float32))

    def permute(self, order) -> "SumEmbeddings":
        order = jnp.asarray(order, jnp.int32)
        return dataclasses.replace(self, terms=jnp.take(self.terms, order, axis=0))

    def extend(self, term_lists) -> "SumEmbeddings":
        rows = jnp.asarray(pad_term_lists(term_lists, int(self.terms.shape[1])))
        return dataclasses.replace(self, terms=jnp.concatenate([self.terms, rows], axis=0))

    def dist(self, i: int, j: int) -> float:
        v = self.get(jnp.asarray([i, j], jnp.int32))
        return float(jnp.maximum(0.0, 1.0 - jnp.dot(v[0], v[1])))


def reorder_keys(container: SumEmbeddings, max_terms: int = 8) -> np.ndarray:
    """Locality sort keys: per element, its term ids ordered by descending
    embedding norm, truncated to ``max_terms`` (embeddings/reorder.rs:32-56).
    Returns int64[n, max_terms] (padded with V, which sorts last).
    """
    norms = np.asarray(jnp.linalg.norm(container.embeddings, axis=1))
    terms = np.asarray(container.terms)
    V = container.embeddings.shape[0]
    n, T = terms.shape
    keys = np.full((n, max_terms), V, np.int64)
    for i in range(n):
        ts = terms[i][terms[i] >= 0]
        if len(ts):
            order = np.argsort(-norms[ts], kind="stable")
            sel = ts[order][:max_terms]
            keys[i, : len(sel)] = sel
    return keys
