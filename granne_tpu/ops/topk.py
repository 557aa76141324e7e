"""Sorted top-k / masked sort helpers.

These replace the reference's scalar priority queues: ``MaxSizeHeap``
(``/root/reference/src/max_size_heap.rs``) and the candidate
``BinaryHeap`` in ``search_for_neighbors`` (``src/index/mod.rs:999-1037``)
become fixed-capacity sorted buffers maintained with batched bitonic sorts
(``jax.lax.sort``), which XLA lowers efficiently on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF = jnp.inf
UNUSED = -1  # adjacency padding sentinel (reference: UNUSED = u32::MAX, src/index/mod.rs:27-28)


def sort_by_key(key: jax.Array, *values: jax.Array):
    """Sort ``key`` ascending along the last axis, carrying ``values`` along.

    Boolean values are carried as int32 and returned as bool.
    """
    ops = [key]
    bool_idx = []
    for i, v in enumerate(values):
        if v.dtype == jnp.bool_:
            bool_idx.append(i + 1)
            ops.append(v.astype(jnp.int32))
        else:
            ops.append(v)
    out = jax.lax.sort(tuple(ops), dimension=-1, num_keys=1, is_stable=True)
    out = list(out)
    for i in bool_idx:
        out[i] = out[i].astype(jnp.bool_)
    return tuple(out)


def merge_topk(
    a_key: jax.Array,
    b_key: jax.Array,
    a_vals: tuple,
    b_vals: tuple,
    k: int,
):
    """Merge two sorted-or-unsorted keyed sets along the last axis, keep best k.

    Returns (key[..., k], vals[..., k] tuple).
    """
    key = jnp.concatenate([a_key, b_key], axis=-1)
    vals = tuple(jnp.concatenate([a, b], axis=-1) for a, b in zip(a_vals, b_vals))
    out = sort_by_key(key, *vals)
    return out[0][..., :k], tuple(v[..., :k] for v in out[1:])


def compact_by_mask(ids: jax.Array, dists: jax.Array, keep: jax.Array, k: int,
                    with_pos: bool = False):
    """Left-compact kept entries into fixed-width [B, k] buffers.

    ``ids``/``dists``/``keep`` are [B, C]; entries with ``keep`` are moved to
    the front preserving order; the rest is padded with (-1, +inf).
    With ``with_pos`` also returns int32[B, k] source positions (the column
    in the input each kept entry came from; 0 for pad slots) — callers use
    it to carry side arrays (e.g. pre-gathered vectors) through the
    compaction without re-gathering.
    """
    B, C = ids.shape
    rank = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    safe_rank = jnp.where(keep, rank, k)  # k is out of bounds -> dropped
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    out_ids = jnp.full((B, k), UNUSED, dtype=ids.dtype)
    out_d = jnp.full((B, k), INF, dtype=dists.dtype)
    out_ids = out_ids.at[rows, safe_rank].set(ids, mode="drop")
    out_d = out_d.at[rows, safe_rank].set(dists, mode="drop")
    if not with_pos:
        return out_ids, out_d
    src = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32), (B, C))
    out_pos = jnp.zeros((B, k), jnp.int32).at[rows, safe_rank].set(src, mode="drop")
    return out_ids, out_d, out_pos
