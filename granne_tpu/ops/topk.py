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


def merge_sorted_topk(a_d, a_vals, b_d, b_vals, k: int):
    """Merge two sorted-ascending keyed sets along the last axis, keep the
    smallest ``k`` entries, sorted.

    Replaces a full ``lax.sort`` over the concatenation when BOTH inputs are
    already sorted (the beam-search merge: the beam is sorted by invariant,
    the candidate block costs one small sort): a bitonic *merge* network —
    ascending ``a`` + INF plateau + descending ``b`` is bitonic, so
    ``log2(L)`` compare-exchange stages finish the job, and because each
    stage's lower half holds the L/2 smallest of a bitonic block, the
    working set HALVES per stage while ``k`` still fits in it.  Measured
    ~2.6x faster than the equivalent ``lax.sort`` at beam shapes on v5e
    (examples/merge_micro.py).

    ``a_vals``/``b_vals`` are tuples of same-shaped value arrays carried
    through the exchanges.  Ties keep the ``a`` side.  Keys must not be NaN
    (use +inf padding).
    """
    B = a_d.shape[:-1]
    A, C = a_d.shape[-1], b_d.shape[-1]
    L = 1 << (A + C - 1).bit_length()
    pad = L - A - C
    parts_d = [a_d]
    parts_v = [list(a_vals)]
    if pad:
        parts_d.append(jnp.full(B + (pad,), INF, a_d.dtype))
        parts_v.append([jnp.full(B + (pad,), UNUSED, v.dtype) for v in a_vals])
    parts_d.append(b_d[..., ::-1])
    parts_v.append([v[..., ::-1] for v in b_vals])
    d = jnp.concatenate(parts_d, axis=-1)
    vals = [jnp.concatenate(vs, axis=-1) for vs in zip(*parts_v)]

    # drop phase: one bitonic block; the lower half of each compare-exchange
    # holds the L/2 smallest and is itself bitonic, so while k fits we keep
    # only it.
    while L // 2 >= k and L > 1:
        s = L // 2
        lo_d, hi_d = d[..., :s], d[..., s:]
        take_lo = lo_d <= hi_d
        d = jnp.where(take_lo, lo_d, hi_d)
        vals = [
            jnp.where(take_lo, v[..., :s], v[..., s:]) for v in vals
        ]
        L = s
    # block phase: finish sorting the remaining single bitonic block with
    # stride-halving compare-exchanges (reshape puts pair (i, i+s) on the
    # penultimate axis).
    s = L // 2
    while s >= 1:
        dr = d.reshape(B + (L // (2 * s), 2, s))
        lo_d, hi_d = dr[..., 0, :], dr[..., 1, :]
        take_lo = lo_d <= hi_d
        d = jnp.stack(
            [jnp.where(take_lo, lo_d, hi_d), jnp.where(take_lo, hi_d, lo_d)],
            axis=-2,
        ).reshape(B + (L,))
        new_vals = []
        for v in vals:
            vr = v.reshape(B + (L // (2 * s), 2, s))
            lo_v, hi_v = vr[..., 0, :], vr[..., 1, :]
            new_vals.append(
                jnp.stack(
                    [jnp.where(take_lo, lo_v, hi_v), jnp.where(take_lo, hi_v, lo_v)],
                    axis=-2,
                ).reshape(B + (L,))
            )
        vals = new_vals
        s //= 2
    return d[..., :k], tuple(v[..., :k] for v in vals)


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
