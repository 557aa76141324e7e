"""Batched HNSW neighbor-selection heuristic.

Reference parity: ``GranneBuilder::select_neighbors`` at
``/root/reference/src/index/mod.rs:848-883`` — given distance-sorted
candidates, keep candidate ``j`` iff ``d(query, j) <= d(k, j)`` for every
already-kept ``k``, stopping at ``max_neighbors``; if there are at most
``max_neighbors`` candidates the heuristic is bypassed entirely
(``:854-856``).

TPU redesign: the pairwise candidate-distance matrix is ONE batched MXU
contraction ([B, C, d] x [B, C, d] -> [B, C, C]); the sequential keep rule is
then a C-step ``fori_loop`` of pure boolean VPU ops over that matrix — no
per-pair distance calls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.topk import compact_by_mask

EPS100 = 100.0 * jnp.finfo(jnp.float32).eps  # reference zero/dup threshold

# Tie tolerance for the keep rule: the reference compares distances computed
# by one scalar code path, where exact duplicates tie exactly.  Here the
# query->candidate and candidate->candidate distances come from different
# contractions, so equal distances can differ by float noise; without slack,
# zero-distance duplicates get dropped nondeterministically.
TIE_EPS = 1e-6


def select_neighbors(
    elements,
    cand_ids: jax.Array,
    cand_d: jax.Array,
    valid: jax.Array,
    max_neighbors: int,
    cand_vecs: jax.Array | None = None,
    return_vecs: bool = False,
):
    """Batched select_neighbors.

    Args:
      cand_ids: int32[B, C] candidate ids, ascending by distance, -1 invalid.
      cand_d: f32[B, C] distances to the (implicit) query.
      valid: bool[B, C].
      max_neighbors: M.
      cand_vecs: optional pre-gathered candidate vectors [B, C, d] (the
        cache-fed merge path) — skips the C scattered row gathers per node.
      return_vecs: with ``cand_vecs``, also return the KEPT vectors
        [B, M, d] (pad slots hold arbitrary data; their ids are -1) — the
        caller can then refresh a neighbor-vector cache row without
        re-gathering anything.

    Returns:
      (ids int32[B, M], dists f32[B, M]) — kept neighbors, distance order,
      padded with (-1, inf); plus vecs [B, M, d] if ``return_vecs``.
    """
    B, C = cand_ids.shape
    M = max_neighbors

    if cand_vecs is not None:
        pair = elements.pairwise_from_vecs(cand_vecs)  # [B, C, C]
    else:
        pair = elements.pairwise_from_ids(cand_ids)  # [B, C, C]
    n_valid = jnp.sum(valid.astype(jnp.int32), axis=1)
    bypass = n_valid <= M  # reference early-return, mod.rs:854-856

    # The reference stops keeping once max_neighbors are kept (:868-871).
    # That cap is applied POST-HOC here: a candidate kept beyond the M-th
    # keep can only block candidates that are themselves beyond the M-th
    # keep (keep decisions never look forward), so the first M kept under
    # the uncapped rule are exactly the capped kept set — and
    # ``compact_by_mask(k=M)`` takes the first M.  Dropping the kept-count
    # from the loop removes a loop-carried scalar and shrinks the body to
    # pure masks.
    def body(j, keep):
        dj = cand_d[:, j]
        # violated if any kept k is strictly closer to j than the query is
        viol = jnp.any(jnp.logical_and(keep, pair[:, j, :] < dj[:, None] - TIE_EPS), axis=1)
        return keep.at[:, j].set(valid[:, j] & ~viol)

    keep0 = jnp.zeros((B, C), jnp.bool_)
    # Unrolling amortizes TPU loop-step overhead across the (cheap, boolean)
    # bodies; the keep rule itself stays sequential in j.
    keep = jax.lax.fori_loop(0, C, body, keep0, unroll=min(C, 8))
    keep = jnp.where(bypass[:, None], valid, keep)
    if not return_vecs:
        return compact_by_mask(cand_ids, cand_d, keep, M)
    assert cand_vecs is not None, "return_vecs requires cand_vecs"
    ids, ds, pos = compact_by_mask(cand_ids, cand_d, keep, M, with_pos=True)
    vecs = jnp.take_along_axis(cand_vecs, pos[:, :, None], axis=1)
    return ids, ds, vecs
