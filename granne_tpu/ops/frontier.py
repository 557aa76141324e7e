"""Batched frontier (beam) search — the TPU reformulation of HNSW's hot loop.

Reference semantics being reproduced: ``search_for_neighbors`` at
``/root/reference/src/index/mod.rs:999-1037`` — a best-first search with a
candidate min-heap, a bounded max-heap of results (``max_search`` entries),
and a visited hash set; termination when the best open candidate is worse
than the worst result of a full result heap.

TPU-native redesign
-------------------
A batch of B queries advances in lockstep.  Per query the heap/hash-set trio
collapses into ONE fixed-capacity sorted beam of ``ef`` (id, dist, expanded)
entries:

* the best *unexpanded* beam entries are the candidate heap's top;
* expanding = gathering their adjacency rows, computing all neighbor
  distances as a dense batched contraction, and bitonic-merging the
  candidates back into the beam;
* termination = no unexpanded entry anywhere (HNSW's "best candidate worse
  than worst full result" rule: anything that survived the merge IS within
  the current top-ef).

No visited set is needed: the beam improves monotonically, so an entry
evicted from the beam can never re-qualify, and duplicates are suppressed by
(a) an intra-round candidate dedupe and (b) a candidate-vs-beam dedupe.
Re-computing a distance for an already-seen-but-rejected id is allowed (it
only costs bandwidth the dense gather already paid for).

The same kernel with ``ef=1`` *is* the greedy upper-layer descent
(``find_entrypoint``, ``src/index/mod.rs:984-997``).

All shapes are static; the outer loop is a ``lax.while_loop`` whose state is
the beam, so a converged batch exits early.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from .nbr_cache import score_cached as _score_cached
from .nbr_cache import row_vecs as _row_vecs
from .nbr_cache import table_kind as _table_kind
from .nbr_cache import unpack_ids as _unpack_ids
from .topk import INF, UNUSED, merge_sorted_topk, sort_by_key


def _flat_pallas_mode(elements, nbr_vecs, M: int, d: int, override=None):
    """Pick the fused Pallas path for flat cache rows.

    Returns None (XLA path), "tpu" (compiled kernel) or "interpret"
    (interpreter — CPU parity tests).  ``override`` (the ``pallas_flat``
    argument threaded from the search entry points; part of the jit cache
    key) wins over the GT_PALLAS_FLAT env var ("0" disables,
    "interpret" forces the interpreted kernel off-TPU).
    """
    from .pallas.nbr_score import flat_ok

    mode = override if override is not None else os.environ.get("GT_PALLAS_FLAT", "0")
    if mode == "0" or nbr_vecs is None:
        return None
    if _table_kind(nbr_vecs) != "flat-bf16":
        return None  # fused kernel reads bf16-in-int16 rows; f32/tiled use other paths
    if not flat_ok(nbr_vecs.shape[1], M, d):
        return None
    if not (hasattr(elements, "dist_from_dots") or hasattr(elements, "dist_from_dots_q")):
        return None
    if mode == "interpret":
        return "interpret"
    return "tpu" if jax.default_backend() == "tpu" else None


def _query_lanes(elements, queries):
    """bf16 [B, d] lanes to tile into the fused scorer's query pattern."""
    f = getattr(elements, "query_lanes", None)
    if f is not None:
        return f(queries)
    return queries.astype(jnp.bfloat16)


def _dist_from_dots(elements, dots, queries):
    f = getattr(elements, "dist_from_dots_q", None)
    if f is not None:
        return f(dots, queries)
    return elements.dist_from_dots(dots)


def default_max_iters(ef: int, expand: int) -> int:
    """Iteration cap: ~2 expansions per beam slot plus slack."""
    return (2 * ef) // max(1, expand) + 16


# Row-count bound for the packed-id merge (id*2+flag must fit int32).
# Above this the beam falls back to a full lax.sort over [B, ef+G].
# Module-level (not inlined) so tests can exercise the fallback branch on
# small graphs (tests/test_frontier.py::test_packed_merge_fallback_parity).
PACKED_MERGE_MAX_ROWS = 2**30


def beam_search(
    adj: jax.Array,
    elements,
    queries,
    entry_ids: jax.Array,
    *,
    ef: int,
    expand: int = 1,
    max_iters: int | None = None,
    gather_budget: int | None = None,
    nbr_vecs: jax.Array | None = None,
    pallas_flat: str | None = None,
):
    """Run batched beam search over one graph layer.

    Args:
      adj: int32[n_rows, M] adjacency with UNUSED=-1 padding.
      elements: an ElementContainer.
      queries: prepared query batch (see ``ElementContainer.prepare_queries``).
      entry_ids: int32[B] entry point per query.
      ef: beam width (reference ``max_search``).
      expand: number of beam slots expanded per iteration (E>1 trades a few
        extra distance computes for fewer, fatter iterations — better
        VPU/MXU utilization).
      max_iters: static iteration cap.
      gather_budget: if set (< expand*M), the per-iteration candidate list is
        left-compacted after id-dedupe and only the first ``gather_budget``
        vector rows are gathered and scored.  The beam is random-row-gather
        ISSUE-bound on TPU (bf16 elements measure the same as f32 — see
        BASELINE.md), and typically well under half the expand*M candidate
        slots survive dedupe, so a budget cuts the dominant cost nearly
        proportionally.  Valid candidates beyond the budget are dropped
        (closest-parent-first order is kept); recall must be re-verified
        per configuration.
      nbr_vecs: optional neighbor-vector cache for THIS layer
        ([n_rows, M, d], see ops.nbr_cache).  Candidate scoring then reads
        one contiguous [M, d] row per expanded node instead of M scattered
        vector rows — measured 2.3x faster at build shapes.  Requires
        ``elements.score_block``; overrides ``gather_budget``.

    Returns:
      (ids, dists): int32[B, ef] / f32[B, ef], ascending by distance,
      padded with (-1, +inf).
    """
    if max_iters is None:
        max_iters = default_max_iters(ef, expand)
    B = entry_ids.shape[0]
    M = adj.shape[1]
    E = expand
    EM = E * M
    if nbr_vecs is not None:
        gather_budget = None  # cache rows are keyed by expanded node, not candidate
    G = EM if gather_budget is None else max(1, min(gather_budget, EM))

    # fused Pallas path for flat cache rows: gather + score + id unpack in
    # one kernel (ops/pallas/nbr_score.gather_score_flat) — the XLA
    # equivalent pays an extra HBM round trip for the gathered block plus
    # relayout copies for the non-lane-aligned [.., M*d] vector view
    # (307us vs ~150us per iteration at build shapes, examples/r3_micro.py)
    d_q = queries.shape[-1]
    flat_mode = _flat_pallas_mode(elements, nbr_vecs, M, d_q, override=pallas_flat)
    qtile = None
    if flat_mode is not None:
        from .pallas.nbr_score import make_qtile

        qtile = make_qtile(_query_lanes(elements, queries), M, nbr_vecs.shape[1])

    # seed the beam with one entry per query ([B]) or K entries ([B, K]) —
    # multi-entry seeding raises recall at fixed ef on clustered data by
    # starting the bottom beam from several upper-layer candidates.
    if entry_ids.ndim == 1:
        entry_ids = entry_ids[:, None]
    K = min(entry_ids.shape[1], ef)
    entry_ids = entry_ids[:, :K]
    if (
        nbr_vecs is not None
        and _table_kind(nbr_vecs) == "flat-f32"
        and hasattr(elements, "cache_rows_exact")
    ):
        # f32 cache: its product guarantee is ONE exact metric for every
        # beam entry, so seeds must be scored with the same exact scorer
        # the cached candidates use (dist_ids_to_queries would mix e.g.
        # int8-quantized-query dots into the same sorted beam)
        seed_rows = elements.cache_rows_exact(jnp.maximum(entry_ids, 0))
        e_d = elements.score_block(seed_rows, queries)  # [B, K]
    else:
        e_d = elements.dist_ids_to_queries(entry_ids, queries)  # [B, K]
    e_valid = entry_ids >= 0
    if K > 1:  # drop duplicate seeds (first occurrence wins)
        eq_s = entry_ids[:, :, None] == entry_ids[:, None, :]
        earlier_s = jnp.tril(jnp.ones((K, K), jnp.bool_), k=-1)
        e_valid &= ~jnp.any(eq_s & earlier_s[None] & e_valid[:, None, :], axis=2)
    e_d = jnp.where(e_valid, e_d, INF)
    e_ids = jnp.where(e_valid, entry_ids, UNUSED)
    if K > 1:
        e_d, e_ids = sort_by_key(e_d, e_ids)  # beam invariant: sorted ascending
    beam_ids = jnp.full((B, ef), UNUSED, jnp.int32).at[:, :K].set(e_ids)
    beam_d = jnp.full((B, ef), INF, jnp.float32).at[:, :K].set(e_d)
    expanded = jnp.zeros((B, ef), jnp.bool_)

    # dedupe-within-round mask: candidate j is a dup if an earlier candidate
    # equals it; static lower-triangular "earlier" matrix.
    earlier = jnp.tril(jnp.ones((EM, EM), jnp.bool_), k=-1)

    def open_mask(ids, exp):
        return jnp.logical_and(~exp, ids >= 0)

    def cond(state):
        it, bids, bd, bexp = state
        return jnp.logical_and(it < max_iters, jnp.any(open_mask(bids, bexp)))

    # The beam is kept SORTED ascending by distance as a loop invariant
    # (the merge sort re-establishes it), so "best E unexpanded" is just
    # the first E open slots — one cumsum + small one-hot gather instead
    # of a top_k.
    def body(state):
        it, bids, bd, bexp = state

        # 1. select the first E open slots (beam sorted => these are best)
        open_ = open_mask(bids, bexp)
        open_rank = jnp.cumsum(open_.astype(jnp.int32), axis=1) - 1
        sel = open_ & (open_rank < E)
        # inverse map: slots[b, e] = beam slot holding the e-th open entry
        hit = jnp.logical_and(
            sel[:, :, None], open_rank[:, :, None] == jnp.arange(E, dtype=jnp.int32)[None, None, :]
        )  # [B, ef, E]
        slots = jnp.sum(hit * jnp.arange(ef, dtype=jnp.int32)[None, :, None], axis=1)
        sel_valid = jnp.any(hit, axis=1)  # [B, E]
        sel_ids = jnp.take_along_axis(bids, slots, axis=1)
        sel_ids = jnp.where(sel_valid, sel_ids, UNUSED)
        bexp = jnp.logical_or(bexp, sel)

        # 2. gather adjacency rows of the selected nodes.  A flat neighbor
        # cache embeds the ids alongside the vectors (ops.nbr_cache
        # pack_rows), so ONE row gather yields both — no separate
        # adjacency gather (saves B*E DMA descriptors per iteration).
        crows = None
        flat_dots = None
        if flat_mode is not None:
            from .pallas.nbr_score import gather_score_flat

            flat_dots, nbrs = gather_score_flat(
                nbr_vecs, sel_ids, qtile, M=M, d=d_q,
                interpret=flat_mode == "interpret",
            )
        elif nbr_vecs is not None and _table_kind(nbr_vecs) != "tiled":
            d_el = queries.shape[-1]
            crows = jnp.take(
                nbr_vecs, jnp.clip(sel_ids, 0, nbr_vecs.shape[0] - 1), axis=0
            )  # [B, E, row_width]
            nbrs = _unpack_ids(crows, M, d_el).reshape(B, EM)
        else:
            nbrs = jnp.take(adj, jnp.clip(sel_ids, 0, adj.shape[0] - 1), axis=0)
            nbrs = nbrs.reshape(B, EM)
        cand_valid = jnp.logical_and(nbrs >= 0, jnp.repeat(sel_valid, M, axis=1))

        # 3. dedupe: within round (first occurrence wins) and vs beam
        eq = nbrs[:, :, None] == nbrs[:, None, :]
        dup = jnp.any(eq & earlier[None] & cand_valid[:, None, :], axis=2)
        cand_valid &= ~dup
        in_beam = jnp.any(nbrs[:, :, None] == bids[:, None, :], axis=2)
        cand_valid &= ~in_beam

        if G < EM:
            # left-compact surviving ids; gather/score only the first G
            crank = jnp.cumsum(cand_valid.astype(jnp.int32), axis=1) - 1
            safe = jnp.where(cand_valid, crank, G)  # G is out of bounds
            rows = jnp.arange(B, dtype=jnp.int32)[:, None]
            nbrs = (
                jnp.full((B, G), UNUSED, jnp.int32)
                .at[rows, safe]
                .set(nbrs, mode="drop")
            )
            cand_valid = nbrs >= 0

        # 4. dense distance computation for the whole candidate block.
        # With a neighbor cache: one contiguous row per EXPANDED node
        # (E fat gathers/query) instead of EM scattered vector rows.  The
        # flat layout reuses the step-2 row gather; the tiled layout goes
        # through the Pallas fused-DMA scorer (ops.nbr_cache.score_cached).
        if flat_dots is not None:
            cand_d = _dist_from_dots(elements, flat_dots, queries)
        elif crows is not None:
            block = _row_vecs(crows, M, d_el).reshape(B, EM, d_el)
            cand_d = elements.score_block(block, queries)
        elif nbr_vecs is not None:
            cand_d = _score_cached(nbr_vecs, sel_ids, queries, elements, M)
        else:
            cand_d = elements.dist_ids_to_queries(nbrs, queries)
        cand_d = jnp.where(cand_valid, cand_d, INF)
        cand_ids = jnp.where(cand_valid, nbrs, UNUSED)

        # 5. merge candidates into the sorted beam, keep top-ef.  The beam
        # is sorted by invariant, so only the candidate block needs a sort
        # (G keys, ~half the concat width) and the combine is a bitonic
        # MERGE network with a halving drop phase (ops.topk
        # merge_sorted_topk) — measured 2.6x faster than the previous full
        # lax.sort over [B, ef+G] at build shapes (examples/merge_micro.py;
        # counting-rank merges via scatter or one-hot gather were measured
        # slower still).  The expanded flag rides the id's low bit so the
        # network carries 2 operands instead of 3 (id*2+exp; UNUSED
        # -1 -> -2; arithmetic shift restores -1).  Needs id*2+1 to fit
        # int32 — guaranteed by the 2^30 row guard below.
        if adj.shape[0] < PACKED_MERGE_MAX_ROWS:
            cand_p = cand_ids * 2
            cd, cp = sort_by_key(cand_d, cand_p)
            beam_p = bids * 2 + bexp.astype(jnp.int32)
            sd, (sp,) = merge_sorted_topk(bd, (beam_p,), cd, (cp,), ef)
            return it + 1, sp >> 1, sd, (sp & 1).astype(jnp.bool_)
        all_d = jnp.concatenate([bd, cand_d], axis=1)
        all_ids = jnp.concatenate([bids, cand_ids], axis=1)
        all_exp = jnp.concatenate([bexp, jnp.zeros((B, G), jnp.bool_)], axis=1)
        sd, sids, sexp = sort_by_key(all_d, all_ids, all_exp)
        return it + 1, sids[:, :ef], sd[:, :ef], sexp[:, :ef]

    _, bids, bd, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), beam_ids, beam_d, expanded))
    return bids, bd


def descend(
    layers: tuple,
    elements,
    queries,
    entry_ids: jax.Array,
    *,
    max_iters: int = 48,
):
    """Greedy entry-point descent through upper layers (ef=1 beam per layer).

    Mirrors ``find_entrypoint`` (``src/index/mod.rs:984-997``): start at node
    0, per layer run an ef=1 search seeded at the previous layer's result.
    """
    ep = entry_ids
    for adj in layers:
        ids, _ = beam_search(adj, elements, queries, ep, ef=1, expand=1, max_iters=max_iters)
        ep = jnp.where(ids[:, 0] >= 0, ids[:, 0], ep)
    return ep


@partial(jax.jit, static_argnames=("ef", "num_neighbors", "expand", "max_iters", "descent_iters", "descent_ef", "gather_budget", "pallas_flat", "rerank"))
def search_layers(
    layers: tuple,
    elements,
    queries,
    *,
    ef: int,
    num_neighbors: int,
    expand: int = 1,
    max_iters: int | None = None,
    descent_iters: int = 48,
    descent_ef: int = 1,
    gather_budget: int | None = None,
    nbr_vecs: jax.Array | None = None,
    pallas_flat: str | None = None,
    rerank: bool = False,
    rerank_with=None,
    rerank_queries=None,
):
    """Full multi-layer search (``search_internal``, src/index/mod.rs:963-982).

    ``layers`` is a tuple of adjacency arrays, top (smallest) first, bottom
    last.  ``descent_ef > 1`` widens the LAST upper-layer descent to that
    beam width and seeds the bottom beam with its top entries (multi-entry
    seeding; the reference descends at ef=1, mod.rs:984-997).

    ``rerank=True`` re-scores the FULL final beam (all ``ef`` entries) with
    ``elements.rerank_dists`` — an exact f32 pass over the stored rows and
    the unquantized query — and sorts by those distances before truncating
    to ``num_neighbors``.  The traversal's bf16/int8 scores misorder
    near-tied candidates in the final top-k; one extra [B, ef] gather +
    tiny contraction recovers ~0.009 recall@10 at fixed ef at the bench
    config (examples/i8_gap.py), i.e. the ef needed for a recall bar drops
    sharply.  ``rerank_with`` substitutes a different container for the
    re-scoring pass (e.g. serve bf16, rerank against the f32 originals);
    ``rerank_queries`` substitutes the query batch for that pass — pass the
    UNROUNDED f32 unit queries so the rerank carries no query-side
    serving-dtype error (``prepare_queries`` downcasts to the traversal
    dtype; without this the "exact" rerank keeps the query's bf16
    rounding).

    Returns (ids int32[B, num_neighbors], dists f32[B, num_neighbors]).
    """
    B = jax.tree_util.tree_leaves(queries)[0].shape[0]
    ep = jnp.zeros((B,), jnp.int32)
    if len(layers) == 0:
        return (
            jnp.full((B, num_neighbors), UNUSED, jnp.int32),
            jnp.full((B, num_neighbors), INF, jnp.float32),
        )
    upper = layers[:-1]
    if descent_ef > 1 and len(upper) > 0:
        ep = descend(upper[:-1], elements, queries, ep, max_iters=descent_iters)
        seeds, _ = beam_search(
            upper[-1], elements, queries, ep, ef=descent_ef, expand=1,
            max_iters=descent_iters,
        )
        ep = jnp.where(seeds >= 0, seeds, ep[:, None])  # [B, descent_ef]
    else:
        ep = descend(upper, elements, queries, ep, max_iters=descent_iters)
    ids, d = beam_search(
        layers[-1], elements, queries, ep, ef=ef, expand=expand, max_iters=max_iters,
        gather_budget=gather_budget, nbr_vecs=nbr_vecs, pallas_flat=pallas_flat,
    )
    if rerank:
        scorer = elements if rerank_with is None else rerank_with
        rd = scorer.rerank_dists(ids, queries if rerank_queries is None else rerank_queries)
        rd = jnp.where(ids >= 0, rd, INF)
        d, ids = sort_by_key(rd, ids)
    return ids[:, :num_neighbors], d[:, :num_neighbors]
