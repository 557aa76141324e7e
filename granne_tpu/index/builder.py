"""Wave-parallel HNSW construction.

Reference parity: ``GranneBuilder`` at ``/root/reference/src/index/mod.rs``
(``build_partial`` :374-402, ``index_elements_in_last_layer`` :645-713,
``index_elements`` :716-802, ``index_element`` :804-846, ``connect_nodes``
:899-921, ``add_and_limit_neighbors`` :923-959).

TPU-native redesign
-------------------
The reference inserts elements one at a time under per-node RwLocks via
rayon.  Here insertion is *wave-parallel*: a wave of W elements

1. batch-searches the frozen graph-so-far (entry descent through previous
   layers + ``ef = max_search`` beam on the layer under construction),
2. runs the select-neighbors heuristic as one batched MXU+VPU kernel,
3. applies the reference's zero-element and duplicate-dead-node rules as
   per-wave masks (``mod.rs:812-814, 827-832``),
4. writes forward edges with a single conflict-free scatter (each wave
   element owns its row),
5. resolves reverse edges deterministically: edges are sorted by target,
   the nearest ``R`` incoming per target are combined with the target's
   existing row and re-pruned through the same heuristic — replacing the
   reference's lock-and-maybe-reprune ``connect_nodes`` with a
   sort/segment/scatter pipeline.

Semantics preserved from the reference (they affect recall parity):
geometric layer schedule, M/2 on upper layers (:665-668), reverse-order
reinsert pass at max_search/2 (:693-710, :776-778), the final
prune-everything pass (:789-796), and the zero/duplicate skip rules.
Intra-wave elements do not see each other (the graph is frozen per wave);
early waves grow geometrically so the first elements of a layer still form
good chains.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import frontier
from ..ops.nbr_cache import make_neighbor_cache, pack_rows, rows_to_vecs, supports_cache
from ..ops.topk import INF, UNUSED, sort_by_key
from . import schedule
from .graph import LayerStack, empty_layer, grow_layer, pad_rows
from .heuristic import EPS100, select_neighbors

_BIG = jnp.iinfo(jnp.int32).max

# Hard element-count limit: ids are int32 and _BIG is the scatter-drop
# sentinel (the reference's u32 analogue is 2^32 - 2, src/lib.rs:7,
# enforced at src/index/mod.rs:420,528).
MAX_ELEMENTS = 2**31 - 2


@dataclass(frozen=True)
class BuildConfig:
    """Build parameters (reference ``BuildConfig``, src/index/mod.rs:198-291).

    The first five fields mirror the reference defaults exactly; the rest are
    TPU-specific wave/batching knobs with no reference counterpart.
    """

    layer_multiplier: float = 15.0
    num_neighbors: int = 30
    max_search: int = 200
    reinsert_elements: bool = True
    expected_num_elements: Optional[int] = None
    show_progress: bool = False
    # TPU-specific:
    wave_size: int = 256  # elements inserted per frozen-graph wave
    expand: int = 4  # beam slots expanded per search iteration during build
    # nearest incoming reverse-edges considered per target per wave.  The
    # round-5 sweeps measured 8 recall-NEUTRAL on both the clustered
    # (0.9470 vs 0.9467) and pure-random hard-case (0.4249 vs 0.4233)
    # 1.2M configs while building 7-12% faster (SCALE_RUNS_r5
    # run=r5_reverse_cap{,_random}), so 8 is the default; raise it for
    # unusually duplicate-heavy data where >8 same-wave reverse edges per
    # target are plausible.
    reverse_cap: int = 8
    merge_chunk: int = 1024  # row chunk for the batched re-prune kernels
    # cap on beam iterations per build search (None = run to convergence,
    # ~2*ef/expand + 16).  A cap ~1.2*ef/expand trades a little candidate
    # quality for proportionally faster waves; recall must be re-verified.
    build_max_iters: int | None = None
    # maintain a neighbor-vector cache for the layer under construction
    # (ops.nbr_cache): one contiguous [M, d] bf16 gather per expanded beam
    # slot instead of M scattered vector rows -- measured 2.3x faster
    # candidate scoring.  Costs n*M*d*2 bytes HBM (4.8 GB at 1.2M x 20 x
    # 100); single-chip builds only; containers must provide cache_rows/
    # score_block (AngularVectors does).
    neighbor_cache: bool = False
    # cache row encoding: "flat" (XLA gather+einsum scoring) or "tiled"
    # (the Pallas fused-DMA scorer, ops/pallas/nbr_score -- measured
    # 1.2-1.26x the XLA path on v5e but rows pad to 8x128-lane tiles:
    # +50% cache HBM at M=20, d=100; requires d <= 128)
    neighbor_cache_layout: str = "flat"
    # per-iteration candidate vector-gather budget for the build beam
    # (see ops.frontier.beam_search gather_budget).  The build wave is
    # ~70% beam time and the beam is gather-issue-bound, so a budget of
    # ~0.5*expand*M speeds waves nearly proportionally; graph quality
    # must be re-verified per configuration.
    gather_budget: int | None = None


# ---------------------------------------------------------------------------
# Row merge: combine existing rows with incoming candidates and re-prune.
# Replaces connect_nodes / add_and_limit_neighbors (mod.rs:899-959).
# ---------------------------------------------------------------------------


def _merge_rows(elements, node_ids, exist, inc_ids, inc_d, node_valid, limit,
                exist_vecs=None, inc_vecs=None, return_vecs=False):
    """Merge incoming neighbor candidates into existing rows.

    node_ids: int32[N]; exist: int32[N, Ms]; inc_ids/inc_d: [N, R];
    node_valid: bool[N]; limit: static max row occupancy after merge.
    ``exist_vecs``/``inc_vecs`` ([N, Ms, d] / [N, R, d], both or neither)
    are pre-gathered candidate vectors (the neighbor-cache merge path):
    existing-row distances and the heuristic's pairwise matrix then come
    from these instead of ~N*(Ms+C) scattered element-row gathers.
    Returns int32[N, Ms] new rows (distance-sorted, -1 padded); with
    ``return_vecs`` also the kept rows' vectors [N, Ms, d] (pad-slot
    contents arbitrary — their ids are -1) so the caller can refresh the
    neighbor-vector cache without re-gathering a single element row.
    """
    Ms = exist.shape[1]
    tq = elements.queries_from_ids(node_ids)
    exist_valid = jnp.logical_and(exist >= 0, node_valid[:, None])
    if exist_vecs is not None:
        exist_d = elements.score_block(exist_vecs, tq)
    else:
        exist_d = elements.dist_ids_to_queries(exist, tq)
    exist_d = jnp.where(exist_valid, exist_d, INF)

    # drop incoming that duplicate an existing neighbor or the node itself
    dup = jnp.any(
        jnp.logical_and(inc_ids[:, :, None] == exist[:, None, :], exist_valid[:, None, :]),
        axis=2,
    )
    inc_valid = (inc_ids >= 0) & ~dup & node_valid[:, None] & (inc_ids != node_ids[:, None])
    inc_d = jnp.where(inc_valid, inc_d, INF)

    all_ids = jnp.concatenate([jnp.where(exist_valid, exist, UNUSED), jnp.where(inc_valid, inc_ids, UNUSED)], axis=1)
    all_d = jnp.concatenate([exist_d, inc_d], axis=1)
    sel_vecs = None
    if exist_vecs is not None:
        C = all_ids.shape[1]
        perm = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32), all_ids.shape)
        sd, sids, sperm = sort_by_key(all_d, all_ids, perm)
        all_vecs = jnp.concatenate([exist_vecs, inc_vecs], axis=1)
        svecs = jnp.take_along_axis(all_vecs, sperm[:, :, None], axis=1)
        valid = sids >= 0
        if return_vecs:
            sel_ids, _, sel_vecs = select_neighbors(
                elements, sids, sd, valid, limit, cand_vecs=svecs, return_vecs=True
            )
        else:
            sel_ids, _ = select_neighbors(elements, sids, sd, valid, limit, cand_vecs=svecs)
    else:
        assert not return_vecs, "return_vecs requires the cache-fed path"
        sd, sids = sort_by_key(all_d, all_ids)
        valid = sids >= 0
        sel_ids, _ = select_neighbors(elements, sids, sd, valid, limit)
    if limit < Ms:
        pad = jnp.full((sel_ids.shape[0], Ms - limit), UNUSED, jnp.int32)
        sel_ids = jnp.concatenate([sel_ids, pad], axis=1)
        if sel_vecs is not None:
            vpad = jnp.zeros(
                (sel_vecs.shape[0], Ms - limit, sel_vecs.shape[2]), sel_vecs.dtype
            )
            sel_vecs = jnp.concatenate([sel_vecs, vpad], axis=1)
    if return_vecs:
        return sel_ids, sel_vecs
    return sel_ids


def _merge_rows_chunked(elements, node_ids, exist, inc_ids, inc_d, node_valid, limit, chunk,
                        nbr_tab=None, inc_pos=None, wave_rows=None, return_vecs=False):
    """lax.map over row chunks to bound the pairwise-distance working set.

    ``nbr_tab`` (optional neighbor-vector cache) activates the cache-fed
    merge: in every caller ``exist == adj[node_ids]``, which is exactly
    what the cache row of ``node_ids`` stores, so existing-row vectors
    come from one fat gather per node.  Incoming vectors are gathered per
    chunk — or, when ``inc_pos``/``wave_rows`` are given (incoming ids are
    wave elements; ``inc_pos`` holds their wave positions), produced by a
    one-hot MXU matmul against the [W, d] wave block: a ~2.4x measured win
    over chunk*R scattered row gathers, which pay the ~30 ns/descriptor
    DMA floor each (examples/r3_micro.py).  All stay chunk-local (a
    whole-N gather would materialize GBs for the prune pass)."""
    N = node_ids.shape[0]
    chunk = min(chunk, N)
    n_pad = (-N) % chunk
    if n_pad:
        node_ids = jnp.concatenate([node_ids, jnp.full((n_pad,), 0, jnp.int32)])
        exist = jnp.concatenate([exist, jnp.full((n_pad, exist.shape[1]), UNUSED, jnp.int32)])
        inc_ids = jnp.concatenate([inc_ids, jnp.full((n_pad, inc_ids.shape[1]), UNUSED, jnp.int32)])
        inc_d = jnp.concatenate([inc_d, jnp.full((n_pad, inc_d.shape[1]), INF, jnp.float32)])
        node_valid = jnp.concatenate([node_valid, jnp.zeros((n_pad,), jnp.bool_)])
        if inc_pos is not None:
            inc_pos = jnp.concatenate([inc_pos, jnp.zeros((n_pad, inc_pos.shape[1]), jnp.int32)])
    nc = node_ids.shape[0] // chunk
    Ms = exist.shape[1]
    use_pos = nbr_tab is not None and inc_pos is not None

    def body(args):
        nid, ex, ii, idd, nv = args[:5]
        ev = iv = None
        if nbr_tab is not None:
            ev = rows_to_vecs(nbr_tab, nid, Ms, elements.dim)
            if use_pos:
                ip = args[5]
                oh = jax.nn.one_hot(ip, wave_rows.shape[0], dtype=wave_rows.dtype)
                iv = jnp.einsum(
                    "nrw,wd->nrd", oh, wave_rows, preferred_element_type=jnp.float32
                ).astype(wave_rows.dtype)
            else:
                iv = elements.cache_rows(ii)
        return _merge_rows(
            elements, nid, ex, ii, idd, nv, limit, ev, iv,
            return_vecs=return_vecs and nbr_tab is not None,
        )

    xs = (
        node_ids.reshape(nc, chunk),
        exist.reshape(nc, chunk, -1),
        inc_ids.reshape(nc, chunk, -1),
        inc_d.reshape(nc, chunk, -1),
        node_valid.reshape(nc, chunk),
    )
    if use_pos:
        xs = xs + (inc_pos.reshape(nc, chunk, -1),)
    out = jax.lax.map(body, xs)
    if return_vecs and nbr_tab is not None:
        rows, vecs = out
        return rows.reshape(nc * chunk, -1)[:N], vecs.reshape((nc * chunk,) + vecs.shape[2:])[:N]
    return out.reshape(nc * chunk, -1)[:N]


# ---------------------------------------------------------------------------
# Reverse-edge application
# ---------------------------------------------------------------------------


def _apply_reverse_edges(adj, elements, tgt, src, d, *, reverse_cap, merge_chunk,
                         nbr_tab=None, src_pos=None, wave_rows=None):
    """Deterministically apply reverse edges (src -> tgt becomes tgt's row).
    Returns ``(adj, nbr_tab)`` with the neighbor-vector cache (if any)
    refreshed for every row written — the merge already holds the kept
    rows' vectors, so the refresh costs zero extra gathers.

    tgt/src: int32[T]; d: f32[T]; invalid edges have tgt == -1.
    ``src_pos`` (int32[T], cache path) carries each edge's wave position so
    incoming vectors come from the [W, d] ``wave_rows`` block by one-hot
    matmul instead of scattered gathers.
    Per target the ``reverse_cap`` nearest incoming edges are merged with the
    existing row; overflow beyond the row width is re-pruned with the
    heuristic (the reference prunes at full row width in ``connect_nodes``,
    mod.rs:915-920; the final per-layer pass later re-limits to M_eff).
    """
    T = tgt.shape[0]
    Ms = adj.shape[1]
    R = reverse_cap
    cached = nbr_tab is not None

    key_t = jnp.where(tgt >= 0, tgt, _BIG)
    if cached and src_pos is not None:
        st, sd, ss, sp = jax.lax.sort(
            (key_t, d, src, src_pos), dimension=0, num_keys=2, is_stable=True
        )
    else:
        st, sd, ss = jax.lax.sort((key_t, d, src), dimension=0, num_keys=2, is_stable=True)
        sp = None
    valid = st != _BIG
    first = jnp.concatenate([valid[:1], jnp.logical_and(st[1:] != st[:-1], valid[1:])])
    uidx = jnp.cumsum(first.astype(jnp.int32)) - 1  # unique-target slot per edge
    pos = jnp.arange(T, dtype=jnp.int32)
    seg_start = jax.lax.cummax(jnp.where(first, pos, -1))
    rank = pos - seg_start
    edge_ok = valid & (rank < R)

    row_idx = jnp.where(edge_ok, uidx, T)
    col_idx = jnp.where(edge_ok, rank, 0)
    inc_ids = jnp.full((T, R), UNUSED, jnp.int32).at[row_idx, col_idx].set(ss, mode="drop")
    inc_d = jnp.full((T, R), INF, jnp.float32).at[row_idx, col_idx].set(sd, mode="drop")
    inc_pos = None
    if sp is not None:
        inc_pos = jnp.zeros((T, R), jnp.int32).at[row_idx, col_idx].set(sp, mode="drop")

    utgt = jnp.full((T,), UNUSED, jnp.int32).at[jnp.where(first, uidx, T)].set(st, mode="drop")
    node_valid = utgt >= 0

    exist = jnp.take(adj, jnp.clip(utgt, 0, adj.shape[0] - 1), axis=0)
    res = _merge_rows_chunked(
        elements, jnp.maximum(utgt, 0), exist, inc_ids, inc_d, node_valid, Ms, merge_chunk,
        nbr_tab=nbr_tab, inc_pos=inc_pos, wave_rows=wave_rows, return_vecs=cached,
    )
    rows_at = jnp.where(node_valid, utgt, _BIG)
    if cached:
        new_rows, new_vecs = res
        vals = pack_rows(
            new_vecs, "tiled" if nbr_tab.ndim == 3 else "flat", ids=new_rows
        )
        nbr_tab = nbr_tab.at[rows_at].set(vals, mode="drop")
    else:
        new_rows = res
    adj = adj.at[rows_at].set(new_rows, mode="drop")
    return adj, nbr_tab


# ---------------------------------------------------------------------------
# One wave of insertions, in two phases:
#   A. search_select_phase — per-element frozen-graph search + heuristic.
#      Embarrassingly parallel across the wave: this is the phase dp_build
#      shards over the device mesh (the rayon par_iter analogue,
#      mod.rs:756-782).
#   B. apply_wave_edges — the deterministic replicated graph mutation
#      (dead-node rule, forward scatter, reverse-edge merge).
# ---------------------------------------------------------------------------


def search_select_phase(
    prev_layers: tuple,
    adj: jax.Array,
    elements,
    wave_ids: jax.Array,
    wave_valid: jax.Array,
    *,
    m_eff: int,
    max_search: int,
    expand: int,
    max_iters: int | None = None,
    gather_budget: int | None = None,
    nbr_vecs: Optional[jax.Array] = None,
    pallas_flat: str | None = None,
):
    """Phase A of a wave (shardable). Mirrors the search/select half of
    ``index_element`` (mod.rs:804-832). Returns (sel_ids, sel_d, active,
    zero_sel) for the wave slice."""
    W = wave_ids.shape[0]
    q = elements.queries_from_ids(wave_ids)

    # entry point: greedy descent through all previously completed layers
    ep = jnp.zeros((W,), jnp.int32)
    ep = frontier.descend(prev_layers, elements, q, ep)

    # beam search on the layer under construction
    cand_ids, cand_d = frontier.beam_search(
        adj, elements, q, ep, ef=max_search, expand=expand, max_iters=max_iters,
        gather_budget=gather_budget, nbr_vecs=nbr_vecs, pallas_flat=pallas_flat,
    )

    # drop self hits (mod.rs:822)
    not_self = cand_ids != wave_ids[:, None]
    cvalid = jnp.logical_and(cand_ids >= 0, not_self)
    cand_d = jnp.where(cvalid, cand_d, INF)
    cand_ids = jnp.where(cvalid, cand_ids, UNUSED)

    # zero-element skip (mod.rs:812-814)
    active = jnp.logical_and(wave_valid, elements.self_dist(wave_ids) <= EPS100)

    # neighbor selection at the effective M (mod.rs:824)
    sel_ids, sel_d = select_neighbors(elements, cand_ids, cand_d, cvalid, m_eff)

    # count zero-distance duplicates among the raw candidates: identical to
    # counting selected zeros in exact arithmetic (the heuristic keeps ties),
    # but robust to f32 noise in the tie comparisons
    zero_sel = jnp.minimum(
        jnp.sum(jnp.logical_and(cand_ids >= 0, cand_d < EPS100), axis=1), m_eff
    )
    return sel_ids, sel_d, active, zero_sel


def apply_wave_edges(
    adj: jax.Array,
    elements,
    wave_ids: jax.Array,
    wave_valid: jax.Array,
    sel_ids: jax.Array,
    sel_d: jax.Array,
    active: jax.Array,
    zero_sel: jax.Array,
    *,
    m_eff: int,
    reinsert: bool,
    reverse_cap: int,
    merge_chunk: int,
    nbr_tab: Optional[jax.Array] = None,
):
    """Phase B of a wave: the deterministic graph mutation (replicated in the
    multi-chip path). Mirrors the linking half of ``index_element``
    (mod.rs:827-846).  Returns ``(adj, nbr_tab)``.

    The neighbor-vector cache (if given) is refreshed IN the merges: every
    row-rewriting merge already holds the kept rows' vectors, so forward
    and reverse cache rows are scattered from register data — the previous
    design's separate refresh re-gathered ~(W + W*m_eff)*Ms scattered
    element rows per wave (~13 ms at build shapes, examples/r3_micro.py).
    Because the forward scatter updates the cache BEFORE the reverse merge
    reads it, same-wave reverse targets see post-forward rows and the
    cache-fed reverse merge is coherent in reinsert mode too (the round-2
    staleness guard is gone)."""
    W = wave_ids.shape[0]
    Ms = adj.shape[1]
    cached = nbr_tab is not None
    layout = ("tiled" if nbr_tab.ndim == 3 else "flat") if cached else None
    wave_rows = elements.cache_rows(wave_ids) if cached else None  # [W, d]

    # duplicate dead-node rule (mod.rs:827-832): sequentially, a node whose
    # (M/2)-th selected neighbor is a ~zero-distance duplicate is left
    # unconnected.  Selected zero-distance neighbors count the duplicates
    # already in the graph; duplicates co-occurring in this wave are invisible
    # to the frozen-graph search, so they are counted directly from the
    # intra-wave pairwise distances (earlier wave positions only — matching
    # sequential insertion order).
    mid = m_eff // 2
    pair_w = elements.pairwise_from_ids(wave_ids[None, :])[0]  # [W, W]
    lower = jnp.tril(jnp.ones((W, W), jnp.bool_), k=-1)
    wave_dups_before = jnp.sum(
        jnp.logical_and(jnp.logical_and(pair_w < EPS100, lower), wave_valid[None, :]), axis=1
    )
    dead = (zero_sel + wave_dups_before) > mid
    active = jnp.logical_and(active, ~dead)

    sel_ids = jnp.where(active[:, None], sel_ids, UNUSED)
    sel_d = jnp.where(active[:, None], sel_d, INF)

    # forward edges
    rows_at = jnp.where(active, wave_ids, _BIG)
    if reinsert:
        # node already in graph: merge selected neighbors into its row
        exist = jnp.take(adj, jnp.clip(wave_ids, 0, adj.shape[0] - 1), axis=0)
        res = _merge_rows_chunked(
            elements,
            jnp.maximum(wave_ids, 0),
            exist,
            sel_ids,
            sel_d,
            active,
            Ms,
            merge_chunk,
            nbr_tab=nbr_tab,
            return_vecs=cached,
        )
        if cached:
            new_rows, new_vecs = res
            nbr_tab = nbr_tab.at[rows_at].set(
                pack_rows(new_vecs, layout, ids=new_rows), mode="drop"
            )
        else:
            new_rows = res
        adj = adj.at[rows_at].set(new_rows, mode="drop")
    else:
        fwd = jnp.concatenate(
            [sel_ids, jnp.full((W, Ms - m_eff), UNUSED, jnp.int32)], axis=1
        ) if Ms > m_eff else sel_ids
        adj = adj.at[rows_at].set(fwd, mode="drop")
        if cached:
            # fresh rows: the one remaining scattered cache gather, W*Ms
            # descriptors (~0.6 ms at build shapes)
            fvecs = elements.cache_rows(jnp.maximum(fwd, 0))
            nbr_tab = nbr_tab.at[rows_at].set(
                pack_rows(fvecs, layout, ids=fwd), mode="drop"
            )

    # reverse edges.  The forward scatter above already refreshed the cache,
    # so same-wave reverse targets read post-forward rows — the cache-fed
    # merge is coherent in BOTH modes (round 2's reinsert staleness guard
    # is obsolete).  Incoming (source) vectors come from the wave block via
    # src_pos, not from scattered element gathers.
    tgt = jnp.where(active[:, None], sel_ids, UNUSED).reshape(-1)
    src = jnp.broadcast_to(wave_ids[:, None], (W, m_eff)).reshape(-1)
    dd = sel_d.reshape(-1)
    src_pos = (
        jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[:, None], (W, m_eff)).reshape(-1)
        if cached
        else None
    )
    adj, nbr_tab = _apply_reverse_edges(
        adj, elements, tgt, src, dd, reverse_cap=reverse_cap, merge_chunk=merge_chunk,
        nbr_tab=nbr_tab, src_pos=src_pos, wave_rows=wave_rows,
    )
    return adj, nbr_tab


def _wave_step_core(
    prev_layers, adj, elements, wave_ids, wave_valid,
    *, m_eff, max_search, expand, reinsert, reverse_cap, merge_chunk,
    max_iters=None, gather_budget=None, nbr_tab=None, pallas_flat=None,
):
    sel_ids, sel_d, active, zero_sel = search_select_phase(
        prev_layers, adj, elements, wave_ids, wave_valid,
        m_eff=m_eff, max_search=max_search, expand=expand, max_iters=max_iters,
        gather_budget=gather_budget, nbr_vecs=nbr_tab, pallas_flat=pallas_flat,
    )
    return apply_wave_edges(
        adj, elements, wave_ids, wave_valid, sel_ids, sel_d, active, zero_sel,
        m_eff=m_eff, reinsert=reinsert, reverse_cap=reverse_cap, merge_chunk=merge_chunk,
        nbr_tab=nbr_tab,
    )


@partial(
    jax.jit,
    donate_argnames=("adj", "nbr_tab"),
    static_argnames=("m_eff", "max_search", "expand", "reinsert", "reverse_cap", "merge_chunk", "max_iters", "gather_budget", "pallas_flat"),
)
def wave_step(
    prev_layers: tuple,
    adj: jax.Array,
    elements,
    wave_ids: jax.Array,
    wave_valid: jax.Array,
    *,
    m_eff: int,
    max_search: int,
    expand: int,
    reinsert: bool,
    reverse_cap: int,
    merge_chunk: int,
    max_iters: int | None = None,
    gather_budget: int | None = None,
    nbr_tab: Optional[jax.Array] = None,
    pallas_flat: str | None = None,
):
    """Insert one wave of elements into ``adj`` (the layer under construction).

    Mirrors ``index_element`` (mod.rs:804-846) batched over the wave.
    ``nbr_tab`` (donated) is both read (scoring accelerator) and refreshed
    in place by the merges.  Returns ``(adj, nbr_tab)``.
    """
    return _wave_step_core(
        prev_layers, adj, elements, wave_ids, wave_valid,
        m_eff=m_eff, max_search=max_search, expand=expand,
        reinsert=reinsert, reverse_cap=reverse_cap, merge_chunk=merge_chunk,
        max_iters=max_iters, gather_budget=gather_budget, nbr_tab=nbr_tab,
        pallas_flat=pallas_flat,
    )


@partial(
    jax.jit,
    donate_argnames=("adj", "nbr_tab"),
    static_argnames=(
        "wave_size", "m_eff", "max_search", "expand", "reinsert",
        "reverse_cap", "merge_chunk", "reverse_order", "max_iters", "gather_budget",
        "pallas_flat",
    ),
)
def waves_while(
    prev_layers: tuple,
    adj: jax.Array,
    elements,
    start: jax.Array,
    end: jax.Array,
    *,
    wave_size: int,
    m_eff: int,
    max_search: int,
    expand: int,
    reinsert: bool,
    reverse_cap: int,
    merge_chunk: int,
    reverse_order: bool = False,
    max_iters: int | None = None,
    gather_budget: int | None = None,
    nbr_tab: Optional[jax.Array] = None,
    pallas_flat: str | None = None,
):
    """Run ALL waves covering [start, end) on device in one dispatch.

    A ``lax.while_loop`` with a *dynamic* trip count replaces the host wave
    loop: per-wave Python/dispatch/H2D overhead (the dominant build cost over
    a high-latency link) disappears, and one compiled program serves every
    segment length at a given layer shape.  ``reverse_order`` runs the waves
    back-to-front (the reference's reverse-order reinsert, mod.rs:776-778).
    """
    start = jnp.asarray(start, jnp.int32)
    end = jnp.asarray(end, jnp.int32)
    n_waves = jnp.maximum((end - start + wave_size - 1) // wave_size, 0)
    offs = jnp.arange(wave_size, dtype=jnp.int32)

    def cond(state):
        w = state[0]
        return w < n_waves

    def body(state):
        w, adj, nbr_tab = state
        if reverse_order:
            lo = end - (w + 1) * wave_size
        else:
            lo = start + w * wave_size
        ids = lo + offs
        valid = jnp.logical_and(ids >= start, ids < end)
        ids = jnp.clip(ids, 0, jnp.maximum(end - 1, 0))
        adj, nbr_tab = _wave_step_core(
            prev_layers, adj, elements, ids, valid,
            m_eff=m_eff, max_search=max_search, expand=expand,
            reinsert=reinsert, reverse_cap=reverse_cap, merge_chunk=merge_chunk,
            max_iters=max_iters, gather_budget=gather_budget, nbr_tab=nbr_tab,
            pallas_flat=pallas_flat,
        )
        return w + 1, adj, nbr_tab

    _, adj, nbr_tab = jax.lax.while_loop(cond, body, (jnp.int32(0), adj, nbr_tab))
    return adj, nbr_tab


# ---------------------------------------------------------------------------
# Final per-layer prune pass (mod.rs:789-796)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("m_eff", "merge_chunk", "rebuild_cache"), donate_argnames=("adj", "nbr_tab"))
def _prune_layer_full(
    adj: jax.Array, elements, *, m_eff: int, merge_chunk: int,
    nbr_tab: Optional[jax.Array] = None, rebuild_cache: bool = True,
):
    N = adj.shape[0]
    node_ids = jnp.arange(N, dtype=jnp.int32)
    empty_inc = jnp.full((N, 1), UNUSED, jnp.int32)
    empty_d = jnp.full((N, 1), INF, jnp.float32)
    node_valid = jnp.any(adj >= 0, axis=1)
    new_rows = _merge_rows_chunked(
        elements, node_ids, adj, empty_inc, empty_d, node_valid, m_eff, merge_chunk,
        nbr_tab=nbr_tab,
    )
    adj = jnp.where(node_valid[:, None], new_rows, adj)
    if nbr_tab is None or not rebuild_cache:
        return adj, None
    nbr_tab = make_neighbor_cache(
        adj, elements, rows=nbr_tab.shape[0],
        layout="tiled" if nbr_tab.ndim == 3 else "flat",
    )
    return adj, nbr_tab


@partial(jax.jit, static_argnames=("rows", "m_eff", "merge_chunk"), donate_argnames=("adj",))
def _prune_slice(adj, elements, lo, *, rows: int, m_eff: int, merge_chunk: int):
    """Prune rows [lo, lo+rows) in place (donated adj, traced lo)."""
    sl = jax.lax.dynamic_slice_in_dim(adj, lo, rows, 0)
    node_ids = lo + jnp.arange(rows, dtype=jnp.int32)
    empty_inc = jnp.full((rows, 1), UNUSED, jnp.int32)
    empty_d = jnp.full((rows, 1), INF, jnp.float32)
    node_valid = jnp.any(sl >= 0, axis=1)
    new_rows = _merge_rows_chunked(
        elements, node_ids, sl, empty_inc, empty_d, node_valid, m_eff, merge_chunk,
    )
    new_rows = jnp.where(node_valid[:, None], new_rows, sl)
    return jax.lax.dynamic_update_slice_in_dim(adj, new_rows, lo, 0)


# Per-dispatch row budget for the sliced prune.  XLA:TPU lays [n, M] int32
# out in (8, 128) tiles — M pads to 128 lanes — and the monolithic prune
# materializes a padded {1,0} relayout of the WHOLE adjacency (6 GB at a
# 12.6M-row bucket) beside the padded element-table copy: measured
# compile-time OOM at 10M elements.  Slicing the dispatch bounds the
# relayout temps to the slice; waves never hit this because they only
# dynamic-slice per wave.
_PRUNE_DISPATCH_ROWS = 1 << 21


def prune_layer(
    adj: jax.Array, elements, *, m_eff: int, merge_chunk: int,
    nbr_tab: Optional[jax.Array] = None, rebuild_cache: bool = True,
):
    """Re-limit every row to ``m_eff`` via the heuristic.

    ``adj`` is donated in every path: at 10M+ rows the lane-padded
    adjacency is multi-GB and holding input + output copies OOMs one
    chip; every caller rebinds ``adj`` to the result.

    Large uncached layers (> ``_PRUNE_DISPATCH_ROWS`` rows) prune in row
    slices — one compiled program, several dispatches — so the per-program
    relayout temps stay bounded (see ``_PRUNE_DISPATCH_ROWS``).  Pruning
    is idempotent per row and rows are independent, so slice order and
    the final overlapping slice are semantics-free.

    Every row can change, so the neighbor-vector cache (if any) is rebuilt
    wholesale afterwards (a merge-fed scatter would materialize a
    table-sized [N, Ms, d] vecs temp — measured 12 GB at 1.2M; the bulk
    rebuild stays chunk-bounded).  ``rebuild_cache=False`` skips the
    rebuild and returns ``nbr_tab=None`` — for the LAST prune of a layer,
    where the cache is still a valid (pre-prune-coherent) scoring
    accelerator for the merge but has no reader afterwards.
    Returns ``(adj, nbr_tab)``.
    """
    N = adj.shape[0]
    if nbr_tab is None and N > _PRUNE_DISPATCH_ROWS:
        rows = _PRUNE_DISPATCH_ROWS
        for lo in range(0, N, rows):
            adj = _prune_slice(
                adj, elements, jnp.int32(min(lo, N - rows)),
                rows=rows, m_eff=m_eff, merge_chunk=merge_chunk,
            )
        return adj, None
    return _prune_layer_full(
        adj, elements, m_eff=m_eff, merge_chunk=merge_chunk,
        nbr_tab=nbr_tab, rebuild_cache=rebuild_cache,
    )


# ---------------------------------------------------------------------------
# Build driver
# ---------------------------------------------------------------------------


_WARMUP_BUCKET = 32


def _wave_ranges(start: int, end: int, wave_size: int):
    """Geometric warm-up then fixed-size waves.

    Wave *sizes* grow geometrically (a wave never exceeds the number of
    elements already in the layer, so early elements form good chains), but
    every wave is padded to one of just TWO compile buckets
    ({32, wave_size}) so XLA compiles each wave kernel at most twice per
    layer shape.
    """
    cur = start
    while cur < end:
        size = max(8, min(wave_size, cur if cur > 0 else 8))
        size = min(size, end - cur)
        bucket = _WARMUP_BUCKET if size <= _WARMUP_BUCKET else wave_size
        yield cur, cur + size, bucket
        cur += size


_SEGMENT_WAVES = 128  # waves per on-device dispatch (progress + RPC-friendly)


def _run_waves(prev_layers, adj, elements, start, end, cfg: BuildConfig, m_eff, max_search, reinsert, mesh=None, nbr_tab=None):
    from ..utils import trace
    from ..utils.progress import ProgressBar

    if mesh is not None:
        # multi-chip: the same wave phases, sharded over the mesh
        # (parallel/dp_build), with full BuildConfig lever parity
        # (build_max_iters, gather_budget, neighbor cache).  Warm-up
        # inserts geometrically growing prefixes host-side so a fresh
        # layer's first elements form good chains; all remaining waves
        # run in on-device segment loops (dp_waves_while) — one dispatch
        # per segment, matching the single-chip waves_while structure.
        from ..parallel import dp_build

        S = mesh.devices.size
        W = max(S, (cfg.wave_size // S) * S)  # mesh-divisible wave size
        cur = start
        if not reinsert:
            while cur < min(end, W):
                size = max(S, min(W, cur if cur else S))
                size = min(size, end - cur)
                adj, nbr_tab = dp_build.dp_build_waves(
                    mesh, prev_layers, adj, elements,
                    np.arange(cur, cur + size, dtype=np.int32),
                    cfg, m_eff, max_search, nbr_tab=nbr_tab,
                )
                cur += size
        seg = W * _SEGMENT_WAVES
        kw = dict(
            wave_size=W, m_eff=m_eff, max_search=max_search,
            expand=cfg.expand, reinsert=reinsert, reverse_cap=cfg.reverse_cap,
            merge_chunk=cfg.merge_chunk, max_iters=cfg.build_max_iters,
            gather_budget=cfg.gather_budget,
        )
        if reinsert:
            hi = end
            while hi > cur:
                lo = max(cur, hi - seg)
                adj, nbr_tab = dp_build.dp_waves_while(
                    mesh, prev_layers, adj, elements, lo, hi,
                    reverse_order=True, nbr_tab=nbr_tab, **kw,
                )
                hi = lo
        else:
            while cur < end:
                hi = min(end, cur + seg)
                adj, nbr_tab = dp_build.dp_waves_while(
                    mesh, prev_layers, adj, elements, cur, hi,
                    reverse_order=False, nbr_tab=nbr_tab, **kw,
                )
                cur = hi
        return adj, nbr_tab

    bar = (
        ProgressBar(end - start, prefix="reinsert " if reinsert else "insert ")
        if cfg.show_progress
        else None
    )
    phase = "build/reinsert_wave" if reinsert else "build/insert_wave"
    kw = dict(
        m_eff=m_eff,
        max_search=max_search,
        expand=cfg.expand,
        reinsert=reinsert,
        reverse_cap=cfg.reverse_cap,
        merge_chunk=cfg.merge_chunk,
        max_iters=cfg.build_max_iters,
        gather_budget=cfg.gather_budget,
    )

    cur = start
    if not reinsert:
        # geometric warm-up: host-driven small waves while the layer is tiny
        # (a wave never exceeds the elements already present, so the first
        # elements form good chains) — bucketed to one compile shape.
        for lo, hi, bucket in _wave_ranges(start, end, cfg.wave_size):
            if hi - lo >= cfg.wave_size:
                break
            ids = np.full((bucket,), 0, np.int32)
            ids[: hi - lo] = np.arange(lo, hi, dtype=np.int32)
            valid = np.zeros((bucket,), bool)
            valid[: hi - lo] = True
            with trace.span(phase):
                adj, nbr_tab = wave_step(
                    prev_layers, adj, elements, jnp.asarray(ids), jnp.asarray(valid),
                    nbr_tab=nbr_tab, **kw
                )
            cur = hi
            if bar is not None:
                bar.add(hi - lo)

    # main: all remaining waves run ON DEVICE (lax.while_loop with dynamic
    # trip count — one dispatch per segment, no per-wave host overhead).
    seg = cfg.wave_size * _SEGMENT_WAVES
    if reinsert:
        hi = end
        while hi > cur:
            lo = max(cur, hi - seg)
            with trace.span(phase):
                adj, nbr_tab = waves_while(
                    prev_layers, adj, elements, lo, hi,
                    wave_size=cfg.wave_size, reverse_order=True, nbr_tab=nbr_tab, **kw,
                )
            if bar is not None:
                bar.add(hi - lo)
            hi = lo
    else:
        while cur < end:
            hi = min(end, cur + seg)
            with trace.span(phase):
                adj, nbr_tab = waves_while(
                    prev_layers, adj, elements, cur, hi,
                    wave_size=cfg.wave_size, reverse_order=False, nbr_tab=nbr_tab, **kw,
                )
            if bar is not None:
                bar.add(hi - cur)
            cur = hi
    if bar is not None:
        bar.finish()
    return adj, nbr_tab


def _index_layer(layers: list, counts: list, elements, cfg: BuildConfig, num_elements: int, mesh=None, consume: bool = False):
    """Build out the last layer (``index_elements_in_last_layer``, mod.rs:645-713)."""
    total = max(
        cfg.expected_num_elements if cfg.expected_num_elements else len(elements),
        len(elements),
    )
    layer_idx = len(layers) - 1
    ideal = schedule.num_elements_in_layer(total, cfg.layer_multiplier, layer_idx)
    if ideal <= counts[-1]:
        return
    target = min(num_elements, ideal)

    m_eff = cfg.num_neighbors if ideal >= total else max(1, cfg.num_neighbors // 2)

    adj = grow_layer(layers[-1], target)
    if adj is layers[-1] and not consume:
        # waves_while donates adj; never donate a buffer the caller may
        # still reference (e.g. a resumed LayerStack).  With ``consume``
        # the caller has relinquished the state (build_layers
        # consume_state=True) and the copy — which DOUBLES the multi-GB
        # bottom layer during a large append — is skipped.
        adj = jnp.copy(adj)
    if consume:
        layers[-1] = None  # drop the list's reference so nothing pins the
        # pre-grow buffer; rebound to the finished adj below
    prev = tuple(layers[:-1])

    if cfg.show_progress:
        print(f"[granne-tpu] building layer {layer_idx}: {counts[-1]} -> {target} (M_eff={m_eff})")

    # neighbor-vector cache for the layer under construction.  On a mesh
    # the cache is REPLICATED like the adjacency (each device reads its
    # copy in the sharded search; the replicated merge refreshes all
    # copies identically) — it costs the full cache HBM per device, the
    # same multiplication the replicated graph already pays.
    nbr_tab = None
    if cfg.neighbor_cache and supports_cache(elements):
        nbr_tab = make_neighbor_cache(
            adj, elements, rows=target, layout=cfg.neighbor_cache_layout
        )

    adj, nbr_tab = _run_waves(
        prev, adj, elements, counts[-1], target, cfg, m_eff, cfg.max_search, False,
        mesh=mesh, nbr_tab=nbr_tab,
    )
    adj, nbr_tab = prune_layer(
        adj, elements, m_eff=m_eff, merge_chunk=cfg.merge_chunk, nbr_tab=nbr_tab,
        rebuild_cache=cfg.reinsert_elements,
    )

    if cfg.reinsert_elements:
        half = max(1, cfg.max_search // 2)
        adj, nbr_tab = _run_waves(
            prev, adj, elements, 0, target, cfg, m_eff, half, True,
            mesh=mesh, nbr_tab=nbr_tab,
        )
        # final prune scores with FULL-PRECISION element vectors (nbr_tab
        # deliberately NOT fed): the cache's bf16 vectors measurably
        # degrade the last global re-limit (1.2M A/B: recall 0.483 vs
        # 0.495) and feeding it saves no time (155.1s vs 155.2s).
        adj, nbr_tab = prune_layer(
            adj, elements, m_eff=m_eff, merge_chunk=cfg.merge_chunk, nbr_tab=None
        )
    del nbr_tab  # build accelerator only; serving builds its own cache

    layers[-1] = adj
    counts[-1] = target


def build_layers(
    elements,
    cfg: BuildConfig,
    num_elements: Optional[int] = None,
    state: Optional[LayerStack] = None,
    mesh=None,
    consume_state: bool = False,
) -> LayerStack:
    """Build (or continue building) the layer stack.

    Mirrors ``build_partial`` (mod.rs:374-402): resumable and idempotent —
    already-indexed elements are not reindexed.

    ``consume_state=True`` relinquishes ``state``'s buffers to the build
    (the reference's ``&mut self`` semantics): the resumed bottom layer is
    donated into the wave loops instead of defensively copied — at 10M+
    elements that copy is multi-GB and OOMs an append on one chip.  The
    passed ``state`` must not be used afterwards.
    """
    if num_elements is None:
        num_elements = len(elements)
    if num_elements == 0:
        return state if state is not None else LayerStack(layers=(), counts=())
    if num_elements > MAX_ELEMENTS:
        raise ValueError(
            f"at most {MAX_ELEMENTS} elements can be indexed (int32 ids; "
            "reference limit: src/index/mod.rs:420)"
        )
    if num_elements > len(elements):
        raise ValueError("Cannot index more elements than exist.")
    if state is not None and state.counts and num_elements < state.counts[-1]:
        raise ValueError("Cannot index fewer elements than already in index.")

    layers = list(state.layers) if state is not None else []
    counts = list(state.counts) if state is not None else []

    # re-open with a different num_neighbors (reference: re-opening a built
    # index with a smaller M is supported, src/index/tests.rs:245-291).
    # Wider configs widen the rows with UNUSED padding; narrower configs
    # keep the loaded width as row capacity — new links honor the new M.
    if layers and layers[0].shape[1] < cfg.num_neighbors:
        width = cfg.num_neighbors
        layers = [
            jnp.concatenate(
                [a, jnp.full((a.shape[0], width - a.shape[1]), UNUSED, jnp.int32)], axis=1
            )
            for a in layers
        ]

    if layers:
        _index_layer(layers, counts, elements, cfg, num_elements, mesh=mesh,
                     consume=consume_state)

    while (counts[-1] if counts else 0) < num_elements:
        if layers:
            # clone the finished layer as the next layer (mod.rs:392-401);
            # an explicit copy so the two never share a donatable buffer
            grown = grow_layer(layers[-1], counts[-1])
            layers.append(jnp.copy(grown) if grown is layers[-1] else grown)
            counts.append(counts[-1])
        else:
            layers.append(empty_layer(8, cfg.num_neighbors))
            counts.append(0)
        _index_layer(layers, counts, elements, cfg, num_elements, mesh=mesh,
                     consume=consume_state)

    return LayerStack(layers=tuple(layers), counts=tuple(counts))
