"""Data-parallel wave insertion over a device mesh.

The build-time counterpart of sharded serving (SURVEY §5.8): the expensive
parts of a wave — entry descent, ``ef``-beam search over the frozen graph
and the select-neighbors heuristic — are embarrassingly parallel across the
wave's elements, so the wave is SHARDED across devices (data parallelism
over insertions, replacing the reference's rayon ``par_iter``,
src/index/mod.rs:756-782).  The graph mutation must be identical
everywhere, so each device ``all_gather``s every shard's selected edges
over ICI and applies the same deterministic forward-scatter + reverse-edge
merge to its replica of the adjacency.

There is ONE wave implementation: ``builder.search_select_phase`` (the
sharded half) and ``builder.apply_wave_edges`` (the replicated half) are
the same functions the single-chip ``wave_step`` composes, so multi-chip
builds inherit every builder rule (intra-wave duplicate dead-node rule,
reinsert merge path, reverse-edge heuristic) and any builder fix lands in
both paths.  ``build_layers(..., mesh=...)`` drives the full multi-layer
schedule through this step.

Every ``BuildConfig`` performance lever the single-chip build depends on is
threaded through (round-5 parity work):

* ``build_max_iters`` / ``gather_budget`` — per-device beam knobs, passed
  straight into the sharded ``search_select_phase``;
* the neighbor-vector cache — REPLICATED like the adjacency (each device
  reads its own copy during search and refreshes it in the replicated
  merge).  Cost: the full cache HBM on every device (n*M*d*2 bytes), the
  same multiplication the replicated graph already pays; the elements are
  what get sharded at capacity scale (sharded_granne), not the graph;
* the on-device segment loop — ``dp_waves_while`` runs ALL waves of a
  segment inside one ``lax.while_loop`` under ``shard_map`` (one dispatch
  per segment), replacing the round-1 host loop that paid a dispatch +
  H2D per wave.  Each device derives its wave slice from
  ``lax.axis_index`` — no per-wave sharded inputs at all.

This keeps the graph replicated (it is small next to the elements) while
the search/heuristic FLOPs scale with device count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..index import builder as B
from .mesh import SHARD_AXIS

_CACHE: dict = {}


def _gather_wave(wave_ids, wave_valid, sel_ids, sel_d, active, zero_sel, m_eff):
    """Replicate the sharded phase-A results: all_gather over ICI."""
    g_ids = jax.lax.all_gather(wave_ids, SHARD_AXIS).reshape(-1)
    g_valid = jax.lax.all_gather(wave_valid, SHARD_AXIS).reshape(-1)
    g_active = jax.lax.all_gather(active, SHARD_AXIS).reshape(-1)
    g_zero = jax.lax.all_gather(zero_sel, SHARD_AXIS).reshape(-1)
    g_sel = jax.lax.all_gather(sel_ids, SHARD_AXIS).reshape(-1, m_eff)
    g_d = jax.lax.all_gather(sel_d, SHARD_AXIS).reshape(-1, m_eff)
    return g_ids, g_valid, g_sel, g_d, g_active, g_zero


def dp_wave_step(
    mesh,
    prev_layers: tuple,
    adj: jax.Array,
    elements,
    wave_ids: jax.Array,
    wave_valid: jax.Array,
    *,
    m_eff: int,
    max_search: int,
    expand: int = 4,
    reinsert: bool = False,
    reverse_cap: int = 16,
    merge_chunk: int = 1024,
    max_iters: int | None = None,
    gather_budget: int | None = None,
    nbr_tab: jax.Array | None = None,
):
    """One wave, sharded over the mesh. wave size must divide the mesh size.

    Returns the updated (replicated) ``(adj, nbr_tab)``.
    """
    key = (
        "step", id(mesh), len(prev_layers), adj.shape, wave_ids.shape[0],
        m_eff, max_search, expand, reinsert, max_iters, gather_budget,
        nbr_tab is not None,
    )
    fn = _CACHE.get(key)
    if fn is None:
        fn = _make_step(
            mesh, m_eff, max_search, expand, reinsert, reverse_cap, merge_chunk,
            max_iters, gather_budget,
        )
        _CACHE[key] = fn
    return fn(prev_layers, adj, elements, wave_ids, wave_valid, nbr_tab)


def _make_step(mesh, m_eff, max_search, expand, reinsert, reverse_cap, merge_chunk,
               max_iters, gather_budget):
    def body(prev_layers, adj, elements, wave_ids, wave_valid, nbr_tab):
        # --- sharded phase: search + select for the local wave slice -------
        sel_ids, sel_d, active, zero_sel = B.search_select_phase(
            prev_layers, adj, elements, wave_ids, wave_valid,
            m_eff=m_eff, max_search=max_search, expand=expand,
            max_iters=max_iters, gather_budget=gather_budget, nbr_vecs=nbr_tab,
        )

        # --- replicate the edge set over ICI, then the identical update ----
        gathered = _gather_wave(
            wave_ids, wave_valid, sel_ids, sel_d, active, zero_sel, m_eff
        )
        adj, nbr_tab = B.apply_wave_edges(
            adj, elements, *gathered,
            m_eff=m_eff, reinsert=reinsert,
            reverse_cap=reverse_cap, merge_chunk=merge_chunk, nbr_tab=nbr_tab,
        )
        return adj, nbr_tab

    return jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(
                P(),  # prev layers (replicated); pytree prefix
                P(),  # adjacency replicated
                P(),  # elements replicated
                P(SHARD_AXIS),  # wave ids sharded
                P(SHARD_AXIS),  # wave valid sharded
                P(),  # neighbor cache replicated (None when uncached)
            ),
            out_specs=P(),
            check_vma=False,
        ),
        donate_argnums=(1, 5),
    )


def dp_waves_while(
    mesh,
    prev_layers: tuple,
    adj: jax.Array,
    elements,
    start,
    end,
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
    nbr_tab: jax.Array | None = None,
):
    """Run ALL waves covering [start, end) on the mesh in ONE dispatch.

    The multi-chip analogue of ``builder.waves_while``: a ``lax.while_loop``
    with a dynamic trip count lives INSIDE ``shard_map``, so a whole
    segment of waves costs one launch instead of one per wave (the
    per-wave host round trip dominated the round-1 dp path).  Each device
    computes its wave slice from ``lax.axis_index`` — wave ids never
    materialize on the host.  ``wave_size`` must be a multiple of the mesh
    size.  Returns the replicated ``(adj, nbr_tab)``.
    """
    S = mesh.devices.size
    if wave_size % S:
        raise ValueError(f"wave_size {wave_size} must be a multiple of mesh size {S}")
    key = (
        "while", id(mesh), len(prev_layers), adj.shape, wave_size,
        m_eff, max_search, expand, reinsert, reverse_order, max_iters,
        gather_budget, nbr_tab is not None,
    )
    fn = _CACHE.get(key)
    if fn is None:
        fn = _make_waves_while(
            mesh, wave_size, m_eff, max_search, expand, reinsert,
            reverse_cap, merge_chunk, reverse_order, max_iters, gather_budget,
        )
        _CACHE[key] = fn
    return fn(
        prev_layers, adj, elements,
        jnp.asarray(start, jnp.int32), jnp.asarray(end, jnp.int32), nbr_tab,
    )


def _make_waves_while(mesh, wave_size, m_eff, max_search, expand, reinsert,
                      reverse_cap, merge_chunk, reverse_order, max_iters,
                      gather_budget):
    S = mesh.devices.size
    W_local = wave_size // S

    def body_fn(prev_layers, adj, elements, start, end, nbr_tab):
        dev = jax.lax.axis_index(SHARD_AXIS)
        n_waves = jnp.maximum((end - start + wave_size - 1) // wave_size, 0)
        offs = jnp.arange(W_local, dtype=jnp.int32)

        def cond(state):
            return state[0] < n_waves

        def body(state):
            w, adj, nbr_tab = state
            if reverse_order:
                lo = end - (w + 1) * wave_size
            else:
                lo = start + w * wave_size
            ids = lo + dev * W_local + offs
            valid = jnp.logical_and(ids >= start, ids < end)
            ids = jnp.clip(ids, 0, jnp.maximum(end - 1, 0))
            sel_ids, sel_d, active, zero_sel = B.search_select_phase(
                prev_layers, adj, elements, ids, valid,
                m_eff=m_eff, max_search=max_search, expand=expand,
                max_iters=max_iters, gather_budget=gather_budget, nbr_vecs=nbr_tab,
            )
            gathered = _gather_wave(ids, valid, sel_ids, sel_d, active, zero_sel, m_eff)
            adj, nbr_tab = B.apply_wave_edges(
                adj, elements, *gathered,
                m_eff=m_eff, reinsert=reinsert,
                reverse_cap=reverse_cap, merge_chunk=merge_chunk, nbr_tab=nbr_tab,
            )
            return w + 1, adj, nbr_tab

        _, adj, nbr_tab = jax.lax.while_loop(cond, body, (jnp.int32(0), adj, nbr_tab))
        return adj, nbr_tab

    return jax.jit(
        jax.shard_map(
            body_fn,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        ),
        donate_argnums=(1, 5),
    )


def dp_build_waves(
    mesh, prev_layers, adj, elements, ids, cfg, m_eff, max_search,
    *, reinsert: bool = False, nbr_tab=None,
):
    """Insert ``ids`` in mesh-sharded waves (host driver loop).

    With ``reinsert=True`` the waves run back-to-front at the caller's
    ``max_search`` (the reference's reverse-order reinsert, mod.rs:776-778).
    Honors every BuildConfig lever (build_max_iters, gather_budget, cache).
    Returns ``(adj, nbr_tab)``.
    """
    S = mesh.devices.size
    W = max(S, (cfg.wave_size // S) * S)
    ranges = list(range(0, len(ids), W))
    if reinsert:
        ranges = list(reversed(ranges))
    for lo in ranges:
        chunk = ids[lo : lo + W]
        pad = W - len(chunk)
        wave = np.concatenate([chunk, np.zeros(pad, np.int32)]).astype(np.int32)
        valid = np.concatenate([np.ones(len(chunk), bool), np.zeros(pad, bool)])
        adj, nbr_tab = dp_wave_step(
            mesh,
            prev_layers,
            adj,
            elements,
            jnp.asarray(wave),
            jnp.asarray(valid),
            m_eff=m_eff,
            max_search=max_search,
            expand=cfg.expand,
            reinsert=reinsert,
            reverse_cap=cfg.reverse_cap,
            merge_chunk=cfg.merge_chunk,
            max_iters=cfg.build_max_iters,
            gather_budget=cfg.gather_budget,
            nbr_tab=nbr_tab,
        )
    return adj, nbr_tab
