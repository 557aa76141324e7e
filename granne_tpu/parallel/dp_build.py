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

This keeps the graph replicated (it is small next to the elements) while
the search/heuristic FLOPs scale with device count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..index import builder as B
from .mesh import SHARD_AXIS

_CACHE: dict = {}


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
):
    """One wave, sharded over the mesh. wave size must divide the mesh size.

    Returns the updated (replicated) adjacency.
    """
    key = (
        id(mesh), len(prev_layers), adj.shape, wave_ids.shape[0],
        m_eff, max_search, expand, reinsert,
    )
    fn = _CACHE.get(key)
    if fn is None:
        fn = _make_step(mesh, m_eff, max_search, expand, reinsert, reverse_cap, merge_chunk)
        _CACHE[key] = fn
    return fn(prev_layers, adj, elements, wave_ids, wave_valid)


def _make_step(mesh, m_eff, max_search, expand, reinsert, reverse_cap, merge_chunk):
    def body(prev_layers, adj, elements, wave_ids, wave_valid):
        # --- sharded phase: search + select for the local wave slice -------
        sel_ids, sel_d, active, zero_sel = B.search_select_phase(
            prev_layers, adj, elements, wave_ids, wave_valid,
            m_eff=m_eff, max_search=max_search, expand=expand,
        )

        # --- replicate the edge set: all_gather over ICI -------------------
        g_ids = jax.lax.all_gather(wave_ids, SHARD_AXIS).reshape(-1)
        g_valid = jax.lax.all_gather(wave_valid, SHARD_AXIS).reshape(-1)
        g_active = jax.lax.all_gather(active, SHARD_AXIS).reshape(-1)
        g_zero = jax.lax.all_gather(zero_sel, SHARD_AXIS).reshape(-1)
        g_sel = jax.lax.all_gather(sel_ids, SHARD_AXIS).reshape(-1, m_eff)
        g_d = jax.lax.all_gather(sel_d, SHARD_AXIS).reshape(-1, m_eff)

        # --- replicated phase: identical deterministic graph update --------
        adj, _ = B.apply_wave_edges(
            adj, elements, g_ids, g_valid, g_sel, g_d, g_active, g_zero,
            m_eff=m_eff, reinsert=reinsert,
            reverse_cap=reverse_cap, merge_chunk=merge_chunk,
        )
        return adj

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
            ),
            out_specs=P(),
            check_vma=False,
        )
    )


def dp_build_waves(
    mesh, prev_layers, adj, elements, ids, cfg, m_eff, max_search,
    *, reinsert: bool = False,
):
    """Insert ``ids`` in mesh-sharded waves (host driver loop).

    With ``reinsert=True`` the waves run back-to-front at the caller's
    ``max_search`` (the reference's reverse-order reinsert, mod.rs:776-778).
    """
    import numpy as np

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
        adj = dp_wave_step(
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
        )
    return adj
