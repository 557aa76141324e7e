"""Data-parallel wave insertion over a device mesh.

The build-time counterpart of sharded serving (SURVEY §5.8): the expensive
parts of a wave — entry descent, ``ef``-beam search over the frozen graph
and the select-neighbors heuristic — are embarrassingly parallel across the
wave's elements, so the wave is SHARDED across devices (data parallelism
over insertions, replacing the reference's rayon ``par_iter``,
src/index/mod.rs:756-782).  The graph mutation must be identical
everywhere, so each device then ``all_gather``s every shard's selected
edges over ICI and applies the same deterministic forward-scatter +
reverse-edge merge to its replica of the adjacency.

This keeps the graph replicated (it is small next to the elements) while
the search/heuristic FLOPs scale with device count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..index import builder as B
from ..index.heuristic import EPS100, select_neighbors
from ..ops import frontier
from ..ops.topk import INF, UNUSED
from .mesh import SHARD_AXIS

_BIG = jnp.iinfo(jnp.int32).max
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
    reverse_cap: int = 16,
    merge_chunk: int = 1024,
):
    """One wave, sharded over the mesh. wave size must divide the mesh size.

    Returns the updated (replicated) adjacency.
    """
    key = (id(mesh), len(prev_layers), adj.shape, wave_ids.shape[0], m_eff, max_search, expand)
    fn = _CACHE.get(key)
    if fn is None:
        fn = _make_step(mesh, m_eff, max_search, expand, reverse_cap, merge_chunk)
        _CACHE[key] = fn
    return fn(prev_layers, adj, elements, wave_ids, wave_valid)


def _make_step(mesh, m_eff, max_search, expand, reverse_cap, merge_chunk):
    def body(prev_layers, adj, elements, wave_ids, wave_valid):
        # --- sharded phase: search + select for the local wave slice -------
        W_local = wave_ids.shape[0]
        q = elements.queries_from_ids(wave_ids)
        ep = jnp.zeros((W_local,), jnp.int32)
        ep = frontier.descend(prev_layers, elements, q, ep)
        cand_ids, cand_d = frontier.beam_search(
            adj, elements, q, ep, ef=max_search, expand=expand
        )
        not_self = cand_ids != wave_ids[:, None]
        cvalid = jnp.logical_and(cand_ids >= 0, not_self)
        cand_d = jnp.where(cvalid, cand_d, INF)
        cand_ids = jnp.where(cvalid, cand_ids, UNUSED)
        active = jnp.logical_and(wave_valid, elements.self_dist(wave_ids) <= EPS100)
        sel_ids, sel_d = select_neighbors(elements, cand_ids, cand_d, cvalid, m_eff)
        zero_sel = jnp.minimum(
            jnp.sum(jnp.logical_and(cand_ids >= 0, cand_d < EPS100), axis=1), m_eff
        )
        dead = zero_sel > (m_eff // 2)
        active = jnp.logical_and(active, ~dead)
        sel_ids = jnp.where(active[:, None], sel_ids, UNUSED)
        sel_d = jnp.where(active[:, None], sel_d, INF)

        # --- replicate the edge set: all_gather over ICI -------------------
        g_ids = jax.lax.all_gather(wave_ids, SHARD_AXIS).reshape(-1)
        g_active = jax.lax.all_gather(active, SHARD_AXIS).reshape(-1)
        g_sel = jax.lax.all_gather(sel_ids, SHARD_AXIS).reshape(-1, m_eff)
        g_d = jax.lax.all_gather(sel_d, SHARD_AXIS).reshape(-1, m_eff)

        # --- replicated phase: identical deterministic graph update --------
        W = g_ids.shape[0]
        Ms = adj.shape[1]
        fwd = (
            jnp.concatenate([g_sel, jnp.full((W, Ms - m_eff), UNUSED, jnp.int32)], axis=1)
            if Ms > m_eff
            else g_sel
        )
        adj = adj.at[jnp.where(g_active, g_ids, _BIG)].set(fwd, mode="drop")
        tgt = jnp.where(g_active[:, None], g_sel, UNUSED).reshape(-1)
        src = jnp.broadcast_to(g_ids[:, None], (W, m_eff)).reshape(-1)
        dd = g_d.reshape(-1)
        adj = B._apply_reverse_edges(
            adj, elements, tgt, src, dd, reverse_cap=reverse_cap, merge_chunk=merge_chunk
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


def dp_build_waves(mesh, prev_layers, adj, elements, ids, cfg, m_eff, max_search):
    """Insert ``ids`` in mesh-sharded waves (host driver loop)."""
    import numpy as np

    S = mesh.devices.size
    W = max(S, (cfg.wave_size // S) * S)
    for lo in range(0, len(ids), W):
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
            reverse_cap=cfg.reverse_cap,
            merge_chunk=cfg.merge_chunk,
        )
    return adj
