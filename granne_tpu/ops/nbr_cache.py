"""Neighbor-vector cache: trade HBM capacity for gather issue rate.

The HNSW hot loop (build and serve) is bound by random row gathers of
candidate vectors: expanding a beam slot needs the vectors of all M of its
neighbors, i.e. M separate ~d*4-byte gathers per expanded node.  Measured on
v5e (examples/beam_micro.py, nbrvec_micro.py) those small per-iteration
gathers run ~10 ns/row *regardless of row bytes*, so the win is fewer,
fatter rows: replicate each node's M neighbors' vectors contiguously as

    nbr_vecs = bf16[n_rows, M, d]     (elements.cache_rows dtype)

and the beam issues ONE (M*d*2)-byte gather per EXPANDED node instead of M
per candidate — measured 2.3x faster candidate scoring at build shapes
(457 vs 1070 us/iteration, W=1024, M=20, E=4, d=100, n=1.2M).

Cost: n*M*d*2 bytes of HBM (4.8 GB at n=1.2M, M=20, d=100) and a
sync-with-adjacency obligation: every row written into ``adj`` must also
refresh the cache row (builder.apply_wave_edges does; ~0.2 ms/wave).

This is a TPU-native answer to the reference's mmap locality reordering
(``/root/reference/src/index/reorder.rs:12-14``): where granne re-orders
nodes so neighbors share pages, we re-materialize neighbor vectors so one
DMA descriptor covers the whole adjacency row.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_CHUNK = 65536


def row_width(M: int, d: int) -> int:
    """Flat cache-row width: M*d zero-padded UP to a multiple of 128 lanes.
    TPU gathers relayout (full-table copy!) any operand whose trailing dim
    is not a 128-multiple — measured: [1.2M, 2000] bf16 gather carries a
    5.1 GB temp, [1.2M, 2048] carries none.
    """
    return -(-(M * d) // 128) * 128


@partial(jax.jit, static_argnames=("chunk", "rows"))
def make_neighbor_cache(
    adj: jax.Array, elements, chunk: int = _CHUNK, rows: int | None = None
) -> jax.Array:
    """Bulk-build the cache for a layer: [n, M] adj -> bf16[>=rows, W128].

    The table is stored 2-D with rows zero-padded to ``row_width(M, d)``
    lanes: a [rows, M, d] layout tiles the minor dims and pads ~1.5x at
    M=20, d=100 (measured 12 GB for a 7.8 GB table), and any non-128-
    multiple trailing dim makes every gather relayout-copy the whole
    table.  ``rows`` bounds the table to the populated prefix — adjacency
    buffers are power-of-two bucketed (index.graph.grow_layer) and caching
    their dead tail wastes GBs.

    Chunked with ``lax.map`` so the intermediate full-precision gather stays
    bounded; the result may carry up to ``chunk-1`` padding rows beyond
    ``rows`` (readers index by adjacency ids only).  UNUSED (-1) slots cache
    row 0's vector; readers mask on ``adj >= 0``.  Jitted: eager execution
    would materialize table-sized temporaries for the reshape.
    """
    n, M = adj.shape
    if rows is not None:
        n = min(n, rows)
    chunk = min(chunk, n) or 1
    n_pad = (-n) % chunk
    a = adj[:n]
    if n_pad:
        a = jnp.concatenate([a, jnp.zeros((n_pad, M), adj.dtype)], axis=0)

    def body(rows_):
        v = elements.cache_rows(jnp.maximum(rows_, 0))  # [chunk, M, d]
        v = v.reshape(chunk, -1)
        pad = row_width(M, v.shape[1] // M) - v.shape[1]
        if pad:
            v = jnp.concatenate([v, jnp.zeros((chunk, pad), v.dtype)], axis=1)
        return v

    out = jax.lax.map(body, a.reshape(-1, chunk, M))
    return out.reshape(n + n_pad, -1)


def supports_cache(elements) -> bool:
    """Containers opt in by providing cache_rows + score_block."""
    return hasattr(elements, "cache_rows") and hasattr(elements, "score_block")
