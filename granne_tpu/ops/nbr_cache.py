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


def tiled_height(M: int) -> int:
    """Tiled cache-row height: M padded UP to the TPU's 8-sublane DMA
    granularity (Mosaic rejects HBM row slices finer than 8 sublanes)."""
    return -(-M // 8) * 8


def pack_rows(vals: jax.Array, layout: str) -> jax.Array:
    """[R, M, d] gathered neighbor vectors -> cache rows in ``layout``.

    flat:  bf16[R, row_width(M, d)]  — vectors back to back, row padded to
           a 128-lane multiple (XLA gather+einsum scoring path).
    tiled: bf16[R, pad8(M), 128]     — each vector zero-padded to 128
           lanes, rows padded to 8 sublanes (the Pallas fused-DMA scoring
           path, ops/pallas/nbr_score; requires d <= 128).
    """
    R, M, d = vals.shape
    if layout == "flat":
        v = vals.reshape(R, M * d)
        pad = row_width(M, d) - M * d
        if pad:
            v = jnp.concatenate([v, jnp.zeros((R, pad), v.dtype)], axis=1)
        return v
    assert layout == "tiled" and d <= 128, (layout, d)
    v = vals
    if d < 128:
        v = jnp.concatenate([v, jnp.zeros((R, M, 128 - d), v.dtype)], axis=2)
    Mp = tiled_height(M)
    if Mp > M:
        v = jnp.concatenate([v, jnp.zeros((R, Mp - M, 128), v.dtype)], axis=1)
    return v


@partial(jax.jit, static_argnames=("chunk", "rows", "layout"))
def make_neighbor_cache(
    adj: jax.Array,
    elements,
    chunk: int = _CHUNK,
    rows: int | None = None,
    layout: str = "flat",
) -> jax.Array:
    """Bulk-build the cache for a layer: [n, M] adj -> cache table.

    ``layout`` picks the row encoding (see ``pack_rows``).  The flat table
    is 2-D with rows zero-padded to ``row_width(M, d)`` lanes: a naive
    [rows, M, d] layout tiles the minor dims and pads ~1.5x at M=20, d=100
    (measured 12 GB for a 7.8 GB table), and any non-128-multiple trailing
    dim makes every gather relayout-copy the whole table.  ``rows`` bounds
    the table to the populated prefix — adjacency buffers are
    power-of-two bucketed (index.graph.grow_layer) and caching their dead
    tail wastes GBs.

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
        return pack_rows(v, layout)

    out = jax.lax.map(body, a.reshape(-1, chunk, M))
    return out.reshape((n + n_pad,) + out.shape[2:])


def supports_cache(elements) -> bool:
    """Containers opt in by providing cache_rows + score_block."""
    return hasattr(elements, "cache_rows") and hasattr(elements, "score_block")


def rows_to_vecs(tab: jax.Array, ids: jax.Array, M: int, d: int) -> jax.Array:
    """Gather cache rows for ``ids`` [N] and view them as [N, M, d]
    neighbor vectors (either layout).  One fat gather per id instead of M
    scattered element-row gathers — the cache-fed merge path."""
    rows = jnp.take(tab, jnp.clip(ids, 0, tab.shape[0] - 1), axis=0)
    if tab.ndim == 2:
        return rows[:, : M * d].reshape(ids.shape[0], M, d)
    return rows[:, :M, :d]


def score_cached(tab: jax.Array, sel_ids: jax.Array, queries, elements, M: int):
    """Score E expanded nodes' cached neighbor vectors against queries.

    Dispatches on the table layout: 2-D flat -> XLA gather + einsum
    (elements.score_block); 3-D tiled -> the Pallas fused-DMA kernel
    (measured 1.2-1.26x the XLA path at build shapes on v5e,
    examples/nbrvec_micro.py).  Returns f32[B, E*M] distances.
    """
    B, E = sel_ids.shape
    ids = jnp.clip(sel_ids, 0, tab.shape[0] - 1)
    if tab.ndim == 2:
        d_el = queries.shape[-1]
        block = jnp.take(tab, ids, axis=0)[:, :, : M * d_el].reshape(
            B, E * M, d_el
        )
        return elements.score_block(block, queries)
    from .pallas.nbr_score import gather_score

    d_el = queries.shape[-1]
    qp = queries.astype(tab.dtype)
    if d_el < 128:
        qp = jnp.concatenate(
            [qp, jnp.zeros((B, 128 - d_el), qp.dtype)], axis=1
        )
    interpret = jax.default_backend() != "tpu"  # CPU tests run interpreted
    dots = gather_score(tab, ids, qp, M=M, interpret=interpret)
    return elements.dist_from_dots(dots)
