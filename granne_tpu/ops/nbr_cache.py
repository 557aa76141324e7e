"""Neighbor-vector cache: trade HBM capacity for DMA descriptor count.

The HNSW hot loop (build and serve) is bound by random row gathers:
expanding a beam slot needs its adjacency row PLUS the vectors of all M of
its neighbors — 1 + M scattered gathers per expanded node, each paying the
~30 ns/descriptor DMA floor regardless of row bytes (measured,
examples/nbrvec_micro.py).  The cache replicates, per node, everything the
beam needs into ONE contiguous row:

    flat  layout: int16[n, pad128(M*d + 2M)] — the M neighbor vectors
          (bf16, bitcast to int16) back to back, then the M int32 neighbor
          ids bitcast into 2M int16 lanes.  One gather per expanded node
          replaces 1 + M (XLA path).  The table is an INTEGER tensor
          because float lanes silently canonicalize NaN payloads: ids
          whose low 16 bits land in [0x7F80, 0x8000) or [0xFF80, 0x10000)
          are NaN bit patterns as bf16, and a pack/scatter/gather/unpack
          round trip through a bf16 table corrupts exactly those ids
          (measured 0.38% of all ids; ~0.2 recall collapse at 1.2M).
    tiled layout: bf16[n, pad8(M), 128] — per-vector 128-lane padding for
          the Pallas fused-DMA scorer (ops/pallas/nbr_score, measured
          1.20-1.26x the flat XLA scoring); ids not embedded.

Measured scoring at build shapes (W=1024, E=4, M=20, d=100, n=1.2M):
baseline per-candidate gathers 1092 us/round -> flat cache 165 us.

Cost: ~n*2*pad128(M*d) bytes of HBM (4.9 GB at n=1.2M, M=20, d=100) and a
sync-with-adjacency obligation: every row written into ``adj`` must also
refresh the cache row (the builder's wave loop does, via the rows_all
lists wave_step returns).  With embedded ids the cache IS the adjacency
the beam traverses, so staleness would corrupt the search, not just slow
it — keep every write path routed through pack_rows.

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


def row_width(M: int, d: int, dtype=jnp.bfloat16) -> int:
    """Flat cache-row width in LANES, zero-padded UP to a multiple of 128.
    TPU gathers relayout (full-table copy!) any operand whose trailing dim
    is not a 128-multiple — measured: [1.2M, 2000] bf16 gather carries a
    5.1 GB temp, [1.2M, 2048] carries none.

    bf16 rows ride in an int16 table: M*d vector lanes + 2*M id lanes
    (each int32 neighbor id bitcast into two int16 lanes; at M=20, d=100
    the ids ride in the pad for free, 2040 -> 2048).  f32 rows ride in an
    int32 table: M*d vector lanes + M id lanes (ids stored directly —
    2x the bytes, but every cached score is then EXACT, which replaces
    the int8 path's rerank gather; see frontier.search_layers(rerank=...)).
    """
    if dtype == jnp.float32:
        return -(-(M * d + M) // 128) * 128
    return -(-(M * d + 2 * M) // 128) * 128


def unpack_ids(rows: jax.Array, M: int, d: int) -> jax.Array:
    """Recover the int32 neighbor ids embedded in flat cache rows.

    rows: int16|int32[..., row_width] -> int32[..., M].
    """
    if rows.dtype == jnp.int32:
        return rows[..., M * d : M * d + M]
    idb = rows[..., M * d : M * d + 2 * M]
    idb = idb.reshape(idb.shape[:-1] + (M, 2))
    return jax.lax.bitcast_convert_type(idb, jnp.int32)


def row_vecs(rows: jax.Array, M: int, d: int) -> jax.Array:
    """View the vector payload of flat cache rows as bf16|f32[..., M*d]."""
    if rows.dtype == jnp.int32:
        return jax.lax.bitcast_convert_type(rows[..., : M * d], jnp.float32)
    return jax.lax.bitcast_convert_type(rows[..., : M * d], jnp.bfloat16)


def tiled_height(M: int) -> int:
    """Tiled cache-row height: M padded UP to the TPU's 8-sublane DMA
    granularity (Mosaic rejects HBM row slices finer than 8 sublanes)."""
    return -(-M // 8) * 8


def pack_rows(vals: jax.Array, layout: str, ids: jax.Array | None = None) -> jax.Array:
    """[R, M, d] gathered neighbor vectors -> cache rows in ``layout``.

    flat:  bf16[R, row_width(M, d)]  — vectors back to back, then the M
           int32 neighbor ids bitcast into 2*M bf16 lanes (``ids``
           required: the adjacency rows the vectors came from), padded to
           a 128-lane multiple (XLA gather+einsum scoring path — the beam
           reads neighbor ids and vectors in one gather).
    tiled: bf16[R, pad8(M), 128]     — each vector zero-padded to 128
           lanes, rows padded to 8 sublanes (the Pallas fused-DMA scoring
           path, ops/pallas/nbr_score; requires d <= 128); ids are NOT
           embedded — the beam gathers adjacency separately.
    """
    R, M, d = vals.shape
    if layout == "flat":
        assert ids is not None, "flat cache rows embed the adjacency ids"
        assert vals.dtype in (jnp.bfloat16, jnp.float32), vals.dtype
        if vals.dtype == jnp.float32:
            v = jax.lax.bitcast_convert_type(vals.reshape(R, M * d), jnp.int32)
            v = jnp.concatenate([v, ids.astype(jnp.int32)], axis=1)
        else:
            v = jax.lax.bitcast_convert_type(vals.reshape(R, M * d), jnp.int16)
            idb = jax.lax.bitcast_convert_type(
                ids.astype(jnp.int32), jnp.int16
            ).reshape(R, 2 * M)
            v = jnp.concatenate([v, idb], axis=1)
        pad = row_width(M, d, vals.dtype) - v.shape[1]
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


@partial(jax.jit, static_argnames=("chunk", "rows", "layout", "cache_dtype"))
def make_neighbor_cache(
    adj: jax.Array,
    elements,
    chunk: int = _CHUNK,
    rows: int | None = None,
    layout: str = "flat",
    cache_dtype: str = "bf16",
) -> jax.Array:
    """Bulk-build the cache for a layer: [n, M] adj -> cache table.

    ``layout`` picks the row encoding (see ``pack_rows``).  ``cache_dtype``
    ("bf16" default, or "f32") picks the flat row precision: f32 rows cost
    2x the HBM but make every cached score EXACT — the serving answer to
    bf16 near-tie misordering without the rerank pass's extra [B, ef]
    scattered gather (the hot loop is DMA-descriptor-bound, so fatter rows
    are nearly free while extra descriptors are not).  Elements provide
    ``cache_rows_exact`` for full-precision rows (falls back to upcasting
    ``cache_rows``).  The flat table
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
    if cache_dtype not in ("bf16", "f32"):
        raise ValueError(f"cache_dtype must be 'bf16' or 'f32', got {cache_dtype!r}")
    if cache_dtype == "f32" and layout != "flat":
        raise ValueError(
            "cache_dtype='f32' is only supported for layout='flat' "
            "(the tiled Pallas scorer reads bf16 tiles)"
        )
    n, M = adj.shape
    if rows is not None:
        n = min(n, rows)
    chunk = min(chunk, n) or 1
    n_pad = (-n) % chunk
    a = adj[:n]
    if n_pad:
        a = jnp.concatenate([a, jnp.zeros((n_pad, M), adj.dtype)], axis=0)

    def body(rows_):
        ii = jnp.maximum(rows_, 0)
        if layout == "flat" and cache_dtype == "f32":
            f = getattr(elements, "cache_rows_exact", None)
            v = f(ii) if f is not None else elements.cache_rows(ii).astype(jnp.float32)
        else:
            v = elements.cache_rows(ii)  # [chunk, M, d]
        return pack_rows(v, layout, ids=rows_)

    out = jax.lax.map(body, a.reshape(-1, chunk, M))
    return out.reshape((n + n_pad,) + out.shape[2:])


def supports_cache(elements) -> bool:
    """Containers opt in by providing cache_rows + score_block."""
    return hasattr(elements, "cache_rows") and hasattr(elements, "score_block")


def table_kind(tab: jax.Array) -> str:
    """The cache table's layout/precision contract, as an explicit name.

    By construction (``pack_rows``/``make_neighbor_cache``) the array type
    IS the tag — 2-D int16 = flat bf16 rows, 2-D int32 = flat f32 rows,
    3-D = tiled bf16 — but readers should dispatch on THIS function, not
    re-sniff dtypes, so the encoding can change in one place (ADVICE r4:
    dtype was doing double duty as a layout tag at several call sites).
    """
    if tab.ndim == 3:
        return "tiled"
    if tab.dtype == jnp.int32:
        return "flat-f32"
    if tab.dtype == jnp.int16:
        return "flat-bf16"
    raise ValueError(f"not a cache table: ndim={tab.ndim} dtype={tab.dtype}")


def rows_to_vecs(tab: jax.Array, ids: jax.Array, M: int, d: int) -> jax.Array:
    """Gather cache rows for ``ids`` [N] and view them as [N, M, d]
    neighbor vectors (either layout).  One fat gather per id instead of M
    scattered element-row gathers — the cache-fed merge path."""
    rows = jnp.take(tab, jnp.clip(ids, 0, tab.shape[0] - 1), axis=0)
    if tab.ndim == 2:
        return row_vecs(rows, M, d).reshape(ids.shape[0], M, d)
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
        block = row_vecs(jnp.take(tab, ids, axis=0), M, d_el).reshape(
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
