"""Pallas TPU kernel: fused neighbor-cache row gather + candidate scoring.

The cached beam's candidate scoring (ops.nbr_cache) is, in XLA, a
three-pass affair over HBM: gather the selected nodes' cache rows into a
[B*E, row] block (write), read it back for the contraction, and write the
scores.  Measured on v5e that pipeline runs at ~125 GB/s effective — well
below streaming bandwidth.

This kernel fuses the whole thing: per grid step it DMAs one chunk's rows
HBM->VMEM directly (row addresses from the scalar-prefetched id list),
double-buffered against the previous chunk's VPU scoring, and writes only
the per-candidate scores back.  Traffic: ~1x rows + scores.

Layout contract (ops.nbr_cache "tiled" layout): the table is
``bf16[n, Mp, 128]`` with ``Mp = pad8(M)`` — each of the M neighbor
vectors zero-padded to 128 lanes, rows padded to the TPU's 8-sublane DMA
granularity (Mosaic rejects single-row slices of 2-D tiled HBM memrefs;
dim-0 slices of a 3-D memref are always legal).

Reference context: accelerates the hot loop of ``search_for_neighbors``
(/root/reference/src/index/mod.rs:999-1037) in its batched TPU form
(ops.frontier.beam_search).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(ids_ref, tab_ref, q_ref, out_ref, bufs, sems, *, CB, E, M, Mp):
    """One grid step scores CB queries (CB*E cache rows).

    ids_ref: int32[B*E] scalar-prefetch (SMEM) — clipped row ids, q-major.
    tab_ref: bf16[n, Mp, 128] in HBM (ANY) — DMA'd manually per row.
    q_ref:   bf16[CB, 128] query block (zero-padded past d).
    out_ref: f32[CB*E, Mp] raw dot products (caller slices [:, :M]).
    bufs:    bf16[2, CB*E, Mp, 128] VMEM scratch (double buffer).
    sems:    DMA semaphores [2].
    """
    i = pl.program_id(0)
    num_chunks = pl.num_programs(0)
    R = CB * E

    def row_dma(chunk, slot, k):
        rid = ids_ref[chunk * R + k]
        return pltpu.make_async_copy(
            tab_ref.at[rid], bufs.at[slot, k], sems.at[slot]
        )

    def issue(chunk, slot):
        def body(k, _):
            row_dma(chunk, slot, k).start()
            return 0

        jax.lax.fori_loop(0, R, body, 0)

    @pl.when(i == 0)
    def _():
        issue(0, 0)

    @pl.when(i + 1 < num_chunks)
    def _():
        issue(i + 1, (i + 1) % 2)

    slot = i % 2

    def wait_body(k, _):
        row_dma(i, slot, k).wait()
        return 0

    jax.lax.fori_loop(0, R, wait_body, 0)

    # --- score: out[q*E+e, j] = <row[q*E+e] vec j, query q> --------------
    qv = q_ref[:].astype(jnp.float32)  # [CB, 128]
    qrep = jnp.repeat(qv, E, axis=0)  # [R, 128]
    rows = bufs[slot].astype(jnp.float32)  # [R, Mp, 128]
    out_ref[:] = jnp.sum(rows * qrep[:, None, :], axis=2)  # [R, Mp]


def _pick_chunk(B: int, E: int, Mp: int) -> int:
    """Largest CB dividing B with double-buffer scratch <= ~6 MB VMEM."""
    row_bytes = Mp * 128 * 2
    cb = B
    while cb > 8 and 2 * cb * E * row_bytes > 6 * 1024 * 1024:
        cb //= 2
    while B % cb:
        cb //= 2
    return max(cb, 1)


@partial(jax.jit, static_argnames=("M", "interpret"))
def gather_score(
    tab: jax.Array,  # bf16[n_rows, Mp, 128]
    sel_ids: jax.Array,  # int32[B, E] expanded-node ids (may contain -1)
    q_padded: jax.Array,  # bf16[B, 128] queries zero-padded to 128 lanes
    *,
    M: int,
    interpret: bool = False,
) -> jax.Array:
    """Returns f32[B, E*M] raw dots of each query against its selected
    nodes' cached neighbor vectors.  Invalid (negative) ids are clipped to
    row 0; callers mask on adjacency validity as usual."""
    B, E = sel_ids.shape
    n_rows, Mp, DP = tab.shape
    assert DP == 128 and Mp >= M, (tab.shape, M)
    assert q_padded.shape == (B, DP), (q_padded.shape, B, DP)

    ids = jnp.clip(sel_ids.reshape(-1), 0, n_rows - 1).astype(jnp.int32)
    CB = _pick_chunk(B, E, Mp)
    R = CB * E

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // CB,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # tab stays in HBM
            pl.BlockSpec((CB, DP), lambda i, ids: (i, 0)),
        ],
        out_specs=pl.BlockSpec((R, Mp), lambda i, ids: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, R, Mp, DP), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    fn = pl.pallas_call(
        partial(_kernel, CB=CB, E=E, M=M, Mp=Mp),
        out_shape=jax.ShapeDtypeStruct((B * E, Mp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )
    dots = fn(ids, tab, q_padded)  # [B*E, Mp]
    return dots[:, :M].reshape(B, E * M)


# ---------------------------------------------------------------------------
# Flat-layout fused gather + score (round 3)
# ---------------------------------------------------------------------------
#
# The tiled kernel above needs the "tiled" cache layout, whose per-vector
# 128-lane padding costs +50% HBM at M=20, d=100 — the only reason it never
# became the default (BASELINE.md round 2).  This kernel works on the FLAT
# layout directly (ops.nbr_cache row_width rows; zero extra bytes): the
# int16[n, RW] table is viewed as int16[n, S, 128] (S = RW/128), whose
# dim-0 slices are always DMA-legal, lifting the 8-sublane constraint
# without padding.
#
# Scoring trick: vectors sit back-to-back at stride d (not lane-aligned).
# Rather than re-laying rows out as [M, d] (an expensive in-kernel
# reshape), candidate dots come from one elementwise multiply with a
# query-TILED pattern (the query repeated at stride d, built once per
# search outside the kernel) followed by a matmul with a constant 0/1
# segment-indicator matrix: dots[r, m] = sum_j row[r, j] * qtile[r, j] *
# Ind[j, m].  The MXU does the segment reduction.  The neighbor ids
# embedded in the row tail are emitted as a second output, so the beam's
# separate adjacency gather disappears entirely (as in the XLA flat path).


def flat_ok(row_w: int, M: int, d: int) -> bool:
    """Kernel layout constraints for the flat table."""
    from ..nbr_cache import row_width

    S = row_w // 128
    return (
        row_w == row_width(M, d)
        and row_w % 128 == 0
        and S % 8 == 0  # int16 DMA sublane granularity of the [S, 128] view
        and M <= 128
    )


def make_qtile(q: jax.Array, M: int, row_w: int) -> jax.Array:
    """[B, d] bf16 query lanes -> [B, S, 128] tiled pattern (q repeated at
    stride d over the first M*d lanes, zeros after).  Built ONCE per search
    — it depends only on the queries."""
    B, d = q.shape
    flat = jnp.tile(q.astype(jnp.bfloat16), (1, M))  # [B, M*d]
    pad = row_w - M * d
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((B, pad), jnp.bfloat16)], axis=1)
    return flat.reshape(B, row_w // 128, 128)


def _seg_indicator(M: int, d: int, row_w: int) -> jax.Array:
    """bf16[S, 128, 128] segment indicator: Ind[s, l, m] = 1 iff flat lane
    s*128 + l belongs to vector m (i.e. m*d <= s*128+l < (m+1)*d)."""
    S = row_w // 128
    lane = (
        jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    )  # [S, 128] global lane index
    m = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
    seg = lane[:, :, None] // d  # [S, 128, 1]
    ok = (seg == m) & (lane[:, :, None] < M * d)
    return ok.astype(jnp.bfloat16)


def _flat_kernel(ids_hbm, tab_ref, qt_ref, ind_ref, dots_ref, tail_ref,
                 ids_smem, bufs, sems, id_sem, *, CB, E, S, t0, md):
    """One grid step scores CB queries (CB*E flat cache rows).

    ids_hbm: int32[B*E] in HBM (ANY) — a NORMAL operand, deliberately not
      scalar-prefetched: inside a lax.while_loop the prefetch buffer was
      observed to go stale after the first iteration (beam froze with
      iteration-1 candidates; see tests/test_nbr_score.py in-loop parity).
      Step 0 DMAs it into SMEM scratch, which persists across grid steps.
    tab_ref: int16[n, S, 128] in HBM (ANY) — DMA'd per row.
    qt_ref:  bf16[CB, S, 128] query-tile block (make_qtile).
    ind_ref: bf16[S, 128, 128] segment indicator.
    dots_ref: f32[CB*E, 128] raw per-vector dots (caller slices [:, :M]).
    tail_ref: int16[CB*E, S - t0, 128] row tails (embedded neighbor ids).
    """
    i = pl.program_id(0)
    num_chunks = pl.num_programs(0)
    R = CB * E

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(ids_hbm, ids_smem, id_sem)
        cp.start()
        cp.wait()

    def row_dma(chunk, slot, k):
        rid = ids_smem[chunk * R + k]
        return pltpu.make_async_copy(tab_ref.at[rid], bufs.at[slot, k], sems.at[slot])

    def issue(chunk, slot):
        def body(k, _):
            row_dma(chunk, slot, k).start()
            return 0

        jax.lax.fori_loop(0, R, body, 0)

    @pl.when(i == 0)
    def _():
        issue(0, 0)

    @pl.when(i + 1 < num_chunks)
    def _():
        issue(i + 1, (i + 1) % 2)

    slot = i % 2

    def wait_body(k, _):
        row_dma(i, slot, k).wait()
        return 0

    jax.lax.fori_loop(0, R, wait_body, 0)

    rows16 = bufs[slot]  # int16 [R, S, 128]
    rowsb = pltpu.bitcast(rows16, jnp.bfloat16)
    # Lanes >= M*d hold int16-embedded neighbor ids (UNUSED = -1 -> 0xFFFF,
    # a bf16 NaN pattern) and pad.  The qtile is zero there, but 0 * NaN =
    # NaN would ride through the indicator matmul into every dot of the
    # row, so those lanes must be SELECTED out, not multiplied out.  (This
    # was the round-3 "frozen beam" bug: any cache row with an unfilled
    # neighbor slot scored NaN for all its candidates.)
    lane = (
        jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    )
    vec_lane = lane < md  # static [S, 128]
    rowsb = jnp.where(vec_lane[None], rowsb, jnp.bfloat16(0))
    qt = qt_ref[:]  # [CB, S, 128]
    qrep = jnp.broadcast_to(qt[:, None], (CB, E, S, 128)).reshape(R, S, 128)
    prod = rowsb * qrep
    acc = jnp.zeros((R, 128), jnp.float32)
    # slices past the last vector lane contribute nothing (ind == 0): skip
    n_vec_slices = (md + 127) // 128
    for s in range(n_vec_slices):  # unrolled MXU matmuls
        acc = acc + jnp.dot(
            prod[:, s, :], ind_ref[s], preferred_element_type=jnp.float32
        )
    dots_ref[:] = acc
    tail_ref[:] = rows16[:, t0:, :]


def _pick_chunk_flat(B: int, E: int, S: int) -> int:
    """Largest CB dividing B with double-buffer scratch <= ~6 MB VMEM."""
    row_bytes = S * 128 * 2
    cb = B
    while cb > 8 and 2 * cb * E * row_bytes > 6 * 1024 * 1024:
        cb //= 2
    while B % cb:
        cb //= 2
    return max(cb, 1)


@partial(jax.jit, static_argnames=("M", "d", "interpret"))
def gather_score_flat(
    tab: jax.Array,  # int16[n, RW] flat cache table (ops.nbr_cache)
    sel_ids: jax.Array,  # int32[B, E] expanded-node ids (may contain -1)
    qtile: jax.Array,  # bf16[B, S, 128] from make_qtile
    *,
    M: int,
    d: int,
    interpret: bool = False,
):
    """Fused flat-row gather + candidate scoring + id unpack.

    Returns (dots f32[B, E*M] raw query·neighbor products, nbrs
    int32[B, E*M] embedded adjacency ids).  Invalid (negative) sel_ids are
    clipped to row 0; callers mask as usual.
    """
    B, E = sel_ids.shape
    n, RW = tab.shape
    S = RW // 128
    assert flat_ok(RW, M, d), (RW, M, d)
    assert qtile.shape == (B, S, 128), (qtile.shape, B, S)
    t0 = (M * d) // 128

    ids = jnp.clip(sel_ids.reshape(-1), 0, n - 1).astype(jnp.int32)
    tab3 = tab.reshape(n, S, 128)
    CB = _pick_chunk_flat(B, E, S)
    R = CB * E
    ind = _seg_indicator(M, d, RW)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B // CB,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # ids in HBM -> SMEM scratch
            pl.BlockSpec(memory_space=pl.ANY),  # tab stays in HBM
            pl.BlockSpec((CB, S, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((S, 128, 128), lambda i: (0, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((R, 128), lambda i: (i, 0)),
            pl.BlockSpec((R, S - t0, 128), lambda i: (i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.SMEM((B * E,), jnp.int32),
            pltpu.VMEM((2, R, S, 128), jnp.int16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    fn = pl.pallas_call(
        partial(_flat_kernel, CB=CB, E=E, S=S, t0=t0, md=M * d),
        out_shape=(
            jax.ShapeDtypeStruct((B * E, 128), jnp.float32),
            jax.ShapeDtypeStruct((B * E, S - t0, 128), jnp.int16),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )
    dots128, tail = fn(ids, tab3, qtile, ind)
    dots = dots128[:, :M].reshape(B, E * M)
    # embedded ids live at flat lanes [M*d, M*d + 2M)
    off = M * d - t0 * 128
    idb = tail.reshape(B * E, (S - t0) * 128)[:, off : off + 2 * M]
    nbrs = jax.lax.bitcast_convert_type(
        idb.reshape(B * E, M, 2), jnp.int32
    ).reshape(B, E * M)
    return dots, nbrs
