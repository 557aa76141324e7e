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
