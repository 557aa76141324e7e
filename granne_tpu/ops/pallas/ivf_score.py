"""Pallas TPU kernel: IVF slot scoring with index_map-driven block streaming.

The XLA path of the cluster-centric IVF scorer first *gathers* the probed
cluster blocks into a [S, L, d] tensor (one full HBM round-trip) and then
contracts it (a second read).  This kernel instead lets the Pallas pipeline
DMA each slot's block HBM->VMEM exactly once, selected directly by the
scalar-prefetched slot->cluster mapping (``PrefetchScalarGridSpec`` — the
block index_map reads ``slot_keys``), and runs the [cap, d] x [d, L] MXU
contraction while the next block is in flight (automatic double buffering).

Traffic: ~1x blocks + scores, vs ~3x for gather-then-einsum.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(slot_keys_ref, block_ref, qg_ref, out_ref):
    # block_ref: [1, L, d] the slot's cluster block (bf16)
    # qg_ref:    [1, cap, d] the slot's query group (bf16)
    # out_ref:   [1, cap, L] f32 scores
    block = block_ref[0]  # [L, d]
    qg = qg_ref[0]  # [cap, d]
    out_ref[0] = jax.lax.dot_general(
        qg,
        block,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("interpret",))
def ivf_score_slots(
    blocks: jax.Array,  # bf16[k, L, d]
    slot_keys: jax.Array,  # int32[S] cluster id per slot (clamped, >= 0)
    qg: jax.Array,  # bf16[S, cap, d] per-slot query group
    *,
    interpret: bool = False,
) -> jax.Array:
    """Returns f32[S, cap, L] raw dot scores."""
    k, L, d = blocks.shape
    S, cap, _ = qg.shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, L, d), lambda s, keys: (keys[s], 0, 0)),
            pl.BlockSpec((1, cap, d), lambda s, keys: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, cap, L), lambda s, keys: (s, 0, 0)),
    )
    fn = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((S, cap, L), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )
    return fn(slot_keys, blocks, qg)


def _kernel_grouped(slot_keys_ref, blocks_hbm, qg_ref, out_ref, scratch, sems):
    """Score G slots per grid step with manual double-buffered block DMA.

    blocks_hbm: [k, L, d] stays in HBM (memory_space=ANY); each slot's
    cluster block is DMA'd HBM->VMEM by the kernel itself, overlapped with
    the previous slot's MXU contraction — the single-slot kernel's
    ~1us/slot grid overhead is amortized G-fold.
    """
    g = pl.program_id(0)
    G = qg_ref.shape[0]

    def get_dma(i, buf):
        key = slot_keys_ref[g * G + i]
        return pltpu.make_async_copy(blocks_hbm.at[key], scratch.at[buf], sems.at[buf])

    get_dma(0, 0).start()

    def body(i, _):
        buf = i % 2

        @pl.when(i + 1 < G)
        def _():
            get_dma(i + 1, (i + 1) % 2).start()

        get_dma(i, buf).wait()
        out_ref[i] = jax.lax.dot_general(
            qg_ref[i],
            scratch[buf],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return _

    jax.lax.fori_loop(0, G, body, None)


@partial(jax.jit, static_argnames=("group", "interpret"))
def ivf_score_slots_grouped(
    blocks: jax.Array,  # bf16[k, L, d]
    slot_keys: jax.Array,  # int32[S] cluster id per slot (clamped, >= 0)
    qg: jax.Array,  # bf16[S, cap, d] per-slot query group
    *,
    group: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Multi-slot-blocked scorer: f32[S, cap, L] raw dot scores."""
    k, L, d = blocks.shape
    S, cap, _ = qg.shape
    G = min(group, S) if S else 1
    pad = (-S) % G
    if pad:
        slot_keys = jnp.concatenate([slot_keys, jnp.zeros((pad,), slot_keys.dtype)])
        qg = jnp.concatenate([qg, jnp.zeros((pad, cap, d), qg.dtype)])
    Sp = S + pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Sp // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # blocks stay in HBM
            pl.BlockSpec((G, cap, d), lambda g, keys: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((G, cap, L), lambda g, keys: (g, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, L, d), blocks.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    fn = pl.pallas_call(
        _kernel_grouped,
        out_shape=jax.ShapeDtypeStruct((Sp, cap, L), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )
    out = fn(slot_keys, blocks, qg)
    return out[:S] if pad else out


def supported() -> bool:
    """TPU-only; opt out with GT_PALLAS_IVF=0.

    The single-slot kernel measured SLOWER than XLA gather+einsum on v5e
    (per-grid-step overhead ~1us/slot); the grouped kernel amortizes that
    overhead 8-fold with in-kernel double-buffered block DMA and is the
    default on TPU where measured faster (see BASELINE.md).
    """
    import os

    flag = os.environ.get("GT_PALLAS_IVF")
    if flag == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
