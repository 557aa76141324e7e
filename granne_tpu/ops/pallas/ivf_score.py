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


def supported() -> bool:
    """Opt-in (GT_PALLAS_IVF=1) and TPU-only.

    Measured on v5e at L=256-1024: the per-grid-step pipeline overhead
    (~1us/slot over thousands of slots) makes this kernel SLOWER than XLA's
    gather+einsum despite touching ~3x less HBM — XLA's gather of large
    contiguous rows is already efficient.  Kept for larger-L regimes and
    future multi-slot blocking work.
    """
    import os

    if os.environ.get("GT_PALLAS_IVF") != "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
