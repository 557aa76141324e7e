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


def _kernel_topk(slot_keys_ref, block_ref, ids_ref, scales_ref, qg_ref,
                 out_v_ref, out_i_ref):
    """Fused slot scoring + per-slot top-K'.

    Never materializes the [cap, L] scores in HBM: the dot runs on the MXU,
    the K'-step max/mask reduction on the VPU, and only [cap, K'] values +
    element ids leave VMEM.  (XLA cannot fuse a top-k into its producer —
    the gather-einsum path writes/re-reads the full score tensor.)
    """
    block = block_ref[0]  # [L, d]
    qg = qg_ref[0]  # [cap, d]
    ids = ids_ref[0, 0]  # int32[L]
    scales = scales_ref[0, 0]  # f32[L]
    cap = qg.shape[0]
    L = block.shape[0]
    Kp = out_v_ref.shape[2]

    scores = jax.lax.dot_general(
        qg.astype(jnp.bfloat16),
        block.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [cap, L]
    scores = scores * scales[None, :]
    scores = jnp.where((ids >= 0)[None, :], scores, -jnp.inf)

    iota = jax.lax.broadcasted_iota(jnp.int32, (cap, L), 1)
    ids_b = jnp.broadcast_to(ids[None, :], (cap, L))
    vals = []
    hit_ids = []
    for _ in range(Kp):
        m = jnp.max(scores, axis=1)  # [cap]
        am = jnp.min(jnp.where(scores == m[:, None], iota, L), axis=1)
        onehot = iota == am[:, None]
        vals.append(m)
        hit_ids.append(jnp.sum(jnp.where(onehot, ids_b, 0), axis=1))
        scores = jnp.where(onehot, -jnp.inf, scores)
    out_v_ref[0] = jnp.stack(vals, axis=1)
    out_i_ref[0] = jnp.stack(hit_ids, axis=1)


def ivf_score_topk(blocks, block_ids, block_scales, slot_keys, qg, *,
                   k_out: int, interpret: bool | None = None):
    """Fused scoring + per-slot top-k: returns (vals f32[S, cap, k_out],
    ids int32[S, cap, k_out]) with -inf / -1 padding.  ``interpret``
    defaults to True off-TPU so CPU tests exercise the same path."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _ivf_score_topk(blocks, block_ids, block_scales, slot_keys, qg,
                           k_out=k_out, interpret=interpret)


@partial(jax.jit, static_argnames=("k_out", "interpret"))
def _ivf_score_topk(
    blocks: jax.Array,  # bf16|f32|i8[k, L, d]
    block_ids: jax.Array,  # int32[k, L] element ids, -1 padding
    block_scales: jax.Array,  # f32[k, L]
    slot_keys: jax.Array,  # int32[S] cluster id per slot (clamped, >= 0)
    qg: jax.Array,  # [S, cap, d] per-slot query group
    *,
    k_out: int,
    interpret: bool = False,
):
    k, L, d = blocks.shape
    S, cap, _ = qg.shape
    Kp = min(k_out, L)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, L, d), lambda s, keys: (keys[s], 0, 0)),
            pl.BlockSpec((1, 1, L), lambda s, keys: (keys[s], 0, 0)),
            pl.BlockSpec((1, 1, L), lambda s, keys: (keys[s], 0, 0)),
            pl.BlockSpec((1, cap, d), lambda s, keys: (s, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, cap, Kp), lambda s, keys: (s, 0, 0)),
            pl.BlockSpec((1, cap, Kp), lambda s, keys: (s, 0, 0)),
        ],
    )
    fn = pl.pallas_call(
        _kernel_topk,
        out_shape=[
            jax.ShapeDtypeStruct((S, cap, Kp), jnp.float32),
            jax.ShapeDtypeStruct((S, cap, Kp), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )
    vals, ids = fn(slot_keys, blocks, block_ids.reshape(k, 1, L),
                   block_scales.reshape(k, 1, L), qg)
    ids = jnp.where(vals > -jnp.inf, ids, -1)
    if Kp < k_out:
        pv = jnp.full((S, cap, k_out - Kp), -jnp.inf, jnp.float32)
        pi = jnp.full((S, cap, k_out - Kp), -1, jnp.int32)
        vals = jnp.concatenate([vals, pv], axis=2)
        ids = jnp.concatenate([ids, pi], axis=2)
    return vals, ids


def supported() -> bool:
    """Opt-in (GT_PALLAS_IVF=1) and TPU-only.

    Measured on v5e (BASELINE.md): BOTH the single-slot kernel and the
    grouped double-buffered-DMA kernel land within ±6% of XLA's
    gather+einsum for the raw scoring (every formulation is DMA-limited at
    the same effective bandwidth) and LOSE end-to-end — so plain scoring
    stays on XLA.  The kernel that wins is ``ivf_score_topk`` (score +
    in-kernel top-k fusion), which has its own gate.
    """
    import os

    if os.environ.get("GT_PALLAS_IVF") != "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def topk_supported() -> bool:
    """The fused score+top-k kernel: opt-in (GT_PALLAS_IVF_TOPK=1), TPU-only.

    Although it avoids materializing the [S, cap, L] score tensor in HBM
    (a fusion XLA cannot do through a sort), the unrolled per-slot top-k
    serializes on the VPU across the S-step grid and measured SLOWER
    end-to-end on v5e (0.45-0.73x, BASELINE.md).  Kept opt-in."""
    import os

    if os.environ.get("GT_PALLAS_IVF_TOPK") != "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
