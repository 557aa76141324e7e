"""Sort-and-segment grouping: the TPU-native replacement for hash-grouping.

Used by the IVF cluster-centric scorer (group (query, cluster) pairs by
cluster) and conceptually mirrors the builder's reverse-edge resolution.
Items sharing a key are packed into fixed-capacity slot buffers; a segment
longer than ``cap`` spills into additional slots for the same key (so hot
keys degrade gracefully instead of dropping items).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = jnp.iinfo(jnp.int32).max


@partial(jax.jit, static_argnames=("cap", "num_slots"))
def group_pairs(keys: jax.Array, values: jax.Array, *, cap: int, num_slots: int):
    """Group ``values`` by ``keys`` into [num_slots, cap] buffers.

    keys/values: int32[P]; invalid items have key < 0.

    Returns:
      slot_keys: int32[num_slots] key of each slot (-1 unused)
      slot_values: int32[num_slots, cap] (-1 padding)
      item_slot, item_pos: int32[P] location of each *sorted* item (-1 dropped)
      sorted_values, sorted_keys: int32[P] the sorted items (key sentinel for
        invalid items is INT32_MAX)
    """
    P = keys.shape[0]
    k = jnp.where(keys >= 0, keys, _BIG)
    sk, sv = jax.lax.sort((k, values), dimension=0, num_keys=1, is_stable=True)
    valid = sk != _BIG
    pos = jnp.arange(P, dtype=jnp.int32)
    seg_head = jnp.concatenate([valid[:1], (sk[1:] != sk[:-1]) & valid[1:]])
    seg_start = jax.lax.cummax(jnp.where(seg_head, pos, -1))
    seg_rank = pos - seg_start
    # spill: a new slot every `cap` items within a segment
    head = jnp.logical_and(valid, jnp.logical_or(seg_head, seg_rank % cap == 0))
    slot = jnp.cumsum(head.astype(jnp.int32)) - 1
    in_slot = seg_rank % cap

    ok = jnp.logical_and(valid, slot < num_slots)
    row = jnp.where(ok, slot, num_slots)
    col = jnp.where(ok, in_slot, 0)
    slot_keys = (
        jnp.full((num_slots,), -1, jnp.int32)
        .at[jnp.where(head & ok, slot, num_slots)]
        .set(sk, mode="drop")
    )
    slot_values = (
        jnp.full((num_slots, cap), -1, jnp.int32).at[row, col].set(sv, mode="drop")
    )
    item_slot = jnp.where(ok, slot, -1)
    return slot_keys, slot_values, item_slot, in_slot, sv, sk
