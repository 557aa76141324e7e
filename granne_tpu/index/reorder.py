"""Locality reordering of a built index.

Reference parity: ``/root/reference/src/index/reorder.rs`` — reorder index
ids so graph-close elements get close ids (better page/cache locality for
the mmap/host serving path; on TPU it also tightens HBM gather locality and
is the basis for host-DRAM tiering).  The reference's key is the
"entrypoint trail": the nearest node id in each of the upper layers
(``find_entrypoint_trail`` :177-207), with a layer-respecting sort
(``compute_order`` :127-174) so each layer remains an id-prefix, then
adjacency rewrite through the mapping (``reorder_layers`` :209-278) and an
element permutation.

TPU redesign: the per-element trails are computed with the *batched* ef=1
descent kernel over all elements at once; the sort and adjacency rewrite
are vectorized numpy on host (they are one-off O(n log n) transforms).

Returns the permutation ``order`` with ``order[new_id] = old_id`` so callers
can translate previously stored ids (same contract as the reference's
doctest, reorder.rs:19-57).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import frontier
from .graph import LayerStack

MAX_TRAIL = 8  # reference caps the trail at 8 upper layers (reorder.rs:142-158)


@partial(jax.jit, static_argnames=("n", "batch"))
def _trails_device(upper: tuple, elements, *, n: int, batch: int) -> jax.Array:
    """All elements' ef=1 descent trails in ONE dispatch.

    An on-device ``fori_loop`` over element batches (the ``waves_while``
    pattern): the host loop it replaces paid ~3 ms of tunnel latency per
    batch per layer — hours at 10M-100M elements, for a transform whose
    whole point is large-scale locality.  Returns int32[n, L]."""
    L = len(upper)
    n_b = -(-n // batch)
    trails = jnp.zeros((n_b * batch, L), jnp.int32)
    offs = jnp.arange(batch, dtype=jnp.int32)

    def body(w, trails):
        ids = jnp.minimum(w * batch + offs, n - 1)
        q = elements.queries_from_ids(ids)
        ep = jnp.zeros((batch,), jnp.int32)
        cols = []
        for adj in upper:  # static unroll: <= MAX_TRAIL layers
            r, _ = frontier.beam_search(adj, elements, q, ep, ef=1, expand=1)
            ep = jnp.where(r[:, 0] >= 0, r[:, 0], ep)
            cols.append(ep)
        return jax.lax.dynamic_update_slice(trails, jnp.stack(cols, axis=1), (w * batch, 0))

    return jax.lax.fori_loop(0, n_b, body, trails)[:n]


def _entrypoint_trails(layers: LayerStack, elements, batch: int = 1024) -> np.ndarray:
    """For each element, the ef=1 descent trail through the upper layers."""
    n = layers.num_elements
    upper = tuple(layers.layers[:-1][-MAX_TRAIL:])
    if len(upper) == 0:
        return np.zeros((n, 0), np.int32)
    return np.asarray(_trails_device(upper, elements, n=n, batch=min(batch, n)))


def compute_order(layers: LayerStack, elements) -> np.ndarray:
    """Layer-respecting locality order; order[new_id] = old_id."""
    n = layers.num_elements
    counts = list(layers.counts)
    trails = _entrypoint_trails(layers, elements)
    order = np.empty(n, np.int64)
    prev = 0
    for count in counts:
        band = np.arange(prev, count)
        if len(band):
            # np.lexsort's PRIMARY key is the LAST column: most-significant
            # trail entry (the topmost layer, trails[:, 0]) goes last, the
            # old id goes first as the final tiebreak.
            key_cols = [band] + [trails[band, li] for li in reversed(range(trails.shape[1]))]
            order[prev:count] = band[np.lexsort(key_cols)]
        prev = count
    return order


def order_by_keys(layers: LayerStack, keys: np.ndarray) -> np.ndarray:
    """Layer-respecting stable sort over external per-element keys.

    Mirrors ``reorder_by_keys``'s ordering (reorder.rs:90-125): within each
    layer band (so every layer stays an id-prefix) elements are sorted by
    their key, ties broken by old id.  ``keys`` is [n] or [n, K] (K columns
    compared left-to-right, e.g. ``embeddings.reorder_keys`` output).
    Returns ``order`` with ``order[new_id] = old_id``.
    """
    keys = np.asarray(keys)
    if keys.ndim == 1:
        keys = keys[:, None]
    n = layers.num_elements
    if keys.shape[0] != n:
        raise ValueError(f"need one key per element ({n}), got {keys.shape[0]}")
    order = np.empty(n, np.int64)
    prev = 0
    for count in layers.counts:
        band = np.arange(prev, count)
        if len(band):
            # lexsort primary key is the LAST column: keys[:, 0] is the
            # most significant, old id the final tiebreak.
            cols = [band] + [keys[band, c] for c in reversed(range(keys.shape[1]))]
            order[prev:count] = band[np.lexsort(cols)]
        prev = count
    return order


def reorder_by_keys(layers: LayerStack, elements, keys: np.ndarray):
    """Reorder a built index by external keys (reorder.rs:90-125).

    The reference doctest workflow (embeddings/reorder.rs:6-25):
    ``keys = embeddings.reorder_keys(container); reorder_by_keys(...)``.
    Returns (layers, elements, order) with ``order[new_id] = old_id``.
    """
    return reorder_index(layers, elements, order_by_keys(layers, keys))


def reorder_index(layers: LayerStack, elements, order: np.ndarray | None = None):
    """Reorder ids of a built index; returns (layers, elements, order).

    ``order[new_id] = old_id``.  Mirrors ``Granne::reorder`` (reorder.rs:59-82)
    and ``reorder_by_keys`` when ``order`` is supplied externally (:90-125).
    """
    n = layers.num_elements
    if order is None:
        order = compute_order(layers, elements)
    order = np.asarray(order, np.int64)
    if order.shape != (n,) or not np.array_equal(np.sort(order), np.arange(n)):
        raise ValueError("order must be a permutation of 0..n")
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)

    new_arrays = []
    for arr, count in zip(layers.as_numpy(), layers.counts):
        # new row r = remap(old row of order[r]) — reorder.rs:209-278
        old_rows = arr[order[:count]]
        remapped = np.where(old_rows >= 0, inv[np.clip(old_rows, 0, n - 1)], -1).astype(np.int32)
        new_arrays.append(remapped)

    new_layers = LayerStack.from_numpy(new_arrays)
    new_elements = elements.permute(order)
    return new_layers, new_elements, order
