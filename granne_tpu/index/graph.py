"""Dense layer-stack graph representation.

Reference parity: the ``Layers`` enum and per-layer adjacency storage at
``/root/reference/src/index/mod.rs:535-625``.  The reference stores each
layer as fixed-width u32 rows (build) or StreamVByte-compressed rows (mmap
serve); the TPU-native in-memory representation is ONE dense
``int32[n_rows, M]`` tensor per layer in HBM, padded with ``UNUSED = -1``
(replacing the ``UNUSED = u32::MAX`` sentinel, ``mod.rs:27-28``).
Compression remains a *disk* concern (see ``index/io.py`` and the native
codec).

Row counts are padded up to power-of-two buckets so recompilation is
amortized across waves/builds of different sizes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

UNUSED = -1


def pad_rows(n: int, minimum: int = 8) -> int:
    """Bucket a row count: powers of two, with half-steps above 2M rows.

    Pure powers of two keep the compile cache small, but waste up to 2x
    the rows — and XLA:TPU lays s32[n, M] out in (8, 128) tiles, padding
    M=20 lanes to 128 (a 6.4x byte tax), so at 10M elements the pow2
    bucket (16.8M rows) costs 8.6 GB of HBM for 0.8 GB of ids (measured
    OOM, round 5).  Above 2^21 rows the buckets therefore include
    1.5 * 2^k half-steps: waste <= 33%, one extra compile shape per
    octave.  (The lane-padding tax itself is a layout property of dense
    [n, M] adjacency — the trade for single-descriptor row gathers.)
    """
    n = max(int(n), minimum)
    p = 1 << (n - 1).bit_length()
    if n > (1 << 21) and 3 * (p >> 2) >= n:
        return 3 * (p >> 2)
    return p


def empty_layer(n_rows: int, width: int) -> jax.Array:
    return jnp.full((pad_rows(n_rows), width), UNUSED, jnp.int32)


def grow_layer(adj: jax.Array, n_rows: int) -> jax.Array:
    """Return adjacency with at least ``n_rows`` row capacity (UNUSED fill)."""
    target = pad_rows(n_rows)
    if adj.shape[0] >= target:
        return adj
    pad = jnp.full((target - adj.shape[0], adj.shape[1]), UNUSED, jnp.int32)
    return jnp.concatenate([adj, pad], axis=0)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LayerStack:
    """A stack of adjacency tensors, top (smallest) layer first.

    ``counts`` are the true per-layer element counts (static metadata);
    tensor rows beyond a layer's count are UNUSED padding.
    """

    layers: tuple  # tuple[jax.Array int32[rows_l, M], ...]
    counts: tuple = field(metadata=dict(static=True))  # tuple[int, ...]

    def __len__(self) -> int:
        return len(self.layers)

    @property
    def num_elements(self) -> int:
        return self.counts[-1] if self.counts else 0

    @property
    def num_neighbors(self) -> int:
        return int(self.layers[0].shape[1]) if self.layers else 0

    def layer_len(self, i: int) -> int:
        return self.counts[i]

    def get_neighbors(self, layer: int, idx: int) -> list[int]:
        """Introspection helper (reference ``Index::get_neighbors``,
        src/index/mod.rs:54-98)."""
        row = np.asarray(self.layers[layer][idx])
        return [int(x) for x in row if x >= 0]

    def as_numpy(self) -> list[np.ndarray]:
        """Per-layer dense adjacency trimmed to true counts."""
        return [np.asarray(a[:c]) for a, c in zip(self.layers, self.counts)]

    @classmethod
    def from_numpy(cls, arrays: list[np.ndarray]) -> "LayerStack":
        layers = []
        counts = []
        for a in arrays:
            a = np.asarray(a, np.int32)
            counts.append(a.shape[0])
            padded = np.full((pad_rows(a.shape[0]), a.shape[1]), UNUSED, np.int32)
            padded[: a.shape[0]] = a
            layers.append(jnp.asarray(padded))
        return cls(layers=tuple(layers), counts=tuple(counts))
