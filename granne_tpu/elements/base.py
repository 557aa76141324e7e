"""Element-container protocol.

Reference parity: the ``ElementContainer`` / ``ExtendableElementContainer`` /
``Permutable`` traits at ``/root/reference/src/elements/mod.rs:17-70``.  The
TPU redesign replaces the per-pair ``dist_to_element`` call with *batched*
distance methods that the frontier search and the select-neighbors heuristic
drive as dense gathers + contractions.

Every concrete container is a frozen dataclass registered as a JAX pytree so
it can flow straight through ``jit`` / ``shard_map``.  Mutation (``push`` /
``permute``) is functional: it returns a new container.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import jax


@runtime_checkable
class ElementContainer(Protocol):
    """Batched analogue of ``ElementContainer`` (``elements/mod.rs:17-45``)."""

    def __len__(self) -> int: ...

    @property
    def dim(self) -> int: ...

    def get(self, ids: jax.Array) -> jax.Array:
        """Gather element vectors (in container-native dtype) for any id shape."""
        ...

    def prepare_queries(self, raw: jax.Array):
        """Convert raw f32 queries [B, d] into a container-native query batch.

        Returns an opaque query object consumed by the dist methods (for f32:
        normalized vectors; for i8: quantized vectors + inv-norms).
        """
        ...

    def dist_ids_to_queries(self, ids: jax.Array, queries) -> jax.Array:
        """dist(element[ids[b, c]], query[b]) -> f32[B, C]."""
        ...

    def pairwise_from_ids(self, ids: jax.Array) -> jax.Array:
        """dist(element[ids[b, i]], element[ids[b, j]]) -> f32[B, C, C]."""
        ...

    def queries_from_ids(self, ids: jax.Array):
        """Make a query batch out of stored elements (self-query / build)."""
        ...

    def self_dist(self, ids: jax.Array) -> jax.Array:
        """dist(element[i], element[i]) — nonzero only for zero vectors.

        Used for the reference's zero-element skip rule
        (``src/index/mod.rs:812-814``).
        """
        ...

    def permute(self, order) -> "ElementContainer":
        """Return a container with rows reordered (``elements/mod.rs:58-61``)."""
        ...
