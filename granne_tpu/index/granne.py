"""Query-side index: the ``Granne`` equivalent.

Reference parity: ``Granne`` at ``/root/reference/src/index/mod.rs:38-150``
(``search`` :140-150, ``search_internal`` :963-982, introspection
``get_neighbors``/``layer_len``/``num_layers`` :54-98).

The TPU redesign serves *batches*: ``search`` takes [B, d] queries and runs
the batched frontier kernel; a single-query convenience path wraps it.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import frontier
from .graph import LayerStack


@dataclass(frozen=True)
class Granne:
    """An immutable searchable index: layer stack + element container.

    ``nbr_vecs`` (optional, see ``with_neighbor_cache``) is a bottom-layer
    neighbor-vector cache (``ops.nbr_cache``): serving then issues one
    contiguous row gather per expanded beam node instead of M scattered
    vector gathers.  Costs ``n * pad128(M*d) * 2`` bytes of HBM.
    """

    layers: LayerStack
    elements: object  # ElementContainer
    nbr_vecs: object = None

    def with_neighbor_cache(self, layout: str = "flat") -> "Granne":
        """Return a copy serving through a bottom-layer vector cache.

        ``layout``: "flat" (XLA gather+einsum scoring) or "tiled" (the
        Pallas fused-DMA scorer, ops/pallas/nbr_score; requires d <= 128).
        """
        from ..ops.nbr_cache import make_neighbor_cache, supports_cache

        if not supports_cache(self.elements):
            raise ValueError(
                f"{type(self.elements).__name__} has no cache_rows/score_block"
            )
        tab = make_neighbor_cache(
            self.layers.layers[-1],
            self.elements,
            rows=self.layers.num_elements,
            layout=layout,
        )
        return Granne(layers=self.layers, elements=self.elements, nbr_vecs=tab)

    # -- persistence (Granne::save_index/save_elements, py/src/lib.rs:325-345)

    def save_index(self, path: str, compressed: bool = True) -> None:
        from . import io as gio

        gio.save_index(self.layers, path, compressed=compressed)

    def save_elements(self, path: str) -> None:
        from . import io as gio

        gio.save_elements(self.elements, path)

    # -- introspection (Index trait, mod.rs:54-98) -------------------------

    def __len__(self) -> int:
        return self.layers.num_elements

    @property
    def num_layers(self) -> int:
        return len(self.layers)

    def layer_len(self, layer: int) -> int:
        return self.layers.layer_len(layer)

    def get_neighbors(self, index: int, layer: int) -> list[int]:
        return self.layers.get_neighbors(layer, index)

    def _check_element_index(self, index: int) -> None:
        n = len(self.elements)
        if not 0 <= index < n:
            raise IndexError(f"element index {index} out of range [0, {n})")

    def get_element(self, index: int):
        self._check_element_index(index)
        return np.asarray(self.elements.get(jnp.asarray([index], jnp.int32))[0])

    def get_internal_element(self, index: int):
        """The element's internal representation (py/src/lib.rs:255-258).

        For dense containers this equals ``get_element``; SumEmbeddings
        containers return the element's term-id list (the stored form),
        mirroring the reference's embeddings variant
        (py/src/variants/index.rs:116-121, minus the word lookup which
        lives in ``api.WordEmbeddingsGranne``).
        """
        self._check_element_index(index)
        get_terms = getattr(self.elements, "get_terms", None)
        if get_terms is not None:
            return get_terms(index)
        return np.asarray(self.elements.get(jnp.asarray([index], jnp.int32))[0])

    # -- search ------------------------------------------------------------

    def search_batch(
        self,
        queries,
        max_search: int = 200,
        num_neighbors: int = 20,
        *,
        expand: int = 1,
        max_iters: int | None = None,
    ):
        """Batched search: raw f32 [B, d] queries -> (ids, dists) [B, k].

        Mirrors ``Granne::search`` (mod.rs:140-150) over a whole batch.
        """
        q = self.elements.prepare_queries(jnp.asarray(queries, jnp.float32))
        ids, d = frontier.search_layers(
            self.layers.layers,
            self.elements,
            q,
            ef=max_search,
            num_neighbors=num_neighbors,
            expand=expand,
            max_iters=max_iters,
            nbr_vecs=self.nbr_vecs,
        )
        return ids, d

    def search(self, element, max_search: int = 200, num_neighbors: int = 20):
        """Single-query search returning [(id, dist)] like the reference."""
        q = jnp.asarray(element, jnp.float32)[None, :]
        ids, d = self.search_batch(q, max_search, num_neighbors)
        ids = np.asarray(ids[0])
        d = np.asarray(d[0])
        return [(int(i), float(x)) for i, x in zip(ids, d) if i >= 0]

    # -- reordering (Granne::reorder, src/index/reorder.rs:59-82) ----------

    def reorder(self, order=None):
        """Return (reordered index, order) with ``order[new_id] = old_id``.

        With ``order=None`` computes the entrypoint-trail locality order;
        passing an explicit permutation mirrors ``reorder_by_keys``.
        """
        from .reorder import reorder_index

        new_layers, new_elements, order = reorder_index(self.layers, self.elements, order)
        return Granne(layers=new_layers, elements=new_elements), order

    def reorder_by_keys(self, keys):
        """Reorder by external per-element sort keys (reorder.rs:90-125).

        ``keys`` is [n] or [n, K]; for SumEmbeddings use
        ``elements.embeddings.reorder_keys(container)`` (the reference's
        ``compute_keys_for_reordering`` doctest, embeddings/reorder.rs:6-25).
        Returns (reordered index, order) with ``order[new_id] = old_id``.
        """
        from .reorder import reorder_by_keys

        new_layers, new_elements, order = reorder_by_keys(self.layers, self.elements, keys)
        return Granne(layers=new_layers, elements=new_elements), order
