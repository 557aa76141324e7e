"""Concurrent build + serve: the extensible online index.

Reference parity: ``RwGranneBuilder`` (``/root/reference/src/index/rw/``) —
insert elements into a live index while serving searches.  The reference
needs a lock-downgrade dance plus an unsafe self-borrowing RwLock slice
(``rw_lock_slice_vector.rs``); here immutability does the work: the index
state (layer stack + elements) is a functional snapshot swapped atomically
under a small mutex, searches run lock-free on whatever snapshot they
grabbed, and inserts batch into waves through the same resumable builder
that powers ``build_partial`` (append-after-build is the reference's
extensible-index story, ``src/index/tests.rs:503-566``).
"""

from __future__ import annotations

import threading
from typing import Optional

import numpy as np

from .builder import BuildConfig, build_layers
from .granne import Granne
from .graph import LayerStack


class RwGranneBuilder:
    """Thread-safe online index: concurrent ``insert``/``search``/``write``."""

    def __init__(self, elements, config: Optional[BuildConfig] = None, **config_kwargs):
        self.config = config if config is not None else BuildConfig(**config_kwargs)
        layers = build_layers(elements, self.config) if len(elements) else LayerStack((), ())
        self._snapshot = Granne(layers=layers, elements=elements)
        self._pending: list[np.ndarray] = []
        self._mutex = threading.Lock()
        self._write_lock = threading.Lock()  # blocks inserts during save (rw/mod.rs:70-97)

    # -- serving -----------------------------------------------------------

    def get_index(self) -> Granne:
        """Lock-free consistent snapshot."""
        return self._snapshot

    def search(self, element, max_search: int = 200, num_neighbors: int = 20):
        return self._snapshot.search(element, max_search, num_neighbors)

    def search_batch(self, queries, max_search: int = 200, num_neighbors: int = 20):
        return self._snapshot.search_batch(queries, max_search, num_neighbors)

    def __len__(self) -> int:
        return len(self._snapshot.elements)

    @property
    def indexed_elements(self) -> int:
        return len(self._snapshot)

    # -- inserting ---------------------------------------------------------

    def insert(self, vector) -> None:
        self.insert_batch(np.asarray(vector, np.float32)[None, :])

    def insert_batch(self, vectors) -> None:
        """Append elements and index them (rw/mod.rs:103-182).

        Batches accumulate until ``config.wave_size`` then flush; call
        ``flush()`` to force indexing of a partial wave.
        """
        vectors = np.asarray(vectors, np.float32)
        with self._write_lock:
            with self._mutex:
                self._pending.append(vectors)
                total = sum(p.shape[0] for p in self._pending)
            if total >= self.config.wave_size:
                self.flush()

    def flush(self) -> None:
        """Index all pending elements and swap in the new snapshot."""
        with self._mutex:
            if not self._pending:
                return
            batch = np.concatenate(self._pending, axis=0)
            self._pending = []
            snap = self._snapshot
        elements = snap.elements.extend(batch)
        layers = build_layers(
            elements,
            self.config,
            state=snap.layers if len(snap.layers) else None,
        )
        with self._mutex:
            self._snapshot = Granne(layers=layers, elements=elements)

    # -- persistence (rw/mod.rs:70-97) ------------------------------------

    def save(self, index_path: str, elements_path: str, compressed: bool = True) -> None:
        from . import io as gio

        with self._write_lock:  # block concurrent inserts, snapshot is safe
            self.flush()
            snap = self._snapshot
            gio.save_index(snap.layers, index_path, compressed=compressed)
            gio.save_elements(snap.elements, elements_path)
