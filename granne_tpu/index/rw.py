"""Concurrent build + serve: the extensible online index.

Reference parity: ``RwGranneBuilder`` (``/root/reference/src/index/rw/``) —
insert elements into a live index while serving searches; inserted elements
are searchable as soon as ``insert``/``insert_batch`` returns
(``rw/mod.rs:99-182``, stress-asserted at ``:231-258``).  The reference
needs a lock-downgrade dance plus an unsafe self-borrowing RwLock slice
(``rw_lock_slice_vector.rs``); here immutability does the work:

* the graph state (layer stack + elements) is a functional snapshot swapped
  atomically under a small mutex — searches run lock-free on whatever
  snapshot they grabbed;
* inserts land in a *pending tail* that is searched exactly (a brute-force
  scan merged into every search result) until the next wave flush indexes
  it through the same resumable builder that powers ``build_partial``
  (append-after-build is the reference's extensible-index story,
  ``src/index/tests.rs:503-566``).  The tail is at most ``wave_size``
  elements plus whatever arrives during a flush, so the exact scan is a
  few fused batched distance rows — cheap next to the beam search;
* flushes are serialized under a build lock (two concurrent flushes would
  otherwise each build from the same base snapshot and the second swap
  would drop the first's layers); the pending tail stays visible *during*
  a flush and is trimmed only after the new snapshot swaps in, so there is
  no window where an inserted element is unfindable.
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
        self._mutex = threading.Lock()  # guards snapshot + pending list
        self._build_lock = threading.Lock()  # serializes flush builds
        self._write_lock = threading.Lock()  # blocks inserts during save (rw/mod.rs:70-97)

    # -- serving -----------------------------------------------------------

    def get_index(self) -> Granne:
        """Lock-free consistent snapshot of the *indexed* graph (excludes
        the pending tail; ``flush()`` first for a complete index)."""
        return self._snapshot

    def _state(self):
        with self._mutex:
            snap = self._snapshot
            pend = list(self._pending)
        tail = np.concatenate(pend, axis=0) if pend else None
        return snap, tail

    def search(self, element, max_search: int = 200, num_neighbors: int = 20):
        q = np.asarray(element, np.float32)[None, :]
        ids, d = self.search_batch(q, max_search, num_neighbors)
        ids, d = np.asarray(ids[0]), np.asarray(d[0])
        return [(int(i), float(x)) for i, x in zip(ids, d) if i >= 0]

    def search_batch(self, queries, max_search: int = 200, num_neighbors: int = 20):
        """Search the snapshot AND the pending tail (exact scan), merged.

        Matches the reference's visibility contract: an element is findable
        the moment its ``insert_batch`` returned (rw/mod.rs:99-182).
        """
        import jax.numpy as jnp

        from ..ops.topk import merge_topk

        snap, tail = self._state()
        ids, d = snap.search_batch(queries, max_search, num_neighbors)
        if tail is None:
            return ids, d
        tc = type(snap.elements).from_raw(tail)
        q = tc.prepare_queries(jnp.asarray(queries, jnp.float32))
        B, P = ids.shape[0], len(tc)
        tid = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32), (B, P))
        td = tc.dist_ids_to_queries(tid, q)
        base = jnp.int32(len(snap.elements))
        d, (ids,) = merge_topk(d, td, (ids,), (base + tid,), num_neighbors)
        return ids, d

    def __len__(self) -> int:
        """Total elements, indexed or pending (all are searchable)."""
        with self._mutex:
            return len(self._snapshot.elements) + sum(p.shape[0] for p in self._pending)

    @property
    def indexed_elements(self) -> int:
        return len(self._snapshot)

    # -- inserting ---------------------------------------------------------

    def insert(self, vector) -> None:
        self.insert_batch(np.asarray(vector, np.float32)[None, :])

    def insert_batch(self, vectors) -> None:
        """Append elements; they are searchable when this returns
        (rw/mod.rs:103-182).

        Elements enter the pending tail immediately (searched exactly) and
        graduate into the graph when ``wave_size`` accumulate or ``flush()``
        is called.
        """
        vectors = np.asarray(vectors, np.float32)
        with self._write_lock:
            with self._mutex:
                self._pending.append(vectors)
                total = sum(p.shape[0] for p in self._pending)
            if total >= self.config.wave_size:
                self.flush()

    def flush(self) -> None:
        """Index all pending elements and swap in the new snapshot.

        Serialized under ``_build_lock``; pending elements remain visible
        through the tail scan until the swap, so searches never lose them.
        """
        with self._build_lock:
            with self._mutex:
                if not self._pending:
                    return
                chunks = list(self._pending)
                snap = self._snapshot
            batch = np.concatenate(chunks, axis=0)
            elements = snap.elements.extend(batch)
            layers = build_layers(
                elements,
                self.config,
                state=snap.layers if len(snap.layers) else None,
            )
            with self._mutex:
                self._snapshot = Granne(layers=layers, elements=elements)
                del self._pending[: len(chunks)]

    # -- persistence (rw/mod.rs:70-97) ------------------------------------

    def save(self, index_path: str, elements_path: str, compressed: bool = True) -> None:
        from . import io as gio

        with self._write_lock:  # block concurrent inserts, snapshot is safe
            self.flush()
            snap = self._snapshot
            gio.save_index(snap.layers, index_path, compressed=compressed)
            gio.save_elements(snap.elements, elements_path)
