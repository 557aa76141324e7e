"""Host (CPU) serving path: scalar HNSW search over mmapped artifacts.

Reference parity: granne's primary deployment mode — mmap the index +
elements and serve queries from CPU processes (``src/lib.rs:16-23``,
compressed layer decoding per visited node ``src/index/mod.rs:554-562``).
This wrapper serves the SAME files written by ``index/io.py``: compressed
layers are searched in place (per-row StreamVByte decode in C++, exactly
the reference's access pattern), dense layers via the dense scalar loop.

Also the measured "single-core granne" baseline for bench.py.
"""

from __future__ import annotations

import ctypes

import numpy as np

from . import get_lib
from ..index import io as gio


class HostGranne:
    """CPU-served index over files written by ``save_index``/``save_elements``."""

    def __init__(self, index_path: str, elements_path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable (no C++ toolchain)")
        self._lib = lib
        meta = gio.read_index_metadata(index_path)
        elements = gio.load_elements(elements_path)  # memory-mapped
        from ..elements.angular import AngularVectors

        if not isinstance(elements, AngularVectors):
            raise TypeError("HostGranne currently serves f32 angular elements")
        self._vectors = np.ascontiguousarray(np.asarray(elements.vectors, np.float32))
        self.num_layers = meta["num_layers"]
        self.num_elements = meta["num_elements"]
        self._compressed = bool(meta.get("compressed"))
        if self._compressed:
            # keep raw per-layer buffers; C++ decodes rows on access
            self._buffers = []
            with open(index_path, "rb") as f:
                f.seek(gio.METADATA_LEN)
                for size in meta["layer_sizes"]:
                    self._buffers.append(np.frombuffer(f.read(size), np.uint8))
        else:
            stack = gio.load_index(index_path)
            self._arrays = [np.ascontiguousarray(a) for a in stack.as_numpy()]
            self._width = meta["num_neighbors"]

    def search_batch(
        self, queries, max_search: int = 200, num_neighbors: int = 10, num_threads: int = 1
    ):
        from ..ops import distance as D
        import jax.numpy as jnp

        q = np.ascontiguousarray(np.asarray(D.normalize(jnp.asarray(queries, jnp.float32))))
        nq = q.shape[0]
        k = num_neighbors
        out_ids = np.empty((nq, k), np.int32)
        out_d = np.empty((nq, k), np.float32)
        n, d = self._vectors.shape
        if self._compressed:
            ptrs = (ctypes.c_void_p * len(self._buffers))(
                *[b.ctypes.data_as(ctypes.c_void_p).value for b in self._buffers]
            )
            lens = np.asarray([len(b) for b in self._buffers], np.uint64)
            self._lib.gt_search_compressed(
                self._vectors.ctypes.data_as(ctypes.c_void_p), n, d,
                ctypes.cast(ptrs, ctypes.c_void_p),
                lens.ctypes.data_as(ctypes.c_void_p),
                len(self._buffers),
                q.ctypes.data_as(ctypes.c_void_p), nq,
                max_search, k, num_threads,
                out_ids.ctypes.data_as(ctypes.c_void_p),
                out_d.ctypes.data_as(ctypes.c_void_p),
            )
        else:
            ptrs = (ctypes.c_void_p * len(self._arrays))(
                *[a.ctypes.data_as(ctypes.c_void_p).value for a in self._arrays]
            )
            self._lib.gt_search_f32(
                self._vectors.ctypes.data_as(ctypes.c_void_p), n, d,
                ctypes.cast(ptrs, ctypes.c_void_p), len(self._arrays), self._width,
                q.ctypes.data_as(ctypes.c_void_p), nq,
                max_search, k, num_threads,
                out_ids.ctypes.data_as(ctypes.c_void_p),
                out_d.ctypes.data_as(ctypes.c_void_p),
            )
        return out_ids, out_d

    def search(self, element, max_search: int = 200, num_neighbors: int = 10):
        ids, d = self.search_batch(np.asarray(element)[None], max_search, num_neighbors)
        return [(int(i), float(x)) for i, x in zip(ids[0], d[0]) if i >= 0]
