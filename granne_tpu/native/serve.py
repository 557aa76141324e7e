"""Host (CPU) serving path: scalar HNSW search over mmapped artifacts.

Reference parity: granne's primary deployment mode — mmap the index +
elements and serve queries from CPU processes (``src/lib.rs:16-23``,
compressed layer decoding per visited node ``src/index/mod.rs:554-562``).
This wrapper serves the SAME files written by ``index/io.py``:

* layers are served **in place from the memory-mapped file** (no upfront
  read — the reference's ``FileOrMemoryLayers::File`` behavior,
  ``src/index/mod.rs:122-135``): compressed layers decode each visited row
  on the fly in C++ (with chunk-compressed row offsets, the ``offsets.rs``
  design), dense layers go through the dense scalar loop;
* elements may be f32 angular or int8 quantized (``angular_int.rs:47-60``),
  both memory-mapped.

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
        emeta = gio.read_elements_metadata(elements_path)
        self._elem_kind = emeta["type"]
        n, d = emeta["count"], emeta["dim"]
        if self._elem_kind == "angular":
            self._vectors = np.memmap(
                elements_path, dtype="<f4", mode="r", offset=gio.METADATA_LEN, shape=(n, d)
            )
            gio._madvise_random(self._vectors)
            self._inv_norms = None
        elif self._elem_kind == "angular_int":
            self._vectors = np.memmap(
                elements_path, dtype="i1", mode="r", offset=gio.METADATA_LEN, shape=(n, d)
            )
            gio._madvise_random(self._vectors)
            v32 = np.asarray(self._vectors, np.int32)
            norms = np.sqrt(np.sum(v32 * v32, axis=1).astype(np.float32))
            self._inv_norms = np.where(norms > 0.0, 1.0 / np.where(norms > 0.0, norms, 1.0), 0.0).astype(np.float32)
        else:
            raise TypeError(
                f"HostGranne serves f32 angular or int8 elements, not {self._elem_kind!r}"
            )
        self.num_layers = meta["num_layers"]
        self.num_elements = meta["num_elements"]
        self._compressed = bool(meta.get("compressed"))
        # serve layers straight from the mapped file, advised for random
        # access (mod.rs:122-135 — mmap + madvise(Random))
        self._mmaps = []
        offset = gio.METADATA_LEN
        for count, size in zip(meta["layer_counts"], meta["layer_sizes"]):
            buf = np.memmap(index_path, dtype=np.uint8, mode="r", offset=offset, shape=(size,))
            gio._madvise_random(buf)
            self._mmaps.append(buf)
            offset += size
        if self._compressed:
            self._buffers = self._mmaps
        else:
            m = meta["num_neighbors"]
            self._arrays = [
                buf.view("<i4").reshape(count, m)
                for buf, count in zip(self._mmaps, meta["layer_counts"])
            ]
            self._width = m

    def _prepare_queries(self, queries):
        """Normalize/quantize queries to match the element space."""
        q = np.asarray(queries, np.float32)
        if self._elem_kind == "angular":
            norms = np.sqrt(np.sum(q * q, axis=1, keepdims=True))
            q = np.where(norms > 0.0, q / np.where(norms > 0.0, norms, 1.0), q)
            return np.ascontiguousarray(q), None
        # max-abs quantize the raw queries, matching
        # AngularIntVectors.prepare_queries -> ops/distance.quantize_i8
        max_abs = np.max(np.abs(q), axis=1, keepdims=True)
        denom = np.where(max_abs > 0.0, max_abs, 127.0)
        qi = np.trunc(q * 127.0 / denom).astype(np.int8)
        v32 = qi.astype(np.int32)
        n = np.sqrt(np.sum(v32 * v32, axis=1).astype(np.float32))
        inv = np.where(n > 0.0, 1.0 / np.where(n > 0.0, n, 1.0), 0.0).astype(np.float32)
        return np.ascontiguousarray(qi), np.ascontiguousarray(inv)

    def search_batch(
        self, queries, max_search: int = 200, num_neighbors: int = 10, num_threads: int = 1
    ):
        q, q_inv = self._prepare_queries(queries)
        nq = q.shape[0]
        k = num_neighbors
        out_ids = np.empty((nq, k), np.int32)
        out_d = np.empty((nq, k), np.float32)
        n, d = self._vectors.shape
        vec_ptr = ctypes.c_void_p(self._vectors.ctypes.data)  # memmaps are C-contiguous
        if self._compressed:
            ptrs = (ctypes.c_void_p * len(self._buffers))(
                *[b.ctypes.data_as(ctypes.c_void_p).value for b in self._buffers]
            )
            lens = np.asarray([len(b) for b in self._buffers], np.uint64)
            if self._elem_kind == "angular":
                self._lib.gt_search_compressed(
                    vec_ptr, n, d,
                    ctypes.cast(ptrs, ctypes.c_void_p),
                    lens.ctypes.data_as(ctypes.c_void_p),
                    len(self._buffers),
                    q.ctypes.data_as(ctypes.c_void_p), nq,
                    max_search, k, num_threads,
                    out_ids.ctypes.data_as(ctypes.c_void_p),
                    out_d.ctypes.data_as(ctypes.c_void_p),
                )
            else:
                self._lib.gt_search_compressed_i8(
                    vec_ptr,
                    self._inv_norms.ctypes.data_as(ctypes.c_void_p), n, d,
                    ctypes.cast(ptrs, ctypes.c_void_p),
                    lens.ctypes.data_as(ctypes.c_void_p),
                    len(self._buffers),
                    q.ctypes.data_as(ctypes.c_void_p),
                    q_inv.ctypes.data_as(ctypes.c_void_p), nq,
                    max_search, k, num_threads,
                    out_ids.ctypes.data_as(ctypes.c_void_p),
                    out_d.ctypes.data_as(ctypes.c_void_p),
                )
        else:
            ptrs = (ctypes.c_void_p * len(self._arrays))(
                *[a.ctypes.data_as(ctypes.c_void_p).value for a in self._arrays]
            )
            if self._elem_kind == "angular":
                self._lib.gt_search_f32(
                    vec_ptr, n, d,
                    ctypes.cast(ptrs, ctypes.c_void_p), len(self._arrays), self._width,
                    q.ctypes.data_as(ctypes.c_void_p), nq,
                    max_search, k, num_threads,
                    out_ids.ctypes.data_as(ctypes.c_void_p),
                    out_d.ctypes.data_as(ctypes.c_void_p),
                )
            else:
                self._lib.gt_search_i8(
                    vec_ptr,
                    self._inv_norms.ctypes.data_as(ctypes.c_void_p), n, d,
                    ctypes.cast(ptrs, ctypes.c_void_p), len(self._arrays), self._width,
                    q.ctypes.data_as(ctypes.c_void_p),
                    q_inv.ctypes.data_as(ctypes.c_void_p), nq,
                    max_search, k, num_threads,
                    out_ids.ctypes.data_as(ctypes.c_void_p),
                    out_d.ctypes.data_as(ctypes.c_void_p),
                )
        return out_ids, out_d

    def search(self, element, max_search: int = 200, num_neighbors: int = 10):
        ids, d = self.search_batch(np.asarray(element)[None], max_search, num_neighbors)
        return [(int(i), float(x)) for i, x in zip(ids[0], d[0]) if i >= 0]
