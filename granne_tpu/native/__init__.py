"""ctypes bindings + lazy build of the native C++ runtime.

The shared library is compiled on demand with g++ (no pip deps). If a
toolchain is unavailable the Python callers fall back to pure-numpy paths
(`codec.py` mirrors the formats).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "codec.cpp")
_LIB = os.path.join(_HERE, "libgranne_tpu.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-o",
        _LIB,
        _SRC,
        "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_LIB)
        except (OSError, subprocess.CalledProcessError):
            return None
        lib.gt_encode_bound.restype = ctypes.c_size_t
        lib.gt_encode_bound.argtypes = [ctypes.c_uint32, ctypes.c_uint32]
        lib.gt_encode_adjacency.restype = ctypes.c_size_t
        lib.gt_encode_adjacency.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint32,
            ctypes.c_uint32,
            ctypes.c_void_p,
        ]
        lib.gt_decode_adjacency.restype = ctypes.c_int
        lib.gt_decode_adjacency.argtypes = [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p]
        lib.gt_adjacency_shape.restype = ctypes.c_int
        lib.gt_adjacency_shape.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.gt_offsets_encoded_size.restype = ctypes.c_size_t
        lib.gt_offsets_encoded_size.argtypes = [ctypes.c_uint32]
        lib.gt_offsets_encode.restype = ctypes.c_size_t
        lib.gt_offsets_encode.argtypes = [ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p]
        lib.gt_offsets_get.restype = ctypes.c_uint64
        lib.gt_offsets_get.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
        lib.gt_offsets_decode.restype = ctypes.c_int
        lib.gt_offsets_decode.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32]
        lib.gt_search_compressed.restype = None
        lib.gt_search_compressed.argtypes = [
            ctypes.c_void_p,  # vectors
            ctypes.c_uint32,  # n
            ctypes.c_uint32,  # d
            ctypes.c_void_p,  # layer buf ptr array
            ctypes.c_void_p,  # layer lens (u64*)
            ctypes.c_uint32,  # num_layers
            ctypes.c_void_p,  # queries
            ctypes.c_uint32,  # nq
            ctypes.c_uint32,  # ef
            ctypes.c_uint32,  # k
            ctypes.c_uint32,  # threads
            ctypes.c_void_p,  # out ids
            ctypes.c_void_p,  # out dists
        ]
        lib.gt_search_f32.restype = None
        lib.gt_search_f32.argtypes = [
            ctypes.c_void_p,  # vectors
            ctypes.c_uint32,  # n
            ctypes.c_uint32,  # d
            ctypes.c_void_p,  # layers (ptr array)
            ctypes.c_uint32,  # num_layers
            ctypes.c_uint32,  # width
            ctypes.c_void_p,  # queries
            ctypes.c_uint32,  # nq
            ctypes.c_uint32,  # ef
            ctypes.c_uint32,  # k
            ctypes.c_uint32,  # num_threads
            ctypes.c_void_p,  # out_ids
            ctypes.c_void_p,  # out_dists
        ]
        lib.gt_search_i8.restype = None
        lib.gt_search_i8.argtypes = [
            ctypes.c_void_p,  # vectors (int8)
            ctypes.c_void_p,  # inv_norms (f32)
            ctypes.c_uint32,  # n
            ctypes.c_uint32,  # d
            ctypes.c_void_p,  # layers (ptr array)
            ctypes.c_uint32,  # num_layers
            ctypes.c_uint32,  # width
            ctypes.c_void_p,  # queries (int8)
            ctypes.c_void_p,  # query inv_norms (f32)
            ctypes.c_uint32,  # nq
            ctypes.c_uint32,  # ef
            ctypes.c_uint32,  # k
            ctypes.c_uint32,  # num_threads
            ctypes.c_void_p,  # out_ids
            ctypes.c_void_p,  # out_dists
        ]
        lib.gt_search_compressed_i8.restype = None
        lib.gt_search_compressed_i8.argtypes = [
            ctypes.c_void_p,  # vectors (int8)
            ctypes.c_void_p,  # inv_norms (f32)
            ctypes.c_uint32,  # n
            ctypes.c_uint32,  # d
            ctypes.c_void_p,  # layer buf ptr array
            ctypes.c_void_p,  # layer lens (u64*)
            ctypes.c_uint32,  # num_layers
            ctypes.c_void_p,  # queries (int8)
            ctypes.c_void_p,  # query inv_norms (f32)
            ctypes.c_uint32,  # nq
            ctypes.c_uint32,  # ef
            ctypes.c_uint32,  # k
            ctypes.c_uint32,  # num_threads
            ctypes.c_void_p,  # out_ids
            ctypes.c_void_p,  # out_dists
        ]
        _lib = lib
        return _lib
