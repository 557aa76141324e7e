"""Adjacency codec front-end: native C++ fast path, numpy fallback.

Format (see codec.cpp): ``u32 rows, u32 width``, per-row payloads
(count byte, flags byte, StreamVByte'd deltas of the sorted ids or raw u32s),
then a u32 per-row offset table.  Mirrors the design of the reference's
``MultiSetVector`` (/root/reference/src/slice_vector/set_vector.rs) and its
raw fallback rule, with ids sorted at encode time like the reference
(decoded rows therefore come back sorted — the reference has the same
behavior, relied on by its serialization-equivalence tests).
"""

from __future__ import annotations

import ctypes

import numpy as np

from . import get_lib

MIN_TO_ENCODE = 4  # set_vector.rs:12
ROW_RAW = 1


def encode_adjacency(adj: np.ndarray) -> bytes:
    adj = np.ascontiguousarray(adj, dtype=np.int32)
    rows, width = adj.shape
    lib = get_lib()
    if lib is not None:
        bound = lib.gt_encode_bound(rows, width)
        out = np.empty(bound, np.uint8)
        n = lib.gt_encode_adjacency(
            adj.ctypes.data_as(ctypes.c_void_p),
            rows,
            width,
            out.ctypes.data_as(ctypes.c_void_p),
        )
        return out[:n].tobytes()
    return _encode_py(adj)


def decode_adjacency(buf: bytes, rows: int, width: int) -> np.ndarray:
    lib = get_lib()
    raw = np.frombuffer(buf, np.uint8)
    if lib is not None:
        r = ctypes.c_uint32(0)
        w = ctypes.c_uint32(0)
        lib.gt_adjacency_shape(
            raw.ctypes.data_as(ctypes.c_void_p), ctypes.byref(r), ctypes.byref(w)
        )
        assert (r.value, w.value) == (rows, width), "shape mismatch in encoded block"
        out = np.empty((rows, width), np.int32)
        lib.gt_decode_adjacency(
            raw.ctypes.data_as(ctypes.c_void_p), len(buf), out.ctypes.data_as(ctypes.c_void_p)
        )
        return out
    return _decode_py(buf, rows, width)


# ---------------------------------------------------------------------------
# Pure-python mirror (slow; used when no C++ toolchain is present and by
# codec unit tests as an independent implementation).
# ---------------------------------------------------------------------------


def _svb_encode(vals: list[int]) -> bytes:
    n = len(vals)
    ctrl = bytearray((n + 3) // 4)
    data = bytearray()
    for i, v in enumerate(vals):
        length = 1 if v < 1 << 8 else 2 if v < 1 << 16 else 3 if v < 1 << 24 else 4
        ctrl[i // 4] |= (length - 1) << ((i % 4) * 2)
        data += int(v).to_bytes(length, "little")
    return bytes(ctrl) + bytes(data)


def _svb_decode(buf: bytes, n: int) -> tuple[list[int], int]:
    n_ctrl = (n + 3) // 4
    ctrl = buf[:n_ctrl]
    pos = n_ctrl
    out = []
    for i in range(n):
        length = ((ctrl[i // 4] >> ((i % 4) * 2)) & 3) + 1
        out.append(int.from_bytes(buf[pos : pos + length], "little"))
        pos += length
    return out, pos


def _encode_py(adj: np.ndarray) -> bytes:
    rows, width = adj.shape
    out = bytearray()
    out += int(rows).to_bytes(4, "little") + int(width).to_bytes(4, "little")
    offsets = []
    base = len(out)
    for r in range(rows):
        offsets.append(len(out) - base)
        ids = sorted(int(x) for x in adj[r] if x >= 0)[:255]
        count = len(ids)
        if count < MIN_TO_ENCODE:
            out += bytes([count, ROW_RAW])
            for v in ids:
                out += v.to_bytes(4, "little")
            continue
        deltas = [ids[0]] + [b - a for a, b in zip(ids, ids[1:])]
        enc = _svb_encode(deltas)
        if len(enc) >= count * 4:
            out += bytes([count, ROW_RAW])
            for v in ids:
                out += v.to_bytes(4, "little")
        else:
            out += bytes([count, 0]) + enc
    for o in offsets:
        out += int(o).to_bytes(4, "little")
    return bytes(out)


def _decode_py(buf: bytes, rows: int, width: int) -> np.ndarray:
    r = int.from_bytes(buf[0:4], "little")
    w = int.from_bytes(buf[4:8], "little")
    assert (r, w) == (rows, width)
    out = np.full((rows, width), -1, np.int32)
    pos = 8
    for row in range(rows):
        count = buf[pos]
        flags = buf[pos + 1]
        pos += 2
        if flags & ROW_RAW:
            vals = [
                int.from_bytes(buf[pos + 4 * i : pos + 4 * i + 4], "little")
                for i in range(count)
            ]
            pos += 4 * count
        else:
            deltas, used = _svb_decode(buf[pos:], count)
            pos += used
            vals = list(np.cumsum(deltas))
        out[row, : min(count, width)] = vals[:width]
    return out
