"""Adjacency codec front-end: native C++ fast path, numpy fallback.

Format v2 (see codec.cpp): ``u32 rows, u32 width, u32 flags, u32 reserved,
u64 payload_len``, per-row payloads (count byte, flags byte, StreamVByte'd
deltas of the sorted ids or raw u32s), then the row-offset table — by
default chunk-compressed ({u64 initial, u16 deltas[60]} per 60 rows, the
reference ``Offsets`` design at /root/reference/src/slice_vector/offsets.rs)
with a raw-u32 fallback signalled by the flags word.  The row payloads
mirror the design of the reference's ``MultiSetVector``
(/root/reference/src/slice_vector/set_vector.rs) including its raw fallback
rule, with ids sorted at encode time like the reference (decoded rows come
back sorted — the reference has the same behavior, relied on by its
serialization-equivalence tests).
"""

from __future__ import annotations

import ctypes

import numpy as np

from . import get_lib

MIN_TO_ENCODE = 4  # set_vector.rs:12
ROW_RAW = 1
ADJ_CHUNKED_OFFSETS = 1  # header flags bit
ADJ_HEADER = 24
OFFSETS_PER_CHUNK = 60  # offsets.rs:7-8
_CHUNK_BYTES = 8 + 2 * OFFSETS_PER_CHUNK


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


def encode_offsets_py(offsets: np.ndarray) -> bytes:
    """Chunk-compress a monotone u64 offset array (offsets.rs format).

    Returns b"" when some delta exceeds u16 (caller uses a raw table).
    """
    offsets = np.asarray(offsets, np.uint64)
    count = len(offsets)
    deltas = np.diff(offsets)
    if len(deltas) and int(deltas.max()) > 0xFFFF:
        return b""
    n_chunks = (count + OFFSETS_PER_CHUNK - 1) // OFFSETS_PER_CHUNK
    d16 = np.zeros(n_chunks * OFFSETS_PER_CHUNK, "<u2")
    d16[: len(deltas)] = deltas.astype("<u2")
    out = bytearray(int(count).to_bytes(8, "little"))
    for c in range(n_chunks):
        out += int(offsets[c * OFFSETS_PER_CHUNK]).to_bytes(8, "little")
        out += d16[c * OFFSETS_PER_CHUNK : (c + 1) * OFFSETS_PER_CHUNK].tobytes()
    return bytes(out)


def decode_offsets_py(buf: bytes, count: int) -> np.ndarray:
    """Decode a chunk-compressed offset table back to u64[count]."""
    out = np.empty(count, np.uint64)
    pos = 8
    done = 0
    while done < count:
        initial = int.from_bytes(buf[pos : pos + 8], "little")
        deltas = np.frombuffer(buf[pos + 8 : pos + _CHUNK_BYTES], "<u2")
        take = min(OFFSETS_PER_CHUNK, count - done)
        vals = initial + np.concatenate([[0], np.cumsum(deltas[: take - 1], dtype=np.uint64)])
        out[done : done + take] = vals[:take]
        done += take
        pos += _CHUNK_BYTES
    return out


def _encode_py(adj: np.ndarray) -> bytes:
    rows, width = adj.shape
    payload = bytearray()
    offsets = []
    for r in range(rows):
        offsets.append(len(payload))
        ids = sorted(int(x) for x in adj[r] if x >= 0)[:255]
        count = len(ids)
        if count < MIN_TO_ENCODE:
            payload += bytes([count, ROW_RAW])
            for v in ids:
                payload += v.to_bytes(4, "little")
            continue
        deltas = [ids[0]] + [b - a for a, b in zip(ids, ids[1:])]
        enc = _svb_encode(deltas)
        if len(enc) >= count * 4:
            payload += bytes([count, ROW_RAW])
            for v in ids:
                payload += v.to_bytes(4, "little")
        else:
            payload += bytes([count, 0]) + enc
    flags = 0
    table = b""
    if rows:
        table = encode_offsets_py(np.asarray(offsets, np.uint64))
        if table:
            flags |= ADJ_CHUNKED_OFFSETS
        else:
            table = np.asarray(offsets, "<u4").tobytes()
    head = (
        int(rows).to_bytes(4, "little")
        + int(width).to_bytes(4, "little")
        + int(flags).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + int(len(payload)).to_bytes(8, "little")
    )
    return head + bytes(payload) + table


def _decode_py(buf: bytes, rows: int, width: int) -> np.ndarray:
    r = int.from_bytes(buf[0:4], "little")
    w = int.from_bytes(buf[4:8], "little")
    assert (r, w) == (rows, width)
    out = np.full((rows, width), -1, np.int32)
    pos = ADJ_HEADER
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
