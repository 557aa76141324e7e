"""Packed odd-byte integers + CSR term storage (host/disk density tricks).

Reference parity: ``/root/reference/src/odd_byte_int.rs:3-36`` — term ids are
stored as 3-byte LE ints (vocab <= 2^24) and CSR offsets as 5-byte ints so a
billion-element SumEmbeddings container fits in RAM.  Here the same density
is achieved with vectorized numpy packing: term-id payloads are u24, and the
CSR offset table uses the chunk-compressed monotone codec
(``native/codec.encode_offsets_py``, the ``offsets.rs`` analogue at
~2.1 B/offset — denser than the reference's FiveByteInt).

On device the terms decode to the dense padded ``int32[n, T]`` tensor
(``SumEmbeddings.terms``): HBM layouts want fixed shapes; the packed form is
a disk/host-tier concern only.
"""

from __future__ import annotations

import numpy as np

U24_MAX = (1 << 24) - 1


def pack_u24(ids: np.ndarray) -> bytes:
    """int array -> packed 3-byte LE payload (odd_byte_int.rs ThreeByteInt)."""
    ids = np.ascontiguousarray(ids, dtype="<u4")
    if ids.size and int(ids.max()) > U24_MAX:
        raise ValueError(f"term id exceeds 3-byte range ({U24_MAX})")
    return np.ascontiguousarray(ids.view(np.uint8).reshape(-1, 4)[:, :3]).tobytes()

def unpack_u24(buf, count: int) -> np.ndarray:
    """Packed 3-byte LE payload -> uint32[count]."""
    raw = np.frombuffer(buf, np.uint8, count * 3).reshape(count, 3)
    out = np.zeros((count, 4), np.uint8)
    out[:, :3] = raw
    return out.view("<u4").reshape(count)


def terms_to_csr(terms: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Dense padded int32[n, T] (-1 pad) -> (offsets u64[n+1], data u32[nnz])."""
    terms = np.asarray(terms)
    mask = terms >= 0
    counts = mask.sum(axis=1)
    offsets = np.zeros(len(terms) + 1, np.uint64)
    np.cumsum(counts, out=offsets[1:])
    data = terms[mask].astype(np.uint32)
    return offsets, data


def csr_to_terms(offsets: np.ndarray, data: np.ndarray, width: int | None = None) -> np.ndarray:
    """(offsets, data) -> dense padded int32[n, T] with -1 padding."""
    offsets = np.asarray(offsets, np.int64)
    counts = np.diff(offsets)
    n = len(counts)
    if width is None:
        width = max(1, int(counts.max()) if n else 1)
    out = np.full((n, width), -1, np.int32)
    # scatter: row r gets data[offsets[r]:offsets[r+1]] into columns [0, count)
    rows = np.repeat(np.arange(n), counts)
    cols = np.arange(len(data)) - np.repeat(offsets[:-1], counts)
    keep = cols < width
    out[rows[keep], cols[keep].astype(np.int64)] = data[keep].astype(np.int32)
    return out
