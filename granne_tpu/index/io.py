"""Index + element serialization.

Reference parity: ``/root/reference/src/index/io.rs`` — a 1024-byte metadata
block (ASCII magic + JSON: version, num_elements, num_layers, num_neighbors,
layer_counts, layer_sizes, compressed) followed by the layers back-to-back
(``io.rs:7-9, 28-67``), with elements stored as a separate artifact
(``src/index/mod.rs:163-168``).

The TPU format keeps the same two-artifact, metadata-block design but its
default layer payload is the *dense* int32 adjacency (the in-HBM layout —
zero-cost load), with an optional compressed payload produced by the native
delta+varint codec (``granne_tpu/native``) as the compact-disk analogue of
the reference's StreamVByte ``MultiSetVector`` (``src/slice_vector/
set_vector.rs``).  Element files memory-map (``np.memmap``), mirroring the
reference's mmap serving story (``src/lib.rs:16-23``).
"""

from __future__ import annotations

import json
import mmap as _mmap
import os

import numpy as np

from .graph import LayerStack


def _madvise_random(arr: np.memmap) -> None:
    """Advise the kernel that access is random (reference: madvise(Random)
    at src/index/mod.rs:123-124, slice_vector/mod.rs:112).  Readahead is
    wasted on ANN row gathers; at billion-row host serving this measurably
    matters.  Best-effort (not all platforms expose madvise)."""
    try:
        arr._mmap.madvise(_mmap.MADV_RANDOM)
    except (AttributeError, ValueError, OSError):
        pass


class _Source:
    """A file path or an in-memory buffer, read through one interface.

    Mirrors the reference's dual ``from_file`` (mmap) / ``from_bytes``
    (caller-owned buffer) constructors (src/index/mod.rs:107-135).
    """

    def __init__(self, path_or_buf):
        if isinstance(path_or_buf, (str, os.PathLike)):
            self._path, self._buf = os.fspath(path_or_buf), None
        else:
            self._path, self._buf = None, memoryview(path_or_buf)

    def head(self, size: int) -> bytes:
        if self._buf is not None:
            return bytes(self._buf[:size])
        with open(self._path, "rb") as f:
            return f.read(size)

    def region(self, dtype, offset: int, shape) -> np.ndarray:
        """Typed view at ``offset``: memory-mapped (madvise-random) for
        paths, zero-copy frombuffer for buffers."""
        if self._buf is not None:
            count = int(np.prod(shape)) if shape else 1
            arr = np.frombuffer(self._buf, dtype=dtype, count=count, offset=offset)
            return arr.reshape(shape)
        arr = np.memmap(self._path, dtype=dtype, mode="r", offset=offset, shape=tuple(shape))
        _madvise_random(arr)
        return arr

    def bytes_at(self, offset: int, size: int) -> bytes:
        if self._buf is not None:
            return bytes(self._buf[offset : offset + size])
        with open(self._path, "rb") as f:
            f.seek(offset)
            return f.read(size)

MAGIC = b"granne-tpu"
ELEMENTS_MAGIC = b"granne-tpu-elements"
METADATA_LEN = 1024
LIBRARY_VERSION = "0.1.0"
SERIALIZATION_VERSION = 1


def _write_metadata(f, magic: bytes, meta: dict) -> None:
    blob = magic + json.dumps(meta).encode("utf-8")
    if len(blob) > METADATA_LEN:
        raise ValueError("metadata too large")
    f.write(blob + b"\x00" * (METADATA_LEN - len(blob)))


def _read_metadata(buf: bytes, magic: bytes) -> dict:
    if buf[: len(magic)] != magic:
        raise ValueError(f"invalid file: bad magic (expected {magic!r})")
    blob = buf[len(magic) : METADATA_LEN].rstrip(b"\x00")
    return json.loads(blob.decode("utf-8"))


# ---------------------------------------------------------------------------
# Index (layer stack)
# ---------------------------------------------------------------------------


def save_index(layers: LayerStack, path: str, compressed: bool = False) -> None:
    """Write the layer stack (``io.rs:11-70``)."""
    arrays = layers.as_numpy()
    payloads = []
    for arr in arrays:
        if compressed:
            from ..native import codec

            payloads.append(codec.encode_adjacency(arr))
        else:
            payloads.append(np.ascontiguousarray(arr, dtype="<i4").tobytes())
    meta = {
        "granne_tpu_version": LIBRARY_VERSION,
        "version": SERIALIZATION_VERSION,
        "num_elements": layers.num_elements,
        "num_layers": len(arrays),
        "num_neighbors": layers.num_neighbors,
        "layer_counts": [int(a.shape[0]) for a in arrays],
        "layer_sizes": [len(p) for p in payloads],
        "compressed": bool(compressed),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        _write_metadata(f, MAGIC, meta)
        for p in payloads:
            f.write(p)
    os.replace(tmp, path)


def read_index_metadata(path: str) -> dict:
    """Validate magic and return the JSON metadata (``io.rs:89-113``)."""
    return _read_metadata(_Source(path).head(METADATA_LEN), MAGIC)


def load_index(source) -> LayerStack:
    """Load a layer stack (``io.rs:72-87``); dense payloads are zero-copy.

    ``source`` is a file path (``Granne::from_file``, mmap) or a bytes-like
    buffer (``Granne::from_bytes``, src/index/mod.rs:107-121 — the caller
    owns the buffer, e.g. a network-fetched index).
    """
    src = _Source(source)
    meta = _read_metadata(src.head(METADATA_LEN), MAGIC)
    m = meta["num_neighbors"]
    counts = meta["layer_counts"]
    sizes = meta["layer_sizes"]
    arrays = []
    offset = METADATA_LEN
    if meta.get("compressed"):
        from ..native import codec

        for count, size in zip(counts, sizes):
            arrays.append(codec.decode_adjacency(src.bytes_at(offset, size), count, m))
            offset += size
    else:
        for count, size in zip(counts, sizes):
            arrays.append(np.asarray(src.region("<i4", offset, (count, m))))
            offset += size
    return LayerStack.from_numpy(arrays)


# ---------------------------------------------------------------------------
# Elements
# ---------------------------------------------------------------------------


_WRITE_CHUNK_BYTES = 256 << 20  # bound host RSS while streaming a matrix out


def _write_matrix_chunked(f, matrix, dtype) -> None:
    """Stream ``matrix`` ([n, d]; jax array, memmap or ndarray) to ``f`` in
    bounded row chunks: device->host (or page-in) happens per chunk, so
    saving a 100M-row container never materializes it whole (the
    reference's shard-writer discipline, embeddings/parsing.rs:63-100)."""
    n, d_ = matrix.shape
    row_bytes = max(1, int(np.dtype(dtype).itemsize) * int(d_))
    step = max(1, _WRITE_CHUNK_BYTES // row_bytes)
    for lo in range(0, int(n), step):
        chunk = np.asarray(matrix[lo : lo + step])
        f.write(np.ascontiguousarray(chunk, dtype=dtype).tobytes())


def save_elements(elements, path: str) -> None:
    """Write an element container (reference: ``write_elements``,
    src/index/mod.rs:163-168 -> slice_vector ``u64 width + data``).

    The vector matrix is streamed in bounded chunks — host peak RSS stays
    ~constant regardless of container size (tests/test_io.py asserts this
    with a memmap-backed container)."""
    from ..elements.angular import AngularVectors
    from ..elements.angular_int import AngularIntVectors
    from ..elements.embeddings import SumEmbeddings

    extra = None
    if isinstance(elements, AngularVectors):
        kind, data, data_dtype = "angular", elements.vectors, "<f4"
        meta_extra = {}
    elif isinstance(elements, AngularIntVectors):
        kind, data, data_dtype = "angular_int", elements.vectors, "i1"
        meta_extra = {}
    elif isinstance(elements, SumEmbeddings):
        # term lists go to disk as CSR with 3-byte packed ids and a
        # chunk-compressed offset table (reference: odd_byte_int.rs:3-36 +
        # embeddings/mod.rs:18-23 + offsets.rs:7-13); the f32 embedding
        # table follows.  Dense [n, T_max] padding is an HBM-only layout.
        from ..elements import packed
        from ..native import codec

        kind = "embeddings"
        terms = np.asarray(elements.terms, dtype="<i4")
        offsets, ids = packed.terms_to_csr(terms)
        off_blob = codec.encode_offsets_py(offsets)
        off_fmt = "chunked"
        if not off_blob:  # some row longer than 64K terms: raw u64 fallback
            off_blob = np.ascontiguousarray(offsets, "<u8").tobytes()
            off_fmt = "raw64"
        ids_blob = packed.pack_u24(ids)
        data = np.frombuffer(off_blob + ids_blob, np.uint8).reshape(1, -1)
        data_dtype = np.uint8
        emb = elements.embeddings
        extra = emb  # f32 table streamed after the CSR blob
        meta_extra = {
            "vocab": int(emb.shape[0]),
            "emb_dim": int(emb.shape[1]),
            "terms_format": "csr24",
            "offsets_format": off_fmt,
            "offsets_bytes": len(off_blob),
            "num_terms": int(len(ids)),
            "term_width": int(terms.shape[1]),
            "count": int(terms.shape[0]),
            "dim": int(terms.shape[1]),
        }
    else:
        raise TypeError(f"unsupported element container: {type(elements)!r}")
    meta = {
        "granne_tpu_version": LIBRARY_VERSION,
        "version": SERIALIZATION_VERSION,
        "type": kind,
        "count": int(data.shape[0]),
        "dim": int(data.shape[1]),
        **meta_extra,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        _write_metadata(f, ELEMENTS_MAGIC, meta)
        _write_matrix_chunked(f, data, data_dtype)
        if extra is not None:
            _write_matrix_chunked(f, extra, "<f4")
    os.replace(tmp, path)


def read_elements_metadata(path: str) -> dict:
    return _read_metadata(_Source(path).head(METADATA_LEN), ELEMENTS_MAGIC)


def load_elements(source, mmap: bool = True):
    """Load an element container into a DEVICE-RESIDENT form.

    For a path the data region is read through a memory map
    (madvise-random), but the returned container uploads the whole matrix
    to device (HBM) at load — budget accordingly (a 25 GB f32 file will
    not fit one chip).  The reference's pay-per-access mmap serving story
    (src/lib.rs:16-23) maps to the HOST-tier paths instead:
    ``native.serve.HostGranne`` serves a graph from mapped files without
    any device upload, and ``parallel.tiering.TieredIvf.load(device=False)``
    keeps IVF blocks host-resident.  ``source`` may also be a bytes-like
    buffer — the ``from_bytes`` constructor (src/index/mod.rs:107-121)."""
    from ..elements.angular import AngularVectors
    from ..elements.angular_int import AngularIntVectors
    from ..elements.embeddings import SumEmbeddings

    src = _Source(source)
    meta = _read_metadata(src.head(METADATA_LEN), ELEMENTS_MAGIC)
    n, d = meta["count"], meta["dim"]
    kind = meta["type"]
    if kind == "embeddings":
        if meta.get("terms_format") != "csr24":
            raise ValueError("unknown embeddings terms format")
        from ..elements import packed
        from ..native import codec

        off_bytes = meta["offsets_bytes"]
        num_terms = meta["num_terms"]
        base = METADATA_LEN
        off_blob = src.bytes_at(base, off_bytes)
        if meta["offsets_format"] == "chunked":
            offsets = codec.decode_offsets_py(off_blob, n + 1)
        else:
            offsets = np.frombuffer(off_blob, "<u8")
        ids_blob = src.region(np.uint8, base + off_bytes, (num_terms * 3,))
        terms = packed.csr_to_terms(offsets, packed.unpack_u24(ids_blob, num_terms),
                                    meta["term_width"])
        emb_off = base + off_bytes + num_terms * 3
        emb = src.region("<f4", emb_off, (meta["vocab"], meta["emb_dim"]))
        return SumEmbeddings.from_parts(np.asarray(emb), terms)
    dtype = {"angular": "<f4", "angular_int": "i1"}[kind]
    raw = src.region(dtype, METADATA_LEN, (n, d))
    if not mmap:
        raw = np.array(raw)
    if kind == "angular":
        return AngularVectors.from_normalized(np.asarray(raw))
    return AngularIntVectors.from_quantized(np.asarray(raw))
