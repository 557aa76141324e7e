"""Host (C++) serving path: compressed + dense mmap search parity."""

import numpy as np
import pytest

from granne_tpu import AngularVectors, BuildConfig, Granne, build_layers
from granne_tpu.index import io as gio
from granne_tpu.native import get_lib
from granne_tpu.native.serve import HostGranne

pytestmark = pytest.mark.skipif(get_lib() is None, reason="no native toolchain")


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    rng = np.random.default_rng(3)
    n, d = 500, 25
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    elements = AngularVectors.from_raw(vecs)
    layers = build_layers(elements, BuildConfig(num_neighbors=16, max_search=30))
    base = tmp_path_factory.mktemp("host")
    gio.save_elements(elements, str(base / "e.gt"))
    gio.save_index(layers, str(base / "dense.gt"), compressed=False)
    gio.save_index(layers, str(base / "comp.gtz"), compressed=True)
    return vecs, elements, layers, base


def test_host_dense_recall(built):
    vecs, _, _, base = built
    h = HostGranne(str(base / "dense.gt"), str(base / "e.gt"))
    ids, dists = h.search_batch(vecs[:200], max_search=20, num_neighbors=1)
    recall = np.mean(ids[:, 0] == np.arange(200))
    assert recall > 0.95


def test_host_compressed_matches_dense(built):
    vecs, _, _, base = built
    hd = HostGranne(str(base / "dense.gt"), str(base / "e.gt"))
    hc = HostGranne(str(base / "comp.gtz"), str(base / "e.gt"))
    ids_d, _ = hd.search_batch(vecs[:100], max_search=20, num_neighbors=5)
    ids_c, _ = hc.search_batch(vecs[:100], max_search=20, num_neighbors=5)
    # compressed rows are sorted; result *sets* must agree
    agree = sum(set(a) == set(b) for a, b in zip(ids_d.tolist(), ids_c.tolist()))
    assert agree >= 95


def test_host_multithreaded_same_results(built):
    vecs, _, _, base = built
    h = HostGranne(str(base / "comp.gtz"), str(base / "e.gt"))
    a, _ = h.search_batch(vecs[:100], 20, 5, num_threads=1)
    b, _ = h.search_batch(vecs[:100], 20, 5, num_threads=4)
    assert np.array_equal(a, b)


def test_host_matches_tpu_search(built):
    vecs, elements, layers, base = built
    h = HostGranne(str(base / "comp.gtz"), str(base / "e.gt"))
    tpu = Granne(layers=layers, elements=elements)
    ids_h, _ = h.search_batch(vecs[:50], 30, 5)
    ids_t, _ = tpu.search_batch(vecs[:50], 30, 5)
    ids_t = np.asarray(ids_t)
    overlap = np.mean([
        len(set(ids_h[i]) & set(ids_t[i].tolist())) / 5 for i in range(50)
    ])
    assert overlap > 0.9


def test_offsets_codec():
    lib = get_lib()
    import ctypes

    rng = np.random.default_rng(0)
    offsets = np.cumsum(rng.integers(0, 1000, 500)).astype(np.uint64)
    offsets = np.concatenate([np.zeros(1, np.uint64), offsets])
    count = len(offsets)
    buf = np.zeros(lib.gt_offsets_encoded_size(count), np.uint8)
    n = lib.gt_offsets_encode(
        offsets.ctypes.data_as(ctypes.c_void_p), count, buf.ctypes.data_as(ctypes.c_void_p)
    )
    assert n > 0
    # ~2.1 bytes per offset (reference offsets.rs design) vs 8 raw
    assert n < count * 3
    out = np.zeros(count, np.uint64)
    lib.gt_offsets_decode(
        buf.ctypes.data_as(ctypes.c_void_p), out.ctypes.data_as(ctypes.c_void_p), count
    )
    assert np.array_equal(out, offsets)
    # random access
    for i in [0, 59, 60, 61, 123, count - 1]:
        assert lib.gt_offsets_get(buf.ctypes.data_as(ctypes.c_void_p), i) == offsets[i]


def test_offsets_overflow_rejected():
    lib = get_lib()
    import ctypes

    offsets = np.asarray([0, 100000], np.uint64)  # delta > u16
    buf = np.zeros(lib.gt_offsets_encoded_size(2), np.uint8)
    n = lib.gt_offsets_encode(
        offsets.ctypes.data_as(ctypes.c_void_p), 2, buf.ctypes.data_as(ctypes.c_void_p)
    )
    assert n == 0


def test_compressed_format_uses_chunked_offsets():
    """The adjacency block's row-offset table is chunk-compressed (v2)."""
    from granne_tpu.native import codec

    rng = np.random.default_rng(1)
    adj = rng.integers(-1, 20000, (600, 24)).astype(np.int32)
    enc = codec.encode_adjacency(adj)
    rows = int.from_bytes(enc[0:4], "little")
    flags = int.from_bytes(enc[8:12], "little")
    payload_len = int.from_bytes(enc[16:24], "little")
    assert rows == 600
    assert flags & codec.ADJ_CHUNKED_OFFSETS
    table = enc[codec.ADJ_HEADER + payload_len:]
    # chunked table is ~2.1 B/row, strictly smaller than the raw u32 table
    assert len(table) < rows * 4
    # python mirrors byte-for-byte and both decode identically
    assert enc == codec._encode_py(adj)
    assert np.array_equal(
        codec.decode_adjacency(enc, 600, 24), codec._decode_py(enc, 600, 24)
    )


@pytest.fixture(scope="module")
def built_i8(tmp_path_factory):
    from granne_tpu import AngularIntVectors

    rng = np.random.default_rng(7)
    n, d = 500, 25
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    elements = AngularIntVectors.from_raw(vecs)
    layers = build_layers(elements, BuildConfig(num_neighbors=16, max_search=30))
    base = tmp_path_factory.mktemp("host_i8")
    gio.save_elements(elements, str(base / "e.gt"))
    gio.save_index(layers, str(base / "dense.gt"), compressed=False)
    gio.save_index(layers, str(base / "comp.gtz"), compressed=True)
    return vecs, elements, layers, base


def test_host_i8_dense_recall(built_i8):
    vecs, _, _, base = built_i8
    h = HostGranne(str(base / "dense.gt"), str(base / "e.gt"))
    ids, _ = h.search_batch(vecs[:200], max_search=20, num_neighbors=1)
    recall = np.mean(ids[:, 0] == np.arange(200))
    assert recall > 0.95


def test_host_i8_compressed_matches_dense(built_i8):
    vecs, _, _, base = built_i8
    hd = HostGranne(str(base / "dense.gt"), str(base / "e.gt"))
    hc = HostGranne(str(base / "comp.gtz"), str(base / "e.gt"))
    ids_d, _ = hd.search_batch(vecs[:100], max_search=20, num_neighbors=5)
    ids_c, _ = hc.search_batch(vecs[:100], max_search=20, num_neighbors=5)
    agree = sum(set(a) == set(b) for a, b in zip(ids_d.tolist(), ids_c.tolist()))
    assert agree >= 95


def test_host_i8_matches_tpu_search(built_i8):
    vecs, elements, layers, base = built_i8
    h = HostGranne(str(base / "comp.gtz"), str(base / "e.gt"))
    tpu = Granne(layers=layers, elements=elements)
    ids_h, _ = h.search_batch(vecs[:50], 30, 5)
    ids_t, _ = tpu.search_batch(vecs[:50], 30, 5)
    ids_t = np.asarray(ids_t)
    overlap = np.mean([
        len(set(ids_h[i]) & set(ids_t[i].tolist())) / 5 for i in range(50)
    ])
    assert overlap > 0.9
