"""Serialization round-trips (mirrors /root/reference/src/index/tests.rs:338-451
and slice_vector write/load round-trip tests)."""

import numpy as np
import pytest

from granne_tpu import AngularVectors, AngularIntVectors, BuildConfig, Granne, build_layers
from granne_tpu.index import io as gio
from granne_tpu.native import codec


def _build_small(rng, n=300, d=16):
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    elements = AngularVectors.from_raw(vecs)
    layers = build_layers(elements, BuildConfig(num_neighbors=12, max_search=25))
    return vecs, elements, layers


def test_index_roundtrip_dense(rng, tmp_path):
    _, elements, layers = _build_small(rng)
    p = str(tmp_path / "index.gt")
    gio.save_index(layers, p)
    loaded = gio.load_index(p)
    assert loaded.counts == layers.counts
    for a, b, c in zip(layers.as_numpy(), loaded.as_numpy(), layers.counts):
        assert np.array_equal(a[:c], b[:c])


def test_index_roundtrip_compressed(rng, tmp_path):
    _, elements, layers = _build_small(rng)
    p = str(tmp_path / "index.gtz")
    gio.save_index(layers, p, compressed=True)
    loaded = gio.load_index(p)
    # compression sorts each row's ids; compare as sets (like the reference's
    # builder-vs-loaded equivalence tests, tests.rs:338-451)
    for a, b, count in zip(layers.as_numpy(), loaded.as_numpy(), layers.counts):
        for i in range(count):
            assert set(a[i][a[i] >= 0]) == set(b[i][b[i] >= 0])
    # and compressed file should actually be smaller than dense
    dense_p = str(tmp_path / "index.gt")
    gio.save_index(layers, dense_p)
    import os

    assert os.path.getsize(p) < os.path.getsize(dense_p)


def test_elements_roundtrip_f32(rng, tmp_path):
    vecs, elements, _ = _build_small(rng)
    p = str(tmp_path / "elements.gt")
    gio.save_elements(elements, p)
    loaded = gio.load_elements(p)
    assert isinstance(loaded, AngularVectors)
    assert np.allclose(np.asarray(loaded.vectors), np.asarray(elements.vectors))


def test_elements_roundtrip_i8(rng, tmp_path):
    vecs = rng.standard_normal((100, 32)).astype(np.float32)
    elements = AngularIntVectors.from_raw(vecs)
    p = str(tmp_path / "elements_i8.gt")
    gio.save_elements(elements, p)
    loaded = gio.load_elements(p)
    assert isinstance(loaded, AngularIntVectors)
    assert np.array_equal(np.asarray(loaded.vectors), np.asarray(elements.vectors))
    assert np.allclose(np.asarray(loaded.inv_norms), np.asarray(elements.inv_norms))


def test_from_bytes_roundtrip(rng, tmp_path):
    """Caller-owned buffers load like files (Granne::from_bytes /
    GranneBuilder::from_bytes, src/index/mod.rs:107-121, 430-446)."""
    vecs, elements, layers = _build_small(rng)
    ip, ep = str(tmp_path / "i.gtz"), str(tmp_path / "e.gt")
    gio.save_index(layers, ip, compressed=True)
    gio.save_elements(elements, ep)
    ibuf = open(ip, "rb").read()
    ebuf = open(ep, "rb").read()

    loaded = gio.load_index(ibuf)
    for a, b, count in zip(gio.load_index(ip).as_numpy(), loaded.as_numpy(), layers.counts):
        assert np.array_equal(a[:count], b[:count])
    el = gio.load_elements(ebuf)
    assert np.allclose(np.asarray(el.vectors), np.asarray(elements.vectors))

    # full index from buffers searches identically to the file load
    from granne_tpu.api import GranneBuilder, load_granne

    idx_f = load_granne(ip, ep)
    idx_b = load_granne(ibuf, ebuf)
    r_f = idx_f.search(vecs[7], 20, 3)
    r_b = idx_b.search(vecs[7], 20, 3)
    assert [i for i, _ in r_f] == [i for i, _ in r_b]

    # builder resume from buffers
    b = GranneBuilder.from_bytes(ibuf, ebuf, num_neighbors=12, max_search=25)
    assert b.indexed_elements == len(vecs)
    b.append(rng.standard_normal(16).astype(np.float32))
    b.build()
    assert b.indexed_elements == len(vecs) + 1


def test_search_after_load_matches(rng, tmp_path):
    vecs, elements, layers = _build_small(rng)
    pi, pe = str(tmp_path / "i.gt"), str(tmp_path / "e.gt")
    gio.save_index(layers, pi, compressed=True)
    gio.save_elements(elements, pe)
    index = Granne(layers=gio.load_index(pi), elements=gio.load_elements(pe))
    ids0, _ = Granne(layers=layers, elements=elements).search_batch(vecs[:32], 20, 5)
    ids1, _ = index.search_batch(vecs[:32], 20, 5)
    # row-sorted adjacency can reorder ties; compare result sets
    for a, b in zip(np.asarray(ids0), np.asarray(ids1)):
        assert set(a.tolist()) == set(b.tolist())


def test_metadata_readable(rng, tmp_path):
    _, _, layers = _build_small(rng)
    p = str(tmp_path / "index.gt")
    gio.save_index(layers, p)
    meta = gio.read_index_metadata(p)
    assert meta["num_elements"] == layers.num_elements
    assert meta["num_layers"] == len(layers)
    assert meta["layer_counts"] == list(layers.counts)


def test_bad_magic_rejected(tmp_path):
    p = str(tmp_path / "bad.gt")
    with open(p, "wb") as f:
        f.write(b"not-an-index" + b"\x00" * 1500)
    with pytest.raises(ValueError):
        gio.read_index_metadata(p)


# -- codec unit tests (set_vector.rs:224-426 analogues) ----------------------


def test_codec_roundtrip_native_vs_python(rng):
    adj = rng.integers(-1, 5000, size=(64, 20)).astype(np.int32)
    # add fully empty and fully dense rows
    adj[0] = -1
    adj[1] = np.arange(20)
    enc_native = codec.encode_adjacency(adj)
    enc_py = codec._encode_py(adj)
    assert enc_native == enc_py  # two independent implementations agree
    dec = codec.decode_adjacency(enc_native, 64, 20)
    dec_py = codec._decode_py(enc_py, 64, 20)
    assert np.array_equal(dec, dec_py)
    for i in range(64):
        assert set(dec[i][dec[i] >= 0]) == set(adj[i][adj[i] >= 0])
        # decoded rows are sorted (duplicates allowed: it is a multi-set codec)
        row = dec[i][dec[i] >= 0]
        assert np.all(np.diff(row) >= 0)


def test_codec_large_ids():
    adj = np.array([[2**31 - 2, 7, 1_000_000, -1, 300]], np.int32)
    enc = codec.encode_adjacency(adj)
    dec = codec.decode_adjacency(enc, 1, 5)
    assert set(dec[0][dec[0] >= 0]) == {2**31 - 2, 7, 1_000_000, 300}


def test_elements_roundtrip_embeddings(rng, tmp_path):
    from granne_tpu.elements.embeddings import SumEmbeddings

    emb = rng.standard_normal((40, 12)).astype(np.float32)
    lists = [list(rng.choice(40, size=rng.integers(1, 5), replace=False)) for _ in range(60)]
    c = SumEmbeddings.from_parts(emb, lists)
    p = str(tmp_path / "emb.gt")
    gio.save_elements(c, p)
    loaded = gio.load_elements(p)
    assert isinstance(loaded, SumEmbeddings)
    assert np.allclose(np.asarray(loaded.embeddings), emb)
    assert loaded.get_terms(13) == c.get_terms(13)


def test_embeddings_csr24_compact_on_disk(rng, tmp_path):
    """Ragged corpora store terms as 3-byte CSR ids + chunked offsets
    (odd_byte_int.rs:3-36, embeddings/mod.rs:18-23): file must be far
    smaller than the dense int32 [n, T_max] form."""
    from granne_tpu.elements.embeddings import SumEmbeddings, pad_term_lists
    from granne_tpu.index import io as gio

    n, V, d = 2000, 5000, 16
    emb = rng.standard_normal((V, d)).astype(np.float32)
    # ragged: mostly short rows, a few long ones setting T_max = 64
    lengths = np.minimum(rng.geometric(0.25, n) + 1, 64)
    lengths[0] = 64
    lists = [list(rng.integers(0, V, L)) for L in lengths]
    terms = pad_term_lists(lists)
    assert terms.shape[1] == 64
    se = SumEmbeddings.from_parts(emb, terms)
    path = tmp_path / "se.gt"
    gio.save_elements(se, str(path))
    loaded = gio.load_elements(str(path))
    assert np.array_equal(np.asarray(loaded.terms), terms)
    assert np.allclose(np.asarray(loaded.embeddings), emb)
    terms_file_bytes = path.stat().st_size - gio.METADATA_LEN - emb.nbytes
    dense_bytes = terms.size * 4
    assert terms_file_bytes < 0.4 * dense_bytes, (terms_file_bytes, dense_bytes)


def test_load_elements_device_resident_contract(rng, tmp_path):
    """load_elements returns a DEVICE-resident container (the whole matrix
    uploads at load — the documented contract, io.py load_elements); the
    lazy/host-tier stories are HostGranne and TieredIvf.load(device=False)."""
    import jax

    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    p = str(tmp_path / "el.gt")
    gio.save_elements(AngularVectors.from_raw(vecs), p)
    loaded = gio.load_elements(p)
    assert isinstance(loaded.vectors, jax.Array)
    # committed: a full device buffer, not a host view that uploads lazily
    assert loaded.vectors.shape == (50, 8)


_RSS_SCRIPT = r"""
import os, sys, threading, time
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from granne_tpu.elements.angular import AngularVectors
from granne_tpu.index import io as gio
from granne_tpu import api

# Peak ANONYMOUS memory: mmap-resident file pages (the input map and the
# output's dirty pages) are file-backed and evictable — only anonymous
# allocations (np copies, tobytes temps) measure "materialized the matrix".
peak = [0]
def sample():
    while True:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("RssAnon"):
                    peak[0] = max(peak[0], int(line.split()[1]))
        time.sleep(0.003)
threading.Thread(target=sample, daemon=True).start()

tmp = sys.argv[1]
n, d = 6_000_000, 64  # 1.5 GB f32: >> the 256 MB streaming chunk

# sparse (untouched) memmap: reads return zero pages, no host copy
mm = np.memmap(os.path.join(tmp, "in.bin"), dtype=np.float32, mode="w+", shape=(n, d))
gio.save_elements(AngularVectors(vectors=mm), os.path.join(tmp, "el.gt"))

emb = api.Embeddings()
emb._matrix = np.memmap(os.path.join(tmp, "in.bin"), dtype=np.float32, mode="r", shape=(n, d))
emb.save_embeddings(os.path.join(tmp, "emb.npy"))

time.sleep(0.05)
print(peak[0])
"""


def test_save_paths_stream_bounded_rss(tmp_path):
    """Saving a matrix much larger than the chunk size must not materialize
    it: peak anonymous RSS stays bounded (VERDICT r4 #6 — the reference
    streams shards, embeddings/parsing.rs:63-100).  Import baseline is
    ~165 MB and the streaming chunks are <= 2 x 256 MB; the unchunked
    writers allocated > 3 GB anon on this input (full-matrix np.asarray +
    tobytes)."""
    import subprocess, sys

    script = tmp_path / "rss_probe.py"
    script.write_text(_RSS_SCRIPT)
    out = subprocess.run(
        [sys.executable, str(script), str(tmp_path)],
        capture_output=True, text=True, timeout=600,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    peak_kb = int(out.stdout.strip().splitlines()[-1])
    assert peak_kb < 1_200_000, f"peak anon RSS {peak_kb} kB — writer not streaming?"
    # and the artifacts are real: header + n*d*4 bytes each
    assert (tmp_path / "el.gt").stat().st_size == gio.METADATA_LEN + 6_000_000 * 64 * 4
    assert (tmp_path / "emb.npy").stat().st_size >= 6_000_000 * 64 * 4
