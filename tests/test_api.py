"""API-surface parity tests (mirrors py/src behaviors)."""

import numpy as np
import pytest

from granne_tpu import compute_distance
from granne_tpu.api import (
    GranneBuilder,
    WordEmbeddingsGranne,
    load_granne,
    parse_elements_and_save_to_disk,
    compute_embeddings_and_save_to_disk,
)


def test_compute_distance_matches_manual(rng):
    a = rng.standard_normal(32).astype(np.float32)
    b = rng.standard_normal(32).astype(np.float32)
    d = compute_distance("angular", a, b)
    an, bn = a / np.linalg.norm(a), b / np.linalg.norm(b)
    assert abs(d - max(0.0, 1 - float(an @ bn))) < 1e-4
    di = compute_distance("angular_int", a, b)
    assert abs(di - d) < 0.02


def test_builder_roundtrip_through_files(rng, tmp_path):
    vecs = rng.standard_normal((300, 20)).astype(np.float32)
    b = GranneBuilder("angular", num_neighbors=12, max_search=25)
    for v in vecs:
        b.append(v)
    b.build()
    assert b.indexed_elements == 300
    # GranneBuilder.get_element returns the normalized ingested element
    # (py/src/lib.rs:461-472); Granne.get_internal_element == get_element
    # for dense containers (py/src/lib.rs:255-258)
    g42 = b.get_element(42)
    assert np.allclose(g42, vecs[42] / np.linalg.norm(vecs[42]), atol=1e-4)
    assert np.allclose(b.get_index().get_internal_element(42), g42, atol=1e-6)
    b.save_index(str(tmp_path / "i.gtz"))
    b.save_elements(str(tmp_path / "e.gt"))
    idx = load_granne(str(tmp_path / "i.gtz"), str(tmp_path / "e.gt"))
    res = idx.search(vecs[42], 20, 3)
    assert res[0][0] == 42

    # Granne itself persists (py/src/lib.rs:325-345): save the LOADED index
    # and elements again, reload, identical search result
    idx.save_index(str(tmp_path / "i2.gtz"))
    idx.save_elements(str(tmp_path / "e2.gt"))
    idx2 = load_granne(str(tmp_path / "i2.gtz"), str(tmp_path / "e2.gt"))
    res2 = idx2.search(vecs[42], 20, 3)
    assert [i for i, _ in res2] == [i for i, _ in res]
    assert np.allclose([d for _, d in res2], [d for _, d in res], atol=1e-6)


def test_builder_resume_from_files(rng, tmp_path):
    vecs = rng.standard_normal((400, 16)).astype(np.float32)
    b = GranneBuilder("angular", num_neighbors=12, max_search=25,
                      expected_num_elements=400)
    for v in vecs[:200]:
        b.append(v)
    b.build()
    b.save_index(str(tmp_path / "i.gtz"))
    b.save_elements(str(tmp_path / "e.gt"))

    b2 = GranneBuilder.from_index(
        str(tmp_path / "i.gtz"), str(tmp_path / "e.gt"),
        num_neighbors=12, max_search=25, expected_num_elements=400,
    )
    for v in vecs[200:]:
        b2.append(v)
    b2.build()
    assert b2.indexed_elements == 400
    res = b2.search(vecs[350], 20, 1)
    assert res[0][0] == 350


def test_etl_pipeline_and_text_queries(rng, tmp_path):
    # word dict + corpus -> elements -> precomputed vectors -> text search
    words = [f"w{i}" for i in range(30)]
    (tmp_path / "words.jsonl").write_text("\n".join(f'{{"word": "{w}"}}' for w in words))
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    lines = []
    rngl = np.random.default_rng(0)
    for i in range(100):
        k = rngl.integers(1, 5)
        lines.append(" ".join(words[j] for j in rngl.choice(30, size=k, replace=False)))
    (corpus / "docs.txt").write_text("\n".join(lines))

    parse_elements_and_save_to_disk(str(corpus), str(tmp_path / "words.jsonl"), str(tmp_path / "elements.npz"))
    emb = rng.standard_normal((30, 16)).astype(np.float32)
    compute_embeddings_and_save_to_disk(str(tmp_path / "elements.npz"), emb, str(tmp_path / "vq.gt"))

    from granne_tpu.index import io as gio
    from granne_tpu import AngularIntVectors

    loaded = gio.load_elements(str(tmp_path / "vq.gt"))
    assert isinstance(loaded, AngularIntVectors)
    assert len(loaded) == 100

    # text-query variant over a SumEmbeddings index
    from granne_tpu.elements.embeddings import SumEmbeddings
    from granne_tpu import BuildConfig, Granne, build_layers
    from granne_tpu.elements.embeddings_etl import WordDict

    data = np.load(str(tmp_path / "elements.npz"))
    container = SumEmbeddings.from_parts(emb, data["terms"])
    layers = build_layers(container, BuildConfig(num_neighbors=10, max_search=20))
    wd = WordDict.from_file(str(tmp_path / "words.jsonl"))
    weg = WordEmbeddingsGranne(Granne(layers=layers, elements=container), emb, wd)

    res = weg.search(lines[7], max_search=20, num_elements=3)
    assert res  # text query works
    v = weg.get_internal_vector(lines[7])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4
    # element 7's own text should retrieve something at distance ~0
    assert res[0][1] < 1e-3

    # get_element = summed vector; get_internal_element = the term WORDS
    # (py/src/variants/index.rs:112-121)
    v7 = weg.get_element(7)
    assert abs(np.linalg.norm(v7) - 1.0) < 1e-3
    w7 = weg.get_internal_element(7)
    assert w7 and set(w7) == set(lines[7].split())


def test_builder_reopen_with_different_num_neighbors(rng, tmp_path):
    """Re-open a built index with a different M (src/index/tests.rs:245-291):
    both narrower and wider configs must build on and stay searchable."""
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    b = GranneBuilder("angular", num_neighbors=16, max_search=25,
                      expected_num_elements=300)
    for v in vecs[:150]:
        b.append(v)
    b.build()
    b.save_index(str(tmp_path / "i.gtz"))
    b.save_elements(str(tmp_path / "e.gt"))

    for m2 in (8, 24):  # narrower and wider than the built 16
        b2 = GranneBuilder.from_index(
            str(tmp_path / "i.gtz"), str(tmp_path / "e.gt"),
            num_neighbors=m2, max_search=25, expected_num_elements=300,
        )
        for v in vecs[150:]:
            b2.append(v)
        b2.build()
        assert b2.indexed_elements == 300
        hits = sum(b2.search(vecs[i], 25, 1)[0][0] == i for i in range(250, 300))
        assert hits >= 45, (m2, hits)


def test_get_element_bounds_checked(rng):
    """OOB introspection raises (the reference panics on OOB; silently
    clamping would return the wrong element)."""
    import pytest

    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    b = GranneBuilder("angular", num_neighbors=8, max_search=10)
    for v in vecs:
        b.append(v)
    b.build()
    idx = b.get_index()
    for bad in (-1, 50, 10_000):
        with pytest.raises(IndexError):
            b.get_element(bad)
        with pytest.raises(IndexError):
            idx.get_element(bad)
        with pytest.raises(IndexError):
            idx.get_internal_element(bad)
    # empty builder: no garbage gather
    b0 = GranneBuilder("angular", dim=8, num_neighbors=8, max_search=10)
    with pytest.raises(IndexError):
        b0.get_element(0)


def test_embeddings_append_after_load_keeps_matrix(rng, tmp_path):
    """Appending to a loaded Embeddings must NOT promote the mmapped matrix
    to per-row copies (O(n) blowup at 2M-row GloVe scale)."""
    from granne_tpu.api import Embeddings

    emb = Embeddings()
    words = [f"w{i}" for i in range(100)]
    mat = rng.standard_normal((100, 12)).astype(np.float32)
    for w, v in zip(words, mat):
        assert emb.append(v, w)
    ep, wp = str(tmp_path / "emb.npy"), str(tmp_path / "words.jsonl")
    emb.save(ep, wp)

    loaded = Embeddings(ep, wp)
    new = rng.standard_normal(12).astype(np.float32)
    assert loaded.append(new, "fresh")
    assert loaded._matrix is not None  # matrix stayed memory-mapped
    assert isinstance(loaded._matrix, np.memmap)
    assert len(loaded) == 101
    assert np.allclose(loaded.get_embedding("fresh"), new)
    assert np.allclose(loaded.get_embedding("w3"), mat[3])
    assert not loaded.append(np.zeros(12, np.float32), "w3")  # dup word
    import pytest

    with pytest.raises(ValueError):
        loaded.append(np.zeros(7, np.float32), "short")
    # save after append round-trips the concatenated table
    ep2 = str(tmp_path / "emb2.npy")
    loaded.save_embeddings(ep2)
    back = np.load(ep2)
    assert back.shape == (101, 12)
    assert np.allclose(back[:100], mat) and np.allclose(back[100], new)


def test_module_doctest():
    """Execute the api.py module docstring example (the reference's
    crate-root doctest, src/lib.rs:31-67, as a living test)."""
    import doctest

    import granne_tpu.api as api

    results = doctest.testmod(api, verbose=False)
    assert results.attempted >= 8
    assert results.failed == 0
