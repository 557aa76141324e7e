"""SumEmbeddings element type + ETL (mirrors embeddings tests and
src/elements/embeddings/* behavior)."""

import gzip
import os

import numpy as np
import jax.numpy as jnp

from granne_tpu.elements.embeddings import SumEmbeddings, pad_term_lists, reorder_keys
from granne_tpu.elements import embeddings_etl as etl
from granne_tpu import BuildConfig, Granne, build_layers


def make_container(rng, v=50, d=16, n=200, max_terms=6):
    emb = rng.standard_normal((v, d)).astype(np.float32)
    lists = [list(rng.choice(v, size=rng.integers(1, max_terms), replace=False)) for _ in range(n)]
    return SumEmbeddings.from_parts(emb, lists), emb, lists


def test_vector_is_normalized_sum(rng):
    c, emb, lists = make_container(rng)
    v = np.asarray(c.get(jnp.asarray([3], jnp.int32)))[0]
    expected = emb[lists[3]].sum(0)
    expected = expected / np.linalg.norm(expected)
    assert np.allclose(v, expected, atol=1e-5)


def test_create_embedding_adhoc(rng):
    c, emb, _ = make_container(rng)
    v = c.create_embedding([1, 2, 5])
    expected = emb[[1, 2, 5]].sum(0)
    expected /= np.linalg.norm(expected)
    assert np.allclose(v, expected, atol=1e-5)


def test_get_terms_roundtrip(rng):
    c, _, lists = make_container(rng)
    assert c.get_terms(17) == [int(t) for t in lists[17]]


def test_hnsw_over_sum_embeddings(rng):
    c, _, _ = make_container(rng, v=100, d=24, n=400)
    layers = build_layers(c, BuildConfig(num_neighbors=16, max_search=30))
    index = Granne(layers=layers, elements=c)
    q = np.asarray(c.get(jnp.arange(400, dtype=jnp.int32)))
    ids, _ = index.search_batch(q, max_search=20, num_neighbors=1)
    # duplicates possible (same term multiset) -> compare by distance
    ids = np.asarray(ids)[:, 0]
    v_res = np.asarray(c.get(jnp.asarray(ids)))
    recall = np.mean(np.sum(v_res * q, axis=1) > 1 - 1e-4)
    assert recall > 0.95, f"embedding self-recall {recall}"


def test_hnsw_over_sum_embeddings_cached(rng):
    """neighbor_cache builds work over SumEmbeddings (the cache also
    materializes the on-the-fly summed vectors) and serving through
    with_neighbor_cache holds self-recall."""
    c, _, _ = make_container(rng, v=100, d=24, n=400)
    layers = build_layers(
        c, BuildConfig(num_neighbors=16, max_search=30, neighbor_cache=True)
    )
    index = Granne(layers=layers, elements=c).with_neighbor_cache()
    q = np.asarray(c.get(jnp.arange(400, dtype=jnp.int32)))
    ids, _ = index.search_batch(q, max_search=20, num_neighbors=1)
    ids = np.asarray(ids)[:, 0]
    v_res = np.asarray(c.get(jnp.asarray(ids)))
    recall = np.mean(np.sum(v_res * q, axis=1) > 1 - 1e-3)
    assert recall > 0.93, f"cached embedding self-recall {recall}"


def test_permute_and_extend(rng):
    c, _, lists = make_container(rng)
    order = np.arange(len(c))[::-1].copy()
    p = c.permute(order)
    assert p.get_terms(0) == c.get_terms(len(c) - 1)
    e = c.extend([[1, 2], [3]])
    assert len(e) == len(c) + 2
    assert e.get_terms(len(c)) == [1, 2]


def test_reorder_keys_norm_ordering(rng):
    c, emb, lists = make_container(rng)
    keys = reorder_keys(c, max_terms=4)
    norms = np.linalg.norm(emb, axis=1)
    for i in [0, 5, 11]:
        ts = [t for t in keys[i] if t < emb.shape[0]]
        got_norms = norms[ts]
        assert np.all(np.diff(got_norms) <= 1e-6)  # descending


def test_etl_word_dict_and_parse(tmp_path, rng):
    words = ["alpha", "beta", "gamma", "delta"]
    dict_path = tmp_path / "words.jsonl"
    dict_path.write_text("\n".join(f'{{"word": "{w}"}}' for w in words))
    wd = etl.WordDict.from_file(str(dict_path))
    assert len(wd) == 4 and wd.get_id("gamma") == 2 and wd.get_word(3) == "delta"

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "a.txt").write_text("alpha beta\ngamma unknown delta\n\n")
    with gzip.open(corpus / "b.txt.gz", "wt") as f:
        f.write("beta beta alpha\n")
    lists = etl.parse_corpus_dir(str(corpus), wd)
    assert [0, 1] in lists and [2, 3] in lists and [1, 1, 0] in lists

    shard_dir = tmp_path / "shards"
    paths = etl.write_shards(lists, str(shard_dir), 2)
    assert len(paths) == 2
    total = sum(np.load(p)["terms"].shape[0] for p in paths)
    assert total == len(lists)


def test_precompute_quantized(rng):
    c, _, _ = make_container(rng, n=50)
    qv = etl.precompute_quantized_vectors(c)
    assert len(qv) == 50
    # quantized vector should be close in direction to the on-the-fly one
    v = np.asarray(c.get(jnp.asarray([7], jnp.int32)))[0]
    qvec = np.asarray(qv.vectors[7], np.float32)
    qvec /= np.linalg.norm(qvec)
    assert np.dot(v, qvec) > 0.99


# ---------------------------------------------------------------------------
# Standalone Embeddings collection (py/src/embeddings.rs:8-144)
# ---------------------------------------------------------------------------


def test_embeddings_class_append_dist_save(rng, tmp_path):
    from granne_tpu import Embeddings

    e = Embeddings()
    d = 12
    vecs = rng.standard_normal((4, d)).astype(np.float32)
    for i, w in enumerate(["alpha", "beta", "gamma", "delta"]):
        assert e.append(vecs[i], w) is True
    assert e.append(vecs[0], "alpha") is False  # duplicate word rejected
    assert len(e) == 4

    # get_embedding: by id, id-list, and text string (un-normalized sums)
    assert np.allclose(e.get_embedding(2), vecs[2])
    assert np.allclose(e.get_embedding([0, 3]), vecs[0] + vecs[3])
    assert np.allclose(e.get_embedding("alpha delta"), vecs[0] + vecs[3])
    assert np.allclose(e.get_embedding("unknown words"), 0.0)

    # dist: angular distance of normalized sums; dist(x, x) == 0
    assert e.dist("alpha", "alpha") < 1e-6
    s, t = vecs[0] + vecs[1], vecs[2]
    expect = max(0.0, 1.0 - np.dot(s / np.linalg.norm(s), t / np.linalg.norm(t)))
    assert abs(e.dist("alpha beta", "gamma") - expect) < 1e-5
    ds = e.dists("alpha", ["beta", [2], 3])
    assert len(ds) == 3 and abs(ds[2] - e.dist("alpha", "delta")) < 1e-6

    # save -> load round trip
    ep, wp = str(tmp_path / "emb.npy"), str(tmp_path / "words.jsonl")
    e.save(ep, wp)
    # reference WordDict format: one bare JSON string per line
    # (py/src/variants/mod.rs write), loadable by upstream granne
    with open(wp, encoding="utf-8") as f:
        first = f.readline().strip()
    assert first == '"alpha"'
    e2 = Embeddings(ep, wp)
    assert len(e2) == 4
    assert np.allclose(e2.get_embedding("beta gamma"), vecs[1] + vecs[2], atol=1e-6)
    # loaded collections can keep growing (append promotes the mmap to rows)
    assert e2.append(rng.standard_normal(d).astype(np.float32), "epsilon")
    assert len(e2) == 5


def test_embeddings_class_path_pairing():
    from granne_tpu import Embeddings
    import pytest

    with pytest.raises(ValueError):
        Embeddings(embeddings_path="only_one.npy")
