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
