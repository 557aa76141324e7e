"""Locality reordering tests (mirrors reorder.rs doctests + structure)."""

import numpy as np

from granne_tpu import AngularVectors, BuildConfig, Granne, build_layers


def _build(rng, n=400, d=16):
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    elements = AngularVectors.from_raw(vecs)
    layers = build_layers(elements, BuildConfig(num_neighbors=12, max_search=25))
    return vecs, Granne(layers=layers, elements=elements)


def test_reorder_preserves_search_results(rng):
    vecs, index = _build(rng)
    n = len(index)
    reordered, order = index.reorder()
    assert sorted(order.tolist()) == list(range(n))
    # result-id translation contract (reorder.rs:19-57)
    for i in [3, 77, 200]:
        res_new = reordered.search(vecs[i], 20, 1)
        assert order[res_new[0][0]] == i


def test_reorder_preserves_layer_structure(rng):
    _, index = _build(rng)
    reordered, order = index.reorder()
    assert reordered.num_layers == index.num_layers
    for l in range(index.num_layers):
        assert reordered.layer_len(l) == index.layer_len(l)
    # graph is isomorphic: node degree distribution preserved
    inv = np.empty(len(order), np.int64)
    inv[order] = np.arange(len(order))
    old = index.layers.as_numpy()[-1]
    new = reordered.layers.as_numpy()[-1]
    for i in [0, 50, 123]:
        old_row = {int(x) for x in old[order[i]] if x >= 0}
        new_row = {int(order[x]) for x in new[i] if x >= 0}
        assert old_row == new_row


def test_reorder_by_external_keys(rng):
    vecs, index = _build(rng, n=200)
    n = len(index)
    # explicit reverse permutation within each layer band is legal iff bands
    # are preserved; use identity except swap two bottom-band ids
    counts = list(index.layers.counts)
    order = np.arange(n)
    a, b = counts[-2] + 1, counts[-2] + 2  # two ids only in the bottom layer
    order[a], order[b] = order[b], order[a]
    reordered, order_out = index.reorder(order)
    assert np.array_equal(order_out, order)
    res = reordered.search(vecs[order[a]], 20, 1)
    assert res[0][0] == a


def test_reorder_recall_unchanged(rng):
    vecs, index = _build(rng, n=500)
    reordered, order = index.reorder()
    ids, _ = reordered.search_batch(vecs, max_search=20, num_neighbors=1)
    ids = np.asarray(ids)[:, 0]
    recall = np.mean(order[ids] == np.arange(500))
    assert recall > 0.95


def test_reorder_by_keys_layer_respecting(rng):
    """reorder_by_keys sorts each layer band by the external key
    (reorder.rs:90-125): keys must be ascending within every band and
    searches must still translate through the returned order."""
    vecs, index = _build(rng)
    n = index.layers.num_elements
    keys = rng.integers(0, 50, n)
    reordered, order = index.reorder_by_keys(keys)
    prev = 0
    for count in index.layers.counts:
        band_keys = keys[order[prev:count]]
        assert np.all(np.diff(band_keys) >= 0), "band not sorted by key"
        prev = count
    for i in rng.integers(0, n, 20):
        res = reordered.search(vecs[order[i]], 20, 1)
        assert res[0][0] == i


def test_reorder_by_keys_embeddings_doctest(rng):
    """The reference's embeddings reorder workflow (embeddings/reorder.rs:6-25):
    keys from reorder_keys(container), reorder, results translate."""
    from granne_tpu.elements.embeddings import SumEmbeddings, reorder_keys

    V, d, n = 300, 12, 250
    emb = rng.standard_normal((V, d)).astype(np.float32)
    lists = [list(rng.integers(0, V, rng.integers(1, 6))) for _ in range(n)]
    se = SumEmbeddings.from_parts(emb, lists)
    layers = build_layers(se, BuildConfig(num_neighbors=10, max_search=20))
    index = Granne(layers=layers, elements=se)
    keys = reorder_keys(se)
    reordered, order = index.reorder_by_keys(keys)
    assert sorted(order.tolist()) == list(range(n))
    # terms permuted consistently: new element i has old order[i]'s terms
    for i in rng.integers(0, n, 10):
        assert reordered.elements.get_terms(int(i)) == se.get_terms(int(order[i]))
    # self-queries still resolve through the translation
    q = np.asarray(se.get(np.arange(n, dtype=np.int32)))
    ids, _ = reordered.search_batch(q[order][:40], max_search=20, num_neighbors=1)
    hits = np.mean(np.asarray(ids)[:, 0] == np.arange(40))
    assert hits > 0.9


def test_compute_order_sorts_by_trails(rng):
    """Regression: the locality order must actually sort each band by the
    entrypoint trail (np.lexsort's primary key is its LAST column; a
    mis-ordered column list silently yields the identity permutation)."""
    from granne_tpu.index.reorder import _entrypoint_trails, compute_order

    vecs, index = _build(rng, n=600)
    trails = _entrypoint_trails(index.layers, index.elements)
    order = compute_order(index.layers, index.elements)
    if trails.shape[1] == 0:
        return  # single-layer graph: nothing to sort by
    prev = 0
    for count in index.layers.counts:
        band = order[prev:count]
        t = trails[band]
        flat = [tuple(row) for row in t]
        assert flat == sorted(flat), "band not sorted by entrypoint trail"
        prev = count
