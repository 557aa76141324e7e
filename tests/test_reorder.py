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
