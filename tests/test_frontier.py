"""Batched frontier search vs the scalar heap oracle on identical graphs.

This is the heart of the TPU redesign: the beam-with-expanded-flags kernel
must return the same result sets as the reference's heap/visited-set loop
(``/root/reference/src/index/mod.rs:999-1037``) when run on the same graph.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from granne_tpu.elements import AngularVectors
from granne_tpu.index.graph import LayerStack
from granne_tpu.models import scalar_ref
from granne_tpu.ops import frontier


def build_oracle_graph(rng, n, d, m=10, ef=40):
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    b = scalar_ref.ScalarHnswBuilder(vecs, num_neighbors=m, max_search=ef)
    b.build()
    return b


@pytest.mark.parametrize("n,d", [(200, 16), (500, 25)])
def test_bottom_layer_beam_matches_oracle(rng, n, d):
    b = build_oracle_graph(rng, n, d)
    adj = b.layers[-1]
    stack = LayerStack.from_numpy([adj])
    elements = AngularVectors.from_normalized(b.vectors)

    ef = 30
    nq = 32
    queries = rng.standard_normal((nq, d)).astype(np.float32)
    qn = scalar_ref.normalize_rows(queries)

    q = elements.prepare_queries(jnp.asarray(qn))
    ids, dists = frontier.beam_search(
        stack.layers[0], elements, q, jnp.zeros((nq,), jnp.int32), ef=ef
    )
    ids = np.asarray(ids)
    dists = np.asarray(dists)

    agree = 0
    for k in range(nq):
        oracle = scalar_ref.search_for_neighbors(adj, 0, b.vectors, qn[k], ef)
        oracle_ids = [i for i, _ in oracle]
        got = [int(i) for i in ids[k] if i >= 0]
        # distances ascending
        dk = dists[k][np.asarray(ids[k]) >= 0]
        assert np.all(np.diff(dk) >= -1e-6)
        # strong parity: beam result set == oracle result set
        if set(got) == set(oracle_ids):
            agree += 1
        # weak parity: top-1 must match, overlap must be high
        assert got[0] == oracle_ids[0]
        overlap = len(set(got) & set(oracle_ids)) / max(1, len(oracle_ids))
        assert overlap >= 0.9
    assert agree >= int(0.8 * nq)


def test_multilayer_search_recall(rng):
    n, d = 600, 25
    b = build_oracle_graph(rng, n, d, m=12, ef=50)
    stack = LayerStack.from_numpy(b.layers)
    elements = AngularVectors.from_normalized(b.vectors)

    # self-query every element: recall@1 > 0.95 (reference tests.rs:50-62)
    q = elements.prepare_queries(jnp.asarray(b.vectors))
    ids, _ = frontier.search_layers(
        stack.layers, elements, q, ef=20, num_neighbors=1
    )
    ids = np.asarray(ids)[:, 0]
    recall = float(np.mean(ids == np.arange(n)))
    assert recall > 0.95, f"recall@1 = {recall}"


def test_expand_multiple_keeps_quality(rng):
    n, d = 400, 16
    b = build_oracle_graph(rng, n, d)
    stack = LayerStack.from_numpy(b.layers)
    elements = AngularVectors.from_normalized(b.vectors)
    q = elements.prepare_queries(jnp.asarray(b.vectors[:64]))
    ids1, d1 = frontier.search_layers(stack.layers, elements, q, ef=24, num_neighbors=5, expand=1)
    ids4, d4 = frontier.search_layers(stack.layers, elements, q, ef=24, num_neighbors=5, expand=4)
    # expanding 4-at-a-time explores a superset; top-1 agreement should be near total
    match = np.mean(np.asarray(ids1[:, 0]) == np.asarray(ids4[:, 0]))
    assert match >= 0.95


def test_ef1_is_greedy_descent(rng):
    n, d = 300, 16
    b = build_oracle_graph(rng, n, d)
    adj = b.layers[-1]
    elements = AngularVectors.from_normalized(b.vectors)
    queries = scalar_ref.normalize_rows(rng.standard_normal((16, d)).astype(np.float32))
    q = elements.prepare_queries(jnp.asarray(queries))
    ids, dists = frontier.beam_search(
        jnp.asarray(np.pad(adj, ((0, 0), (0, 0)), constant_values=-1)),
        elements,
        q,
        jnp.zeros((16,), jnp.int32),
        ef=1,
    )
    ids = np.asarray(ids)[:, 0]
    # every result must be a local minimum w.r.t. its graph neighborhood
    for k in range(16):
        node = int(ids[k])
        dn = scalar_ref.angular_dist(b.vectors[node], queries[k])
        for nbr in adj[node]:
            if nbr >= 0:
                assert dn <= scalar_ref.angular_dist(b.vectors[int(nbr)], queries[k]) + 1e-6


def test_multi_entry_seeding(rng):
    """descent_ef > 1 seeds the bottom beam with several upper-layer
    candidates; recall must not regress vs single-entry descent."""
    from granne_tpu import AngularVectors, BuildConfig, build_layers

    n, d = 3000, 24
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    el = AngularVectors.from_raw(vecs)
    layers = build_layers(el, BuildConfig(num_neighbors=12, max_search=30))
    q = el.prepare_queries(jnp.asarray(vecs[:256]))
    r = {}
    for de in (1, 4):
        ids, dists = frontier.search_layers(
            layers.layers, el, q, ef=20, num_neighbors=1, descent_ef=de
        )
        ids = np.asarray(ids)
        r[de] = float(np.mean(ids[:, 0] == np.arange(256)))
        d0 = np.asarray(dists)[:, 0]
        assert np.all(d0[ids[:, 0] >= 0] < 1e-3)
    assert r[4] >= r[1] - 0.01, r


def test_gather_budget(rng):
    """A per-iteration vector-gather budget must (a) be a no-op when >= the
    candidate width, (b) hold self-recall when moderately tight."""
    from granne_tpu import AngularVectors, BuildConfig, build_layers

    n, d, M = 3000, 24, 12
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    el = AngularVectors.from_raw(vecs)
    layers = build_layers(el, BuildConfig(num_neighbors=M, max_search=30))
    q = el.prepare_queries(jnp.asarray(vecs[:256]))

    base_ids, _ = frontier.search_layers(
        layers.layers, el, q, ef=20, num_neighbors=1, expand=2
    )
    # budget >= expand*M: byte-for-byte the unbudgeted program
    full_ids, _ = frontier.search_layers(
        layers.layers, el, q, ef=20, num_neighbors=1, expand=2, gather_budget=2 * M
    )
    assert np.array_equal(np.asarray(base_ids), np.asarray(full_ids))

    tight_ids, _ = frontier.search_layers(
        layers.layers, el, q, ef=20, num_neighbors=1, expand=2, gather_budget=M
    )
    base_r = float(np.mean(np.asarray(base_ids)[:, 0] == np.arange(256)))
    tight_r = float(np.mean(np.asarray(tight_ids)[:, 0] == np.arange(256)))
    assert tight_r >= base_r - 0.05, (base_r, tight_r)


def test_neighbor_cache_beam_parity(rng):
    """Fused cache scoring must reproduce the uncached beam exactly when the
    element container is already bf16 (the cache stores bf16 rows)."""
    from granne_tpu import AngularVectors, BuildConfig, build_layers
    from granne_tpu.ops.nbr_cache import make_neighbor_cache

    n, d, M = 2000, 24, 12
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    el = AngularVectors.from_raw(vecs)
    layers = build_layers(el, BuildConfig(num_neighbors=M, max_search=30))
    adj = layers.layers[-1]

    el16 = el.as_bf16()
    q = el16.prepare_queries(jnp.asarray(vecs[:128]))
    tab = make_neighbor_cache(adj, el16)
    base_ids, base_d = frontier.beam_search(
        adj, el16, q, jnp.zeros((128,), jnp.int32), ef=20, expand=2
    )
    fused_ids, fused_d = frontier.beam_search(
        adj, el16, q, jnp.zeros((128,), jnp.int32), ef=20, expand=2, nbr_vecs=tab
    )
    assert np.array_equal(np.asarray(base_ids), np.asarray(fused_ids))
    np.testing.assert_allclose(np.asarray(base_d), np.asarray(fused_d), rtol=1e-6)


def test_neighbor_cache_build_recall(rng):
    """A neighbor_cache build scores candidates in bf16; the resulting graph
    must hold self-recall parity with the uncached f32 build."""
    from granne_tpu import AngularVectors, BuildConfig, build_layers

    n, d, M = 3000, 24, 12
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    el = AngularVectors.from_raw(vecs)
    q = el.prepare_queries(jnp.asarray(vecs[:256]))

    r = {}
    for cache in (False, True):
        layers = build_layers(
            el, BuildConfig(num_neighbors=M, max_search=30, neighbor_cache=cache)
        )
        ids, _ = frontier.search_layers(layers.layers, el, q, ef=20, num_neighbors=1)
        r[cache] = float(np.mean(np.asarray(ids)[:, 0] == np.arange(256)))
    assert r[True] >= r[False] - 0.02, r


def test_rerank_exact_final_ordering(rng):
    """search_layers(rerank=True) must return the final beam re-sorted by
    EXACT f32 distances (dequantized int8 unit rows x the unquantized unit
    query) — verified against a numpy recompute — and only reorder/refine
    within the beam the plain search produced."""
    from granne_tpu import AngularVectors, BuildConfig, build_layers
    from granne_tpu.elements.angular_int import AngularIntVectors
    from granne_tpu.ops.nbr_cache import make_neighbor_cache

    n, d, M, ef, k = 2000, 24, 12, 24, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    el = AngularVectors.from_raw(vecs)
    layers = build_layers(el, BuildConfig(num_neighbors=M, max_search=30))

    el8 = AngularIntVectors.from_raw(vecs, rounding="nearest")
    queries = rng.standard_normal((64, d)).astype(np.float32)
    q8 = el8.prepare_queries(jnp.asarray(queries))
    tab8 = make_neighbor_cache(layers.layers[-1], el8)
    kw = dict(ef=ef, expand=1, descent_ef=4)

    beam_ids, _ = frontier.search_layers(
        layers.layers, el8, q8, nbr_vecs=tab8, num_neighbors=ef, **kw
    )
    rr_ids, rr_d = frontier.search_layers(
        layers.layers, el8, q8, nbr_vecs=tab8, num_neighbors=k, rerank=True, **kw
    )
    beam_ids, rr_ids, rr_d = map(np.asarray, (beam_ids, rr_ids, rr_d))

    unit = np.asarray(el8.vectors).astype(np.float32) * np.asarray(el8.inv_norms)[:, None]
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    for i in range(64):
        assert set(rr_ids[i]) <= set(beam_ids[i])  # drawn from the same beam
        exact = np.maximum(0.0, 1.0 - unit[rr_ids[i]] @ qn[i])
        np.testing.assert_allclose(rr_d[i], exact, atol=1e-5)
        assert np.all(np.diff(rr_d[i]) >= -1e-6)  # ascending
        # top-k by exact distance over the WHOLE beam == the reranked top-k
        beam_exact = np.maximum(0.0, 1.0 - unit[beam_ids[i]] @ qn[i])
        want = beam_exact[np.argsort(beam_exact, kind="stable")[:k]]
        np.testing.assert_allclose(np.sort(rr_d[i]), want, atol=1e-5)


def test_rerank_f32_container_is_noop_on_order(rng):
    """On the exact f32 container rerank may not LOSE results: the top-k
    distances must match the plain search's (scoring is already exact, so
    re-sorting the beam by the same metric preserves the top-k set)."""
    from granne_tpu import AngularVectors, BuildConfig, build_layers

    n, d = 1500, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    el = AngularVectors.from_raw(vecs)
    layers = build_layers(el, BuildConfig(num_neighbors=10, max_search=30))
    q = el.prepare_queries(jnp.asarray(vecs[:128]))

    kw = dict(ef=20, num_neighbors=5, expand=1)
    ids0, d0 = frontier.search_layers(layers.layers, el, q, **kw)
    ids1, d1 = frontier.search_layers(layers.layers, el, q, rerank=True, **kw)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-5)
    assert np.array_equal(np.asarray(ids0), np.asarray(ids1))


def test_f32_cache_exact_parity(rng):
    """A cache_dtype="f32" flat table embeds exact rows + int32 ids, so the
    cached beam must reproduce the uncached f32 beam EXACTLY (ids and
    distances) — and for int8 elements it must match the precision of the
    bf16-cache + exact-rerank path on the final top-k distances."""
    from granne_tpu import AngularVectors, BuildConfig, build_layers
    from granne_tpu.elements.angular_int import AngularIntVectors
    from granne_tpu.ops.nbr_cache import make_neighbor_cache

    n, d, M = 2500, 24, 12
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    el = AngularVectors.from_raw(vecs)
    layers = build_layers(el, BuildConfig(num_neighbors=M, max_search=30))
    q = el.prepare_queries(jnp.asarray(vecs[:96]))
    kw = dict(ef=20, num_neighbors=10, expand=1, descent_ef=4)

    tabf = make_neighbor_cache(layers.layers[-1], el, cache_dtype="f32")
    ids0, d0 = frontier.search_layers(layers.layers, el, q, **kw)
    ids1, d1 = frontier.search_layers(layers.layers, el, q, nbr_vecs=tabf, **kw)
    assert np.array_equal(np.asarray(ids0), np.asarray(ids1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)

    # int8: every f32-cache distance must equal the exact dequantized score
    el8 = AngularIntVectors.from_raw(vecs, rounding="nearest")
    q8 = el8.prepare_queries(jnp.asarray(vecs[:96]))
    tab8 = make_neighbor_cache(layers.layers[-1], el8, cache_dtype="f32")
    ids8, d8 = frontier.search_layers(layers.layers, el8, q8, nbr_vecs=tab8, **kw)
    ids8, d8 = np.asarray(ids8), np.asarray(d8)
    unit = np.asarray(el8.vectors).astype(np.float32) * np.asarray(el8.inv_norms)[:, None]
    qn = vecs[:96] / np.linalg.norm(vecs[:96], axis=1, keepdims=True)
    for i in range(96):
        exact = np.maximum(0.0, 1.0 - unit[ids8[i]] @ qn[i])
        np.testing.assert_allclose(d8[i], exact, atol=1e-5)


def test_dequantized_serving_with_rerank(rng):
    """The dequantized int8 serving path: traversal through the bf16 unit
    copy, exact final ordering against the int8 storage via rerank_with.
    The copy's rows must be the bf16 cast of the exact dequant, and the
    reranked distances must match a numpy recompute of int8 scoring."""
    from granne_tpu import AngularVectors, BuildConfig, build_layers
    from granne_tpu.elements.angular_int import AngularIntVectors
    from granne_tpu.ops.nbr_cache import make_neighbor_cache

    n, d, M = 2000, 24, 12
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    el = AngularVectors.from_raw(vecs)
    layers = build_layers(el, BuildConfig(num_neighbors=M, max_search=30))

    el8 = AngularIntVectors.from_raw(vecs, rounding="nearest")
    el8dq = el8.dequantized()
    unit = np.asarray(el8.vectors).astype(np.float32) * np.asarray(el8.inv_norms)[:, None]
    np.testing.assert_array_equal(
        np.asarray(el8dq.vectors),
        np.asarray(jnp.asarray(unit).astype(jnp.bfloat16)),
    )

    queries = rng.standard_normal((64, d)).astype(np.float32)
    qdq = el8dq.prepare_queries(jnp.asarray(queries))
    tab = make_neighbor_cache(layers.layers[-1], el8dq)
    ids, dist = frontier.search_layers(
        layers.layers, el8dq, qdq, nbr_vecs=tab, rerank=True, rerank_with=el8,
        ef=24, num_neighbors=10, expand=1, descent_ef=4,
    )
    ids, dist = np.asarray(ids), np.asarray(dist)
    # rerank scored against the int8 storage with the (bf16-cast) unit query
    qbf = np.asarray(jnp.asarray(
        queries / np.linalg.norm(queries, axis=1, keepdims=True)
    ).astype(jnp.bfloat16).astype(jnp.float32))
    for i in range(64):
        exact = np.maximum(0.0, 1.0 - unit[ids[i]] @ qbf[i])
        np.testing.assert_allclose(dist[i], exact, atol=2e-5)
        assert np.all(np.diff(dist[i]) >= -1e-6)


def test_packed_merge_fallback_parity(rng, monkeypatch):
    """The >=2^30-row beam merge falls back from the packed-id bitonic
    merge to a full lax.sort (frontier.py PACKED_MERGE_MAX_ROWS).  Force
    the fallback on a small graph and require IDENTICAL beams — the two
    branches must be semantically interchangeable (VERDICT r4 #7: the
    fallback previously had no test)."""
    n, d, ef, nq = 400, 12, 24, 16
    b = build_oracle_graph(rng, n, d)
    stack = LayerStack.from_numpy([b.layers[-1]])
    elements = AngularVectors.from_normalized(b.vectors)
    q = elements.prepare_queries(
        jnp.asarray(scalar_ref.normalize_rows(rng.standard_normal((nq, d)).astype(np.float32)))
    )
    ep = jnp.zeros((nq,), jnp.int32)

    ids_packed, d_packed = frontier.beam_search(stack.layers[0], elements, q, ep, ef=ef)
    monkeypatch.setattr(frontier, "PACKED_MERGE_MAX_ROWS", 1)
    ids_sort, d_sort = frontier.beam_search(stack.layers[0], elements, q, ep, ef=ef)

    assert np.array_equal(np.asarray(ids_packed), np.asarray(ids_sort))
    assert np.allclose(np.asarray(d_packed), np.asarray(d_sort), rtol=0, atol=0)
