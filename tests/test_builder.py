"""Wave-parallel builder tests.

Mirrors the reference index tests (/root/reference/src/index/tests.rs):
recall@1 > 0.95 self-query harness (:41-62, :115-132), layer-count
structure (:135-169, :305-335), partial/resumable builds (:172-192), and
i8 parity (:124-132).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from granne_tpu import AngularVectors, AngularIntVectors, BuildConfig, Granne, build_layers
from granne_tpu.index import schedule


def build_and_search(rng, n, d, max_search_build=30, max_search_q=20, **cfg_kw):
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    elements = AngularVectors.from_raw(vecs)
    cfg = BuildConfig(num_neighbors=20, max_search=max_search_build, **cfg_kw)
    layers = build_layers(elements, cfg)
    index = Granne(layers=layers, elements=elements)
    ids, _ = index.search_batch(vecs, max_search=max_search_q, num_neighbors=1)
    recall = float(np.mean(np.asarray(ids)[:, 0] == np.arange(n)))
    return index, recall


def test_self_query_recall_small(rng):
    _, recall = build_and_search(rng, 500, 25)
    assert recall > 0.95, f"recall@1 = {recall}"


def test_self_query_recall_larger(rng):
    _, recall = build_and_search(rng, 1500, 32, max_search_build=40, max_search_q=30)
    assert recall > 0.95, f"recall@1 = {recall}"


def test_layer_structure(rng):
    n = 1000
    index, _ = build_and_search(rng, n, 16)
    expected = schedule.layer_counts(n, 15.0)
    assert index.num_layers == len(expected)
    assert [index.layer_len(i) for i in range(index.num_layers)] == expected


def test_partial_build_then_continue(rng):
    n, d = 600, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    elements = AngularVectors.from_raw(vecs)
    cfg = BuildConfig(num_neighbors=16, max_search=30, expected_num_elements=n)
    part = build_layers(elements, cfg, num_elements=300)
    assert part.num_elements == 300
    full = build_layers(elements, cfg, state=part)
    assert full.num_elements == n
    index = Granne(layers=full, elements=elements)
    ids, _ = index.search_batch(vecs, max_search=20, num_neighbors=1)
    recall = float(np.mean(np.asarray(ids)[:, 0] == np.arange(n)))
    assert recall > 0.93, f"recall@1 after resume = {recall}"


def test_neighbor_cache_build_recall(rng):
    """neighbor_cache=True builds (the BENCH_BUILD_CACHE path: candidate
    scoring and reverse merges fed from bf16 cache rows instead of f32
    element gathers) must hold the same self-recall bar as uncached builds.
    Not bit-exact by design — cache rows are bf16."""
    _, recall = build_and_search(rng, 500, 25, neighbor_cache=True)
    assert recall > 0.95, f"cache-build recall@1 = {recall}"


def test_neighbor_cache_build_matches_uncached_quality(rng):
    n, d = 800, 32
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    elements = AngularVectors.from_raw(vecs)
    recalls = {}
    for cache in (False, True):
        cfg = BuildConfig(num_neighbors=16, max_search=40, neighbor_cache=cache)
        layers = build_layers(elements, cfg)
        index = Granne(layers=layers, elements=elements)
        ids, _ = index.search_batch(vecs, max_search=30, num_neighbors=1)
        recalls[cache] = float(np.mean(np.asarray(ids)[:, 0] == np.arange(n)))
    assert recalls[True] >= recalls[False] - 0.02, f"recalls: {recalls}"


def test_i8_recall(rng):
    n, d = 500, 25
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    elements = AngularIntVectors.from_raw(vecs)
    cfg = BuildConfig(num_neighbors=20, max_search=30)
    layers = build_layers(elements, cfg)
    index = Granne(layers=layers, elements=elements)
    ids, _ = index.search_batch(vecs, max_search=20, num_neighbors=1)
    recall = float(np.mean(np.asarray(ids)[:, 0] == np.arange(n)))
    assert recall > 0.95, f"i8 recall@1 = {recall}"


def test_neighbor_rows_are_valid(rng):
    n = 400
    index, _ = build_and_search(rng, n, 16)
    for layer in range(index.num_layers):
        count = index.layer_len(layer)
        arr = np.asarray(index.layers.layers[layer])
        used = arr[:count]
        # ids within range, no self loops
        assert used.max() < count
        for i in range(0, count, 37):
            row = [x for x in used[i] if x >= 0]
            assert i not in row
            assert len(row) == len(set(row))  # no duplicate edges


def test_zero_vector_skipped(rng):
    n, d = 300, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs[7] = 0.0  # zero element must become unreachable (mod.rs:812-814)
    elements = AngularVectors.from_raw(vecs)
    layers = build_layers(elements, BuildConfig(num_neighbors=16, max_search=30))
    bottom = np.asarray(layers.layers[-1])[:n]
    assert np.all(bottom[7] == -1)  # no forward edges
    assert not np.any(bottom == 7)  # no reverse edges


def test_duplicate_elements_dead_nodes(rng):
    # many exact duplicates: per group, at most ~M/2+1 copies connect (the
    # reference dead-node rule, mod.rs:827-832); compare against the scalar
    # oracle's connected count on the same data
    from granne_tpu.models import scalar_ref

    n, d, m = 200, 16, 10
    base = rng.standard_normal((20, d)).astype(np.float32)
    vecs = np.tile(base, (10, 1))
    elements = AngularVectors.from_raw(vecs)
    layers = build_layers(elements, BuildConfig(num_neighbors=m, max_search=20))
    bottom = np.asarray(layers.layers[-1])[:n]
    connected = int(np.sum(np.any(bottom >= 0, axis=1)))

    oracle = scalar_ref.ScalarHnswBuilder(vecs, num_neighbors=m, max_search=20)
    oracle.build()
    oracle_connected = int(np.sum(np.any(oracle.layers[-1] >= 0, axis=1)))

    # upper bound: each of the 20 groups connects at most m//2 + 1 copies
    assert connected <= 20 * (m // 2 + 1)
    assert abs(connected - oracle_connected) <= 25


def test_empty_build():
    elements = AngularVectors.from_raw(np.zeros((0, 8), np.float32))
    layers = build_layers(elements, BuildConfig())
    assert layers.num_elements == 0


def test_i8_vs_f32_recall_parity(rng):
    # BASELINE config 2: quantized path recall parity vs f32 at equal M/ef
    n, d = 800, 32
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    cfg = BuildConfig(num_neighbors=16, max_search=30)
    queries = vecs + 0.05 * rng.standard_normal((n, d)).astype(np.float32)

    e32 = AngularVectors.from_raw(vecs)
    l32 = build_layers(e32, cfg)
    ids32, _ = Granne(layers=l32, elements=e32).search_batch(queries, 30, 1)
    r32 = float(np.mean(np.asarray(ids32)[:, 0] == np.arange(n)))

    e8 = AngularIntVectors.from_raw(vecs)
    l8 = build_layers(e8, cfg)
    ids8, _ = Granne(layers=l8, elements=e8).search_batch(queries, 30, 1)
    r8 = float(np.mean(np.asarray(ids8)[:, 0] == np.arange(n)))

    assert r32 > 0.95
    assert r8 > r32 - 0.03, f"i8 recall {r8} vs f32 {r32}"


def test_element_count_limit_enforced():
    """int32 id limit (reference: 2^32-2 at src/index/mod.rs:420; here
    2^31-2) is rejected up front, before any work."""
    import pytest
    from granne_tpu import MAX_ELEMENTS, AngularVectors, BuildConfig, build_layers

    class HugeElements:
        def __len__(self):
            return MAX_ELEMENTS + 1

    with pytest.raises(ValueError, match="at most"):
        build_layers(HugeElements(), BuildConfig())


def test_pad_rows_half_step_buckets():
    """Row buckets: powers of two, 1.5*2^k half-steps above 2M rows (the
    pow2 bucket at 10M wastes 67% of an already lane-padded multi-GB
    tensor — measured OOM, round 5)."""
    from granne_tpu.index.graph import pad_rows

    assert pad_rows(5) == 8
    assert pad_rows(1 << 20) == 1 << 20
    assert pad_rows((1 << 20) + 1) == 1 << 21  # pure pow2 below the knee
    assert pad_rows(10_000_000) == 3 * (1 << 22)  # 12.58M, not 16.78M
    assert pad_rows(11_000_000) == 3 * (1 << 22)  # same bucket: appends
    # 10M -> 11M never regrow
    assert pad_rows(13_000_000) == 1 << 24
    for n in [1, 100, 3_000_000, 9_999_999]:
        assert pad_rows(n) >= n

