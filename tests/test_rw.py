"""Online (concurrent build+serve) index tests.

Mirrors the reference rw tests (/root/reference/src/index/rw/mod.rs:231-366):
parallel insert racing parallel search, append-after-build findability,
layer equivalence vs offline build, empty/one-element search.
"""

import threading

import numpy as np

from granne_tpu import AngularVectors, BuildConfig
from granne_tpu.index.rw import RwGranneBuilder
from granne_tpu.index import schedule


def test_append_after_build_findable(rng):
    n1, n2, d = 400, 100, 16
    vecs = rng.standard_normal((n1 + n2, d)).astype(np.float32)
    rw = RwGranneBuilder(
        AngularVectors.from_raw(vecs[:n1]), BuildConfig(num_neighbors=16, max_search=30)
    )
    rw.insert_batch(vecs[n1:])
    rw.flush()
    assert rw.indexed_elements == n1 + n2
    ids, _ = rw.search_batch(vecs, max_search=20, num_neighbors=1)
    recall = float(np.mean(np.asarray(ids)[:, 0] == np.arange(n1 + n2)))
    assert recall > 0.93, f"append recall {recall}"


def test_insert_visible_before_flush(rng):
    """Reference contract: elements are searchable the moment insert_batch
    returns (rw/mod.rs:99-182, stress-asserted at :231-258) — no flush."""
    base = rng.standard_normal((150, 16)).astype(np.float32)
    rw = RwGranneBuilder(
        AngularVectors.from_raw(base),
        BuildConfig(num_neighbors=12, max_search=25, wave_size=1024),
    )
    extra = rng.standard_normal((20, 16)).astype(np.float32)
    rw.insert_batch(extra)
    assert rw.indexed_elements == 150  # wave not flushed yet
    assert len(rw) == 170  # but all elements are live
    ids, d = rw.search_batch(extra, max_search=20, num_neighbors=1)
    assert np.array_equal(np.asarray(ids)[:, 0], 150 + np.arange(20))
    assert np.all(np.asarray(d)[:, 0] < 1e-3)
    # base elements still found through the snapshot path
    ids_b, _ = rw.search_batch(base[:50], max_search=20, num_neighbors=1)
    assert float(np.mean(np.asarray(ids_b)[:, 0] == np.arange(50))) > 0.95
    # ids are stable across the flush boundary
    rw.flush()
    ids2, _ = rw.search_batch(extra, max_search=25, num_neighbors=1)
    assert np.array_equal(np.asarray(ids2)[:, 0], 150 + np.arange(20))

    # single insert into an empty index is visible immediately too
    rw2 = RwGranneBuilder(
        AngularVectors.from_raw(np.zeros((0, 8), np.float32)),
        BuildConfig(num_neighbors=8, max_search=10, wave_size=64),
    )
    rw2.insert(np.ones(8, np.float32))
    res = rw2.search(np.ones(8, np.float32), 10, 3)
    assert res and res[0][0] == 0


def test_concurrent_flush_no_lost_updates(rng):
    """Racing direct flush() calls must not drop each other's layers
    (flushes build under _build_lock; the pending tail stays visible)."""
    n, d = 200, 16
    vecs = rng.standard_normal((n + 128, d)).astype(np.float32)
    rw = RwGranneBuilder(
        AngularVectors.from_raw(vecs[:n]),
        BuildConfig(num_neighbors=12, max_search=25, wave_size=10_000),
    )
    errors = []

    def ins(lo):
        try:
            rw.insert_batch(vecs[lo : lo + 32])
            rw.flush()  # direct flush, racing the others
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=ins, args=(n + i * 32,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    rw.flush()
    assert rw.indexed_elements == n + 128  # nothing lost
    # every inserted element findable (arrival order is nondeterministic,
    # so assert by self-distance rather than id)
    _, dists = rw.search_batch(vecs[n:], max_search=30, num_neighbors=1)
    assert float(np.mean(np.asarray(dists)[:, 0] < 1e-3)) > 0.95


def test_layer_counts_match_offline(rng):
    # like the reference rw test, the online builder pre-declares its final
    # capacity (rw/mod.rs:32-61 max_elements == expected_num_elements) so the
    # layer schedule matches an offline build of the full set
    n, d = 600, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    cfg = BuildConfig(num_neighbors=12, max_search=25, expected_num_elements=n)
    rw = RwGranneBuilder(AngularVectors.from_raw(vecs[:300]), cfg)
    rw.insert_batch(vecs[300:])
    rw.flush()
    idx = rw.get_index()
    expected = schedule.layer_counts(n, 15.0)
    assert [idx.layer_len(i) for i in range(idx.num_layers)] == expected


def test_concurrent_insert_and_search(rng):
    n, d = 300, 16
    vecs = rng.standard_normal((n + 200, d)).astype(np.float32)
    rw = RwGranneBuilder(AngularVectors.from_raw(vecs[:n]), BuildConfig(num_neighbors=12, max_search=25, wave_size=64))
    errors = []

    def inserter():
        try:
            for lo in range(n, n + 200, 50):
                rw.insert_batch(vecs[lo : lo + 50])
            rw.flush()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def searcher():
        try:
            for _ in range(10):
                ids, _ = rw.search_batch(vecs[:64], max_search=15, num_neighbors=3)
                assert np.asarray(ids).shape == (64, 3)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=inserter)] + [threading.Thread(target=searcher) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    rw.flush()
    assert rw.indexed_elements == n + 200


def test_empty_and_single(rng):
    rw = RwGranneBuilder(AngularVectors.from_raw(np.zeros((0, 8), np.float32)), BuildConfig(num_neighbors=8, max_search=10))
    assert rw.search(np.ones(8, np.float32), 10, 3) == []
    rw.insert(np.ones(8, np.float32))
    rw.flush()
    res = rw.search(np.ones(8, np.float32), 10, 3)
    assert res and res[0][0] == 0


def test_save_while_serving(rng, tmp_path):
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    rw = RwGranneBuilder(AngularVectors.from_raw(vecs), BuildConfig(num_neighbors=12, max_search=20))
    rw.save(str(tmp_path / "i.gtz"), str(tmp_path / "e.gt"))
    from granne_tpu.api import load_granne

    idx = load_granne(str(tmp_path / "i.gtz"), str(tmp_path / "e.gt"))
    assert len(idx) == 200
