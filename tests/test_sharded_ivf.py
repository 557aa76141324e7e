"""Sharded IVF serving over the virtual 8-device CPU mesh.

Cluster blocks are row-sharded (the config-5 scale-out path: one chip holds
~100M int8 vectors of blocks, so 1B lives sharded); queries replicate and
per-shard top-k merges over an all_gather.  Per-shard probing at a given
``nprobe`` covers a superset of the single-device probe set, so recall must
be >= the single-device search at equal nprobe (parallel/sharded_ivf.py).
"""

import numpy as np
import jax.numpy as jnp

from granne_tpu.index.ivf import IvfIndex
from granne_tpu.ops import distance as D
from granne_tpu.parallel.mesh import make_mesh
from granne_tpu.parallel.sharded_ivf import ShardedIvf


def _exact_gt(vecs, queries, k):
    x = np.asarray(D.normalize(jnp.asarray(vecs)))
    q = np.asarray(D.normalize(jnp.asarray(queries)))
    scores = q @ x.T
    return np.argsort(-scores, axis=1)[:, :k]


def _recall(ids, gt):
    k = gt.shape[1]
    return float(np.mean([len(set(ids[i]) & set(gt[i])) / k for i in range(len(gt))]))


def test_sharded_ivf_matches_exact_at_full_probe(rng):
    n, d, k = 2048, 24, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((64, d)).astype(np.float32)
    mesh = make_mesh(4)
    idx = ShardedIvf.build(vecs, mesh=mesh, n_clusters=24, kmeans_iters=6, dtype="float32")
    # probing every local cluster makes the search a full scan (the grouped
    # scorer contracts in bf16, so near-ties may swap vs the f32 oracle)
    ids, dists = idx.search_batch(queries, k, nprobe=idx.k_local)
    gt = _exact_gt(vecs, queries, k)
    assert _recall(np.asarray(ids), gt) > 0.99
    d_np = np.asarray(dists)
    assert np.all(np.diff(d_np, axis=1) >= -1e-6)  # sorted ascending


def test_sharded_ivf_recall_at_least_single_device(rng):
    n, d, k = 4096, 32, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((128, d)).astype(np.float32)
    gt = _exact_gt(vecs, queries, k)

    single = IvfIndex.build(vecs, n_clusters=48, kmeans_iters=6)
    mesh = make_mesh(4)
    sharded = ShardedIvf.from_ivf(single, mesh)

    for nprobe in (2, 4, 8):
        ids_s, _ = single.search_batch(queries, k, nprobe=nprobe)
        ids_m, _ = sharded.search_batch(queries, k, nprobe=nprobe)
        r_s = _recall(np.asarray(ids_s), gt)
        r_m = _recall(np.asarray(ids_m), gt)
        assert r_m >= r_s - 1e-9, f"nprobe={nprobe}: sharded {r_m} < single {r_s}"


def test_sharded_ivf_global_ids_and_padding(rng):
    n, d = 900, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    mesh = make_mesh(8)
    # k_phys deliberately NOT a multiple of 8 -> exercises the padding path
    idx = ShardedIvf.build(vecs, mesh=mesh, n_clusters=13, kmeans_iters=5, cluster_cap=96)
    assert idx.blocks.shape[0] % 8 == 0
    ids, _ = idx.search_batch(vecs[:100], 5, nprobe=3)
    ids = np.asarray(ids)
    live = ids[ids >= 0]
    assert live.max() < n
    # self-queries must find themselves in the top results
    hit = np.mean([(i in set(ids[i])) for i in range(100)])
    assert hit > 0.95, f"self-hit {hit}"
    # no duplicate ids within a row (padding blocks never leak)
    for row in ids:
        lv = row[row >= 0]
        assert len(set(lv.tolist())) == len(lv)


def test_ivf_save_load_roundtrip(rng, tmp_path):
    n, d = 1200, 20
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    for dtype in ("float32", "bfloat16", "int8"):
        idx = IvfIndex.build(vecs, n_clusters=16, kmeans_iters=5, dtype=dtype)
        p = str(tmp_path / f"ivf_{dtype}.gti")
        idx.save(p)
        back = IvfIndex.load(p)
        assert str(back.blocks.dtype) == dtype
        assert back.n_total == n
        q = vecs[:32]
        ids_a, d_a = idx.search_batch(q, 5, nprobe=4)
        ids_b, d_b = back.search_batch(q, 5, nprobe=4)
        assert np.array_equal(np.asarray(ids_a), np.asarray(ids_b)), dtype
        assert np.allclose(np.asarray(d_a), np.asarray(d_b), atol=1e-6), dtype


def test_sharded_ivf_load_onto_mesh(rng, tmp_path):
    n, d = 1000, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    idx = IvfIndex.build(vecs, n_clusters=12, kmeans_iters=5)
    p = str(tmp_path / "ivf.gti")
    idx.save(p)
    mesh = make_mesh(4)
    sharded = ShardedIvf.load(p, mesh)
    ids_s, _ = idx.search_batch(vecs[:64], 5, nprobe=4)
    ids_m, _ = sharded.search_batch(vecs[:64], 5, nprobe=4)
    gt = _exact_gt(vecs, vecs[:64], 5)
    assert _recall(np.asarray(ids_m), gt) >= _recall(np.asarray(ids_s), gt) - 1e-9


def test_sharded_ivf_int8_blocks(rng):
    n, d = 1500, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    mesh = make_mesh(4)
    idx = ShardedIvf.build(vecs, mesh=mesh, n_clusters=16, kmeans_iters=5, dtype="int8")
    ids, _ = idx.search_batch(vecs[:64], 5, nprobe=8)
    ids = np.asarray(ids)
    hit = np.mean([(i in set(ids[i])) for i in range(64)])
    assert hit > 0.9, f"int8 self-hit {hit}"


def test_ivf_append_extends_index(rng):
    """Extensible IVF (config-4 analogue): appended elements are findable,
    recall matches a from-scratch rebuild at equal nprobe (fill-before-spill
    keeps the sub-block count from growing while padding lasts), ids are
    globally contiguous."""
    n, m, d, k = 3000, 600, 24, 10
    base = rng.standard_normal((n, d)).astype(np.float32)
    extra = rng.standard_normal((m, d)).astype(np.float32)
    allv = np.concatenate([base, extra])

    idx = IvfIndex.build(base, n_clusters=32, kmeans_iters=6)
    ext = idx.append(extra)
    assert ext.n_total == n + m
    assert idx.n_total == n  # functional update: original untouched
    # 600 new over 32 clusters fits existing padding: no new sub-blocks
    assert ext.blocks.shape[0] == idx.blocks.shape[0]

    fresh = IvfIndex.build(allv, n_clusters=32, kmeans_iters=6)
    gt = _exact_gt(allv, allv[:200], k)
    ids_a, _ = ext.search_batch(allv[:200], k, nprobe=16)
    ids_f, _ = fresh.search_batch(allv[:200], k, nprobe=16)
    r_a, r_f = _recall(np.asarray(ids_a), gt), _recall(np.asarray(ids_f), gt)
    assert r_a >= r_f - 0.03, f"append {r_a} vs fresh {r_f}"

    # appended elements must find themselves
    ids_new, _ = ext.search_batch(extra, 5, nprobe=16)
    hit = np.mean([(n + i) in set(np.asarray(ids_new)[i]) for i in range(m)])
    assert hit > 0.95, f"appended self-hit {hit}"

    # id space: every id in [0, n+m)
    live = np.asarray(ids_new)[np.asarray(ids_new) >= 0]
    assert live.max() < n + m


def test_ivf_append_overflow_spills_new_blocks(rng):
    """Appending more than the free padding spills into fresh sub-blocks
    (duplicated centroid rows); everything stays findable."""
    n, m, d = 1000, 2000, 16
    base = rng.standard_normal((n, d)).astype(np.float32)
    extra = rng.standard_normal((m, d)).astype(np.float32)
    idx = IvfIndex.build(base, n_clusters=16, kmeans_iters=5, cluster_cap=80)
    ext = idx.append(extra)
    assert ext.blocks.shape[0] > idx.blocks.shape[0]
    ids, _ = ext.search_batch(extra[:100], 5, nprobe=ext.blocks.shape[0])
    hit = np.mean([(n + i) in set(np.asarray(ids)[i]) for i in range(100)])
    assert hit > 0.99, f"overflow self-hit {hit}"
    # no id appears twice anywhere in the block map
    bid = np.asarray(ext.block_ids)
    live = bid[bid >= 0]
    assert len(np.unique(live)) == len(live) == n + m


def test_ivf_append_int8_and_dim_check(rng):
    base = rng.standard_normal((1200, 16)).astype(np.float32)
    idx = IvfIndex.build(base, n_clusters=12, kmeans_iters=5, dtype="int8")
    ext = idx.append(rng.standard_normal((300, 16)).astype(np.float32))
    assert str(ext.blocks.dtype) == "int8"
    ids, _ = ext.search_batch(base[:50], 5, nprobe=8)
    assert np.mean(np.asarray(ids)[:, 0] == np.arange(50)) > 0.9
    try:
        idx.append(np.zeros((4, 7), np.float32))
        assert False, "dim mismatch accepted"
    except ValueError:
        pass
