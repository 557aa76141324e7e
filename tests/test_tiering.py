"""Host-DRAM tiered IVF serving tests."""

import numpy as np

from granne_tpu.parallel.tiering import TieredIvf


def test_tiered_matches_recall(rng):
    n, d = 5000, 24
    x = rng.standard_normal((n, d)).astype(np.float32)
    t = TieredIvf.build(x, n_clusters=48, kmeans_iters=6)
    ids, dists = t.search_batch(x[:100], num_neighbors=5, nprobe=12)
    recall = np.mean(ids[:, 0] == np.arange(100))
    assert recall > 0.95
    assert np.all(np.diff(dists, axis=1) >= -1e-5)


def test_tiered_pipeline_batches(rng):
    n, d = 3000, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    t = TieredIvf.build(x, n_clusters=32, kmeans_iters=5)
    batches = [x[i * 100 : (i + 1) * 100] for i in range(5)]
    outs = list(t.search_batches(batches, num_neighbors=3, nprobe=8))
    assert len(outs) == 5
    allids = np.concatenate([o[0] for o in outs])
    recall = np.mean(allids[:, 0] == np.arange(500))
    assert recall > 0.95


def test_tiered_load_from_saved_index(rng, tmp_path):
    """TieredIvf.load serves an IvfIndex.save artifact with blocks staying
    host-resident (memory-mapped) — the beyond-HBM reload path."""
    from granne_tpu.index.ivf import IvfIndex

    n, d = 2500, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = IvfIndex.build(x, n_clusters=24, kmeans_iters=5, dtype="int8")
    p = str(tmp_path / "ivf.gti")
    idx.save(p)
    t = TieredIvf.load(p)
    assert isinstance(t.host_blocks, np.ndarray)
    ids, _ = t.search_batch(x[:80], num_neighbors=5, nprobe=8)
    recall = np.mean(ids[:, 0] == np.arange(80))
    assert recall > 0.9


def test_tiered_sharded_composition(rng):
    """The 1B serving shape at toy scale (VERDICT r3 #6): host-tiered blocks
    SHARDED over the mesh — recall must be >= the single-device tiered
    search at equal nprobe (per-shard probes are a superset)."""
    from granne_tpu.parallel.mesh import make_mesh
    from granne_tpu.parallel.tiering import TieredShardedIvf

    n, d = 4000, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    from granne_tpu.index.ivf import IvfIndex

    idx = IvfIndex.build(x, n_clusters=40, kmeans_iters=5)
    single = TieredIvf.from_ivf(idx)
    mesh = make_mesh(8)
    ts = TieredShardedIvf.from_ivf(idx, mesh=mesh)
    assert isinstance(ts.host_blocks, np.ndarray)  # blocks stay host-resident

    q = x[:128]
    sid, _ = single.search_batch(q, num_neighbors=5, nprobe=8)
    tid, tdd = ts.search_batch(q, num_neighbors=5, nprobe=8)
    r_single = np.mean(sid[:, 0] == np.arange(128))
    r_shard = np.mean(tid[:, 0] == np.arange(128))
    assert r_shard >= r_single, (r_shard, r_single)
    assert np.all(np.diff(tdd, axis=1) >= -1e-5)
    # global ids, within range
    assert tid.max() < n


def test_tiered_sharded_load_from_artifact(rng, tmp_path):
    """One IvfIndex.save artifact now serves all four modes; check the
    tiered+sharded one."""
    from granne_tpu.index.ivf import IvfIndex
    from granne_tpu.parallel.mesh import make_mesh
    from granne_tpu.parallel.tiering import TieredShardedIvf

    n, d = 2000, 12
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = IvfIndex.build(x, n_clusters=24, kmeans_iters=5, dtype="int8")
    p = str(tmp_path / "ivf.gti")
    idx.save(p)
    ts = TieredShardedIvf.load(p, mesh=make_mesh(4))
    ids, _ = ts.search_batch(x[:64], num_neighbors=5, nprobe=8)
    recall = np.mean(ids[:, 0] == np.arange(64))
    assert recall > 0.9
