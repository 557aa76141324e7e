"""IVF + brute-force engines: exactness and recall vs ground truth."""

import numpy as np
import jax.numpy as jnp

from granne_tpu.models.brute import BruteForceIndex
from granne_tpu.index.ivf import IvfIndex
from granne_tpu.ops import kmeans
from granne_tpu.ops import distance as D


def exact_topk(x, q, k):
    xn = np.asarray(D.normalize(jnp.asarray(x)))
    qn = np.asarray(D.normalize(jnp.asarray(q)))
    dots = qn @ xn.T
    return np.argsort(-dots, axis=1)[:, :k]


def test_brute_force_is_exact(rng):
    n, d = 5000, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((64, d)).astype(np.float32)
    index = BruteForceIndex.build(x)
    ids, dists = index.search_batch(q, num_neighbors=10)
    ids = np.asarray(ids)
    gt = exact_topk(x, q, 10)
    # bf16 scoring: top-1 must match almost always, top-10 overlap high
    top1 = np.mean(ids[:, 0] == gt[:, 0])
    overlap = np.mean([len(set(ids[i]) & set(gt[i])) / 10 for i in range(64)])
    assert top1 >= 0.95, f"top1 {top1}"
    assert overlap >= 0.9, f"overlap {overlap}"
    # dists ascending
    assert np.all(np.diff(np.asarray(dists), axis=1) >= -1e-6)


def test_exact_topk_matches_numpy(rng):
    from granne_tpu.models.brute import exact_topk as brute_exact_topk

    n, d, k = 3000, 24, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((32, d)).astype(np.float32)
    xn = np.asarray(D.normalize(jnp.asarray(x)))
    qn = np.asarray(D.normalize(jnp.asarray(q)))
    # chunk < n exercises the cross-chunk merge and last-chunk padding mask
    ids, dists = brute_exact_topk(xn, qn, k, chunk=1024)
    gt = exact_topk(x, q, k)
    assert np.array_equal(ids, gt)
    assert np.all(np.diff(dists, axis=1) >= -1e-6)


def test_kmeans_clusters_data(rng):
    # well-separated blobs: kmeans must recover them
    k, per, d = 8, 100, 16
    centers = rng.standard_normal((k, d)).astype(np.float32) * 5
    x = np.concatenate([centers[i] + 0.05 * rng.standard_normal((per, d)) for i in range(k)]).astype(np.float32)
    x = np.asarray(D.normalize(jnp.asarray(x)))
    cents, assign = kmeans.train_kmeans(x, k, iters=15, seed=1)
    assign = np.asarray(assign)
    # each blob maps to exactly one cluster
    for i in range(k):
        blob = assign[i * per : (i + 1) * per]
        assert len(set(blob.tolist())) == 1
    # all 8 clusters used
    assert len(set(assign.tolist())) == k


def test_kmeanspp_init_k_exceeds_subsample(rng):
    # k larger than the init subsample must not raise (ADVICE r1: all-zero
    # d2 after the pool is consumed crashed rng.choice) and must return k
    # finite centers; exercises both the uniform-fallback and k>=n paths.
    x = rng.standard_normal((50, 8)).astype(np.float32)
    dup = np.repeat(x, 10, axis=0)  # 500 rows, only 50 distinct points
    centers = kmeans._kmeanspp_init(dup, 200, np.random.default_rng(0), sample=100)
    assert centers.shape == (200, 8)
    assert np.all(np.isfinite(centers))
    centers = kmeans._kmeanspp_init(x, 120, np.random.default_rng(0), sample=100)
    assert centers.shape == (120, 8)


def test_train_kmeans_k_exceeds_init_subsample(rng):
    x = np.asarray(D.normalize(jnp.asarray(rng.standard_normal((400, 8)).astype(np.float32))))
    cents, assign = kmeans.train_kmeans(x, 64, iters=4, seed=0)
    assert cents.shape == (64, 8)
    assert np.asarray(assign).shape == (400,)
    assert np.all(np.isfinite(np.asarray(cents)))


def test_ivf_recall(rng):
    n, d = 8000, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = x[:128]  # self queries
    index = IvfIndex.build(x, n_clusters=64, kmeans_iters=8)
    ids, dists = index.search_batch(q, num_neighbors=10, nprobe=8)
    ids = np.asarray(ids)
    recall1 = np.mean(ids[:, 0] == np.arange(128))
    assert recall1 > 0.95, f"ivf recall@1 {recall1}"
    # isotropic gaussians are IVF's worst case; at nprobe=half the clusters
    # recall@10 must clear 0.95 even here
    ids32 = np.asarray(index.search_batch(q, num_neighbors=10, nprobe=32)[0])
    gt = exact_topk(x, q, 10)
    overlap = np.mean([len(set(ids32[i]) & set(gt[i])) / 10 for i in range(128)])
    assert overlap > 0.9, f"ivf recall@10 {overlap}"


def test_ivf_no_element_dropped(rng):
    n, d = 3000, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    index = IvfIndex.build(x, n_clusters=32, kmeans_iters=5)
    ids = np.asarray(index.block_ids)
    live = ids[ids >= 0]
    assert len(live) == n
    assert set(live.tolist()) == set(range(n))


def test_ivf_nprobe_monotone_recall(rng):
    n, d = 6000, 24
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = x[:100]
    index = IvfIndex.build(x, n_clusters=64, kmeans_iters=6)
    gt = exact_topk(x, q, 10)
    last = 0.0
    for nprobe in [2, 8, 48]:
        ids = np.asarray(index.search_batch(q, num_neighbors=10, nprobe=nprobe)[0])
        ov = np.mean([len(set(ids[i]) & set(gt[i])) / 10 for i in range(100)])
        assert ov >= last - 0.02  # allow small noise, must trend up
        last = ov
    assert last > 0.95


def test_ivf_int8_blocks_recall(rng):
    # int8 block storage must rank correctly (per-row inv-norm scales)
    n, d = 6000, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = x[:100]
    i_f = IvfIndex.build(x, n_clusters=48, kmeans_iters=6)
    i_q = IvfIndex.build(x, n_clusters=48, kmeans_iters=6, dtype="int8")
    ids_f = np.asarray(i_f.search_batch(q, 10, nprobe=16)[0])
    ids_q = np.asarray(i_q.search_batch(q, 10, nprobe=16)[0])
    r1_f = np.mean(ids_f[:, 0] == np.arange(100))
    r1_q = np.mean(ids_q[:, 0] == np.arange(100))
    assert r1_q > 0.95
    # int8 quantization should cost at most a little recall vs bf16
    overlap = np.mean([len(set(ids_f[i]) & set(ids_q[i])) / 10 for i in range(100)])
    assert overlap > 0.85


def test_ivf_pathological_probe_skew(rng):
    """All queries probe the SAME cluster: the grouped path must spill the
    hot cluster into duplicate slots without dropping results (slot_keys
    clamping regression; ivf.py group spill)."""
    n, d = 4000, 24
    center = rng.standard_normal(d).astype(np.float32)
    vecs = np.concatenate([
        center + 0.01 * rng.standard_normal((200, d)).astype(np.float32),
        rng.standard_normal((n - 200, d)).astype(np.float32) * 5.0,
    ])
    ivf = IvfIndex.build(vecs, n_clusters=64, kmeans_iters=6, cluster_cap=64)
    # 256 near-identical queries all hitting the dense cluster
    q = center + 0.01 * rng.standard_normal((256, d)).astype(np.float32)
    ids, _ = ivf.search_batch(q, 10, nprobe=4, group_cap=8)
    ids = np.asarray(ids)
    assert np.all(ids >= 0), "spill path dropped results"
    # exact check vs brute force on the same queries
    bf = BruteForceIndex.build(vecs)
    gt, _ = bf.search_batch(q, 10)
    overlap = np.mean([
        len(set(ids[i]) & set(np.asarray(gt)[i].tolist())) / 10 for i in range(256)
    ])
    assert overlap > 0.9, overlap


def test_ivf_tiny_n_and_n_less_than_k(rng):
    """Degenerate sizes: n < k and single-digit n must build and search."""
    for n in (3, 9, 40):
        vecs = rng.standard_normal((n, 8)).astype(np.float32)
        ivf = IvfIndex.build(vecs, n_clusters=16, kmeans_iters=2, cluster_cap=8)
        ids, _ = ivf.search_batch(vecs, min(5, n), nprobe=min(16, ivf.k))
        ids = np.asarray(ids)
        assert ids.shape[0] == n
        assert np.mean(ids[:, 0] == np.arange(n)) > 0.9
