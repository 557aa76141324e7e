"""Chunked large-scale IVF builders (granne_tpu/index/ivf_big.py).

The chunked paths must agree with the standard in-memory layout: exact
results at full probe coverage, self-query hits, and int8/f32 agreement.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from granne_tpu.index.ivf_big import (
    build_ivf_f32_chunked,
    build_ivf_i8_chunked,
    exact_topk_over_blocks,
)
from granne_tpu.ops.distance import normalize, quantize_i8

K = 5
silent = staticmethod(lambda m: None)


def _recall(ids, gt):
    return float(np.mean([len(set(ids[i]) & set(gt[i])) / K for i in range(len(gt))]))


def _exact_up_to_ties(ids, q_np, x_np, gt_v, tol=5e-3):
    """True iff every returned id's exact f32 cosine reaches the k-th GT
    cosine (minus bf16 scoring noise) — the engine scores in bf16, the GT
    in f32, so strict set equality fails on near-ties."""
    cos = np.einsum("bd,bkd->bk", q_np, x_np[np.asarray(ids)])
    return bool(np.all(cos >= gt_v[:, K - 1 : K] - tol))


@pytest.fixture
def data(rng):
    centers = rng.standard_normal((20, 16)).astype(np.float32)
    assign = rng.integers(0, 20, 2000)
    return (centers[assign] + 0.3 * rng.standard_normal((2000, 16))).astype(np.float32)


def test_f32_chunked_exact_at_full_probe(data):
    ivf = build_ivf_f32_chunked(
        data, n_clusters=16, cluster_cap=64, kmeans_iters=4,
        chunk=512, kmeans_sample=1024, log=lambda m: None,
    )
    kp = int(ivf.blocks.shape[0])
    q = normalize(jnp.asarray(data[:64]))
    gt, gt_v = exact_topk_over_blocks(ivf, q, K, block_chunk=8)
    ids, _ = ivf.search_batch(q, K, nprobe=kp, grouped=False, query_chunk=32)
    x_np = np.asarray(normalize(jnp.asarray(data)))
    assert _exact_up_to_ties(np.asarray(ids), np.asarray(q), x_np, gt_v)
    assert int(np.asarray(ids)[0, 0]) == 0  # self-query


def test_f32_chunked_clustered_recall_at_small_nprobe(data):
    ivf = build_ivf_f32_chunked(
        data, n_clusters=16, cluster_cap=192, kmeans_iters=6,
        chunk=1024, kmeans_sample=2000, log=lambda m: None,
    )
    q = normalize(jnp.asarray(data[:128]))
    gt, _ = exact_topk_over_blocks(ivf, q, K, block_chunk=8)
    ids, _ = ivf.search_batch(q, K, nprobe=6, grouped=False, query_chunk=32)
    # clustered data: a handful of probes must already be near-exact
    assert _recall(np.asarray(ids), gt) > 0.9


def test_i8_chunked_matches_f32_ranking(data):
    x_i8 = np.asarray(quantize_i8(jnp.asarray(normalize(jnp.asarray(data)))))
    ivf = build_ivf_i8_chunked(
        x_i8, n_clusters=16, cluster_cap=64, kmeans_iters=4,
        chunk=512, kmeans_sample=1024, log=lambda m: None,
    )
    kp = int(ivf.blocks.shape[0])
    assert ivf.blocks.dtype == jnp.int8
    q = normalize(jnp.asarray(data[:64]))
    gt, gt_v = exact_topk_over_blocks(ivf, q, K, block_chunk=8)
    ids, _ = ivf.search_batch(q, K, nprobe=kp, grouped=False, query_chunk=32)
    xf = x_i8.astype(np.float32)
    x_np = xf / np.maximum(np.linalg.norm(xf, axis=1, keepdims=True), 1e-12)
    assert _exact_up_to_ties(np.asarray(ids), np.asarray(q), x_np, gt_v)
    assert int(np.asarray(ids)[0, 0]) == 0


def test_chunked_ids_partition(data):
    ivf = build_ivf_f32_chunked(
        data, n_clusters=8, cluster_cap=64, kmeans_iters=3,
        chunk=512, kmeans_sample=512, log=lambda m: None,
    )
    ids = np.asarray(ivf.block_ids).reshape(-1)
    real = ids[ids >= 0]
    # every element appears exactly once across all blocks
    assert sorted(real.tolist()) == list(range(len(data)))
