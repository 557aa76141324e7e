"""Batched k-means (Lloyd's) on TPU — the IVF coarse quantizer trainer.

No reference counterpart (granne is HNSW-only); this powers the TPU-native
IVF index family (``index/ivf.py``), which exists because contiguous
cluster blocks turn the random 400-byte row gathers that throttle graph
traversal on TPU into large streaming DMAs feeding the MXU.

Assignment is a chunked [n, d] x [d, k] matmul + argmax; the update is a
segment-sum scatter.  Everything static-shaped and jitted.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("chunk",))
def assign_clusters(x: jax.Array, centroids: jax.Array, *, chunk: int = 65536) -> jax.Array:
    """Nearest-centroid assignment by maximum dot product (unit-norm data).

    x: f32[n, d]; centroids: f32[k, d].  Returns int32[n].
    """
    n = x.shape[0]
    k = centroids.shape[0]
    pad = (-n) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0)))

    def body(xc):
        dots = jax.lax.dot_general(
            xc, centroids, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        return jnp.argmax(dots, axis=1).astype(jnp.int32)

    out = jax.lax.map(body, xp.reshape(-1, chunk, x.shape[1]))
    return out.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("k",))
def _update_centroids(x: jax.Array, assign: jax.Array, *, k: int):
    sums = jnp.zeros((k, x.shape[1]), jnp.float32).at[assign].add(x)
    counts = jnp.zeros((k,), jnp.float32).at[assign].add(1.0)
    centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    return centroids, counts


def _kmeanspp_init(x: np.ndarray, k: int, rng: np.random.Generator, sample: int = 20000) -> np.ndarray:
    """k-means||-style seeding (distance-proportional, oversampled rounds).

    The init subsample scales with k (>= 4k when data allows) so large-k
    trainings (IVF at 100M+ vectors uses k in the tens of thousands) never
    exhaust the candidate pool; if the remaining d2 mass hits zero (fewer
    distinct points than centers) the tail falls back to uniform picks.
    Centers are drawn in ~32 oversampled rounds with a BLAS distance update
    instead of one python-loop iteration per center.
    """
    n = x.shape[0]
    sample = max(sample, 4 * k)
    if n > sample:
        x = np.ascontiguousarray(x[rng.choice(n, size=sample, replace=False)])
        n = sample
    if k >= n:
        extra = rng.integers(n, size=k - n)
        return np.concatenate([x, x[extra]]).astype(np.float32)
    centers = np.empty((k, x.shape[1]), np.float32)
    centers[0] = x[rng.integers(n)]
    x_sq = np.sum(x.astype(np.float32) ** 2, axis=1)
    d2 = np.maximum(x_sq + np.sum(centers[0] ** 2) - 2.0 * (x @ centers[0]), 0.0)
    i = 1
    while i < k:
        s = float(d2.sum())
        if s <= 1e-12:
            centers[i:] = x[rng.integers(n, size=k - i)]
            break
        batch = min(k - i, max(1, k // 32))
        idx = rng.choice(n, size=batch, p=d2 / s)
        c = x[idx].astype(np.float32)
        centers[i : i + batch] = c
        new_d2 = x_sq[:, None] + np.sum(c**2, axis=1)[None, :] - 2.0 * (x @ c.T)
        d2 = np.minimum(d2, np.maximum(new_d2.min(axis=1), 0.0))
        i += batch
    return centers


def train_kmeans(
    x: np.ndarray | jax.Array,
    k: int,
    *,
    iters: int = 12,
    seed: int = 0,
    chunk: int = 65536,
):
    """k-means++ seeded Lloyd's iterations; empty clusters re-seed randomly.

    Returns (centroids f32[k, d], assignments int32[n]).
    """
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    rng = np.random.default_rng(seed)
    centroids = jnp.asarray(_kmeanspp_init(np.asarray(x), k, rng))

    assign = None
    for _ in range(iters):
        assign = assign_clusters(x, centroids, chunk=min(chunk, max(256, n)))
        centroids, counts = _update_centroids(x, assign, k=k)
        empty = np.asarray(counts == 0)
        if empty.any():
            reseed = rng.choice(n, size=int(empty.sum()))
            centroids = centroids.at[jnp.asarray(np.nonzero(empty)[0])].set(x[jnp.asarray(reseed)])
    assign = assign_clusters(x, centroids, chunk=min(chunk, max(256, n)))
    return centroids, assign
