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
    """k-means++ seeding (distance-proportional) on a subsample."""
    n = x.shape[0]
    if n > sample:
        x = x[rng.choice(n, size=sample, replace=False)]
        n = sample
    centers = np.empty((k, x.shape[1]), np.float32)
    centers[0] = x[rng.integers(n)]
    d2 = np.sum((x - centers[0]) ** 2, axis=1)
    for i in range(1, k):
        p = d2 / max(d2.sum(), 1e-12)
        centers[i] = x[rng.choice(n, p=p)]
        d2 = np.minimum(d2, np.sum((x - centers[i]) ** 2, axis=1))
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
