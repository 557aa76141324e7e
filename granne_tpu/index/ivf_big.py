"""Chunked IVF construction for beyond-HBM datasets (100M-1B vectors).

The reference's billion-vector story is "mmap the files and let the OS
page" (``/root/reference/src/lib.rs:16-23``).  The TPU equivalent built
here: the dataset lives in host DRAM as int8 (max-abs quantized, the
``angular_int`` format, ``/root/reference/src/elements/angular_int.rs:25-45``);
construction streams it through the chip in fixed-size chunks (assignment
passes), and the resulting cluster-padded blocks either
  * fit in HBM (e.g. 100M x 96d int8 ~ 10 GB on a 16 GB chip) and are
    served by the standard :class:`~granne_tpu.index.ivf.IvfIndex` path, or
  * stay in host DRAM and are served by
    :class:`~granne_tpu.parallel.tiering.TieredIvf` with prefetch overlap.

Everything device-side is static-shaped; no pass ever materializes more
than one chunk of the dataset in HBM.
"""

from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import kmeans
from ..ops.distance import normalize
from .ivf import IvfIndex


@jax.jit
def _assign_chunk_f32(x: jax.Array, centroids: jax.Array):
    """Nearest-centroid assignment + L2-normalized rows for an f32 chunk."""
    xn = normalize(x)
    dots = jax.lax.dot_general(
        xn.astype(jnp.bfloat16), centroids.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    return jnp.argmax(dots, axis=1).astype(jnp.int32), xn


def build_ivf_f32_chunked(
    x: np.ndarray,
    *,
    n_clusters: int,
    cluster_cap: int = 256,
    kmeans_iters: int = 8,
    kmeans_sample: int = 1_000_000,
    chunk: int = 2_000_000,
    seed: int = 0,
    dtype: str = "bfloat16",
    log=lambda m: print(m, file=sys.stderr, flush=True),
) -> IvfIndex:
    """f32-ingest analogue of :func:`build_ivf_i8_chunked`.

    Same sub-block layout as :meth:`IvfIndex.build` but trains k-means on a
    subsample and streams assignment, so datasets in the 10M+ range never
    round-trip the full matrix through HBM twice.
    """
    n, d = x.shape
    rng = np.random.default_rng(seed)

    take = min(kmeans_sample, n)
    sel = np.sort(rng.choice(n, size=take, replace=False)) if take < n else np.arange(n)
    sample = np.asarray(normalize(jnp.asarray(x[sel], jnp.float32)))
    log(f"[ivf_big] kmeans: k={n_clusters} on {take} samples, {kmeans_iters} iters")
    centroids, _ = kmeans.train_kmeans(sample, n_clusters, iters=kmeans_iters, seed=seed)
    del sample

    assign = np.empty((n,), np.int32)
    xn = np.empty((n, d), np.float32)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        xc = x[lo:hi]
        if hi - lo < chunk:
            xc = np.concatenate([xc, np.zeros((chunk - (hi - lo), d), x.dtype)])
        a, xnc = _assign_chunk_f32(jnp.asarray(xc, jnp.float32), centroids)
        assign[lo:hi] = np.asarray(a)[: hi - lo]
        xn[lo:hi] = np.asarray(xnc)[: hi - lo]
        log(f"[ivf_big] assigned {hi}/{n}")

    k = n_clusters
    L = -(-cluster_cap // 8) * 8
    counts = np.bincount(assign, minlength=k)
    blocks_per_cluster = np.maximum(1, -(-counts // L))
    block_base = np.concatenate([[0], np.cumsum(blocks_per_cluster)])
    k_phys = int(block_base[-1])
    log(f"[ivf_big] layout: {k_phys} physical blocks of L={L} "
        f"({k_phys * L / n - 1:+.1%} padding)")

    order = np.argsort(assign, kind="stable")
    a_s = assign[order]
    starts = np.searchsorted(a_s, np.arange(k))
    rank = np.arange(n) - starts[a_s]
    phys_block = block_base[a_s] + rank // L
    phys_pos = rank % L

    np_dtype = {"bfloat16": np.float32, "float32": np.float32}[dtype]
    blocks = np.zeros((k_phys, L, d), np_dtype)
    ids = np.full((k_phys, L), -1, np.int32)
    blocks[phys_block, phys_pos] = xn[order]
    ids[phys_block, phys_pos] = order
    phys_centroids = np.repeat(np.asarray(centroids), blocks_per_cluster, axis=0)

    if dtype == "bfloat16":
        import ml_dtypes

        blocks = blocks.astype(ml_dtypes.bfloat16)  # halve the H2D transfer
    log(f"[ivf_big] uploading {blocks.nbytes / 1e9:.1f} GB of blocks to HBM")
    return IvfIndex(
        centroids=jnp.asarray(phys_centroids),
        blocks=jax.device_put(blocks),
        block_ids=jax.device_put(ids),
        block_scales=jnp.ones((k_phys, L), jnp.float32),
        n_total=n,
    )


@partial(jax.jit, static_argnames=())
def _assign_chunk_i8(x_i8: jax.Array, centroids: jax.Array):
    """Nearest-centroid assignment + per-row inverse norms for an int8 chunk.

    argmax_c dot(x, c) is scale-invariant in x, so quantized rows assign to
    the same cluster their unit-norm f32 originals would (up to quantization
    noise, which only shifts borderline rows between near-equal clusters).
    """
    xb = x_i8.astype(jnp.bfloat16)
    dots = jax.lax.dot_general(
        xb, centroids.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    assign = jnp.argmax(dots, axis=1).astype(jnp.int32)
    x32 = x_i8.astype(jnp.int32)
    sq = jnp.sum(x32 * x32, axis=1).astype(jnp.float32)
    nrm = jnp.sqrt(sq)
    inv = jnp.where(nrm > 0.0, 1.0 / jnp.where(nrm > 0.0, nrm, 1.0), 0.0)
    return assign, inv


def build_ivf_i8_chunked(
    x_i8: np.ndarray,
    *,
    n_clusters: int,
    cluster_cap: int = 512,
    kmeans_iters: int = 8,
    kmeans_sample: int = 1_000_000,
    chunk: int = 4_000_000,
    seed: int = 0,
    device_resident: bool = True,
    log=lambda m: print(m, file=sys.stderr, flush=True),
) -> IvfIndex:
    """Build an int8 IVF index from a host-resident int8 dataset.

    Mirrors :meth:`IvfIndex.build`'s fixed-size sub-block layout (clusters
    larger than ``cluster_cap`` span several physical blocks with duplicated
    centroid rows) but never ships the full dataset to the device as f32:
    k-means trains on a normalized subsample, assignment streams int8
    chunks, and the final blocks upload int8.

    Args:
      x_i8: int8[n, d] max-abs quantized vectors (host).
      device_resident: if True the returned index's arrays live in HBM;
        if False they stay host-side numpy (feed to ``TieredIvf``).
    """
    n, d = x_i8.shape
    rng = np.random.default_rng(seed)

    # --- 1. coarse quantizer on a normalized f32 subsample ---------------
    take = min(kmeans_sample, n)
    sel = rng.choice(n, size=take, replace=False) if take < n else np.arange(n)
    sample = np.asarray(normalize(jnp.asarray(x_i8[np.sort(sel)], jnp.float32)))
    log(f"[ivf_big] kmeans: k={n_clusters} on {take} samples, {kmeans_iters} iters")
    centroids, _ = kmeans.train_kmeans(sample, n_clusters, iters=kmeans_iters, seed=seed)
    del sample

    # --- 2. streaming assignment pass over int8 chunks -------------------
    assign = np.empty((n,), np.int32)
    inv_norms = np.empty((n,), np.float32)
    step = chunk
    for lo in range(0, n, step):
        hi = min(lo + step, n)
        xc = x_i8[lo:hi]
        if hi - lo < step:  # pad to the compile bucket
            xc = np.concatenate([xc, np.zeros((step - (hi - lo), d), np.int8)])
        a, iv = _assign_chunk_i8(jnp.asarray(xc), centroids)
        assign[lo:hi] = np.asarray(a)[: hi - lo]
        inv_norms[lo:hi] = np.asarray(iv)[: hi - lo]
        log(f"[ivf_big] assigned {hi}/{n}")

    # --- 3. fixed-size sub-block layout (host) ---------------------------
    k = n_clusters
    L = -(-cluster_cap // 8) * 8
    counts = np.bincount(assign, minlength=k)
    blocks_per_cluster = np.maximum(1, -(-counts // L))
    block_base = np.concatenate([[0], np.cumsum(blocks_per_cluster)])
    k_phys = int(block_base[-1])
    log(f"[ivf_big] layout: {k_phys} physical blocks of L={L} "
        f"({k_phys * L / n - 1:+.1%} padding)")

    order = np.argsort(assign, kind="stable")
    a_s = assign[order]
    starts = np.searchsorted(a_s, np.arange(k))
    rank = np.arange(n) - starts[a_s]
    phys_block = block_base[a_s] + rank // L
    phys_pos = rank % L

    blocks = np.zeros((k_phys, L, d), np.int8)
    ids = np.full((k_phys, L), -1, np.int32)
    scales = np.zeros((k_phys, L), np.float32)
    blocks[phys_block, phys_pos] = x_i8[order]
    ids[phys_block, phys_pos] = order
    scales[phys_block, phys_pos] = inv_norms[order]
    phys_centroids = np.repeat(np.asarray(centroids), blocks_per_cluster, axis=0)

    if device_resident:
        log(f"[ivf_big] uploading {blocks.nbytes / 1e9:.1f} GB of blocks to HBM")
        return IvfIndex(
            centroids=jnp.asarray(phys_centroids),
            blocks=jax.device_put(blocks),
            block_ids=jax.device_put(ids),
            block_scales=jax.device_put(scales),
            n_total=n,
        )
    return IvfIndex(
        centroids=jnp.asarray(phys_centroids),
        blocks=blocks,  # host numpy: consume via TieredIvf.from_ivf
        block_ids=ids,
        block_scales=scales,
        n_total=n,
    )


@partial(jax.jit, static_argnames=("k",))
def _gt_chunk_scores(blocks_chunk, ids_chunk, scales_chunk, q, *, k):
    """Exact top-k of one block-chunk vs all queries: returns (ids, cos).

    Scores in f32 (stored dtype upcasts losslessly; queries keep full
    precision) so 'exact ground truth' carries no bf16 ranking noise.
    """
    dots = jnp.einsum(
        "sld,bd->bsl",
        blocks_chunk.astype(jnp.float32),
        q.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    cos = dots * scales_chunk[None]
    cos = jnp.where((ids_chunk >= 0)[None], cos, -jnp.inf)
    B = q.shape[0]
    flat = cos.reshape(B, -1)
    fids = jnp.broadcast_to(ids_chunk.reshape(-1)[None], flat.shape)
    v, pos = jax.lax.top_k(flat, k)
    return jnp.take_along_axis(fids, pos, axis=1), v


def exact_topk_over_blocks(index: IvfIndex, q: jax.Array, k: int, *, block_chunk: int = 2048):
    """Exact ground truth by scanning every (device-resident) block chunk.

    Used to measure recall at scales where a separate brute index would not
    fit next to the IVF structure in HBM.
    """
    k_phys = index.blocks.shape[0]
    B = q.shape[0]
    best_ids = np.full((B, k), -1, np.int64)
    best_v = np.full((B, k), -np.inf, np.float32)
    for lo in range(0, k_phys, block_chunk):
        hi = min(lo + block_chunk, k_phys)
        ids_c, v_c = _gt_chunk_scores(
            jax.lax.slice_in_dim(index.blocks, lo, hi, axis=0),
            jax.lax.slice_in_dim(index.block_ids, lo, hi, axis=0),
            jax.lax.slice_in_dim(index.block_scales, lo, hi, axis=0),
            q,
            k=k,
        )
        all_v = np.concatenate([best_v, np.asarray(v_c)], axis=1)
        all_i = np.concatenate([best_ids, np.asarray(ids_c, np.int64)], axis=1)
        pos = np.argsort(-all_v, axis=1)[:, :k]
        best_v = np.take_along_axis(all_v, pos, axis=1)
        best_ids = np.take_along_axis(all_i, pos, axis=1)
    return best_ids, best_v
