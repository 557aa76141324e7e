"""Host-DRAM <-> HBM tiering: the billion-vector mmap analogue.

The reference serves billion-vector indexes from memory-mapped files with
OS paging (``src/lib.rs:16-23``, madvise-random).  The TPU equivalent keeps
the small hot state in HBM — IVF centroids and cluster id maps — while the
cluster *blocks* (the bulk) live in host DRAM, fetched per query batch as
large contiguous slabs (the IVF layout makes every fetch a sequential read,
unlike graph traversal's random rows — this is why the tiered path is built
on IVF).

A two-deep prefetch pipeline overlaps the host->HBM transfer of the next
batch's clusters with the current batch's MXU scoring.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..index.ivf import IvfIndex
from ..ops import distance as D


@partial(jax.jit, static_argnames=("nprobe",))
def _coarse_probes(centroids, q, *, nprobe):
    cs = jax.lax.dot_general(
        q, centroids, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return jax.lax.top_k(cs, nprobe)[1]


@partial(jax.jit, static_argnames=("k_out",))
def _score_fetched(blocks, block_ids, block_scales, probe_of_query, q, *, k_out):
    """blocks: [U, L, d] fetched clusters; probe_of_query: int32[B, nprobe]
    indices INTO the fetched axis; q: [B, d]."""
    pb = jnp.take(blocks, probe_of_query, axis=0)  # [B, nprobe, L, d]
    pids = jnp.take(block_ids, probe_of_query, axis=0)
    pscales = jnp.take(block_scales, probe_of_query, axis=0)
    dots = jnp.einsum(
        "bpld,bd->bpl",
        pb.astype(jnp.bfloat16),
        q.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    dots = dots * pscales
    dots = jnp.where(pids >= 0, dots, -jnp.inf)
    B = q.shape[0]
    v, pos = jax.lax.top_k(dots.reshape(B, -1), k_out)
    ids = jnp.take_along_axis(pids.reshape(B, -1), pos, axis=1)
    return ids, jnp.maximum(0.0, 1.0 - v)


@dataclass
class TieredIvf:
    """IVF index with host-resident blocks and HBM-resident coarse state."""

    centroids: jax.Array  # HBM f32[k, d]
    host_blocks: np.ndarray  # host [k, L, d] (bf16/f32/int8)
    host_block_ids: np.ndarray  # host int32[k, L]
    host_block_scales: np.ndarray  # host f32[k, L]
    n_total: int

    @classmethod
    def from_ivf(cls, index: IvfIndex) -> "TieredIvf":
        return cls(
            centroids=jnp.asarray(index.centroids),
            host_blocks=np.asarray(index.blocks),
            host_block_ids=np.asarray(index.block_ids),
            host_block_scales=np.asarray(index.block_scales),
            n_total=index.n_total,
        )

    @classmethod
    def build(cls, raw_vectors, **kw) -> "TieredIvf":
        return cls.from_ivf(IvfIndex.build(raw_vectors, **kw))

    @classmethod
    def load(cls, path: str) -> "TieredIvf":
        """Serve an ``IvfIndex.save`` artifact beyond-HBM: blocks stay
        host-resident (memory-mapped), only the coarse state moves to HBM."""
        return cls.from_ivf(IvfIndex.load(path, device=False))

    def _fetch(self, probes: np.ndarray):
        """Host gather of the unique probed clusters + remap probe indices."""
        uniq, inv = np.unique(probes, return_inverse=True)
        blocks = jax.device_put(jnp.asarray(self.host_blocks[uniq]))
        ids = jax.device_put(jnp.asarray(self.host_block_ids[uniq]))
        scales = jax.device_put(jnp.asarray(self.host_block_scales[uniq]))
        return blocks, ids, scales, jnp.asarray(inv.reshape(probes.shape).astype(np.int32))

    def _prepare(self, batch, nprobe):
        """Coarse probe + host gather + async H2D for one batch."""
        q = D.normalize(jnp.asarray(np.asarray(batch, np.float32)))
        probes = np.asarray(_coarse_probes(self.centroids, q, nprobe=nprobe))
        return q, self._fetch(probes)

    def search_batches(self, query_batches, num_neighbors: int = 10, *, nprobe: int = 16):
        """Generator over result batches with a two-deep prefetch pipeline.

        Batch k+1's *entire* fetch — coarse probe, host-side unique+gather,
        and the H2D transfer — runs on a prefetch thread while the device
        scores batch k, so both the host gather and the link transfer hide
        behind MXU time (the weak spot of a naive loop is the synchronous
        np.unique+fancy-gather, which a device-async H2D alone cannot hide).
        """
        from concurrent.futures import ThreadPoolExecutor

        it = iter(query_batches)
        with ThreadPoolExecutor(max_workers=1) as ex:
            try:
                first = next(it)
            except StopIteration:
                return
            fut = ex.submit(self._prepare, first, nprobe)
            done = False
            while not done:
                q, (blocks, ids, scales, probe_idx) = fut.result()
                nxt = next(it, None)
                if nxt is None:
                    done = True
                else:
                    fut = ex.submit(self._prepare, nxt, nprobe)
                out = _score_fetched(blocks, ids, scales, probe_idx, q, k_out=num_neighbors)
                yield tuple(np.asarray(x) for x in out)

    def search_batches_sequential(self, query_batches, num_neighbors: int = 10, *, nprobe: int = 16):
        """No-overlap reference path (for pipeline-efficiency measurement)."""
        for batch in query_batches:
            q, (blocks, ids, scales, probe_idx) = self._prepare(batch, nprobe)
            out = _score_fetched(blocks, ids, scales, probe_idx, q, k_out=num_neighbors)
            yield tuple(np.asarray(x) for x in out)

    def search_batch(self, queries, num_neighbors: int = 10, *, nprobe: int = 16):
        return next(iter(self.search_batches([queries], num_neighbors, nprobe=nprobe)))
