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


# ---------------------------------------------------------------------------
# Tiered + sharded composition: the 1B-vector serving shape (config 5).
# One v5e chip holds ~100M int8 vectors HBM-resident (measured, BASELINE);
# at 1B the blocks overflow every chip's HBM *and* one host's fetch
# bandwidth, so the composition is: the PHYSICAL block axis is partitioned
# across the mesh, each device's slice lives in ITS host's DRAM (on real
# multi-host pods each process owns its slice; this class models it with
# per-shard host arrays), per batch each shard host-gathers only its own
# probed clusters, and per-shard top-k merges over ICI exactly as
# ShardedIvf does.  Probe semantics match ShardedIvf: nprobe is PER SHARD,
# so the probed union is a superset of the single-device probe set and
# recall at equal nprobe is >= the single-device search.
# ---------------------------------------------------------------------------


@dataclass
class TieredShardedIvf:
    """Host-tiered cluster blocks, sharded over a device mesh.

    Composes :class:`TieredIvf` (blocks in host DRAM, coarse state in HBM)
    with :class:`~granne_tpu.parallel.sharded_ivf.ShardedIvf` (block axis
    partitioned over the mesh, ICI all_gather merge).  SURVEY §5.8's
    multi-host serving obligation: DCN moves nothing but queries/results;
    block traffic stays host-local per shard.
    """

    mesh: jax.sharding.Mesh
    centroids: jax.Array  # HBM f32[k_pad, d], replicated (coarse state is tiny)
    centroid_valid: np.ndarray  # host bool[k_pad] (pad rows excluded from probes)
    host_blocks: np.ndarray  # host [k_pad, L, d]; shard s owns rows [s*k_local, (s+1)*k_local)
    host_block_ids: np.ndarray  # host int32[k_pad, L], global element ids
    host_block_scales: np.ndarray  # host f32[k_pad, L]
    n_total: int

    @classmethod
    def from_ivf(cls, index: IvfIndex, mesh=None) -> "TieredShardedIvf":
        from .mesh import make_mesh

        if mesh is None:
            mesh = make_mesh()
        S = int(mesh.devices.size)
        k_phys = int(np.asarray(index.blocks).shape[0])
        pad = (-k_phys) % S
        cent = np.asarray(index.centroids)
        blocks = np.asarray(index.blocks)
        bids = np.asarray(index.block_ids)
        scales = np.asarray(index.block_scales)
        valid = np.ones((k_phys,), bool)
        if pad:
            cent = np.concatenate([cent, np.zeros((pad,) + cent.shape[1:], cent.dtype)])
            blocks = np.concatenate([blocks, np.zeros((pad,) + blocks.shape[1:], blocks.dtype)])
            bids = np.concatenate([bids, np.full((pad,) + bids.shape[1:], -1, bids.dtype)])
            scales = np.concatenate([scales, np.ones((pad,) + scales.shape[1:], scales.dtype)])
            valid = np.concatenate([valid, np.zeros((pad,), bool)])
        return cls(
            mesh=mesh,
            centroids=jnp.asarray(cent),
            centroid_valid=valid,
            host_blocks=blocks,
            host_block_ids=bids,
            host_block_scales=scales,
            n_total=index.n_total,
        )

    @classmethod
    def build(cls, raw_vectors, mesh=None, **kw) -> "TieredShardedIvf":
        return cls.from_ivf(IvfIndex.build(raw_vectors, **kw), mesh)

    @classmethod
    def load(cls, path: str, mesh=None) -> "TieredShardedIvf":
        """One saved artifact serves single-device, mesh-sharded, host-tiered
        — and now tiered+sharded (blocks stay memory-mapped on the host)."""
        return cls.from_ivf(IvfIndex.load(path, device=False), mesh)

    @property
    def k_local(self) -> int:
        return int(self.host_blocks.shape[0]) // int(self.mesh.devices.size)

    def search_batch(self, queries, num_neighbors: int = 10, *, nprobe: int = 16):
        """Coarse probe (HBM, replicated) -> per-shard host gather of that
        shard's probed clusters -> sharded H2D (each device receives only
        its slice) -> per-device scoring -> ICI all_gather merge.
        Returns (int32[B, k] global ids, f32[B, k] distances) on host."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .mesh import SHARD_AXIS

        S = int(self.mesh.devices.size)
        kl = self.k_local
        nprobe = min(nprobe, kl)
        q = D.normalize(jnp.asarray(np.asarray(queries, np.float32)))
        B = int(q.shape[0])

        # coarse scores against ALL centroids, then per-shard local top-nprobe
        # (ShardedIvf's superset semantics — a globally top cluster is top
        # within its own shard)
        cs = np.array(
            jax.lax.dot_general(
                q, self.centroids, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )  # np.array (not asarray): a writable copy, the device view is read-only
        cs[:, ~self.centroid_valid] = -np.inf
        local = cs.reshape(B, S, kl)
        probes = np.argpartition(-local, nprobe - 1, axis=2)[:, :, :nprobe]  # [B, S, np]

        # per-shard host gather of the unique probed clusters, padded to a
        # common U so the fetched tensors stack shard-major
        fetch_b, fetch_i, fetch_s, probe_idx = [], [], [], []
        U = max(len(np.unique(probes[:, s, :])) for s in range(S))
        for s in range(S):
            uniq, inv = np.unique(probes[:, s, :], return_inverse=True)
            rows = s * kl + uniq
            pad = U - len(uniq)
            blk = self.host_blocks[rows]
            ids = self.host_block_ids[rows]
            scl = self.host_block_scales[rows]
            if pad:
                blk = np.concatenate([blk, np.zeros((pad,) + blk.shape[1:], blk.dtype)])
                ids = np.concatenate([ids, np.full((pad,) + ids.shape[1:], -1, ids.dtype)])
                scl = np.concatenate([scl, np.ones((pad,) + scl.shape[1:], scl.dtype)])
            fetch_b.append(blk)
            fetch_i.append(ids)
            fetch_s.append(scl)
            probe_idx.append(inv.reshape(B, nprobe).astype(np.int32))

        rows_sh = NamedSharding(self.mesh, P(SHARD_AXIS))
        blocks = jax.device_put(np.stack(fetch_b), rows_sh)  # [S, U, L, d]
        bids = jax.device_put(np.stack(fetch_i), rows_sh)
        scales = jax.device_put(np.stack(fetch_s), rows_sh)
        pidx = jax.device_put(np.stack(probe_idx), rows_sh)  # [S, B, np]

        fn = _tiered_sharded_merge(self.mesh, num_neighbors)
        ids, dd = fn(blocks, bids, scales, pidx, q)
        return np.asarray(ids), np.asarray(dd)


_TS_CACHE: dict = {}


def _tiered_sharded_merge(mesh, k_out: int):
    """shard_map'd per-device scoring of fetched blocks + all_gather merge."""
    from jax.sharding import PartitionSpec as P

    from ..ops.topk import sort_by_key
    from .mesh import SHARD_AXIS

    key = (id(mesh), k_out)
    cached = _TS_CACHE.get(key)
    if cached is not None:
        return cached

    def body(blocks, bids, scales, pidx, q):
        # leading shard axis is size 1 inside the map
        ids_l, d_l = _score_fetched(
            blocks[0], bids[0], scales[0], pidx[0], q, k_out=k_out
        )
        d_l = jnp.where(ids_l >= 0, d_l, jnp.inf)
        all_ids = jax.lax.all_gather(ids_l, SHARD_AXIS)  # [S, B, k]
        all_d = jax.lax.all_gather(d_l, SHARD_AXIS)
        B = q.shape[0]
        cat_ids = jnp.transpose(all_ids, (1, 0, 2)).reshape(B, -1)
        cat_d = jnp.transpose(all_d, (1, 0, 2)).reshape(B, -1)
        sd, sids = sort_by_key(cat_d, cat_ids)
        return sids[:, :k_out], sd[:, :k_out]

    cached = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    _TS_CACHE[key] = cached
    return cached
