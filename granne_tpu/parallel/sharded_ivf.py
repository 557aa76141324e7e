"""Multi-chip IVF serving: cluster blocks sharded over a device mesh.

The scale-out path for BASELINE config 5 (100M-1B vectors): one chip's HBM
holds ~10 GB of int8 cluster blocks (~100M x 96d measured), so a 1B-vector
index lives sharded — each device owns a contiguous slice of the PHYSICAL
block axis (``IvfIndex.blocks [k_phys, L, d]``), queries are replicated,
and per-shard candidates merge over ICI.

The reference's equivalent story is file-sharding above the library plus
per-process mmap (``/root/reference/src/elements/embeddings/parsing.rs:63-100``,
``src/lib.rs:16-23``); here the shard router is in-library and the merge is
an ``all_gather`` + batched top-k, like ``parallel/sharded.ShardedGranne``
does for HNSW sub-indexes.

Probe semantics: ``nprobe`` is PER SHARD.  Every shard's local top-nprobe
is a superset of that shard's members of the global top-nprobe (a globally
top cluster is top within its own shard), so the union probed at equal
``nprobe`` covers at least what the single-device search probes — sharded
recall at a given nprobe is >= single-device recall, at S x the block
scoring work.  Lower nprobe to trade back.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..index.ivf import IvfIndex, _ivf_search_grouped
from ..ops import distance as D
from ..ops.topk import sort_by_key
from .mesh import SHARD_AXIS, make_mesh


@dataclass
class ShardedIvf:
    """An :class:`IvfIndex` whose physical block axis is mesh-sharded.

    ``centroids``/``blocks``/``block_ids``/``block_scales`` keep the
    single-device layout but carry a ``NamedSharding`` over axis 0;
    ``centroid_valid`` masks the rows added to round ``k_phys`` up to a
    multiple of the mesh size (their block_ids are all -1).
    """

    mesh: jax.sharding.Mesh
    centroids: jax.Array  # f32[k_pad, d], row-sharded
    blocks: jax.Array  # bf16|f32|i8[k_pad, L, d], row-sharded
    block_ids: jax.Array  # int32[k_pad, L], row-sharded, global ids
    block_scales: jax.Array  # f32[k_pad, L], row-sharded
    centroid_valid: jax.Array  # bool[k_pad], row-sharded
    n_total: int

    @classmethod
    def from_ivf(cls, index: IvfIndex, mesh: jax.sharding.Mesh | None = None) -> "ShardedIvf":
        """Shard a built index: pad ``k_phys`` to a mesh multiple with empty
        blocks (ids -1, zero centroids — excluded from probes by the valid
        mask), then place every per-block array row-sharded."""
        if mesh is None:
            mesh = make_mesh()
        S = int(mesh.devices.size)
        k_phys = int(index.blocks.shape[0])
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

        # device_put host arrays directly against the sharding: each device
        # receives only its slice (no full-array stop on the default device)
        rows = NamedSharding(mesh, P(SHARD_AXIS))
        return cls(
            mesh=mesh,
            centroids=jax.device_put(cent, rows),
            blocks=jax.device_put(blocks, rows),
            block_ids=jax.device_put(bids, rows),
            block_scales=jax.device_put(scales, rows),
            centroid_valid=jax.device_put(valid, rows),
            n_total=index.n_total,
        )

    @classmethod
    def build(cls, raw_vectors, mesh: jax.sharding.Mesh | None = None, **kw) -> "ShardedIvf":
        return cls.from_ivf(IvfIndex.build(raw_vectors, **kw), mesh)

    @classmethod
    def load(cls, path: str, mesh: jax.sharding.Mesh | None = None) -> "ShardedIvf":
        """Load an ``IvfIndex.save`` artifact straight onto the mesh (each
        device receives only its own block-row slice)."""
        return cls.from_ivf(IvfIndex.load(path, device=False), mesh)

    @property
    def k_local(self) -> int:
        return int(self.blocks.shape[0]) // int(self.mesh.devices.size)

    def search_batch(
        self,
        queries,
        num_neighbors: int = 10,
        *,
        nprobe: int = 16,
        group_cap: int = 32,
        use_pallas: bool | None = None,
    ):
        """Replicated queries -> per-shard grouped IVF scoring (the
        single-device hot path, ``index/ivf._ivf_search_grouped``) ->
        ``all_gather`` of per-shard top-k over ICI -> batched merge.

        Returns replicated (int32[B, k] global ids, f32[B, k] distances).
        """
        from ..ops.pallas import ivf_score

        if not isinstance(queries, jax.Array):
            queries = jnp.asarray(np.asarray(queries, np.float32))
        q = D.normalize(queries.astype(jnp.float32))
        nprobe = min(nprobe, self.k_local)
        if use_pallas is None:
            use_pallas = ivf_score.supported()
        B = q.shape[0]
        num_slots = min(B * nprobe, self.k_local + (B * nprobe) // group_cap + 8)
        return _sharded_ivf_search(
            self.mesh,
            self.centroids,
            self.blocks,
            self.block_ids,
            self.block_scales,
            self.centroid_valid,
            q,
            nprobe=nprobe,
            k_out=num_neighbors,
            group_cap=group_cap,
            num_slots=num_slots,
            use_pallas=bool(use_pallas),
            use_pallas_topk=ivf_score.topk_supported(),
        )


_SEARCH_CACHE: dict = {}


def _sharded_ivf_search(mesh, centroids, blocks, block_ids, block_scales, centroid_valid, q, *, nprobe, k_out, group_cap, num_slots, use_pallas, use_pallas_topk):
    key = (id(mesh), nprobe, k_out, group_cap, num_slots, use_pallas, use_pallas_topk)
    cached = _SEARCH_CACHE.get(key)
    if cached is None:

        def body(cent, blk, bids, scales, valid, qq):
            ids_l, d_l = _ivf_search_grouped(
                cent, blk, bids, scales, qq,
                nprobe=nprobe, k_out=k_out, group_cap=group_cap,
                num_slots=num_slots, use_pallas=use_pallas,
                use_pallas_topk=use_pallas_topk, centroid_valid=valid,
            )
            # block_ids are global element ids (the index was laid out once,
            # then sharded), so no offset translation is needed here
            all_ids = jax.lax.all_gather(ids_l, SHARD_AXIS)  # [S, B, k]
            all_d = jax.lax.all_gather(d_l, SHARD_AXIS)
            B = qq.shape[0]
            cat_ids = jnp.transpose(all_ids, (1, 0, 2)).reshape(B, -1)
            cat_d = jnp.transpose(all_d, (1, 0, 2)).reshape(B, -1)
            # padding slots carry id -1 at +inf-equivalent distance; push
            # them behind every real candidate before the cut
            cat_d = jnp.where(cat_ids >= 0, cat_d, jnp.inf)
            sd, sids = sort_by_key(cat_d, cat_ids)
            return sids[:, :k_out], sd[:, :k_out]

        cached = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS), P()),
                out_specs=(P(), P()),
                check_vma=False,
            )
        )
        _SEARCH_CACHE[key] = cached
    return cached(centroids, blocks, block_ids, block_scales, centroid_valid, q)
