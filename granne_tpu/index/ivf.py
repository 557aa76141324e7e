"""IVF (inverted-file) index family — the TPU-native large-scale engine.

No direct reference counterpart (granne is HNSW-only; its billion-scale
story is mmap + i8 + sharding, ``src/lib.rs:16-23``).  On TPU the
graph-traversal access pattern is throttled by DMA-issue-limited 400-byte
row gathers, while the MXU can score whole *contiguous* cluster blocks at
streaming bandwidth.  IVF restructures storage so the hot loop is:

    1. score queries against k centroids            (one dense matmul)
    2. pick top-``nprobe`` clusters per query       (top_k)
    3. score the padded cluster blocks [L, d]       (batched matmuls over
       index_map-selected blocks — large DMAs, MXU-bound)
    4. merge per-cluster top-k                      (sort/top_k)

Storage: elements are permuted cluster-by-cluster into a padded dense
tensor [k, L, d] plus an id map [k, L] (-1 padding), the cluster analogue
of the reference's ``reorder`` locality story (``src/index/reorder.rs``).

Exact within probed clusters; recall is tuned by ``nprobe``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import distance as D
from ..ops import kmeans

IVF_MAGIC = b"granne-tpu-ivf"


def _as_device_f32(x):
    """Queries to device f32 without a host round-trip for jax arrays."""
    if isinstance(x, jax.Array):
        return x.astype(jnp.float32)
    return jnp.asarray(np.asarray(x, np.float32))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class IvfIndex:
    """Padded-cluster IVF index over unit-norm f32 (or int8) vectors."""

    centroids: jax.Array  # f32[k, d]
    blocks: jax.Array  # bf16|f32|i8[k, L, d] cluster-padded vectors
    block_ids: jax.Array  # int32[k, L], -1 padding
    block_scales: jax.Array  # f32[k, L]: per-row score scale (1.0 unless int8)
    n_total: int = field(metadata=dict(static=True))

    @property
    def k(self) -> int:
        return int(self.centroids.shape[0])

    @property
    def cluster_cap(self) -> int:
        return int(self.blocks.shape[1])

    @classmethod
    def build(
        cls,
        raw_vectors: np.ndarray,
        *,
        n_clusters: int | None = None,
        kmeans_iters: int = 12,
        cluster_cap: int | None = None,
        dtype: str = "bfloat16",
        seed: int = 0,
    ) -> "IvfIndex":
        """Train the coarse quantizer and lay out fixed-size sub-blocks.

        ``cluster_cap`` is the physical block size L; clusters larger than L
        span multiple blocks with duplicated centroid rows (no element ever
        leaves its true cluster).
        """
        x = np.asarray(
            D.normalize(jnp.asarray(np.asarray(raw_vectors, np.float32)))
        )
        n, d = x.shape
        if n_clusters is None:
            n_clusters = max(8, int(np.sqrt(n) * 1.5) // 8 * 8)
        k = n_clusters

        centroids, assign = kmeans.train_kmeans(x, k, iters=kmeans_iters, seed=seed)
        centroids = np.asarray(centroids)
        assign = np.asarray(assign)

        # Fixed-size physical sub-blocks: a cluster of s members occupies
        # ceil(s/L) blocks, each carrying a COPY of the cluster's centroid
        # row.  The coarse top-k then naturally probes every sub-block of a
        # near cluster (duplicated centroids tie), so no element is ever
        # spilled away from its true cluster and padding waste is bounded by
        # one partial block per cluster.
        if cluster_cap is None:
            cluster_cap = min(512, max(64, int(np.ceil(n / k * 1.5))))
        L = -(-cluster_cap // 8) * 8  # sublane-align

        counts = np.bincount(assign, minlength=k)
        blocks_per_cluster = np.maximum(1, -(-counts // L))
        block_base = np.concatenate([[0], np.cumsum(blocks_per_cluster)])
        k_phys = int(block_base[-1])

        order = np.argsort(assign, kind="stable")
        a_s = assign[order]
        starts = np.searchsorted(a_s, np.arange(k))
        rank = np.arange(n) - starts[a_s]
        phys_block = block_base[a_s] + rank // L
        phys_pos = rank % L

        blocks = np.zeros((k_phys, L, d), np.float32)
        ids = np.full((k_phys, L), -1, np.int32)
        blocks[phys_block, phys_pos] = x[order]
        ids[phys_block, phys_pos] = order
        # physical centroid table: cluster centroid repeated per sub-block
        centroids = np.repeat(centroids, blocks_per_cluster, axis=0)

        scales = jnp.ones((k_phys, L), jnp.float32)
        if dtype == "bfloat16":
            blocks_j = jnp.asarray(blocks, jnp.bfloat16)
        elif dtype == "int8":
            # rows are unit-norm f32 before quantization; int8 rows are not,
            # so cosine ranking needs the per-row reciprocal norm as a scale
            blocks_j = D.quantize_i8(jnp.asarray(blocks))
            scales = D.inv_norms_i8(blocks_j)
        else:
            blocks_j = jnp.asarray(blocks)

        return cls(
            centroids=jnp.asarray(centroids),
            blocks=blocks_j,
            block_ids=jnp.asarray(ids),
            block_scales=scales,
            n_total=n,
        )

    # -- extension -----------------------------------------------------------

    def append(self, raw_vectors) -> "IvfIndex":
        """Extend a built index with new elements (functional update).

        The reference's extensible-index story (append onto a built HNSW,
        ``src/index/mod.rs:374-402``) applied to the IVF engine: each new
        vector is assigned to its nearest existing cluster, fills that
        cluster's free padding slots first, and only the overflow is laid
        out as fresh sub-blocks carrying a copy of the cluster's centroid
        row — the same duplicated-centroid mechanism oversized clusters use
        at build time, so the coarse probe covers old and new blocks alike
        (``nprobe`` counts sub-blocks; fill-before-spill keeps the block
        count — and thus the nprobe needed for a given recall — from
        growing until clusters actually run out of padding).

        New elements get ids ``n_total .. n_total+len(raw)-1`` — the caller
        keeps one id space by concatenating its element store.
        """
        x = np.asarray(
            D.normalize(jnp.asarray(np.asarray(raw_vectors, np.float32)))
        )
        m, d = x.shape
        if d != self.blocks.shape[2]:
            raise ValueError(f"dimension mismatch: {d} != {self.blocks.shape[2]}")
        L = self.cluster_cap

        # nearest physical centroid; duplicated rows tie and argmax takes the
        # first, i.e. the first block of the cluster's contiguous run
        assign = np.asarray(kmeans.assign_clusters(jnp.asarray(x), self.centroids))

        # group physical blocks into runs of identical (duplicated) centroid
        # rows: a run IS one logical cluster (layout is np.repeat at build)
        cent_np = np.asarray(self.centroids)
        same = np.all(cent_np[1:] == cent_np[:-1], axis=1)
        run_id = np.concatenate([[0], np.cumsum(~same)]).astype(np.int64)
        n_runs = int(run_id[-1]) + 1

        # free slots, grouped by run (block-major order keeps runs contiguous)
        ids_np = np.asarray(self.block_ids)
        free_b, free_p = np.nonzero(ids_np < 0)
        free_run = run_id[free_b]
        free_count = np.bincount(free_run, minlength=n_runs)
        free_start = np.concatenate([[0], np.cumsum(free_count)])

        # rank each new member within its run
        member_run = run_id[assign]
        order = np.argsort(member_run, kind="stable")
        r_s = member_run[order]
        uniq, starts = np.unique(r_s, return_index=True)
        rank = np.arange(m) - starts[np.searchsorted(uniq, r_s)]

        in_free = rank < free_count[r_s]
        slot_idx = free_start[r_s] + np.minimum(rank, np.maximum(free_count[r_s] - 1, 0))
        fill_b = free_b[slot_idx[in_free]]
        fill_p = free_p[slot_idx[in_free]]
        fill_x = x[order[in_free]]
        fill_ids = (self.n_total + order[in_free]).astype(np.int32)

        # overflow spills into fresh sub-blocks per run
        sp_mask = ~in_free
        sp_run = r_s[sp_mask]
        sp_rank = rank[sp_mask] - free_count[sp_run]
        sp_uniq, sp_starts = np.unique(sp_run, return_index=True)
        sp_sizes = np.diff(np.append(sp_starts, len(sp_run)))
        blocks_per = -(-sp_sizes // L)
        new_base = np.concatenate([[0], np.cumsum(blocks_per)])
        k_new = int(new_base[-1])

        grp = np.searchsorted(sp_uniq, sp_run)
        new_blocks = np.zeros((k_new, L, d), np.float32)
        new_ids = np.full((k_new, L), -1, np.int32)
        new_blocks[new_base[grp] + sp_rank // L, sp_rank % L] = x[order[sp_mask]]
        new_ids[new_base[grp] + sp_rank // L, sp_rank % L] = self.n_total + order[sp_mask]
        # centroid row of each spilling run = its first block's row
        run_first = np.concatenate([[0], np.nonzero(~same)[0] + 1])
        new_cent = np.repeat(cent_np[run_first[sp_uniq]], blocks_per, axis=0)

        # materialize updated copies on host (functional update; the scatter
        # copies the tensor either way), then one device_put each
        blocks_np = np.array(np.asarray(self.blocks))
        ids_out = np.array(ids_np)
        scales_np = np.array(np.asarray(self.block_scales))
        is_i8 = self.blocks.dtype == jnp.int8
        if is_i8:
            q8 = np.asarray(D.quantize_i8(jnp.asarray(fill_x)))
            blocks_np[fill_b, fill_p] = q8
            inv = np.asarray(D.inv_norms_i8(jnp.asarray(q8[None]))).reshape(-1)
            scales_np[fill_b, fill_p] = inv
            nb = np.asarray(D.quantize_i8(jnp.asarray(new_blocks)))
            nscales = np.asarray(D.inv_norms_i8(jnp.asarray(nb)))
        else:
            blocks_np[fill_b, fill_p] = fill_x.astype(blocks_np.dtype)
            nb = new_blocks.astype(blocks_np.dtype)
            nscales = np.ones((k_new, L), np.float32)
        ids_out[fill_b, fill_p] = fill_ids

        return IvfIndex(
            centroids=jnp.asarray(np.concatenate([cent_np, new_cent])),
            blocks=jnp.asarray(np.concatenate([blocks_np, nb])),
            block_ids=jnp.asarray(np.concatenate([ids_out, new_ids])),
            block_scales=jnp.asarray(np.concatenate([scales_np, nscales])),
            n_total=self.n_total + m,
        )

    # -- persistence ---------------------------------------------------------
    # Same single-artifact, 1024-byte-metadata-block convention as the HNSW
    # index format (index/io.py; reference: src/index/io.rs:7-9,46-67).

    def save(self, path: str) -> None:
        """Write centroids/blocks/ids/scales back-to-back after the metadata
        block.  Scales are omitted when trivially 1.0 (non-int8 blocks)."""
        import os

        from . import io as gio

        cent = np.ascontiguousarray(np.asarray(self.centroids), "<f4")
        blocks = np.ascontiguousarray(np.asarray(self.blocks))
        bids = np.ascontiguousarray(np.asarray(self.block_ids), "<i4")
        dtype = str(self.blocks.dtype)
        scales = None
        if dtype == "int8":
            scales = np.ascontiguousarray(np.asarray(self.block_scales), "<f4")
        meta = {
            "granne_tpu_version": gio.LIBRARY_VERSION,
            "version": gio.SERIALIZATION_VERSION,
            "k_phys": int(blocks.shape[0]),
            "cluster_cap": int(blocks.shape[1]),
            "dim": int(blocks.shape[2]),
            "dtype": dtype,
            "n_total": int(self.n_total),
            "has_scales": scales is not None,
        }
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            gio._write_metadata(f, IVF_MAGIC, meta)
            f.write(cent.tobytes())
            f.write(blocks.tobytes())
            f.write(bids.tobytes())
            if scales is not None:
                f.write(scales.tobytes())
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str, device: bool = True) -> "IvfIndex":
        """Load an index; payloads memory-map and move to device unless
        ``device=False`` (host-resident numpy views, e.g. for
        ``parallel/tiering.TieredIvf`` pipelines that stream blocks)."""
        import ml_dtypes

        from . import io as gio

        with open(path, "rb") as f:
            meta = gio._read_metadata(f.read(gio.METADATA_LEN), IVF_MAGIC)
        k, L, d = meta["k_phys"], meta["cluster_cap"], meta["dim"]
        blk_dt = {"float32": np.dtype("<f4"), "bfloat16": np.dtype(ml_dtypes.bfloat16),
                  "int8": np.dtype("i1")}[meta["dtype"]]
        off = gio.METADATA_LEN
        cent = np.memmap(path, "<f4", mode="r", offset=off, shape=(k, d))
        off += cent.nbytes
        blocks = np.memmap(path, blk_dt, mode="r", offset=off, shape=(k, L, d))
        off += blocks.nbytes
        bids = np.memmap(path, "<i4", mode="r", offset=off, shape=(k, L))
        off += bids.nbytes
        if meta["has_scales"]:
            scales = np.memmap(path, "<f4", mode="r", offset=off, shape=(k, L))
        else:
            scales = np.ones((k, L), np.float32)
        put = jnp.asarray if device else np.asarray
        return cls(
            centroids=put(cent),
            blocks=put(blocks),
            block_ids=put(bids),
            block_scales=put(scales),
            n_total=meta["n_total"],
        )

    # -- search ------------------------------------------------------------

    def search_batch(
        self,
        queries,
        num_neighbors: int = 10,
        *,
        nprobe: int = 16,
        query_chunk: int = 256,
        grouped: bool = True,
        group_cap: int = 32,
        use_pallas: bool | None = None,
    ):
        q = D.normalize(_as_device_f32(queries))
        from ..ops.pallas import ivf_score

        if use_pallas is None:
            use_pallas = ivf_score.supported()
        use_pallas_topk = ivf_score.topk_supported()
        if grouped:
            B = q.shape[0]
            num_slots = min(B * nprobe, self.k + (B * nprobe) // group_cap + 8)
            return _ivf_search_grouped(
                self.centroids,
                self.blocks,
                self.block_ids,
                self.block_scales,
                q,
                nprobe=nprobe,
                k_out=num_neighbors,
                group_cap=group_cap,
                num_slots=num_slots,
                use_pallas=use_pallas,
                use_pallas_topk=use_pallas_topk,
            )
        return _ivf_search(
            self.centroids,
            self.blocks,
            self.block_ids,
            self.block_scales,
            q,
            nprobe=nprobe,
            k_out=num_neighbors,
            query_chunk=query_chunk,
        )


@partial(jax.jit, static_argnames=("nprobe", "k_out", "group_cap", "num_slots", "use_pallas", "use_pallas_topk"))
def _ivf_search_grouped(centroids, blocks, block_ids, block_scales, q, *, nprobe, k_out, group_cap, num_slots, use_pallas=False, use_pallas_topk=False, centroid_valid=None):
    """Cluster-centric scoring: each probed cluster's block streams from HBM
    ONCE and is scored against every query probing it via one batched MXU
    contraction — no per-query block materialization.

    Hot clusters probed by more than ``group_cap`` queries spill into
    duplicate slots (graceful, no dropped work).

    ``centroid_valid`` (optional bool[k]) excludes padding blocks from the
    coarse probe — the sharded path pads ``k_phys`` up to a multiple of the
    mesh size with empty blocks (``parallel/sharded_ivf.py``).
    """
    from ..ops.segment import group_pairs

    B = q.shape[0]
    L = blocks.shape[1]
    S = num_slots
    cs = jax.lax.dot_general(
        q, centroids, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if centroid_valid is not None:
        cs = jnp.where(centroid_valid[None, :], cs, -jnp.inf)
    _, probes = jax.lax.top_k(cs, nprobe)  # [B, nprobe]

    P = B * nprobe
    pair_keys = probes.reshape(-1).astype(jnp.int32)
    pair_idx = jnp.arange(P, dtype=jnp.int32)
    slot_keys, slot_pairs, item_slot, item_pos, sorted_pairs, _ = group_pairs(
        pair_keys, pair_idx, cap=group_cap, num_slots=S
    )

    # per-slot block + query group
    safe_keys = jnp.clip(slot_keys, 0, blocks.shape[0] - 1)
    ids_g = jnp.take(block_ids, safe_keys, axis=0)  # [S, L]
    scales_g = jnp.take(block_scales, safe_keys, axis=0)  # [S, L]
    slot_queries = jnp.where(slot_pairs >= 0, slot_pairs // nprobe, 0)
    qg = jnp.take(q, slot_queries, axis=0)  # [S, cap, d]

    from ..ops.pallas import ivf_score

    if use_pallas_topk:
        # Fused Pallas score + per-slot top-k: the [S, cap, L] score tensor
        # never touches HBM (a fusion XLA cannot perform through a sort),
        # and the downstream pair-scatter/merge shrinks from width L to
        # width k_out.  Per-slot top-k_out union >= global top-k_out, so the
        # final per-query top_k stays exact.
        vals, vids = ivf_score.ivf_score_topk(
            blocks, block_ids, block_scales, safe_keys, qg, k_out=k_out
        )
        occupied = (slot_pairs >= 0)[:, :, None]
        vals = jnp.where(occupied, vals, -jnp.inf)
        vids = jnp.where(occupied, vids, -1)
        Kp = vals.shape[2]
        flat_v = vals.reshape(S * group_cap, Kp)
        flat_i = vids.reshape(S * group_cap, Kp)
        lin = jnp.where(item_slot >= 0, item_slot * group_cap + item_pos, 0)
        rows = jnp.where((item_slot >= 0)[:, None], jnp.take(flat_v, lin, axis=0), -jnp.inf)
        id_rows = jnp.where((item_slot >= 0)[:, None], jnp.take(flat_i, lin, axis=0), -1)
        out_scores = jnp.full((P, Kp), -jnp.inf, jnp.float32).at[sorted_pairs].set(rows, mode="drop")
        out_ids = jnp.full((P, Kp), -1, jnp.int32).at[sorted_pairs].set(id_rows, mode="drop")
        v, pos = jax.lax.top_k(out_scores.reshape(B, nprobe * Kp), k_out)
        ids = jnp.take_along_axis(out_ids.reshape(B, nprobe * Kp), pos, axis=1)
        return ids, jnp.maximum(0.0, 1.0 - v)

    # manual in-kernel DMA requires the lane dim 128-aligned (Mosaic
    # memref_slice constraint); unaligned d falls back to the XLA path
    if blocks.dtype == jnp.bfloat16 and use_pallas and blocks.shape[2] % 128 == 0:
        # Pallas: blocks stream HBM->VMEM once (double-buffered in-kernel
        # DMA, G slots per grid step), selected by the prefetched
        # slot->cluster map; no [S, L, d] gather materialization
        scores = ivf_score.ivf_score_slots_grouped(
            blocks, safe_keys, qg.astype(jnp.bfloat16)
        )
    else:
        bg = jnp.take(blocks, safe_keys, axis=0)  # [S, L, d]
        scores = jnp.einsum(
            "sld,scd->scl",
            bg.astype(jnp.bfloat16),
            qg.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )  # [S, cap, L]
    scores = scores * scales_g[:, None, :]
    valid = jnp.logical_and((slot_pairs >= 0)[:, :, None], (ids_g >= 0)[:, None, :])
    scores = jnp.where(valid, scores, -jnp.inf)

    # scatter each (slot, pos) score row back to its original pair
    flat_scores = scores.transpose(0, 1, 2).reshape(S * group_cap, L)
    lin = jnp.where(item_slot >= 0, item_slot * group_cap + item_pos, 0)
    rows = jnp.take(flat_scores, lin, axis=0)  # [P, L] (sorted-pair order)
    rows = jnp.where((item_slot >= 0)[:, None], rows, -jnp.inf)
    id_rows = jnp.take(ids_g, jnp.maximum(item_slot, 0), axis=0)
    id_rows = jnp.where((item_slot >= 0)[:, None], id_rows, -1)

    out_scores = jnp.full((P, L), -jnp.inf, jnp.float32).at[sorted_pairs].set(rows, mode="drop")
    out_ids = jnp.full((P, L), -1, jnp.int32).at[sorted_pairs].set(id_rows, mode="drop")

    per_q_scores = out_scores.reshape(B, nprobe * L)
    per_q_ids = out_ids.reshape(B, nprobe * L)
    v, pos = jax.lax.top_k(per_q_scores, k_out)
    ids = jnp.take_along_axis(per_q_ids, pos, axis=1)
    return ids, jnp.maximum(0.0, 1.0 - v)


@partial(jax.jit, static_argnames=("nprobe", "k_out", "query_chunk"))
def _ivf_search(centroids, blocks, block_ids, block_scales, q, *, nprobe, k_out, query_chunk):
    B = q.shape[0]
    pad = (-B) % query_chunk
    qp = jnp.pad(q, ((0, pad), (0, 0)))

    def chunk_body(qc):
        # 1-2: coarse scores -> probe list
        cs = jax.lax.dot_general(
            qc, centroids, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        _, probes = jax.lax.top_k(cs, nprobe)  # [Qc, nprobe]

        # 3: gather blocks and score (bf16 MXU passes)
        pb = jnp.take(blocks, probes, axis=0)  # [Qc, nprobe, L, d]
        pids = jnp.take(block_ids, probes, axis=0)  # [Qc, nprobe, L]
        pscales = jnp.take(block_scales, probes, axis=0)
        dots = jnp.einsum(
            "qpld,qd->qpl",
            pb.astype(jnp.bfloat16),
            qc.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        dots = dots * pscales
        dots = jnp.where(pids >= 0, dots, -jnp.inf)

        # 4: merge
        Qc = qc.shape[0]
        flat = dots.reshape(Qc, -1)
        fids = pids.reshape(Qc, -1)
        v, pos = jax.lax.top_k(flat, k_out)
        ids = jnp.take_along_axis(fids, pos, axis=1)
        return ids, jnp.maximum(0.0, 1.0 - v)

    nc = qp.shape[0] // query_chunk
    ids, dists = jax.lax.map(chunk_body, qp.reshape(nc, query_chunk, -1))
    ids = ids.reshape(-1, k_out)[:B]
    dists = dists.reshape(-1, k_out)[:B]
    return ids, dists
