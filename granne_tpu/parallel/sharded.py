"""Multi-chip serving: element-sharded search over a device mesh.

The TPU-native replacement for the reference's above-the-library sharding
story (SURVEY §5.8; ``parsing.rs:63-100`` shard files + per-process mmap):
elements are partitioned into S contiguous shards; each device holds ONE
shard's element slice plus an HNSW graph built over that shard.  A query
batch is replicated; every device beam-searches its own sub-index in
lockstep, and the per-shard top-k results are merged with an
``all_gather`` over ICI followed by a batched top-k — the collective-based
analogue of merging per-shard result sets on the host.

Local shard ids are translated to global ids inside the shard_map body
(``global = local + shard_offset``), so callers see one id space.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..index.builder import BuildConfig, build_layers
from ..index.graph import LayerStack
from ..ops import frontier
from ..ops.topk import sort_by_key
from .mesh import SHARD_AXIS, make_mesh


@dataclass
class ShardedGranne:
    """An index sharded across a 1-D device mesh (one sub-index per device).

    ``layers``/``elements`` are pytrees whose array leaves carry a leading
    shard axis of size S, placed with a sharded ``NamedSharding`` so each
    device holds exactly its own shard's slice.
    """

    mesh: jax.sharding.Mesh
    layers: tuple  # tuple of int32[S, rows_l, M]
    counts: tuple
    elements: object  # container with leading shard axis on array leaves
    shard_offsets: jax.Array  # int32[S]
    n_total: int

    @classmethod
    def build(
        cls,
        element_cls,
        raw_vectors: np.ndarray,
        config: BuildConfig,
        mesh: jax.sharding.Mesh | None = None,
    ) -> "ShardedGranne":
        """Partition rows contiguously, build one sub-index per shard.

        Sub-index builds run sequentially (each is itself a batched TPU
        program); layer stacks are padded to identical shapes and stacked
        with a leading shard axis.
        """
        if mesh is None:
            mesh = make_mesh()
        S = mesh.devices.size
        n = raw_vectors.shape[0]
        bounds = np.linspace(0, n, S + 1).astype(np.int64)
        shard_n = int(np.max(bounds[1:] - bounds[:-1]))

        per_shard_layers: list[LayerStack] = []
        per_shard_elems = []
        offsets = []
        for s in range(S):
            lo, hi = int(bounds[s]), int(bounds[s + 1])
            # pad every shard to the same element count (repeat last row; the
            # padding rows are excluded from each sub-index by num_elements)
            chunk = raw_vectors[lo:hi]
            if chunk.shape[0] < shard_n:
                pad = np.repeat(chunk[-1:], shard_n - chunk.shape[0], axis=0)
                chunk = np.concatenate([chunk, pad], axis=0)
            elems = element_cls.from_raw(chunk)
            cfg = config
            stack = build_layers(elems, cfg, num_elements=hi - lo)
            per_shard_layers.append(stack)
            per_shard_elems.append(elems)
            offsets.append(lo)

        # unify layer-stack shapes across shards (same depth, same row pads)
        depth = max(len(ls) for ls in per_shard_layers)
        widths = config.num_neighbors
        row_pads = []
        for li in range(depth):
            rows = 8
            for ls in per_shard_layers:
                if li < len(ls):
                    rows = max(rows, ls.layers[li].shape[0])
            row_pads.append(rows)

        stacked_layers = []
        counts = []
        for li in range(depth):
            per = []
            cnt = []
            for ls in per_shard_layers:
                if li < len(ls):
                    a = np.asarray(ls.layers[li])
                    cnt.append(ls.counts[li])
                else:
                    # shallower stack: reuse its bottom layer for this depth
                    a = np.asarray(ls.layers[-1])
                    cnt.append(ls.counts[-1])
                if a.shape[0] < row_pads[li]:
                    a = np.pad(a, ((0, row_pads[li] - a.shape[0]), (0, 0)), constant_values=-1)
                per.append(a)
            stacked_layers.append(jnp.asarray(np.stack(per)))
            counts.append(tuple(cnt))

        elements = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *per_shard_elems
        )

        sharding = NamedSharding(mesh, P(SHARD_AXIS))
        stacked_layers = tuple(jax.device_put(a, sharding) for a in stacked_layers)
        elements = jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), elements)

        return cls(
            mesh=mesh,
            layers=stacked_layers,
            counts=tuple(counts),
            elements=elements,
            shard_offsets=jax.device_put(jnp.asarray(offsets, jnp.int32), sharding),
            n_total=n,
        )

    # -- persistence: manifest + per-shard artifact pairs -------------------
    # (the in-library analogue of the reference's shard files,
    # embeddings/parsing.rs:63-100 + per-process mmap serving)

    def save(self, directory: str, compressed: bool = True) -> None:
        import json
        import os

        from ..index import io as gio
        from ..index.graph import LayerStack

        os.makedirs(directory, exist_ok=True)
        S = int(self.mesh.devices.size)
        offsets = np.asarray(self.shard_offsets)
        manifest = {
            "num_shards": S,
            "n_total": self.n_total,
            "shard_offsets": [int(o) for o in offsets],
        }
        for s in range(S):
            counts = tuple(c[s] for c in self.counts)
            arrays = [np.asarray(a[s])[: counts[i]] for i, a in enumerate(self.layers)]
            stack = LayerStack.from_numpy(arrays)
            gio.save_index(stack, os.path.join(directory, f"shard{s}.index"), compressed=compressed)
            local_elems = jax.tree_util.tree_map(lambda a: a[s], self.elements)
            gio.save_elements(local_elems, os.path.join(directory, f"shard{s}.elements"))
        with open(os.path.join(directory, "manifest.json"), "w") as f:
            json.dump(manifest, f)

    @classmethod
    def load(cls, directory: str, mesh: jax.sharding.Mesh | None = None) -> "ShardedGranne":
        import json
        import os

        from ..index import io as gio

        with open(os.path.join(directory, "manifest.json")) as f:
            manifest = json.load(f)
        S = manifest["num_shards"]
        if mesh is None:
            mesh = make_mesh(S)
        if mesh.devices.size != S:
            raise ValueError(f"manifest has {S} shards, mesh has {mesh.devices.size} devices")

        per_stacks = [gio.load_index(os.path.join(directory, f"shard{s}.index")) for s in range(S)]
        per_elems = [gio.load_elements(os.path.join(directory, f"shard{s}.elements")) for s in range(S)]

        depth = max(len(st) for st in per_stacks)
        row_pads = []
        for li in range(depth):
            rows = 8
            for st in per_stacks:
                if li < len(st):
                    rows = max(rows, st.layers[li].shape[0])
            row_pads.append(rows)
        stacked, counts = [], []
        for li in range(depth):
            per, cnt = [], []
            for st in per_stacks:
                a = np.asarray(st.layers[li if li < len(st) else -1])
                cnt.append(st.counts[li if li < len(st) else -1])
                if a.shape[0] < row_pads[li]:
                    a = np.pad(a, ((0, row_pads[li] - a.shape[0]), (0, 0)), constant_values=-1)
                per.append(a)
            stacked.append(jnp.asarray(np.stack(per)))
            counts.append(tuple(cnt))

        elements = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *per_elems
        )
        sharding = NamedSharding(mesh, P(SHARD_AXIS))
        return cls(
            mesh=mesh,
            layers=tuple(jax.device_put(a, sharding) for a in stacked),
            counts=tuple(counts),
            elements=jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), elements),
            shard_offsets=jax.device_put(
                jnp.asarray(manifest["shard_offsets"], jnp.int32), sharding
            ),
            n_total=manifest["n_total"],
        )

    def search_batch(self, queries, max_search: int = 200, num_neighbors: int = 20, expand: int = 1):
        """Replicated queries -> per-shard beam search -> ICI all_gather merge."""
        if not isinstance(queries, jax.Array):
            queries = jnp.asarray(np.asarray(queries, np.float32))
        queries = queries.astype(jnp.float32)
        return _sharded_search(
            self.mesh,
            self.layers,
            self.elements,
            self.shard_offsets,
            queries,
            ef=max_search,
            k=num_neighbors,
            expand=expand,
        )


_SEARCH_CACHE: dict = {}


def _sharded_search(mesh, layers, elements, shard_offsets, queries, *, ef, k, expand):
    key = (id(mesh), ef, k, expand, len(layers))
    cached = _SEARCH_CACHE.get(key)
    if cached is not None:
        return cached(layers, elements, shard_offsets, queries)

    def body(layers, elements, offset, q):
        # strip the per-device shard axis
        local_layers = tuple(a[0] for a in layers)
        local_elements = jax.tree_util.tree_map(lambda a: a[0], elements)
        pq = local_elements.prepare_queries(q)
        ids, d = frontier.search_layers(
            local_layers, local_elements, pq, ef=ef, num_neighbors=k, expand=expand
        )
        gids = jnp.where(ids >= 0, ids + offset[0], -1)
        # gather candidates from every shard: [S, B, k]
        all_ids = jax.lax.all_gather(gids, SHARD_AXIS)
        all_d = jax.lax.all_gather(d, SHARD_AXIS)
        B = q.shape[0]
        cat_ids = jnp.transpose(all_ids, (1, 0, 2)).reshape(B, -1)
        cat_d = jnp.transpose(all_d, (1, 0, 2)).reshape(B, -1)
        sd, sids = sort_by_key(cat_d, cat_ids)
        return sids[:, :k], sd[:, :k]

    fn = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(
                tuple(P(SHARD_AXIS) for _ in layers),
                jax.tree_util.tree_map(lambda _: P(SHARD_AXIS), elements),
                P(SHARD_AXIS),
                P(),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    _SEARCH_CACHE[key] = fn
    return fn(layers, elements, shard_offsets, queries)
