"""Data-parallel wave build over the virtual mesh.

The dp path shares its wave implementation with the single-chip builder
(builder.search_select_phase / apply_wave_edges), so these tests assert not
just searchability but *graph parity* with the single-device build.
"""

import numpy as np
import jax.numpy as jnp

from granne_tpu import AngularVectors, BuildConfig, build_layers
from granne_tpu.index.graph import empty_layer, grow_layer
from granne_tpu.parallel.mesh import make_mesh
from granne_tpu.parallel import dp_build


def test_dp_wave_build_recall(rng):
    n, d = 512, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    elements = AngularVectors.from_raw(vecs)
    mesh = make_mesh(4)
    cfg = BuildConfig(num_neighbors=12, max_search=30, wave_size=64)

    # single layer built entirely with the sharded wave step
    adj = grow_layer(empty_layer(8, cfg.num_neighbors), n)
    ids = np.arange(n, dtype=np.int32)
    # geometric warm-up then fixed waves, like the single-chip driver
    cursor = 0
    while cursor < n:
        size = max(8, min(cfg.wave_size, cursor if cursor else 8))
        size = min(size, n - cursor)
        adj, _ = dp_build.dp_build_waves(
            mesh, tuple(), adj, elements, ids[cursor : cursor + size], cfg,
            cfg.num_neighbors, cfg.max_search,
        )
        cursor += size

    # searchable with good self-recall
    from granne_tpu.ops import frontier

    q = elements.queries_from_ids(jnp.arange(n, dtype=jnp.int32))
    got, _ = frontier.beam_search(adj, elements, q, jnp.zeros((n,), jnp.int32), ef=20)
    recall = float(np.mean(np.asarray(got)[:, 0] == np.arange(n)))
    assert recall > 0.95, f"dp-build recall {recall}"


def _row_sets(arr):
    return [frozenset(int(x) for x in row if x >= 0) for row in arr]


def test_dp_full_build_matches_single_device(rng):
    """build_layers(mesh=...) must produce the same multi-layer graph as the
    single-device build: same schedule, same reinsert, near-identical edges
    (differences only from f32 reduction order at different batch shapes)."""
    n, d = 700, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    elements = AngularVectors.from_raw(vecs)
    cfg = BuildConfig(num_neighbors=10, max_search=25, wave_size=64)

    single = build_layers(elements, cfg)
    mesh = make_mesh(8)
    dp = build_layers(elements, cfg, mesh=mesh)

    assert single.counts == dp.counts, "layer schedule diverged"
    total = agree = 0
    for a, b in zip(single.as_numpy(), dp.as_numpy()):
        for ra, rb in zip(_row_sets(a), _row_sets(b)):
            union = len(ra | rb)
            agree += len(ra & rb) if union else 1
            total += union if union else 1
    jaccard = agree / total
    assert jaccard > 0.95, f"dp/single edge agreement too low: {jaccard:.3f}"


def test_dp_full_build_self_recall(rng):
    """Multi-layer mesh build is searchable end-to-end."""
    from granne_tpu import Granne

    n, d = 600, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    elements = AngularVectors.from_raw(vecs)
    cfg = BuildConfig(num_neighbors=12, max_search=30, wave_size=64)
    mesh = make_mesh(8)
    layers = build_layers(elements, cfg, mesh=mesh)
    assert len(layers) >= 2, "expected a multi-layer stack"
    index = Granne(layers=layers, elements=elements)
    ids, _ = index.search_batch(vecs[:200], max_search=25, num_neighbors=1)
    recall = float(np.mean(np.asarray(ids)[:, 0] == np.arange(200)))
    assert recall > 0.95, f"mesh-build self-recall {recall}"


def test_dp_build_honors_levers(rng):
    """Round-5 parity: the dp path must honor every BuildConfig performance
    lever the single-chip build uses (neighbor_cache, build_max_iters,
    gather_budget) and produce an equivalent graph (VERDICT r4 #2 — these
    were previously silently dropped on the mesh path)."""
    n, d = 640, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    elements = AngularVectors.from_raw(vecs)
    cfg = BuildConfig(
        num_neighbors=10, max_search=25, wave_size=64,
        neighbor_cache=True, build_max_iters=10, gather_budget=24,
    )

    single = build_layers(elements, cfg)
    dp = build_layers(elements, cfg, mesh=make_mesh(8))

    assert single.counts == dp.counts, "layer schedule diverged"
    total = agree = 0
    for a, b in zip(single.as_numpy(), dp.as_numpy()):
        for ra, rb in zip(_row_sets(a), _row_sets(b)):
            union = len(ra | rb)
            agree += len(ra & rb) if union else 1
            total += union if union else 1
    jaccard = agree / total
    assert jaccard > 0.95, f"dp/single lever-build agreement too low: {jaccard:.3f}"
