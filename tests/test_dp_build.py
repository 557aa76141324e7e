"""Data-parallel wave build over the virtual mesh."""

import numpy as np
import jax.numpy as jnp

from granne_tpu import AngularVectors, BuildConfig
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
        adj = dp_build.dp_build_waves(
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


def test_dp_wave_matches_single_device_quality(rng):
    n, d = 256, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    elements = AngularVectors.from_raw(vecs)
    mesh = make_mesh(8)
    cfg = BuildConfig(num_neighbors=10, max_search=25, wave_size=32)
    adj = grow_layer(empty_layer(8, cfg.num_neighbors), n)
    adj = dp_build.dp_build_waves(
        mesh, tuple(), adj, elements, np.arange(n, dtype=np.int32), cfg, 10, 25
    )
    arr = np.asarray(adj)[:n]
    # every row connected, ids valid, no self loops
    assert np.all(arr.max(axis=1) >= 0)
    assert arr.max() < n
    for i in range(0, n, 17):
        assert i not in arr[i][arr[i] >= 0]
