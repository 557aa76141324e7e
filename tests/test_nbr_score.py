"""Pallas neighbor-cache scorer parity (interpret mode) + serve-cache path.

The kernel contract is ops/pallas/nbr_score.gather_score; the serve-side
cache is Granne.with_neighbor_cache (ops.nbr_cache).  Reference context:
the batched form of ``search_for_neighbors``
(/root/reference/src/index/mod.rs:999-1037).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from granne_tpu import AngularVectors, BuildConfig, build_layers
from granne_tpu.index.granne import Granne
from granne_tpu.ops.pallas.nbr_score import gather_score


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_gather_score_parity(rng):
    n, M, d, DP, B, E = 500, 6, 20, 128, 32, 3
    Mp = 8
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    adj = rng.integers(0, n, (n, M)).astype(np.int32)
    g = vecs[adj.reshape(-1)].reshape(n, M, d)
    gp = np.zeros((n, Mp, DP), np.float32)
    gp[:, :M, :d] = g
    tab = jnp.asarray(gp, jnp.bfloat16)
    sel = jnp.asarray(rng.integers(0, n, (B, E)).astype(np.int32))
    qp = np.zeros((B, DP), np.float32)
    qp[:, :d] = rng.standard_normal((B, d))
    qp16 = jnp.asarray(qp, jnp.bfloat16)

    dots = gather_score(tab, sel, qp16, M=M, interpret=True)
    ref = np.einsum(
        "bkd,bd->bk",
        np.asarray(tab)[np.asarray(sel).reshape(-1)][:, :M]
        .reshape(B, E * M, DP)
        .astype(np.float32),
        np.asarray(qp16, np.float32),
    )
    np.testing.assert_allclose(np.asarray(dots), ref, atol=1e-2)


def test_gather_score_negative_ids_clipped(rng):
    n, M, d, DP, B, E = 100, 4, 16, 128, 8, 2
    Mp = 8
    gp = rng.standard_normal((n, Mp, DP)).astype(np.float32)
    tab = jnp.asarray(gp, jnp.bfloat16)
    sel = jnp.asarray(np.full((B, E), -1, np.int32))
    qp16 = jnp.asarray(rng.standard_normal((B, DP)), jnp.bfloat16)
    dots = gather_score(tab, sel, qp16, M=M, interpret=True)
    # clipped to row 0 for every slot
    row0 = np.asarray(tab)[0, :M].astype(np.float32)
    ref = np.asarray(qp16, np.float32) @ row0.T  # [B, M]
    ref = np.tile(ref, (1, E))
    np.testing.assert_allclose(np.asarray(dots), ref, atol=1e-2)


@pytest.mark.parametrize("layout", ["flat", "tiled"])
def test_serve_neighbor_cache_parity(rng, layout):
    """with_neighbor_cache must reproduce the uncached search on bf16
    elements (the cache stores bf16 rows): exactly for the flat/XLA
    layout; the tiled/Pallas scorer pads d to 128 zero lanes, so its
    distances match to f32 rounding of the identical dot."""
    n, d, M = 1500, 24, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    el = AngularVectors.from_raw(vecs)
    layers = build_layers(el, BuildConfig(num_neighbors=M, max_search=30))
    idx = Granne(layers=layers, elements=el.as_bf16())
    idxc = idx.with_neighbor_cache(layout=layout)
    assert idxc.nbr_vecs is not None
    assert idxc.nbr_vecs.ndim == (3 if layout == "tiled" else 2)

    q = vecs[:128]
    ids0, d0 = idx.search_batch(q, max_search=24, num_neighbors=5)
    ids1, d1 = idxc.search_batch(q, max_search=24, num_neighbors=5)
    match = float(np.mean(np.asarray(ids0) == np.asarray(ids1)))
    if layout == "flat":
        assert np.array_equal(np.asarray(ids0), np.asarray(ids1))
        np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)
    else:
        assert match > 0.99, match


def test_flat_rows_id_roundtrip_bit_exact(rng):
    """Ids embedded in flat cache rows must survive pack/scatter/gather/
    unpack BIT-EXACTLY.  Regression: a bf16 table silently canonicalized
    NaN payloads — ids whose low 16 bits form bf16 NaN patterns (0.38% of
    all ids) came back corrupted, collapsing 1.2M build recall 0.64->0.30.
    The table is int16 for exactly this reason."""
    from granne_tpu.ops.nbr_cache import pack_rows, row_vecs, unpack_ids

    R, M, d = 9000, 6, 12
    # cover the NaN-pattern windows: low halves in [0x7F80, 0x8000)
    base = rng.integers(0, 1 << 20, (R, M)).astype(np.int32)
    base[: 0x80 * 4] = 0x7F80 + np.arange(0x80 * 4)[:, None] % 0x100
    ids = jnp.asarray(base)
    vals = jnp.asarray(rng.standard_normal((R, M, d)), jnp.bfloat16)
    rows = pack_rows(vals, "flat", ids=ids)
    assert rows.dtype == jnp.int16
    tab = jnp.zeros((R, rows.shape[1]), rows.dtype).at[jnp.arange(R)].set(rows)
    taken = jnp.take(tab, jnp.arange(R), axis=0)
    assert int(jnp.sum(unpack_ids(taken, M, d) != ids)) == 0
    assert int(jnp.sum(row_vecs(taken, M, d).reshape(R, M, d) != vals)) == 0


def test_serve_neighbor_cache_unsupported_container():
    class Opaque:
        pass

    from granne_tpu.index.graph import LayerStack

    idx = Granne(
        layers=LayerStack(layers=[jnp.full((4, 2), -1, jnp.int32)], counts=[4]),
        elements=Opaque(),
    )
    with pytest.raises(ValueError):
        idx.with_neighbor_cache()


def test_int8_neighbor_cache_serving(rng):
    """int8 elements serve through the neighbor cache: cache rows are
    bf16-NORMALIZED int8 vectors (elements/angular_int.py cache_rows), so
    cached results must closely match the uncached int8 search and hold
    self-recall.  Config-2 parity path (reference int8 semantics:
    /root/reference/src/elements/angular_int.rs:47-60)."""
    from granne_tpu import AngularIntVectors

    n, d, M = 1500, 24, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    el = AngularVectors.from_raw(vecs)
    layers = build_layers(el, BuildConfig(num_neighbors=M, max_search=30))
    el8 = AngularIntVectors.from_raw(vecs)
    idx = Granne(layers=layers, elements=el8)
    idxc = idx.with_neighbor_cache()
    assert idxc.nbr_vecs is not None and idxc.nbr_vecs.ndim == 2

    q = vecs[:128]
    ids0, _ = idx.search_batch(q, max_search=24, num_neighbors=5)
    ids1, _ = idxc.search_batch(q, max_search=24, num_neighbors=5)
    # bf16 normalization perturbs distances ~1e-3: near-identical results
    overlap = np.mean([
        len(set(np.asarray(ids0)[i]) & set(np.asarray(ids1)[i])) / 5
        for i in range(128)
    ])
    assert overlap > 0.97, overlap
    # self-recall@1 through the cached path
    self_hit = float(np.mean(np.asarray(ids1)[:, 0] == np.arange(128)))
    assert self_hit > 0.95, self_hit


def test_int8_neighbor_cache_build(rng):
    """Building WITH the neighbor cache on int8 elements (cache-fed merges
    score bf16-normalized rows) preserves self-recall."""
    from granne_tpu import AngularIntVectors

    n, d, M = 1200, 24, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    el8 = AngularIntVectors.from_raw(vecs)
    layers = build_layers(
        el8, BuildConfig(num_neighbors=M, max_search=30, neighbor_cache=True)
    )
    idx = Granne(layers=layers, elements=el8)
    ids, _ = idx.search_batch(vecs[:256], max_search=30, num_neighbors=1)
    rec = float(np.mean(np.asarray(ids)[:, 0] == np.arange(256)))
    assert rec > 0.95, rec


def test_flat_fused_kernel_parity(rng):
    """The fused flat-row Pallas scorer (gather_score_flat, interpreted on
    CPU) must reproduce the XLA flat-cache search: same ids, distances to
    f32 rounding.  Requires row_width % 1024 == 0 -> use d=121, M=8:
    8*121 + 16 = 984 -> pad 1024."""
    from granne_tpu.ops import frontier
    from granne_tpu.ops.nbr_cache import make_neighbor_cache, row_width
    from granne_tpu.ops.pallas.nbr_score import flat_ok

    n, d, M = 1200, 121, 8
    assert flat_ok(row_width(M, d), M, d)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    el = AngularVectors.from_raw(vecs)
    layers = build_layers(el, BuildConfig(num_neighbors=M, max_search=24))
    el16 = el.as_bf16()
    tab = make_neighbor_cache(layers.layers[-1], el16, rows=n)
    q = el16.prepare_queries(jnp.asarray(vecs[:64]))

    ids0, d0 = frontier.search_layers(
        layers.layers, el16, q, ef=16, num_neighbors=5,
        nbr_vecs=tab, pallas_flat="0",
    )
    ids1, d1 = frontier.search_layers(
        layers.layers, el16, q, ef=16, num_neighbors=5,
        nbr_vecs=tab, pallas_flat="interpret",
    )
    overlap = np.mean([
        len(set(np.asarray(ids0)[i]) & set(np.asarray(ids1)[i])) / 5
        for i in range(64)
    ])
    assert overlap > 0.99, overlap
    np.testing.assert_allclose(
        np.sort(np.asarray(d0)), np.sort(np.asarray(d1)), atol=2e-3
    )


def test_flat_fused_kernel_int8(rng):
    """Fused flat scorer on the int8 container (query_lanes /
    dist_from_dots_q hooks): parity with the XLA cached int8 search."""
    from granne_tpu import AngularIntVectors
    from granne_tpu.ops import frontier
    from granne_tpu.ops.nbr_cache import make_neighbor_cache

    n, d, M = 1200, 121, 8
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    el = AngularVectors.from_raw(vecs)
    layers = build_layers(el, BuildConfig(num_neighbors=M, max_search=24))
    el8 = AngularIntVectors.from_raw(vecs)
    tab = make_neighbor_cache(layers.layers[-1], el8, rows=n)
    q = el8.prepare_queries(jnp.asarray(vecs[:64]))

    ids0, _ = frontier.search_layers(
        layers.layers, el8, q, ef=16, num_neighbors=5,
        nbr_vecs=tab, pallas_flat="0",
    )
    ids1, _ = frontier.search_layers(
        layers.layers, el8, q, ef=16, num_neighbors=5,
        nbr_vecs=tab, pallas_flat="interpret",
    )
    overlap = np.mean([
        len(set(np.asarray(ids0)[i]) & set(np.asarray(ids1)[i])) / 5
        for i in range(64)
    ])
    assert overlap > 0.99, overlap


def test_flat_fused_kernel_unfilled_rows(rng):
    """Cache rows with UNUSED (-1) neighbor slots must not poison the dots:
    -1 embeds as 0xFFFF int16 lanes, which bitcast to bf16 NaN — the kernel
    must SELECT the id/pad lanes out before the product (0 * NaN = NaN was
    the round-3 frozen-beam bug: any query expanding a node with an
    unfilled adjacency row got NaN for all its candidates, corrupting the
    beam sort from that iteration on)."""
    from granne_tpu.ops.nbr_cache import pack_rows, row_width
    from granne_tpu.ops.pallas.nbr_score import (
        flat_ok, gather_score_flat, make_qtile,
    )

    n, M, d, B, E = 400, 8, 121, 32, 2
    RW = row_width(M, d)
    assert flat_ok(RW, M, d)
    adj = rng.integers(0, n, (n, M)).astype(np.int32)
    adj[:, M // 2:] = -1  # every row half-unfilled
    vals = rng.standard_normal((n, M, d)).astype(np.float32)
    tab = pack_rows(jnp.asarray(vals, jnp.bfloat16), "flat", ids=jnp.asarray(adj))
    q = jnp.asarray(rng.standard_normal((B, d)), jnp.bfloat16)
    qtile = make_qtile(q, M, RW)
    sel = jnp.asarray(rng.integers(0, n, (B, E)).astype(np.int32))

    dots, nbrs = gather_score_flat(tab, sel, qtile, M=M, d=d, interpret=True)
    dn = np.asarray(dots)
    assert np.all(np.isfinite(dn)), "NaN/inf leaked from id/pad lanes"
    ref = np.einsum(
        "kmd,kd->km",
        np.asarray(jnp.asarray(vals, jnp.bfloat16)[np.asarray(sel).reshape(-1)], np.float32),
        np.repeat(np.asarray(q, np.float32), E, axis=0),
    ).reshape(B, E * M)
    np.testing.assert_allclose(dn, ref, atol=0.15, rtol=0.05)
    assert np.array_equal(
        np.asarray(nbrs), adj[np.asarray(sel).reshape(-1)].reshape(B, E * M)
    )


def test_make_neighbor_cache_rejects_f32_tiled(rng):
    """cache_dtype="f32" is flat-only; a tiled request must fail loudly
    instead of silently returning a bf16 table (ADVICE r4)."""
    import pytest
    from granne_tpu.elements import AngularVectors
    from granne_tpu.ops.nbr_cache import make_neighbor_cache

    el = AngularVectors.from_raw(rng.standard_normal((32, 16)).astype(np.float32))
    adj = jnp.full((32, 4), -1, jnp.int32)
    with pytest.raises(ValueError, match="flat"):
        make_neighbor_cache(adj, el, layout="tiled", cache_dtype="f32")
    with pytest.raises(ValueError, match="cache_dtype"):
        make_neighbor_cache(adj, el, cache_dtype="f16")
