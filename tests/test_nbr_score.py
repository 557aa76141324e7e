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
