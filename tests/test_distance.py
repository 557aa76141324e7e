"""Distance math vs naive numpy (mirrors /root/reference/src/math.rs:161-197
and angular metric tests angular.rs:92-143)."""

import numpy as np
import jax.numpy as jnp

from granne_tpu.ops import distance as D


def naive_angular(a, b):
    na = a / np.linalg.norm(a)
    nb = b / np.linalg.norm(b)
    return max(0.0, 1.0 - float(np.dot(na, nb)))


def test_normalize_unit_and_zero(rng):
    x = rng.standard_normal((16, 33)).astype(np.float32)
    x[3] = 0.0
    out = np.asarray(D.normalize(jnp.asarray(x)))
    norms = np.linalg.norm(out, axis=1)
    assert np.allclose(norms[np.arange(16) != 3], 1.0, atol=1e-5)
    assert np.all(out[3] == 0.0)


def test_angular_dist_matrix_vs_naive(rng):
    a = rng.standard_normal((5, 64)).astype(np.float32)
    b = rng.standard_normal((7, 64)).astype(np.float32)
    an = np.asarray(D.normalize(jnp.asarray(a)))
    bn = np.asarray(D.normalize(jnp.asarray(b)))
    got = np.asarray(D.angular_dist_matrix(jnp.asarray(an), jnp.asarray(bn)))
    for i in range(5):
        for j in range(7):
            assert abs(got[i, j] - naive_angular(a[i], b[j])) < 1e-3  # f32 accumulation


def test_angular_metric_properties(rng):
    # dist(x, x) == 0; symmetric; in [0, 2]  (angular.rs:92-143)
    x = np.asarray(D.normalize(jnp.asarray(rng.standard_normal((20, 16)).astype(np.float32))))
    dm = np.asarray(D.angular_dist_matrix(jnp.asarray(x), jnp.asarray(x)))
    assert np.allclose(np.diag(dm), 0.0, atol=1e-5)
    assert np.allclose(dm, dm.T, atol=1e-5)
    assert np.all(dm >= 0.0) and np.all(dm <= 2.0 + 1e-6)


def test_quantize_i8_range_and_sign(rng):
    x = rng.standard_normal((10, 50)).astype(np.float32) * 7.3
    q = np.asarray(D.quantize_i8(jnp.asarray(x)))
    assert q.dtype == np.int8
    assert q.max() <= 127 and q.min() >= -127
    # matches an f32 emulation of the reference formula
    # `trunc(x * 127.0 / max_abs)` (angular_int.rs:27-45) to within one
    # quantization level (XLA may reassociate the scale into a reciprocal)
    for r in range(10):
        k = np.argmax(np.abs(x[r]))
        assert abs(q[r, k]) >= 126  # max-abs coordinate saturates (mod f32 rounding)
        m = np.float32(np.abs(x[r]).max())
        ref = np.trunc(x[r] * np.float32(127.0) / m).astype(np.int8)
        assert np.abs(q[r].astype(np.int32) - ref.astype(np.int32)).max() <= 1


def test_i8_dist_close_to_f32(rng):
    x = rng.standard_normal((40, 100)).astype(np.float32)
    dm_f32 = np.asarray(D.angular_dist_matrix(D.normalize(jnp.asarray(x)), D.normalize(jnp.asarray(x))))
    q = D.quantize_i8(jnp.asarray(x))
    dm_i8 = np.asarray(D.i8_dist_matrix(q, q))
    assert np.abs(dm_f32 - dm_i8).max() < 0.02


def test_i8_zero_vector_dist_is_one(rng):
    x = rng.standard_normal((4, 16)).astype(np.float32)
    x[1] = 0.0
    q = D.quantize_i8(jnp.asarray(x))
    dm = np.asarray(D.i8_dist_matrix(q, q))
    assert np.allclose(dm[1, :], 1.0)  # NaN->0 cosine fallback (angular_int.rs:47-60)
    assert np.allclose(dm[:, 1], 1.0)


def test_quantize_i8_nearest(rng):
    x = rng.standard_normal((10, 50)).astype(np.float32) * 3.1
    qt = np.asarray(D.quantize_i8(jnp.asarray(x)))
    qr = np.asarray(D.quantize_i8(jnp.asarray(x), rounding="nearest"))
    assert qr.dtype == np.int8
    assert qr.max() <= 127 and qr.min() >= -127
    # round-to-nearest matches the numpy emulation and is never FARTHER
    # from the real-valued scale than truncation
    for r in range(10):
        m = np.float32(np.abs(x[r]).max())
        scaled = x[r] * np.float32(127.0) / m
        ref = np.round(scaled).astype(np.int8)
        assert np.abs(qr[r].astype(np.int32) - ref.astype(np.int32)).max() <= 1
        err_r = np.abs(qr[r] - scaled)
        err_t = np.abs(qt[r] - scaled)
        assert err_r.mean() <= err_t.mean() + 1e-6

    with np.testing.assert_raises(ValueError):
        D.quantize_i8(jnp.asarray(x), rounding="bogus")


def test_int8_extend_preserves_rounding(rng):
    """A container built with rounding="nearest" must append
    nearest-rounded codes too (ADVICE r4: extend() previously always
    truncated, silently mixing quantizers in one container)."""
    from granne_tpu.elements.angular_int import AngularIntVectors
    from granne_tpu.ops import distance as D

    a = rng.standard_normal((20, 16)).astype(np.float32)
    b = rng.standard_normal((8, 16)).astype(np.float32)
    for mode in ("trunc", "nearest"):
        c = AngularIntVectors.from_raw(a, rounding=mode).extend(b)
        expect = np.asarray(D.quantize_i8(jnp.asarray(b), rounding=mode))
        assert np.array_equal(np.asarray(c.vectors[20:]), expect), mode
    # the two modes genuinely differ on this data (the test has teeth)
    t = np.asarray(D.quantize_i8(jnp.asarray(b), rounding="trunc"))
    nr = np.asarray(D.quantize_i8(jnp.asarray(b), rounding="nearest"))
    assert not np.array_equal(t, nr)
