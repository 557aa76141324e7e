"""Unit tests for the sorted-buffer helpers (ops.topk).

These replace the reference's MaxSizeHeap / BinaryHeap
(``/root/reference/src/max_size_heap.rs``, ``src/index/mod.rs:999-1037``);
the bitonic merge network must agree with a full sort on the kept prefix.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from granne_tpu.ops.topk import INF, merge_sorted_topk, sort_by_key


@pytest.mark.parametrize(
    "A,C,k",
    [
        (100, 80, 100),  # build shape: ef=100, E*M=80
        (32, 20, 32),  # serve shape: ef=32, M=20
        (1, 20, 1),  # greedy descent: ef=1
        (7, 3, 7),  # non-power-of-two everything
        (16, 16, 8),  # k smaller than either input
        (4, 60, 4),
    ],
)
def test_merge_matches_full_sort(rng, A, C, k):
    B = 17
    a_d = np.sort(rng.standard_normal((B, A)).astype(np.float32), axis=1)
    b_d = np.sort(rng.standard_normal((B, C)).astype(np.float32), axis=1)
    # sprinkle INF padding (tails), as the beam does
    a_d[:, A - 2 :] = np.inf
    a_v = rng.integers(0, 10_000, (B, A)).astype(np.int32)
    b_v = rng.integers(0, 10_000, (B, C)).astype(np.int32)

    d, (v,) = merge_sorted_topk(
        jnp.asarray(a_d), (jnp.asarray(a_v),), jnp.asarray(b_d), (jnp.asarray(b_v),), k
    )
    ref_d, ref_v = sort_by_key(
        jnp.concatenate([jnp.asarray(a_d), jnp.asarray(b_d)], axis=1),
        jnp.concatenate([jnp.asarray(a_v), jnp.asarray(b_v)], axis=1),
    )
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref_d)[:, :k])
    # values must match wherever keys are unique (ties may reorder); random
    # floats make ties measure-zero, so exact match is expected
    np.testing.assert_array_equal(np.asarray(v), np.asarray(ref_v)[:, :k])


def test_merge_multiple_values(rng):
    B, A, C, k = 5, 12, 9, 10
    a_d = np.sort(rng.standard_normal((B, A)).astype(np.float32), axis=1)
    b_d = np.sort(rng.standard_normal((B, C)).astype(np.float32), axis=1)
    a_v1 = rng.integers(0, 100, (B, A)).astype(np.int32)
    a_v2 = a_v1.astype(np.float32) * 2
    b_v1 = rng.integers(100, 200, (B, C)).astype(np.int32)
    b_v2 = b_v1.astype(np.float32) * 2
    d, (v1, v2) = merge_sorted_topk(
        jnp.asarray(a_d),
        (jnp.asarray(a_v1), jnp.asarray(a_v2)),
        jnp.asarray(b_d),
        (jnp.asarray(b_v1), jnp.asarray(b_v2)),
        k,
    )
    np.testing.assert_allclose(np.asarray(v1).astype(np.float32) * 2, np.asarray(v2))
    assert np.all(np.diff(np.asarray(d), axis=1) >= 0)


def test_merge_all_inf_padding():
    B, A, C, k = 3, 8, 8, 8
    a_d = jnp.full((B, A), INF, jnp.float32)
    b_d = jnp.full((B, C), INF, jnp.float32)
    a_v = jnp.full((B, A), -2, jnp.int32)
    b_v = jnp.full((B, C), -2, jnp.int32)
    d, (v,) = merge_sorted_topk(a_d, (a_v,), b_d, (b_v,), k)
    assert np.all(np.isinf(np.asarray(d)))
