"""Resume/prune paths that carry heavy compile loads.

Split out of test_builder.py: XLA:CPU flakily segfaults after many big
compilations in one process (see pytest.ini's process-per-file isolation
and CLAUDE.md); these tests each build several full graphs.
"""

import numpy as np
import jax.numpy as jnp
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)



def test_build_layers_consume_state_resume(rng):
    """consume_state=True (donating resume) produces the same index as the
    defensive-copy resume; the donated state must not be reused."""
    import jax.numpy as jnp
    from granne_tpu import AngularVectors, BuildConfig, build_layers

    n, d = 600, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    elements = AngularVectors.from_raw(vecs)
    cfg = BuildConfig(num_neighbors=10, max_search=25, wave_size=64)

    base = build_layers(elements, cfg, num_elements=400)
    keep = build_layers(elements, cfg, num_elements=n, state=base)
    base2 = build_layers(elements, cfg, num_elements=400)
    consumed = build_layers(elements, cfg, num_elements=n, state=base2,
                            consume_state=True)
    assert keep.counts == consumed.counts
    for a, b in zip(keep.as_numpy(), consumed.as_numpy()):
        assert np.array_equal(a, b)


def test_prune_layer_sliced_matches_full(rng, monkeypatch):
    """The slice-dispatched prune (large uncached layers) must equal the
    monolithic prune exactly — slices are independent and idempotent."""
    from granne_tpu import AngularVectors, BuildConfig, build_layers
    from granne_tpu.index import builder as B

    n, d = 500, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    elements = AngularVectors.from_raw(vecs)
    cfg = BuildConfig(num_neighbors=10, max_search=25, wave_size=64,
                      reinsert_elements=False)
    layers = build_layers(elements, cfg)
    adj = jnp.copy(layers.layers[-1])

    full, _ = B._prune_layer_full(jnp.copy(adj), elements, m_eff=8, merge_chunk=128)
    monkeypatch.setattr(B, "_PRUNE_DISPATCH_ROWS", 64)
    sliced, _ = B.prune_layer(jnp.copy(adj), elements, m_eff=8, merge_chunk=128)
    assert np.array_equal(np.asarray(full), np.asarray(sliced))
