"""A/B: build-search beam cost, f32 vs bf16 element gathers, expand sweep.

The wave-cost split (wave_split.py) shows the build wave is ~69% beam
search, and the beam is candidate-vector-gather bound.  bf16 halves the
gathered bytes; this measures the device-true beam time per wave for
(dtype, expand) combinations with the chained forced-execution harness.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/granne_tpu_jax_cache")

from functools import partial

import jax.numpy as jnp
import numpy as np

from granne_tpu import AngularVectors, BuildConfig, build_layers
from granne_tpu.ops import distance as D, frontier

n, d, W, M, ef = 1_200_000, 100, 1024, 20, 100
vecs = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32)
el = AngularVectors.from_normalized(D.normalize(vecs))
el16 = el.as_bf16()
small = build_layers(
    AngularVectors.from_normalized(el.vectors[:30000]),
    BuildConfig(num_neighbors=M, max_search=ef, wave_size=256),
)
real = np.asarray(small.layers[-1])
reps = int(np.ceil(n / real.shape[0]))
adj_np = np.tile(real, (reps, 1))[:n]
rng = np.random.default_rng(0)
adj_np = np.where(adj_np >= 0, (adj_np + rng.integers(0, n)) % n, -1).astype(np.int32)
adj = jnp.asarray(adj_np)
ids0 = jnp.asarray(np.arange(n - W, n, dtype=np.int32))


def dev_time(op, iters_pair=(3, 13)):
    @partial(jax.jit, static_argnames=("iters",))
    def run(ids, adj, el, *, iters):
        def body(i, carry):
            ids_c, a, acc = carry
            probe = op(ids_c, a, el)
            z = jnp.where(jnp.isfinite(probe), probe, 1.0).astype(jnp.float32) * 0.0
            return ids0 + z.astype(jnp.int32), a, acc + z

        return jax.lax.fori_loop(0, iters, body, (ids, adj, jnp.float32(0)))[2]

    lo, hi = iters_pair
    for it in (lo, hi):
        float(run(ids0, adj, elx, iters=it))
    t0 = time.perf_counter()
    float(run(ids0, adj, elx, iters=lo))
    tl = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(ids0, adj, elx, iters=hi))
    th = time.perf_counter() - t0
    return (th - tl) / (hi - lo)


def beam(E):
    def op(ids, a, el):
        q = el.queries_from_ids(ids)
        ci, cd = frontier.beam_search(a, el, q, jnp.zeros((W,), jnp.int32), ef=ef, expand=E)
        return cd[0, 0]

    return op


if __name__ == "__main__":
    for name, holder, E in (
        ("f32 E=4", el, 4),
        ("bf16 E=4", el16, 4),
        ("bf16 E=2", el16, 2),
        ("bf16 E=8", el16, 8),
    ):
        elx = holder
        t = dev_time(beam(E))
        print(f"beam {name}: {t*1e3:.1f}ms/wave ({W/t:,.0f} vec/s if alone)", flush=True)
