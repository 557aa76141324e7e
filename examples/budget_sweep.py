"""Device-true full-wave time vs beam gather_budget (W=1024, ef=100, M=20, E=4).

Baseline (gather_budget=None == 80): 81.1 ms/wave (wave_split.py).
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
from granne_tpu.index import builder as B
from granne_tpu.ops import distance as D

n, d, W, M, ef = 1_200_000, 100, 1024, 20, 100
vecs = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32)
el = AngularVectors.from_normalized(D.normalize(vecs))
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
prev = tuple(small.layers[:-1])
ids0 = jnp.asarray(np.arange(n - W, n, dtype=np.int32))
valid = jnp.ones((W,), bool)


def dev_time(op, iters_pair=(3, 13)):
    @partial(jax.jit, static_argnames=("iters",))
    def run(ids, adj, prev, el, *, iters):
        def body(i, carry):
            ids_c, a, acc = carry
            out_a, probe = op(ids_c, a, prev, el)
            z = jnp.where(jnp.isfinite(probe), probe, 1.0) * 0.0
            return ids0 + z.astype(jnp.int32), out_a, acc + z

        return jax.lax.fori_loop(0, iters, body, (ids, adj, jnp.float32(0)))[2]

    lo, hi = iters_pair
    for it in (lo, hi):
        float(run(ids0, adj, prev, el, iters=it))
    t0 = time.perf_counter()
    float(run(ids0, adj, prev, el, iters=lo))
    tl = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(ids0, adj, prev, el, iters=hi))
    th = time.perf_counter() - t0
    return (th - tl) / (hi - lo)


def full(G):
    def op(ids, a, prev, el):
        a2, _ = B._wave_step_core(
            prev, a, el, ids, valid, m_eff=M, max_search=ef,
            expand=4, reinsert=False, reverse_cap=16, merge_chunk=1024,
            gather_budget=G,
        )
        return a2, jnp.float32(a2[0, 0])

    return op


if __name__ == "__main__":
    for G in (48, 40, 32):
        t = dev_time(full(G))
        print(f"full wave G={G}: {t*1e3:.1f}ms/wave ({W/t:,.0f} vec/s if alone)", flush=True)
