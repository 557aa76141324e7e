"""Microbench: fused neighbor-vector-table gather vs per-candidate gather.

Idea: replicate each node's M neighbors' vectors contiguously
(nbr_vecs bf16[n, M, d], ~4.8 GB at n=1.2M, M=20, d=100).  The beam then
issues ONE (M*d*2)-byte row gather per EXPANDED node instead of M separate
d-vector gathers per candidate.  Random gathers measure ~10 ns/row
regardless of row bytes (beam_micro.py), so E rows/query beats E*M
rows/query by ~M/streaming-limit.

Also times the per-wave table maintenance: re-gathering + scattering the
rows whose adjacency changed (~21k rows/wave at W=1024, M=20, R=16).
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

from granne_tpu.ops import distance as D

n, d, W, M, E = 1_200_000, 100, 1024, 20, 4
EM = E * M
vecs = D.normalize(jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32))
adj = jax.random.randint(jax.random.PRNGKey(1), (n, M), 0, n, jnp.int32)
q = vecs[:W]
rng = np.random.default_rng(0)
sel0 = jnp.asarray(rng.integers(0, n, (W, E)).astype(np.int32))
upd0 = jnp.asarray(rng.integers(0, n, (21504,)).astype(np.int32))


STEP = 100_000
n_pad = ((n + STEP - 1) // STEP) * STEP


@jax.jit
def build_table(vecs, adj):
    # one program: fori_loop + dynamic_update_slice keeps the table
    # in-place (no per-chunk concatenate copies blowing HBM)
    tab0 = jnp.zeros((n_pad, M, d), jnp.bfloat16)

    def body(i, tab):
        lo = i * STEP
        rows = jax.lax.dynamic_slice_in_dim(adj, lo, STEP, axis=0)
        g = jnp.take(vecs, jnp.clip(rows.reshape(-1), 0, n - 1), axis=0)
        return jax.lax.dynamic_update_slice_in_dim(
            tab, g.astype(jnp.bfloat16).reshape(STEP, M, d), lo, axis=0
        )

    return jax.lax.fori_loop(0, n_pad // STEP, body, tab0)


t0 = time.time()
nbr_vecs = build_table(vecs, adj)
nbr_vecs.block_until_ready()
_ = float(nbr_vecs[0, 0, 0])  # force
print(f"table build ({nbr_vecs.nbytes/1e9:.1f} GB): {time.time()-t0:.1f}s", flush=True)


def dev_time(op, args, iters_pair=(5, 55)):
    @jax.jit
    def run(sel, iters, *args):
        def body(i, carry):
            sel_c, acc = carry
            probe = op(sel_c, *args)
            z = jnp.where(jnp.isfinite(probe), probe, 1.0).astype(jnp.float32) * 0.0
            return sel0 + z.astype(jnp.int32), acc + z

        return jax.lax.fori_loop(0, iters, body, (sel, jnp.float32(0)))[1]

    lo, hi = iters_pair
    for it in (lo, hi):
        float(run(sel0, jnp.int32(it), *args))
    t0 = time.perf_counter()
    float(run(sel0, jnp.int32(lo), *args))
    tl = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(sel0, jnp.int32(hi), *args))
    th = time.perf_counter() - t0
    return (th - tl) / (hi - lo)


def baseline(sel, adjv, vecsv):
    nbrs = jnp.take(adjv, jnp.clip(sel, 0, n - 1), axis=0).reshape(W, EM)
    g = jnp.take(vecsv, jnp.clip(nbrs.reshape(-1), 0, n - 1), axis=0).reshape(W, EM, d)
    cd = 1.0 - jnp.einsum("bkd,bd->bk", g, q)
    return cd[0, 0]


def fused(sel, adjv, tab):
    nbrs = jnp.take(adjv, jnp.clip(sel, 0, n - 1), axis=0).reshape(W, EM)
    g = jnp.take(tab, jnp.clip(sel, 0, n - 1), axis=0).reshape(W, EM, d)
    cd = 1.0 - jnp.einsum("bkd,bd->bk", g, q.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return cd[0, 0] + jnp.float32(nbrs[0, 0]) * 0.0


def table_update(sel, adjv, vecsv, tab):
    # re-gather M vectors for 21k changed rows and scatter into the table
    rows = jnp.take(adjv, upd0, axis=0)  # [U, M] new adjacency
    g = jnp.take(vecsv, jnp.clip(rows.reshape(-1), 0, n - 1), axis=0)
    newt = g.astype(jnp.bfloat16).reshape(-1, M, d)
    tab2 = tab.at[upd0].set(newt)
    return jnp.float32(tab2[0, 0, 0]) + jnp.float32(sel[0, 0]) * 0.0


if __name__ == "__main__":
    t = dev_time(baseline, (adj, vecs))
    print(f"baseline gather+dot (EM rows/query): {t*1e6:.0f}us/iter", flush=True)
    t = dev_time(fused, (adj, nbr_vecs))
    print(f"fused table gather+dot (E rows/query): {t*1e6:.0f}us/iter", flush=True)
    t = dev_time(table_update, (adj, vecs, nbr_vecs), iters_pair=(3, 13))
    print(f"table update 21k rows: {t*1e3:.2f}ms/wave", flush=True)
