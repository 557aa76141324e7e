"""Sub-phase breakdown of apply_wave_edges at build shapes (round 3).

Times, device-true (chained fori + value fetch + iteration differencing):
  full edges       — apply_wave_edges, realistic random targets
  reverse only     — _apply_reverse_edges with the same edge distribution
  rev uncached     — same without the neighbor-vector cache
  rev rc=8         — reverse_cap 8 instead of 16
  sort only        — the 4-operand segment sort of T=W*M edges
  dup pairwise     — the W x W intra-wave duplicate detection

Env: GT_MC (merge_chunk, default 4096), GT_W, GT_RC.
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

from granne_tpu import AngularVectors
from granne_tpu.index import builder as B
from granne_tpu.ops import distance as D
from granne_tpu.ops.nbr_cache import make_neighbor_cache

n, d, W, M = 1_200_000, 100, 1024, 20
MC = int(os.environ.get("GT_MC", "4096"))
RC = int(os.environ.get("GT_RC", "16"))

vecs = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32)
el = AngularVectors.from_normalized(D.normalize(vecs))
rng = np.random.default_rng(0)
adj_np = rng.integers(0, n, (n, M)).astype(np.int32)
adj = jnp.asarray(adj_np)
tab = make_neighbor_cache(adj, el, layout="flat")

ids0 = jnp.asarray(np.arange(n - W, n, dtype=np.int32))
valid = jnp.ones((W,), bool)
rand_sel = jnp.asarray(rng.integers(0, n, (W, M)).astype(np.int32))


def dev_time(op, use_tab=True, iters_pair=(3, 13)):
    t_ref = tab if use_tab else None

    # elements ride as a jit ARGUMENT: closing over them inlines the
    # 480 MB vector tensor into the remote-compile request (HTTP 413)
    @partial(jax.jit, static_argnames=("iters",))
    def run(ids, a, t, e, *, iters):
        def body(i, carry):
            ids_c, a_c, t_c, acc = carry
            out_a, out_t, probe = op(ids_c, a_c, t_c, e)
            z = jnp.where(jnp.isfinite(probe), probe, 1.0) * 0.0
            return ids0 + z.astype(jnp.int32), out_a, out_t, acc + z

        return jax.lax.fori_loop(0, iters, body, (ids, a, t, jnp.float32(0)))[3]

    lo, hi = iters_pair
    for it in (lo, hi):
        float(run(ids0, adj, t_ref, el, iters=it))
    t0 = time.perf_counter()
    float(run(ids0, adj, t_ref, el, iters=lo))
    tl = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(ids0, adj, t_ref, el, iters=hi))
    th = time.perf_counter() - t0
    return (th - tl) / (hi - lo)


def mk_sel(ids):
    s_ids = (rand_sel + ids[:, None]) % jnp.int32(n)
    s_d = jnp.abs(jnp.sin(ids.astype(jnp.float32)))[:, None] * jnp.ones((1, M))
    return s_ids, s_d


def full_edges(ids, a, t, e):
    s_ids, s_d = mk_sel(ids)
    a2, t2 = B.apply_wave_edges(
        a, e, ids, valid, s_ids, s_d, valid, jnp.zeros((W,), bool),
        m_eff=M, reinsert=False, reverse_cap=RC, merge_chunk=MC, nbr_tab=t,
    )
    return a2, t2, jnp.float32(a2[0, 0])


def reverse_only(ids, a, t, e):
    s_ids, s_d = mk_sel(ids)
    tgt = s_ids.reshape(-1)
    src = jnp.broadcast_to(ids[:, None], (W, M)).reshape(-1)
    dd = s_d.reshape(-1)
    sp = (
        jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[:, None], (W, M)).reshape(-1)
        if t is not None else None
    )
    wr = e.cache_rows(ids) if t is not None else None
    a2, t2 = B._apply_reverse_edges(
        a, e, tgt, src, dd, reverse_cap=RC, merge_chunk=MC,
        nbr_tab=t, src_pos=sp, wave_rows=wr,
    )
    return a2, t2, jnp.float32(a2[0, 0])


def sort_only(ids, a, t, e):
    s_ids, s_d = mk_sel(ids)
    tgt = s_ids.reshape(-1)
    src = jnp.broadcast_to(ids[:, None], (W, M)).reshape(-1)
    dd = s_d.reshape(-1)
    sp = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[:, None], (W, M)).reshape(-1)
    key_t = jnp.where(tgt >= 0, tgt, jnp.iinfo(jnp.int32).max)
    st, sd, ss, spp = jax.lax.sort((key_t, dd, src, sp), dimension=0, num_keys=2, is_stable=True)
    return a, t, sd[0]


def dup_only(ids, a, t, e):
    pair_w = e.pairwise_from_ids(ids[None, :])[0]
    return a, t, pair_w[0, 0]


if __name__ == "__main__":
    print(f"W={W} M={M} mc={MC} rc={RC} n={n}", flush=True)
    for name, op, use_tab in (
        ("full edges (cached)", full_edges, True),
        ("reverse only (cached)", reverse_only, True),
        ("reverse only (uncached)", reverse_only, False),
        ("full edges (uncached)", full_edges, False),
        ("sort only", sort_only, True),
        ("dup pairwise only", dup_only, True),
    ):
        t = dev_time(op, use_tab=use_tab)
        print(f"{name}: {t*1e3:.2f}ms", flush=True)
