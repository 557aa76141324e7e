"""Per-component microbench of ONE beam iteration at build shapes.

W=1024 queries, ef=100, M=20, E=4 (EM=80), n=1.2M, d=100.  Times each
sub-op of frontier.beam_search's body in isolation with the chained
forced-execution harness, to find where the ~0.85 ms/iteration goes.
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
from granne_tpu.ops.topk import sort_by_key

n, d, W, M, ef, E = 1_200_000, 100, 1024, 20, 100, 4
EM = E * M
vecs = D.normalize(jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32))
adj = jax.random.randint(jax.random.PRNGKey(1), (n, M), 0, n, jnp.int32)
q = vecs[:W]
rng = np.random.default_rng(0)
sel0 = jnp.asarray(rng.integers(0, n, (W, E)).astype(np.int32))
bids0 = jnp.asarray(rng.integers(0, n, (W, ef)).astype(np.int32))
bd0 = jnp.sort(jnp.asarray(rng.random((W, ef), np.float32)), axis=1)
earlier = jnp.tril(jnp.ones((EM, EM), jnp.bool_), k=-1)


def dev_time(op, iters_pair=(5, 55)):
    @partial(jax.jit, static_argnames=("iters",))
    def run(sel, adjv, vecsv, bids, bd, *, iters):
        def body(i, carry):
            sel_c, acc = carry
            probe = op(sel_c, adjv, vecsv, bids, bd)
            z = jnp.where(jnp.isfinite(probe), probe, 1.0).astype(jnp.float32) * 0.0
            return sel0 + z.astype(jnp.int32), acc + z

        return jax.lax.fori_loop(0, iters, body, (sel, jnp.float32(0)))[1]

    lo, hi = iters_pair
    for it in (lo, hi):
        float(run(sel0, adj, vecs, bids0, bd0, iters=it))
    t0 = time.perf_counter()
    float(run(sel0, adj, vecs, bids0, bd0, iters=lo))
    tl = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(sel0, adj, vecs, bids0, bd0, iters=hi))
    th = time.perf_counter() - t0
    return (th - tl) / (hi - lo)


def adj_gather(sel, adjv, vecsv, bids, bd):
    nbrs = jnp.take(adjv, jnp.clip(sel, 0, n - 1), axis=0).reshape(W, EM)
    return jnp.float32(nbrs[0, 0])


def vec_gather_dist(sel, adjv, vecsv, bids, bd):
    # gather EM=80 vector rows per query + dot: the presumed whale
    nbrs = (sel[:, :, None] * M + jnp.arange(M)[None, None, :]).reshape(W, EM) % n
    g = jnp.take(vecsv, nbrs.reshape(-1), axis=0).reshape(W, EM, d)
    cd = 1.0 - jnp.einsum("bkd,bd->bk", g, q)
    return cd[0, 0]


def vec_gather_dist_G(G):
    def op(sel, adjv, vecsv, bids, bd):
        nbrs = (sel[:, :, None] * M + jnp.arange(M)[None, None, :]).reshape(W, EM)[:, :G] % n
        g = jnp.take(vecsv, nbrs.reshape(-1), axis=0).reshape(W, G, d)
        cd = 1.0 - jnp.einsum("bkd,bd->bk", g, q)
        return cd[0, 0]

    return op


def dedupe(sel, adjv, vecsv, bids, bd):
    nbrs = (sel[:, :, None] * M + jnp.arange(M)[None, None, :]).reshape(W, EM) % n
    cand_valid = nbrs >= 0
    eq = nbrs[:, :, None] == nbrs[:, None, :]
    dup = jnp.any(eq & earlier[None] & cand_valid[:, None, :], axis=2)
    cand_valid &= ~dup
    in_beam = jnp.any(nbrs[:, :, None] == bids[:, None, :], axis=2)
    cand_valid &= ~in_beam
    return jnp.sum(cand_valid).astype(jnp.float32)


def merge_sort(sel, adjv, vecsv, bids, bd):
    cd = (sel[:, :1] * jnp.ones((W, EM), jnp.float32)) * 1e-9
    cids = (sel[:, :1] + jnp.arange(EM)[None, :]).astype(jnp.int32)
    all_d = jnp.concatenate([bd, cd], axis=1)
    all_ids = jnp.concatenate([bids, cids], axis=1)
    all_exp = jnp.concatenate([jnp.zeros((W, ef), jnp.bool_), jnp.ones((W, EM), jnp.bool_)], axis=1)
    sd, sids, sexp = sort_by_key(all_d, all_ids, all_exp)
    return sd[0, 0]


def open_select(sel, adjv, vecsv, bids, bd):
    bexp = bids > (n // 2)
    open_ = ~bexp & (bids >= 0)
    open_rank = jnp.cumsum(open_.astype(jnp.int32), axis=1) - 1
    selm = open_ & (open_rank < E)
    hit = selm[:, :, None] & (open_rank[:, :, None] == jnp.arange(E)[None, None, :])
    slots = jnp.sum(hit * jnp.arange(ef, dtype=jnp.int32)[None, :, None], axis=1)
    sids = jnp.take_along_axis(bids, slots, axis=1)
    return jnp.float32(sids[0, 0])


if __name__ == "__main__":
    for name, op in (
        ("adj row gather [W,4]x20B", adj_gather),
        ("vec gather+dot G=80", vec_gather_dist),
        ("vec gather+dot G=40", vec_gather_dist_G(40)),
        ("dedupe EMxEM", dedupe),
        ("merge sort w=180", merge_sort),
        ("open-slot select", open_select),
    ):
        t = dev_time(op)
        print(f"{name}: {t*1e6:.0f}us/iter", flush=True)
