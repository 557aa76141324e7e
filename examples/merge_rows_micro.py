"""Ablation micro for _merge_rows (the reverse-edge merge — measured 28 of
the 34 ms edge phase at build shapes, round 4).

Times one merge chunk [Nc, Ms + R] with components knocked out one at a
time; the gap between "full" and an ablation is that component's cost.
Device-true chained-fori timing.  Env: MR_NC (default 4096).
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
from granne_tpu.index.heuristic import select_neighbors
from granne_tpu.ops import distance as D
from granne_tpu.ops.nbr_cache import make_neighbor_cache, pack_rows, rows_to_vecs
from granne_tpu.ops.topk import INF, UNUSED, sort_by_key

n, d, W, Ms, R = 1_200_000, 100, 1024, 20, 16
Nc = int(os.environ.get("MR_NC", "4096"))

vecs = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32)
el = AngularVectors.from_normalized(D.normalize(vecs))
rng = np.random.default_rng(0)
adj = jnp.asarray(rng.integers(0, n, (n, Ms)).astype(np.int32))
tab = make_neighbor_cache(adj, el, layout="flat")
wave_rows = el.cache_rows(jnp.asarray(np.arange(W, dtype=np.int32)))

nid0 = jnp.asarray(rng.integers(0, n, Nc).astype(np.int32))
inc_ids0 = jnp.asarray(rng.integers(0, n, (Nc, R)).astype(np.int32))
inc_pos0 = jnp.asarray(rng.integers(0, W, (Nc, R)).astype(np.int32))
inc_d0 = jnp.asarray(np.sort(rng.random((Nc, R)).astype(np.float32), axis=1))


def dev_time(op, iters_pair=(4, 24)):
    @partial(jax.jit, static_argnames=("iters",))
    def run(nid, a, t, e, wr, *, iters):
        def body(i, carry):
            nid_c, a_c, t_c, acc = carry
            out_a, out_t, probe = op(nid_c, a_c, t_c, e, wr)
            z = jnp.where(jnp.isfinite(probe), probe, 1.0) * 0.0
            return nid0 + z.astype(jnp.int32), out_a, out_t, acc + z

        return jax.lax.fori_loop(0, iters, body, (nid, a, t, jnp.float32(0)))[3]

    lo, hi = iters_pair
    for it in (lo, hi):
        float(run(nid0, adj, tab, el, wave_rows, iters=it))
    t0 = time.perf_counter()
    float(run(nid0, adj, tab, el, wave_rows, iters=lo))
    tl = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(nid0, adj, tab, el, wave_rows, iters=hi))
    th = time.perf_counter() - t0
    return (th - tl) / (hi - lo)


def merge_chunk(nid, a, t, e, wr, *, skip=()):
    """_merge_rows body with named components ablated."""
    exist = jnp.take(a, nid, axis=0)
    node_valid = jnp.ones((Nc,), bool)
    tq = e.queries_from_ids(nid)
    if "exist_gather" in skip:
        ev = jnp.zeros((Nc, Ms, d), jnp.bfloat16)
    else:
        ev = rows_to_vecs(t, nid, Ms, d)
    if "onehot" in skip:
        iv = jnp.zeros((Nc, R, d), jnp.bfloat16)
    else:
        oh = jax.nn.one_hot(inc_pos0, W, dtype=wr.dtype)
        iv = jnp.einsum("nrw,wd->nrd", oh, wr, preferred_element_type=jnp.float32).astype(wr.dtype)
    exist_d = e.score_block(ev, tq)
    inc_d = inc_d0
    all_ids = jnp.concatenate([exist, inc_ids0], axis=1)
    all_d = jnp.concatenate([exist_d, inc_d], axis=1)
    C = all_ids.shape[1]
    if "sort" in skip:
        sd, sids, sperm = all_d, all_ids, jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32), all_ids.shape)
    else:
        perm = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32), all_ids.shape)
        sd, sids, sperm = sort_by_key(all_d, all_ids, perm)
    all_vecs = jnp.concatenate([ev, iv], axis=1)
    if "vec_perm" in skip:
        svecs = all_vecs
    else:
        svecs = jnp.take_along_axis(all_vecs, sperm[:, :, None], axis=1)
    valid = sids >= 0
    if "heuristic" in skip:
        sel_ids, _sd2, sel_vecs = sids[:, :Ms], sd[:, :Ms], svecs[:, :Ms]
    else:
        sel_ids, _sd2, sel_vecs = select_neighbors(
            e, sids, sd, valid, Ms, cand_vecs=svecs, return_vecs=True
        )
    if "scatter" in skip:
        return a, t, jnp.float32(sel_ids[0, 0])
    vals = pack_rows(sel_vecs.astype(jnp.bfloat16), "flat", ids=sel_ids)
    t = t.at[nid].set(vals, mode="drop")
    a = a.at[nid].set(sel_ids, mode="drop")
    return a, t, jnp.float32(sel_ids[0, 0])


if __name__ == "__main__":
    print(f"Nc={Nc} Ms={Ms} R={R} d={d} n={n}", flush=True)
    base = dev_time(partial(merge_chunk, skip=()))
    print(f"full merge chunk: {base*1e3:.2f}ms", flush=True)
    for name in ("exist_gather", "onehot", "sort", "vec_perm", "heuristic", "scatter"):
        tt = dev_time(partial(merge_chunk, skip=(name,)))
        print(f"  without {name}: {tt*1e3:.2f}ms  (component ~{(base-tt)*1e3:.2f}ms)", flush=True)
