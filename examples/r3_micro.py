"""Round-3 microbench: where do the cached wave phases actually spend time?

Measures, at build shapes (W=1024, ef=100, M=20, E=4, n=1.2M, d=100), with
the chained forced-execution harness (CLAUDE.md "CRITICAL measurement
gotcha").  ALL large arrays (elements, adjacency, cache table) are passed
as jit ARGUMENTS — closing over them uploads multi-GB HLO constants over
the tunnel.

  A. cached-beam body components: fat row gather, +unpack+score, full body
  B. edge-application components: axis-0 edge sort, chunked merge at
     merge_chunk in {1024, 4096, 16384}
  C. scattered vs one-hot gather of wave-local vectors (the inc_vecs path)
  D. select_neighbors heuristic alone
  E. full prune_layer at n=1.2M for merge_chunk in {1024, 16384}
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
from granne_tpu.index.heuristic import select_neighbors
from granne_tpu.ops import distance as D
from granne_tpu.ops.nbr_cache import make_neighbor_cache, row_vecs, unpack_ids
from granne_tpu.ops.topk import INF, UNUSED, sort_by_key

n, d, W, M, ef, E = 1_200_000, 100, 1024, 20, 100, 4
EM = E * M
R = 16  # reverse_cap
T = W * M

vecs = D.normalize(jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32))
el = AngularVectors.from_normalized(vecs)
adj = jax.random.randint(jax.random.PRNGKey(1), (n, M), 0, n, jnp.int32)
tab = make_neighbor_cache(adj, el, layout="flat")
q = vecs[:W]
rng = np.random.default_rng(0)
sel0 = jnp.asarray(rng.integers(0, n, (W, E)).astype(np.int32))
bids0 = jnp.asarray(rng.integers(0, n, (W, ef)).astype(np.int32))
bd0 = jnp.sort(jnp.asarray(rng.random((W, ef), np.float32)), axis=1)
tgt0 = jnp.asarray(rng.integers(0, n, (T,)).astype(np.int32))
src0 = jnp.asarray(np.repeat(np.arange(n - W, n, dtype=np.int32), M))
dd0 = jnp.asarray(rng.random((T,), np.float32))
wave_vecs0 = jnp.asarray(np.asarray(vecs[n - W :]))


def dev_time(op, args, iters_pair=(5, 35)):
    """op(chain, *args) -> scalar probe; chain feeds iteration i+1."""

    @partial(jax.jit, static_argnames=("iters",))
    def run(args, *, iters):
        def body(i, carry):
            chain, acc = carry
            probe = op(chain, *args)
            z = jnp.where(jnp.isfinite(probe), probe, 1.0).astype(jnp.float32) * 0.0
            return z, acc + z

        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0), jnp.float32(0)))[1]

    lo, hi = iters_pair
    for it in (lo, hi):
        float(run(args, iters=it))
    t0 = time.perf_counter()
    float(run(args, iters=lo))
    tl = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(args, iters=hi))
    th = time.perf_counter() - t0
    return (th - tl) / (hi - lo)


# --- A. cached-beam components --------------------------------------------


def a_row_gather(chain, tab, sel, q, el):
    s = sel + chain.astype(jnp.int32)
    crows = jnp.take(tab, jnp.clip(s, 0, n - 1), axis=0)
    return jnp.float32(crows[0, 0, 0])


def a_gather_score(chain, tab, sel, q, el):
    s = sel + chain.astype(jnp.int32)
    crows = jnp.take(tab, jnp.clip(s, 0, n - 1), axis=0)
    nbrs = unpack_ids(crows, M, d).reshape(W, EM)
    block = row_vecs(crows, M, d).reshape(W, EM, d)
    cd = el.score_block(block, q)
    return cd[0, 0] + jnp.float32(nbrs[0, 0])


def a_full_body(chain, tab, sel, q, el):
    earlier = jnp.tril(jnp.ones((EM, EM), jnp.bool_), k=-1)
    s = sel + chain.astype(jnp.int32)
    bids, bd = bids0, bd0
    bexp = bids > (n // 2)
    crows = jnp.take(tab, jnp.clip(s, 0, n - 1), axis=0)
    nbrs = unpack_ids(crows, M, d).reshape(W, EM)
    cand_valid = nbrs >= 0
    eq = nbrs[:, :, None] == nbrs[:, None, :]
    dup = jnp.any(eq & earlier[None] & cand_valid[:, None, :], axis=2)
    cand_valid &= ~dup
    in_beam = jnp.any(nbrs[:, :, None] == bids[:, None, :], axis=2)
    cand_valid &= ~in_beam
    block = row_vecs(crows, M, d).reshape(W, EM, d)
    cand_d = el.score_block(block, q)
    cand_d = jnp.where(cand_valid, cand_d, INF)
    cand_ids = jnp.where(cand_valid, nbrs, UNUSED)
    all_d = jnp.concatenate([bd, cand_d], axis=1)
    all_ids = jnp.concatenate([bids, cand_ids], axis=1)
    all_exp = jnp.concatenate([bexp, jnp.zeros((W, EM), jnp.bool_)], axis=1)
    packed = all_ids * 2 + all_exp.astype(jnp.int32)
    sd, sp = sort_by_key(all_d, packed)
    return sd[0, 0]


# --- B. edge application --------------------------------------------------


def b_edge_sort(chain, tgt, dd, src):
    key_t = jnp.where(tgt >= 0, tgt + chain.astype(jnp.int32), B._BIG)
    st, sd_, ss = jax.lax.sort((key_t, dd, src), dimension=0, num_keys=2, is_stable=True)
    return jnp.float32(st[0]) + sd_[0]


def b_apply_reverse(mc, use_tab):
    def op(chain, tgt, dd, src, adj, el, tab):
        t = tgt + chain.astype(jnp.int32)
        a2, rows = B._apply_reverse_edges(
            adj, el, t, src, dd, reverse_cap=R, merge_chunk=mc,
            nbr_tab=tab if use_tab else None,
        )
        return jnp.float32(a2[0, 0])

    return op


# --- C. wave-local vector gathers -----------------------------------------


def c_scatter_gather(chain, idx, el):
    ii = (idx + chain.astype(jnp.int32)).reshape(-1)
    g = el.get(ii)
    return g[0, 0]


def c_onehot_gather(chain, pos, wave_vecs):
    p = pos + chain.astype(jnp.int32)
    oh = jax.nn.one_hot(p.reshape(-1), W, dtype=jnp.bfloat16)
    g = jnp.dot(oh, wave_vecs.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return g[0, 0]


# --- D. heuristic ---------------------------------------------------------


def d_heuristic(chain, ci, cd, v, el):
    ci = ci + chain.astype(jnp.int32) * 0
    ids, ds = select_neighbors(el, ci, cd, v, M)
    return ds[0, 0]


# --- E. prune -------------------------------------------------------------


def e_prune(mc):
    def op(chain, adj, el):
        a2, _ = B.prune_layer(adj, el, m_eff=M, merge_chunk=mc, nbr_tab=None)
        return jnp.float32(a2[0, 0])

    return op


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"A", "B", "C", "D", "E"}
    if "P" in which:
        run_pallas()
    if "A" in which:
        print("--- A. cached beam (per iteration) ---", flush=True)
        for name, op in (
            ("fat row gather [W,E]x4KB", a_row_gather),
            ("gather+unpack+score", a_gather_score),
            ("full beam body", a_full_body),
        ):
            t = dev_time(op, (tab, sel0, q, el))
            print(f"{name}: {t*1e6:.0f}us/iter", flush=True)

    if "B" in which:
        print("--- B. edge application ---", flush=True)
        t = dev_time(b_edge_sort, (tgt0, dd0, src0))
        print(f"axis-0 sort T={T}: {t*1e6:.0f}us", flush=True)
        for mc in (1024, 4096, 16384):
            t = dev_time(b_apply_reverse(mc, True), (tgt0, dd0, src0, adj, el, tab), iters_pair=(2, 8))
            print(f"apply_reverse cached mc={mc}: {t*1e3:.2f}ms", flush=True)
        t = dev_time(b_apply_reverse(4096, False), (tgt0, dd0, src0, adj, el, tab), iters_pair=(2, 8))
        print(f"apply_reverse uncached mc=4096: {t*1e3:.2f}ms", flush=True)

    if "C" in which:
        print("--- C. wave-local vector gathers (16384 ids) ---", flush=True)
        idx = jnp.asarray(rng.integers(n - W, n, (16384,)).astype(np.int32))
        pos = idx - (n - W)
        t = dev_time(c_scatter_gather, (idx, el))
        print(f"scattered take: {t*1e6:.0f}us", flush=True)
        t = dev_time(c_onehot_gather, (pos, wave_vecs0))
        print(f"one-hot matmul: {t*1e6:.0f}us", flush=True)

    if "D" in which:
        print("--- D. heuristic alone ---", flush=True)
        for C, Bn in ((36, 20480), (100, 1024)):
            ci = jnp.asarray(rng.integers(0, n, (Bn, C)).astype(np.int32))
            cd = jnp.sort(jnp.asarray(rng.random((Bn, C), np.float32)), axis=1)
            v = jnp.ones((Bn, C), bool)
            t = dev_time(d_heuristic, (ci, cd, v, el), iters_pair=(3, 13))
            print(f"select_neighbors B={Bn} C={C}: {t*1e3:.2f}ms", flush=True)

    if "E" in which:
        print("--- E. prune_layer n=1.2M ---", flush=True)
        for mc in (1024, 16384):
            t = dev_time(e_prune(mc), (adj, el), iters_pair=(1, 3))
            print(f"prune mc={mc}: {t*1e3:.0f}ms", flush=True)


# --- P. Pallas flat fused scorer vs XLA flat path -------------------------


def p_flat_kernel(chain, tab, sel, qtile, el):
    from granne_tpu.ops.pallas.nbr_score import gather_score_flat

    s = sel + chain.astype(jnp.int32)
    dots, nbrs = gather_score_flat(tab, s, qtile, M=M, d=d)
    return dots[0, 0] + jnp.float32(nbrs[0, 0])


def run_pallas():
    from granne_tpu.ops.pallas.nbr_score import make_qtile

    qtile = make_qtile(q.astype(jnp.bfloat16), M, tab.shape[1])
    t = dev_time(a_gather_score, (tab, sel0, q, el))
    print(f"XLA gather+unpack+score: {t*1e6:.0f}us/iter", flush=True)
    t = dev_time(p_flat_kernel, (tab, sel0, qtile, el))
    print(f"Pallas flat fused: {t*1e6:.0f}us/iter", flush=True)
