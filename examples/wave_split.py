"""Device-true split of wave-build cost: full wave vs search+select vs beam.

Times each phase with the chained-fori forced-execution harness (CLAUDE.md
"CRITICAL measurement gotcha"): op output feeds the next iteration's input,
one scalar fetched at the end, two iteration counts differenced.  All arrays
are passed as jit ARGUMENTS (closing over them inlines multi-GB constants
into the HLO and trips the remote-compile 413 limit).

GT_CACHE=1 additionally measures every phase with the neighbor-vector
cache (ops.nbr_cache) threaded through.
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
from granne_tpu.ops import distance as D, frontier
from granne_tpu.ops.nbr_cache import make_neighbor_cache

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

USE_CACHE = os.environ.get("GT_CACHE", "0") == "1"
MCS = [int(x) for x in os.environ.get("GT_MC", "1024").split(",")]
MC = MCS[0]
LAYOUT = os.environ.get("GT_LAYOUT", "flat")
MI = int(os.environ.get("GT_MI", "0")) or None  # build_max_iters analogue
RC = int(os.environ.get("GT_RC", "16"))  # reverse_cap
PHASES = os.environ.get("GT_PHASES", "full,search,beam,edges").split(",")
tab = make_neighbor_cache(adj, el, layout=LAYOUT) if USE_CACHE else None

# realistic reverse-edge target distribution: selections hit ~W*M distinct
# random rows across the layer (the tiled `ids % n` synthetic collapses to
# W unique targets and understates the reverse merge's gather cost)
_sel_np = rng.integers(0, n, (W, M)).astype(np.int32)
rand_sel = jnp.asarray(_sel_np)


def dev_time(op, iters_pair=(3, 13)):
    @partial(jax.jit, static_argnames=("iters",))
    def run(ids, adj, prev, el, tab, *, iters):
        def body(i, carry):
            ids_c, a, acc = carry
            out_a, probe = op(ids_c, a, prev, el, tab)
            z = jnp.where(jnp.isfinite(probe), probe, 1.0) * 0.0
            return ids0 + z.astype(jnp.int32), out_a, acc + z

        return jax.lax.fori_loop(0, iters, body, (ids, adj, jnp.float32(0)))[2]

    lo, hi = iters_pair
    for it in (lo, hi):
        float(run(ids0, adj, prev, el, tab, iters=it))
    t0 = time.perf_counter()
    float(run(ids0, adj, prev, el, tab, iters=lo))
    tl = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(ids0, adj, prev, el, tab, iters=hi))
    th = time.perf_counter() - t0
    return (th - tl) / (hi - lo)


def full(ids, a, prev, el, tab, mc=MC):
    a2, _ = B._wave_step_core(
        prev, a, el, ids, valid, m_eff=M, max_search=ef,
        expand=4, reinsert=False, reverse_cap=RC, merge_chunk=mc,
        nbr_tab=tab, max_iters=MI,
    )
    return a2, jnp.float32(a2[0, 0])


def search_only(ids, a, prev, el, tab):
    s_ids, s_d, act, zs = B.search_select_phase(
        prev, a, el, ids, valid, m_eff=M, max_search=ef, expand=4, nbr_vecs=tab,
        max_iters=MI,
    )
    return a, s_d[0, 0]


def beam_only(ids, a, prev, el, tab):
    q = el.queries_from_ids(ids)
    ci, cd = frontier.beam_search(
        a, el, q, jnp.zeros((W,), jnp.int32), ef=ef, expand=4, nbr_vecs=tab,
        max_iters=MI,
    )
    return a, cd[0, 0]


def edges_only(ids, a, prev, el, tab, mc=MC):
    # apply_wave_edges with synthetic selections (cost model: same shapes,
    # random targets like a real wave's)
    s_ids = (rand_sel + ids[:, None]) % jnp.int32(n)
    s_d = jnp.abs(jnp.sin(ids.astype(jnp.float32)))[:, None] * jnp.ones((1, M))
    act = valid
    zs = jnp.zeros((W,), bool)
    a2, _rows = B.apply_wave_edges(
        a, el, ids, valid, s_ids, s_d, act, zs,
        m_eff=M, reinsert=False, reverse_cap=RC, merge_chunk=mc, nbr_tab=tab,
    )
    return a2, jnp.float32(a2[0, 0])


if __name__ == "__main__":
    print(f"cache={USE_CACHE} merge_chunk={MCS} layout={LAYOUT} mi={MI} rc={RC}")
    from functools import partial as _p

    jobs = []
    for name, op in (
        ("full wave", full),
        ("search+select", search_only),
        ("beam only", beam_only),
        ("edges only", edges_only),
    ):
        key = {"full wave": "full", "search+select": "search",
               "beam only": "beam", "edges only": "edges"}[name]
        if key not in PHASES:
            continue
        if key in ("full", "edges"):
            for mc in MCS:
                jobs.append((f"{name} mc={mc}", _p(op, mc=mc)))
        else:
            jobs.append((name, op))
    for name, op in jobs:
        t = dev_time(op)
        print(f"{name}: {t*1e3:.1f}ms/wave ({W/t:,.0f} vec/s if alone)", flush=True)
