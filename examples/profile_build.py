"""DISPATCH-RATE instrument (historical): timings here do NOT force
execution — block_until_ready is lazy on the tunnel backend (CLAUDE.md).
Use examples/build_sweep_forced.py / devbench.py for device-true numbers.

Profile wave_step phases on TPU to find the build-throughput bottleneck.

Times each phase of a wave as a standalone jit with block_until_ready at a
realistic shape (n vectors indexed, one wave of W inserts at build ef).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("GT_FORCE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GT_FORCE_PLATFORM"])
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/granne_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

from granne_tpu import AngularVectors, BuildConfig, build_layers
from granne_tpu.index import builder
from granne_tpu.index.heuristic import select_neighbors
from granne_tpu.ops import frontier
from granne_tpu.ops.topk import INF, UNUSED


def timeit(fn, *args, iters=10, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=200_000)
    p.add_argument("--d", type=int, default=100)
    p.add_argument("--m", type=int, default=20)
    p.add_argument("--ef", type=int, default=100)
    p.add_argument("--wave", type=int, default=256)
    p.add_argument("--expand", type=int, default=4)
    p.add_argument("--build-n", type=int, default=50_000,
                   help="real build size for the end-to-end rate measurement")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    vecs = jax.random.normal(key, (args.n, args.d), jnp.float32)
    elements = AngularVectors.from_raw(np.asarray(vecs))

    cfg = BuildConfig(num_neighbors=args.m, max_search=args.ef,
                      wave_size=args.wave, expand=args.expand)

    # --- real small build for end-to-end rate + a realistic graph prefix ---
    t0 = time.perf_counter()
    stack = build_layers(
        AngularVectors.from_normalized(elements.vectors[: args.build_n]), cfg
    )
    jax.block_until_ready(stack.layers)
    t_build = time.perf_counter() - t0
    print(f"build {args.build_n} took {t_build:.1f}s = {args.build_n/t_build:.0f} vec/s")

    # synthetic bottom layer at full n for component timing: copy the real
    # graph rows cyclically so adjacency is plausible
    real = np.asarray(stack.layers[-1])
    reps = int(np.ceil(args.n / real.shape[0]))
    adj_np = np.tile(real, (reps, 1))[: args.n]
    # remap ids into [0, n)
    adj_np = np.where(adj_np >= 0, (adj_np + rng.integers(0, args.n)) % args.n, -1).astype(np.int32)
    adj = jnp.asarray(adj_np)
    prev = tuple(stack.layers[:-1])

    W = args.wave
    wave_ids = jnp.asarray(np.arange(args.n - W, args.n, dtype=np.int32))
    wave_valid = jnp.ones((W,), bool)
    q = elements.queries_from_ids(wave_ids)
    ep = jnp.zeros((W,), jnp.int32)

    # --- components -------------------------------------------------------
    res = {}

    descend_fn = jax.jit(lambda: frontier.descend(prev, elements, q, ep))
    res["descend(prev layers)"] = timeit(descend_fn)

    beam_fn = jax.jit(lambda: frontier.beam_search(
        adj, elements, q, ep, ef=args.ef, expand=args.expand))
    res[f"beam ef={args.ef} E={args.expand}"] = timeit(beam_fn)

    cand_ids, cand_d = beam_fn()
    cvalid = cand_ids >= 0

    pair_fn = jax.jit(lambda: elements.pairwise_from_ids(cand_ids))
    res[f"pairwise [W,{cand_ids.shape[1]},{cand_ids.shape[1]}]"] = timeit(pair_fn)

    sel_fn = jax.jit(lambda: select_neighbors(elements, cand_ids, cand_d, cvalid, args.m))
    res["select_neighbors"] = timeit(sel_fn)

    sel_ids, sel_d = sel_fn()

    # reverse-edge application
    tgt = sel_ids.reshape(-1)
    src = jnp.broadcast_to(wave_ids[:, None], sel_ids.shape).reshape(-1)
    dd = sel_d.reshape(-1)
    rev_fn = jax.jit(lambda a: builder._apply_reverse_edges(
        a, elements, tgt, src, dd, reverse_cap=cfg.reverse_cap,
        merge_chunk=cfg.merge_chunk))
    res["apply_reverse_edges"] = timeit(rev_fn, adj)

    # forward merge path (reinsert branch)
    exist = jnp.take(adj, wave_ids, axis=0)
    fwd_fn = jax.jit(lambda: builder._merge_rows_chunked(
        elements, wave_ids, exist, sel_ids, sel_d, wave_valid,
        adj.shape[1], cfg.merge_chunk))
    res["fwd merge (reinsert)"] = timeit(fwd_fn)

    # full wave_step, both modes
    ws = lambda reins: builder.wave_step(
        prev, adj, elements, wave_ids, wave_valid, m_eff=args.m,
        max_search=args.ef, expand=args.expand, reinsert=reins,
        reverse_cap=cfg.reverse_cap, merge_chunk=cfg.merge_chunk)
    res["wave_step insert"] = timeit(ws, False, iters=5)
    res["wave_step reinsert(ef/2)"] = timeit(
        lambda: builder.wave_step(
            prev, adj, elements, wave_ids, wave_valid, m_eff=args.m,
            max_search=max(1, args.ef // 2), expand=args.expand, reinsert=True,
            reverse_cap=cfg.reverse_cap, merge_chunk=cfg.merge_chunk), iters=5)

    print(f"\nplatform={jax.devices()[0].platform} n={args.n} W={W} M={args.m} ef={args.ef}")
    for k, v in res.items():
        print(f"  {k:36s} {v*1e3:8.2f} ms  ({W/v:,.0f} vec/s if alone)")
    tot = res["wave_step insert"] + res["wave_step reinsert(ef/2)"]
    print(f"  insert+reinsert total {tot*1e3:.2f} ms -> {W/tot:,.0f} vec/s steady-state")


if __name__ == "__main__":
    main()
