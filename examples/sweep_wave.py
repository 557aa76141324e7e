"""DISPATCH-RATE instrument (historical): timings here do NOT force
execution — block_until_ready is lazy on the tunnel backend (CLAUDE.md).
Use examples/build_sweep_forced.py / devbench.py for device-true numbers.

Sweep wave size W and expand E for wave_step throughput on TPU."""

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
from granne_tpu.ops import frontier


def timeit(fn, *args, iters=5, **kw):
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
    p.add_argument("--build-n", type=int, default=20_000)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    vecs = jax.random.normal(key, (args.n, args.d), jnp.float32)
    elements = AngularVectors.from_raw(np.asarray(vecs))

    cfg = BuildConfig(num_neighbors=args.m, max_search=args.ef, wave_size=256)
    stack = build_layers(
        AngularVectors.from_normalized(elements.vectors[: args.build_n]), cfg
    )
    real = np.asarray(stack.layers[-1])
    reps = int(np.ceil(args.n / real.shape[0]))
    adj_np = np.tile(real, (reps, 1))[: args.n]
    adj_np = np.where(adj_np >= 0, (adj_np + rng.integers(0, args.n)) % args.n, -1).astype(np.int32)
    adj = jnp.asarray(adj_np)
    prev = tuple(stack.layers[:-1])

    print(f"platform={jax.devices()[0].platform} n={args.n} M={args.m} ef={args.ef}")
    for W in (256, 512, 1024, 2048):
        wave_ids = jnp.asarray(np.arange(args.n - W, args.n, dtype=np.int32))
        wave_valid = jnp.ones((W,), bool)
        q = elements.queries_from_ids(wave_ids)
        ep = jnp.zeros((W,), jnp.int32)
        for E in (4, 8, 16):
            t_beam = timeit(jax.jit(
                lambda q=q, ep=ep, E=E: frontier.beam_search(
                    adj, elements, q, ep, ef=args.ef, expand=E)))
            t_ins = timeit(lambda W=W, E=E, wi=wave_ids, wv=wave_valid: builder.wave_step(
                prev, adj, elements, wi, wv, m_eff=args.m,
                max_search=args.ef, expand=E, reinsert=False,
                reverse_cap=cfg.reverse_cap, merge_chunk=cfg.merge_chunk))
            t_re = timeit(lambda W=W, E=E, wi=wave_ids, wv=wave_valid: builder.wave_step(
                prev, adj, elements, wi, wv, m_eff=args.m,
                max_search=max(1, args.ef // 2), expand=E, reinsert=True,
                reverse_cap=cfg.reverse_cap, merge_chunk=cfg.merge_chunk))
            tot = t_ins + t_re
            print(f"  W={W:5d} E={E:2d}: beam {t_beam*1e3:7.2f}ms  insert {t_ins*1e3:7.2f}ms  "
                  f"reinsert {t_re*1e3:7.2f}ms  -> {W/tot:8,.0f} vec/s steady")


if __name__ == "__main__":
    main()
