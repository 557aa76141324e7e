"""Forced-execution build-throughput sweep over (wave_size, expand).

Timing ends with a value fetch from every layer, so the number is real
device throughput (block_until_ready is lazy on the tunnel backend).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/granne_tpu_jax_cache")

import jax.numpy as jnp

from granne_tpu import AngularVectors, BuildConfig, build_layers
from granne_tpu.ops import distance as D


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=300_000)
    p.add_argument("--d", type=int, default=100)
    p.add_argument("--m", type=int, default=20)
    p.add_argument("--ef", type=int, default=100)
    p.add_argument("--configs", default="256:4,1024:4,1024:8,2048:8")
    p.add_argument("--cache", action="store_true", help="neighbor_cache builds")
    p.add_argument("--cache-layout", default="flat", choices=["flat", "tiled"])
    p.add_argument("--max-iters", type=int, default=0, help="build_max_iters cap")
    p.add_argument("--recall", action="store_true",
                   help="serve 1024 self-queries at ef=60 vs exact GT per build")
    args = p.parse_args()

    vecs = jax.random.normal(jax.random.PRNGKey(0), (args.n, args.d), jnp.float32)
    el = AngularVectors.from_normalized(D.normalize(vecs))
    _ = float(el.vectors[0, 0])

    gt = None
    if args.recall:
        from granne_tpu.models.brute import exact_topk
        import numpy as np
        q = el.vectors[:1024]
        gt = np.asarray(exact_topk(el.vectors, q, 10)[0])

    for cfg_s in args.configs.split(","):
        W, E = (int(x) for x in cfg_s.split(":"))
        cfg = BuildConfig(num_neighbors=args.m, max_search=args.ef,
                          wave_size=W, expand=E, neighbor_cache=args.cache,
                          neighbor_cache_layout=args.cache_layout,
                          build_max_iters=args.max_iters or None)
        t0 = time.perf_counter()
        stack = build_layers(el, cfg)
        probes = [float(jnp.sum(a[:: max(1, a.shape[0] // 64)])) for a in stack.layers]
        dt = time.perf_counter() - t0
        # connectivity sanity: bottom layer rows mostly non-empty
        filled = float(jnp.mean(jnp.any(stack.layers[-1][: args.n] >= 0, axis=1)))
        print(f"W={W:5d} E={E} cache={args.cache}/{args.cache_layout} mi={args.max_iters}: {dt:7.1f}s = {args.n/dt:8,.0f} vec/s  "
              f"(bottom fill {filled:.3f})", flush=True)
        if gt is not None:
            import numpy as np
            from granne_tpu.ops import frontier
            for dt_name, elv in (("bf16", el.as_bf16()), ("f32", el)):
                qv = elv.prepare_queries(el.vectors[:1024])
                ids, _d = frontier.search_layers(
                    stack.layers, elv, qv, ef=60, num_neighbors=10,
                    expand=2, descent_ef=4,
                )
                ids = np.asarray(ids)
                rec = float(np.mean([len(set(ids[i]) & set(gt[i])) / 10 for i in range(1024)]))
                print(f"          recall@10 (ef=60 {dt_name}): {rec:.4f}", flush=True)


if __name__ == "__main__":
    main()
