"""Measure tiered-serving pipeline efficiency (host fetch / compute overlap)
independent of link bandwidth: run on the CPU backend where "H2D" is a copy,
so the measured ratio isolates how much of the per-batch host work the
two-deep prefetch pipeline hides behind scoring.

Usage: GT_FORCE_PLATFORM=cpu python examples/tiered_overlap.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("GT_FORCE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GT_FORCE_PLATFORM"])
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/granne_tpu_jax_cache")

import numpy as np

from granne_tpu.parallel.tiering import TieredIvf


def run(gen):
    t0 = time.perf_counter()
    n = sum(r[0].shape[0] for r in gen)
    return n, time.perf_counter() - t0


def main():
    rng = np.random.default_rng(0)
    n, d = 200_000, 96
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    t = TieredIvf.build(vecs, n_clusters=512, kmeans_iters=4, cluster_cap=512)

    batches = [rng.standard_normal((512, d)).astype(np.float32) for _ in range(24)]
    kw = dict(num_neighbors=10, nprobe=16)

    # warm both paths (compiles)
    run(t.search_batches_sequential(batches[:2], **kw))
    run(t.search_batches(batches[:2], **kw))

    nq, t_seq = run(t.search_batches_sequential(batches, **kw))
    _, t_pipe = run(t.search_batches(batches, **kw))
    print(f"sequential: {nq/t_seq:,.0f} qps   pipelined: {nq/t_pipe:,.0f} qps   "
          f"overlap speedup: {t_seq/t_pipe:.2f}x")


if __name__ == "__main__":
    main()
