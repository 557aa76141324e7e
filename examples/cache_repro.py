"""Bisect the neighbor-cache build-quality regression at mid scale (CPU)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault("GT_FORCE_PLATFORM", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from granne_tpu import AngularVectors, BuildConfig, build_layers
from granne_tpu.models.brute import exact_topk
from granne_tpu.ops import distance as D
from granne_tpu.ops import frontier

n = int(os.environ.get("N", 16000))
d = int(os.environ.get("D", 100))
W = int(os.environ.get("W", 1024))
E = int(os.environ.get("E", 4))
M = 20

vecs = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32)
el = AngularVectors.from_normalized(D.normalize(vecs))
q = el.vectors[:1024]
gt = np.asarray(exact_topk(el.vectors, q, 10)[0])


def recall(stack):
    ids, _ = frontier.search_layers(
        stack.layers, el, el.prepare_queries(q), ef=60, num_neighbors=10,
        expand=2, descent_ef=4,
    )
    ids = np.asarray(ids)
    return float(np.mean([len(set(ids[i]) & set(gt[i])) / 10 for i in range(1024)]))


for cache in (False, True):
    cfg = BuildConfig(num_neighbors=M, max_search=100, wave_size=W, expand=E,
                      neighbor_cache=cache)
    t0 = time.perf_counter()
    stack = build_layers(el, cfg)
    jax.block_until_ready(stack.layers)
    dt = time.perf_counter() - t0
    print(f"cache={cache}: {dt:6.1f}s  recall@10={recall(stack):.4f}", flush=True)
