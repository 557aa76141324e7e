"""GloVe end-to-end demo (reference parity: /root/reference/examples/glove.rs).

Parse a GloVe-format text file (``word v1 v2 ... vd`` per line), build an
index, then run self-queries printing each word's nearest tokens.

Usage:
    python examples/glove.py glove.6B.100d.txt [--max-words 50000]
        [--engine hnsw|ivf|brute] [--max-search 10] [--queries word1,word2]

With no file argument a synthetic vocabulary is generated so the demo runs
in zero-egress environments.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if os.environ.get("GT_FORCE_PLATFORM"):
    # the environment's sitecustomize pins JAX_PLATFORMS; config.update wins
    import jax

    jax.config.update("jax_platforms", os.environ["GT_FORCE_PLATFORM"])


def parse_glove(path: str, max_words: int | None):
    words, rows = [], []
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        for line in f:
            parts = line.rstrip().split(" ")
            if len(parts) < 3:
                continue
            words.append(parts[0])
            rows.append(np.asarray(parts[1:], dtype=np.float32))
            if max_words and len(words) >= max_words:
                break
    return words, np.stack(rows)


def synthetic(n=20000, d=100, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((400, d)).astype(np.float32)
    vecs = centers[rng.integers(0, 400, n)] + 0.3 * rng.standard_normal((n, d)).astype(np.float32)
    words = [f"word{i:05d}" for i in range(n)]
    return words, vecs.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("glove_file", nargs="?", default=None)
    ap.add_argument("--max-words", type=int, default=50000)
    ap.add_argument("--engine", choices=["hnsw", "ivf", "brute"], default="hnsw")
    ap.add_argument("--max-search", type=int, default=10)  # glove.rs:24-64 default
    ap.add_argument("--num-neighbors", type=int, default=6)
    ap.add_argument("--queries", default=None, help="comma-separated words (default: first 10)")
    args = ap.parse_args()

    if args.glove_file:
        words, vecs = parse_glove(args.glove_file, args.max_words)
    else:
        print("no glove file given; using synthetic vocabulary", file=sys.stderr)
        words, vecs = synthetic()
    print(f"loaded {len(words)} words, dim {vecs.shape[1]}", file=sys.stderr)

    t0 = time.time()
    if args.engine == "hnsw":
        from granne_tpu import AngularVectors, BuildConfig, Granne, build_layers

        elements = AngularVectors.from_raw(vecs)
        layers = build_layers(
            elements, BuildConfig(num_neighbors=20, max_search=50, show_progress=True)
        )
        index = Granne(layers=layers, elements=elements)
        search = lambda q, k: index.search_batch(q, max_search=args.max_search * 10, num_neighbors=k)
    elif args.engine == "ivf":
        from granne_tpu.index.ivf import IvfIndex

        index = IvfIndex.build(vecs)
        search = lambda q, k: index.search_batch(q, num_neighbors=k)
    else:
        from granne_tpu.models.brute import BruteForceIndex

        index = BruteForceIndex.build(vecs)
        search = lambda q, k: index.search_batch(q, num_neighbors=k)
    print(f"build: {time.time() - t0:.1f}s", file=sys.stderr)

    if args.queries:
        qwords = [w for w in args.queries.split(",") if w in set(words)]
    else:
        qwords = words[:10]
    widx = {w: i for i, w in enumerate(words)}
    q = vecs[[widx[w] for w in qwords]]

    ids, dists = search(q, args.num_neighbors)
    ids, dists = np.asarray(ids), np.asarray(dists)
    for r, w in enumerate(qwords):
        near = [f"{words[i]}({dists[r][j]:.3f})" for j, i in enumerate(ids[r]) if i >= 0]
        print(f"{w}: {' '.join(near)}")


if __name__ == "__main__":
    main()
