"""Offline ETL for SumEmbeddings corpora.

Reference parity: ``/root/reference/src/elements/embeddings/parsing.rs`` —
parse a JSON-lines word dictionary (``:19-31``), tokenize text corpora
(directories of optionally-gzipped files, one parallel task per file,
``:154-240``), write element shards (``:63-100``), and precompute summed
vectors to disk (``:103-152``).

Host-side work; parallelism via a thread pool over files (the rayon
analogue).
"""

from __future__ import annotations

import gzip
import json
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np


class WordDict:
    """JSON-lines word <-> id mapping (py/src/variants/mod.rs:9-78).

    Each line: ``{"word": <str>}`` — the id is the line number; or a plain
    string per line.
    """

    def __init__(self, words: list[str]):
        self.words = list(words)
        self.index = {w: i for i, w in enumerate(self.words)}

    @classmethod
    def from_file(cls, path: str) -> "WordDict":
        words = []
        op = gzip.open if path.endswith(".gz") else open
        with op(path, "rt", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    obj = json.loads(line)
                    words.append(obj["word"] if isinstance(obj, dict) else str(obj))
                except json.JSONDecodeError:
                    words.append(line)
        return cls(words)

    def __len__(self) -> int:
        return len(self.words)

    def get_word(self, idx: int) -> str:
        return self.words[idx]

    def get_id(self, word: str) -> int | None:
        return self.index.get(word)

    def to_ids(self, text: str) -> list[int]:
        return [self.index[w] for w in text.split() if w in self.index]


def parse_file(path: str, words: WordDict) -> list[list[int]]:
    """One corpus file -> per-line term-id lists (parsing.rs:154-240)."""
    op = gzip.open if path.endswith(".gz") else open
    out = []
    with op(path, "rt", encoding="utf-8", errors="replace") as f:
        for line in f:
            ids = words.to_ids(line.strip())
            if ids:
                out.append(ids)
    return out


def parse_corpus_dir(directory: str, words: WordDict, max_workers: int = 8) -> list[list[int]]:
    """Parse every file in a directory, one worker per file (rayon analogue)."""
    files = sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if os.path.isfile(os.path.join(directory, f))
    )
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        results = list(pool.map(lambda p: parse_file(p, words), files))
    out = []
    for r in results:
        out.extend(r)
    return out


def write_shards(term_lists: list[list[int]], out_dir: str, num_shards: int) -> list[str]:
    """Split element term lists into shard files (parsing.rs:63-100).

    Each shard is an .npz with the padded term tensor for its slice.
    """
    os.makedirs(out_dir, exist_ok=True)
    n = len(term_lists)
    bounds = np.linspace(0, n, num_shards + 1).astype(int)
    width = max((len(t) for t in term_lists), default=1)
    paths = []
    for s in range(num_shards):
        lo, hi = bounds[s], bounds[s + 1]
        from .embeddings import pad_term_lists

        arr = pad_term_lists(term_lists[lo:hi], width)
        path = os.path.join(out_dir, get_shard_name(s, num_shards))
        np.savez(path, terms=arr, lo=lo, hi=hi)
        paths.append(path + ".npz" if not path.endswith(".npz") else path)
    return paths


def get_shard_name(shard: int, total: int) -> str:
    """Zero-padded shard naming (parsing.rs:50-61)."""
    digits = len(str(total - 1)) if total > 1 else 1
    return f"shard-{shard:0{digits}d}-of-{total}"


def precompute_quantized_vectors(container, chunk: int = 4096):
    """Materialize all summed vectors as int8 (parsing.rs:103-152).

    Returns an AngularIntVectors over the on-the-fly vectors, trading RAM
    for per-query compute exactly like the reference's offline step.
    """
    import jax.numpy as jnp

    from .angular_int import AngularIntVectors

    n = len(container)
    parts = []
    for lo in range(0, n, chunk):
        ids = jnp.arange(lo, min(n, lo + chunk), dtype=jnp.int32)
        parts.append(np.asarray(container.get(ids)))
    vecs = np.concatenate(parts) if parts else np.zeros((0, container.dim), np.float32)
    return AngularIntVectors.from_raw(vecs)
