"""User-facing API shaped like granne's Python bindings.

Reference parity: ``/root/reference/py/src/lib.rs`` — classes ``Granne``
(:175-343) and ``GranneBuilder`` (:384-578), module function
``compute_distance`` (:17-30).  The TPU classes keep the same method
surface (append / build / save_index / save_elements / search /
get_neighbors / num_layers / layer_len / reorder) while ``search`` gains a
first-class batched form.

The index class itself lives in ``index/granne.py``; this module adds the
mutable builder wrapper and convenience constructors.

Example (the reference crate-root doctest, ``src/lib.rs:31-67``:
build -> save -> load from disk -> search -> same results; executed by
``tests/test_api.py::test_module_doctest``):

>>> import tempfile, os, numpy as np
>>> import granne_tpu as granne
>>> rng = np.random.default_rng(7)
>>> builder = granne.GranneBuilder(
...     "angular", num_neighbors=8, max_search=16, wave_size=32)
>>> for v in rng.standard_normal((200, 8)).astype(np.float32):
...     builder.append(v)
>>> builder.build()
>>> builder.num_layers >= 2
True
>>> tmp = tempfile.mkdtemp()
>>> builder.save_index(os.path.join(tmp, "index.granne"))
>>> builder.save_elements(os.path.join(tmp, "elements.bin"))
>>> index = granne.load_granne(
...     os.path.join(tmp, "index.granne"), os.path.join(tmp, "elements.bin"))
>>> query = builder.get_element(123)
>>> res = index.search(query, 16, 5)  # [(id, dist)], nearest first
>>> res[0][0]
123
>>> res == builder.search(query, 16, 5)  # loaded == builder's results
True
>>> res[0][1] < 1e-5
True
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np

from .elements.angular import AngularVectors
from .elements.angular_int import AngularIntVectors
from .index import io as gio
from .index.builder import BuildConfig, build_layers
from .index.granne import Granne
from .index.graph import LayerStack

DEFAULT_MAX_SEARCH = 200  # py/src/lib.rs:14
DEFAULT_NUM_ELEMENTS = 10  # py/src/lib.rs:15

_ELEMENT_TYPES = {
    "angular": AngularVectors,
    "angular_int": AngularIntVectors,
}


def compute_distance(element_type: str, a, b) -> float:
    """Module-level distance helper (py/src/lib.rs:17-30)."""
    cls = _ELEMENT_TYPES[element_type]
    container = cls.from_raw(np.stack([np.asarray(a, np.float32), np.asarray(b, np.float32)]))
    return container.dist(0, 1)


def load_granne(index_path, elements_path) -> Granne:
    """Open a saved index + elements pair (Granne ctor, py/src/lib.rs:175-211).

    Either argument may be a file path (``Granne::from_file``, mmap) or a
    bytes-like buffer (``Granne::from_bytes``, src/index/mod.rs:107-121).
    """
    return Granne(layers=gio.load_index(index_path), elements=gio.load_elements(elements_path))


def parse_elements_and_save_to_disk(
    corpus_dir: str, words_path: str, output_path: str, num_shards: int = 1
) -> None:
    """Offline ETL: tokenize a corpus directory into term-id element shards
    (py/src/lib.rs:71-147 -> embeddings/parsing.rs:154-240, :63-100)."""
    from .elements import embeddings_etl as etl

    words = etl.WordDict.from_file(words_path)
    lists = etl.parse_corpus_dir(corpus_dir, words)
    if num_shards <= 1:
        from .elements.embeddings import pad_term_lists

        np.savez(output_path, terms=pad_term_lists(lists))
    else:
        etl.write_shards(lists, output_path, num_shards)


def compute_embeddings_and_save_to_disk(
    elements_path: str, embeddings: np.ndarray, output_path: str
) -> None:
    """Precompute summed element vectors as int8 and save them
    (py/src/lib.rs:~130 -> embeddings/parsing.rs:103-152)."""
    from .elements import embeddings_etl as etl
    from .elements.embeddings import SumEmbeddings

    data = np.load(elements_path)
    container = SumEmbeddings.from_parts(embeddings, data["terms"])
    quantized = etl.precompute_quantized_vectors(container)
    gio.save_elements(quantized, output_path)


class Embeddings:
    """Standalone word-embedding collection (py/src/embeddings.rs:8-144).

    Append (word, vector) pairs, embed word-id lists / text strings as
    bag-of-embedding sums, and compute angular distances between queries.
    Files: embeddings as a mmap-able ``.npy`` matrix, words as JSON-lines
    (the reference stores a FixedWidthSliceVector + JSON-lines word dict).
    """

    def __init__(self, embeddings_path: Optional[str] = None, words_path: Optional[str] = None):
        from .elements.embeddings_etl import WordDict

        if (embeddings_path is None) != (words_path is None):
            raise ValueError(
                "embeddings_path and words_path must be given together"
            )  # py/src/embeddings.rs:36-38
        if embeddings_path is not None:
            self._matrix = np.load(embeddings_path, mmap_mode="r")
            self.words = WordDict.from_file(words_path)
        else:
            self._matrix = None
            self.words = WordDict([])
        # appended tail: rows past the (optional) loaded matrix.  The matrix
        # stays memory-mapped — appending never copies or promotes it.
        self._rows: list[np.ndarray] = []

    def __len__(self) -> int:
        return len(self.words)

    @property
    def _base(self) -> int:
        return self._matrix.shape[0] if self._matrix is not None else 0

    def _row(self, idx: int) -> np.ndarray:
        base = self._base
        return self._matrix[idx] if idx < base else self._rows[idx - base]

    @property
    def _dim(self) -> Optional[int]:
        if self._matrix is not None:
            return int(self._matrix.shape[1])
        return int(self._rows[0].shape[0]) if self._rows else None

    def append(self, embedding, word: str) -> bool:
        """Returns False (and does not insert) if the word already exists
        (py/src/embeddings.rs:108-116)."""
        if self.words.get_id(word) is not None:
            return False
        v = np.asarray(embedding, np.float32).ravel()
        dim = self._dim
        if dim is not None and v.shape[0] != dim:
            raise ValueError(f"dimension mismatch: {v.shape[0]} != {dim}")
        self._rows.append(v)
        self.words.index[word] = len(self.words.words)
        self.words.words.append(word)
        return True

    def _ids_of(self, query) -> list[int]:
        if isinstance(query, (int, np.integer)):
            return [int(query)]
        if isinstance(query, str):
            return self.words.to_ids(query)
        return [int(i) for i in query]

    def get_embedding(self, query) -> np.ndarray:
        """Un-normalized bag-of-embeddings sum for an id, id list, or text
        string (py/src/embeddings.rs:63-76)."""
        ids = self._ids_of(query)
        if not ids:
            dim = self._row(0).shape[0] if len(self) else 0
            return np.zeros(dim, np.float32)
        return np.sum([self._row(i) for i in ids], axis=0, dtype=np.float32)

    @staticmethod
    def _angular(a: np.ndarray, b: np.ndarray) -> float:
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0.0 or nb == 0.0:
            return 1.0
        return float(max(0.0, 1.0 - np.dot(a / na, b / nb)))

    def dist(self, left, right) -> float:
        return self._angular(self.get_embedding(left), self.get_embedding(right))

    def dists(self, left, rights) -> list[float]:
        lv = self.get_embedding(left)
        return [self._angular(lv, self.get_embedding(r)) for r in rights]

    def save_embeddings(self, path: str) -> None:
        """Write the embedding matrix as .npy, streaming the (possibly
        memory-mapped) base matrix in bounded chunks — saving never
        materializes it whole (the reference streams shards,
        embeddings/parsing.rs:63-100)."""
        if not path.endswith(".npy"):
            path += ".npy"  # np.save's suffix rule, kept for compatibility
        base = self._base
        n = base + len(self._rows)
        d = self._dim or 0
        if n == 0 or d == 0:  # zero-size arrays can't memory-map
            np.save(path, np.zeros((n, d), np.float32))
            return
        out = np.lib.format.open_memmap(
            path, mode="w+", dtype=np.float32, shape=(n, d)
        )
        step = max(1, (64 << 20) // max(1, 4 * d))
        for lo in range(0, base, step):
            hi = min(lo + step, base)  # out has appended rows beyond base
            out[lo:hi] = self._matrix[lo:hi]
        for i, row in enumerate(self._rows):
            out[base + i] = row
        out.flush()
        del out

    def save_words(self, path: str) -> None:
        # One bare JSON string per line — the reference WordDict format
        # (py/src/variants/mod.rs write/new), readable by upstream granne
        # and by WordDict.from_file (which accepts both forms).
        with open(path, "w", encoding="utf-8") as f:
            for w in self.words.words:
                f.write(json.dumps(w) + "\n")

    def save(self, embeddings_path: str, words_path: str) -> None:
        self.save_embeddings(embeddings_path)
        self.save_words(words_path)


class WordEmbeddingsGranne:
    """Index whose queries may be raw vectors OR text strings
    (py/src/variants/index.rs:90-122): text is tokenized against a WordDict
    and embedded as a normalized bag-of-embeddings sum."""

    def __init__(self, index: Granne, embeddings: np.ndarray, word_dict):
        from .elements.embeddings import SumEmbeddings

        self.index = index
        self.words = word_dict
        self._embedder = SumEmbeddings.from_parts(embeddings, [[0]])

    def _to_vector(self, query) -> np.ndarray:
        if isinstance(query, str):
            ids = self.words.to_ids(query)
            if not ids:
                return np.zeros(self._embedder.dim, np.float32)
            return self._embedder.create_embedding(ids)
        return np.asarray(query, np.float32)

    def search(self, query, max_search: int = DEFAULT_MAX_SEARCH, num_elements: int = DEFAULT_NUM_ELEMENTS):
        return self.index.search(self._to_vector(query), max_search, num_elements)

    def get_internal_vector(self, query) -> np.ndarray:
        return self._to_vector(query)

    def get_element(self, idx: int):
        """The element's summed vector (py/src/variants/index.rs:112-114)."""
        return self.index.get_element(idx)

    def get_internal_element(self, idx: int):
        """The element's term WORDS (py/src/variants/index.rs:116-121).

        Falls back to the index's internal representation when the index
        stores precomputed vectors instead of term lists.
        """
        get_terms = getattr(self.index.elements, "get_terms", None)
        if get_terms is None:
            return self.index.get_internal_element(idx)
        return [self.words.words[t] for t in get_terms(idx)]


class GranneBuilder:
    """Mutable builder facade over the functional wave builder.

    Mirrors the reference's ``GranneBuilder`` Python class
    (py/src/lib.rs:384-578): append elements, build (optionally partially),
    save/load, introspect, and hand out a searchable snapshot.
    """

    def __init__(
        self,
        element_type: str = "angular",
        dim: Optional[int] = None,
        config: Optional[BuildConfig] = None,
        **config_kwargs,
    ):
        if config is None:
            config = BuildConfig(**config_kwargs)
        elif config_kwargs:
            raise ValueError("pass either config or kwargs, not both")
        self.config = config
        self._element_type = element_type
        self._cls = _ELEMENT_TYPES[element_type]
        self._dim = dim
        self._pending: list[np.ndarray] = []
        self._elements = None
        self._layers: Optional[LayerStack] = None

    # -- construction ------------------------------------------------------

    @classmethod
    def from_elements(cls, elements, config: Optional[BuildConfig] = None, **kw) -> "GranneBuilder":
        kind = "angular" if isinstance(elements, AngularVectors) else "angular_int"
        b = cls(kind, dim=elements.dim, config=config, **kw)
        b._elements = elements
        return b

    @classmethod
    def from_index(
        cls,
        index_path: str,
        elements_path: str,
        config: Optional[BuildConfig] = None,
        **kw,
    ) -> "GranneBuilder":
        """Resume building from a saved index (GranneBuilder::from_file,
        src/index/mod.rs:430-469)."""
        elements = gio.load_elements(elements_path)
        b = cls.from_elements(elements, config=config, **kw)
        b._layers = gio.load_index(index_path)
        return b

    @classmethod
    def from_bytes(
        cls,
        index_bytes,
        elements_bytes,
        config: Optional[BuildConfig] = None,
        **kw,
    ) -> "GranneBuilder":
        """Resume building from caller-owned buffers
        (``GranneBuilder::from_bytes``, src/index/mod.rs:430-446)."""
        elements = gio.load_elements(elements_bytes)
        b = cls.from_elements(elements, config=config, **kw)
        b._layers = gio.load_index(index_bytes)
        return b

    # -- element ingestion -------------------------------------------------

    def append(self, vector) -> None:
        """Append one element (py/src/lib.rs:474-489)."""
        v = np.asarray(vector, np.float32)
        if v.ndim == 1:
            v = v[None, :]
        if self._dim is None:
            self._dim = v.shape[1]
        if v.shape[1] != self._dim:
            raise ValueError(f"dimension mismatch: {v.shape[1]} != {self._dim}")
        self._pending.append(v)

    def _flush(self):
        if self._pending:
            batch = np.concatenate(self._pending, axis=0)
            self._pending.clear()
            if self._elements is None:
                self._elements = self._cls.from_raw(batch)
            else:
                self._elements = self._elements.extend(batch)
        if self._elements is None:
            self._elements = self._cls.from_raw(np.zeros((0, self._dim or 1), np.float32))
        return self._elements

    @property
    def elements(self):
        return self._flush()

    def __len__(self) -> int:
        """Number of elements (indexed or not)."""
        return len(self._flush())

    @property
    def indexed_elements(self) -> int:
        return self._layers.num_elements if self._layers is not None else 0

    # -- building ----------------------------------------------------------

    def build(self, num_elements: Optional[int] = None) -> None:
        """Build the index, optionally only the first ``num_elements``
        (Builder::build/build_partial, src/index/mod.rs:364-402)."""
        elements = self._flush()
        # consume_state: the builder owns its state exclusively, so the
        # resumed bottom layer is donated into the wave loops instead of
        # defensively copied (multi-GB at 10M+ appends)
        self._layers = build_layers(
            elements, self.config, num_elements, state=self._layers,
            consume_state=True,
        )

    # -- persistence -------------------------------------------------------

    def save_index(self, path: str, compressed: bool = True) -> None:
        if self._layers is None:
            self._layers = LayerStack(layers=(), counts=())
        gio.save_index(self._layers, path, compressed=compressed)

    def save_elements(self, path: str) -> None:
        gio.save_elements(self._flush(), path)

    # -- introspection / search -------------------------------------------

    def get_index(self) -> Granne:
        """Searchable snapshot of the current build state
        (``GranneBuilder::get_index``, src/index/mod.rs:483-488)."""
        layers = self._layers if self._layers is not None else LayerStack(layers=(), counts=())
        return Granne(layers=layers, elements=self._flush())

    @property
    def num_layers(self) -> int:
        return len(self._layers) if self._layers is not None else 0

    def layer_len(self, layer: int) -> int:
        return self._layers.layer_len(layer) if self._layers is not None else 0

    def get_neighbors(self, index: int, layer: int) -> list[int]:
        return self._layers.get_neighbors(layer, index) if self._layers is not None else []

    def get_element(self, index: int):
        """The (ingested) element at ``index``.

        API superset: the reference keeps this method commented out in its
        bindings (py/src/lib.rs:461-472 is disabled upstream); it is provided
        here because the underlying container supports it.
        """
        import jax.numpy as jnp

        elements = self._flush()
        if not 0 <= index < len(elements):
            raise IndexError(f"element index {index} out of range [0, {len(elements)})")
        return np.asarray(elements.get(jnp.asarray([index], jnp.int32))[0])

    def search(self, element, max_search: int = DEFAULT_MAX_SEARCH, num_elements: int = DEFAULT_NUM_ELEMENTS):
        return self.get_index().search(element, max_search, num_elements)
