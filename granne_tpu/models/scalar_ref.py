"""Scalar (sequential, heap-based) HNSW oracle.

A faithful *from-scratch Python* implementation of the reference's search and
build semantics (``/root/reference/src/index/mod.rs``), used as the
correctness oracle in tests:

* ``search_for_neighbors`` (:999-1037): candidate min-heap + bounded result
  max-heap + visited set, termination when the best open candidate is worse
  than the worst of a full result set;
* ``find_entrypoint`` (:984-997): ef=1 descent;
* sequential insertion with ``select_neighbors`` (:848-883),
  ``connect_nodes`` (:899-921), ``add_and_limit_neighbors`` (:923-959), the
  zero-element and duplicate-dead-node rules (:812-814, :827-832), the
  geometric layer schedule (:633-643), M/2 upper layers (:665-668), reverse
  reinsert at max_search/2 (:693-710), and the final prune pass (:789-796).

This is NOT the TPU path — it exists so the batched kernels can be tested
for parity on identical graphs, and to cross-check recall. Keep n small.
"""

from __future__ import annotations

import heapq
import math

import numpy as np

from ..index.schedule import num_elements_in_layer

EPS100 = 100.0 * np.finfo(np.float32).eps
UNUSED = -1


def angular_dist(a: np.ndarray, b: np.ndarray) -> float:
    return float(max(0.0, 1.0 - np.dot(a, b)))


def normalize_rows(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float32)
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    return np.where(n > 0, x / np.where(n > 0, n, 1), x).astype(np.float32)


def search_for_neighbors(adj, entrypoint, vectors, goal, max_search):
    """Exact reimplementation of the reference hot loop (mod.rs:999-1037).

    adj: int32[n, M] dense adjacency (-1 padding); returns [(id, dist)]
    ascending, at most max_search entries.
    """
    dist0 = angular_dist(vectors[entrypoint], goal)
    # res: bounded max-heap (python heapq is a min-heap; store negated dists)
    res: list = []  # (-dist, -id) so the root is the *worst* kept result
    pq: list = [(dist0, entrypoint)]
    visited = {entrypoint}

    def res_push(d, idx):
        if len(res) < max_search:
            heapq.heappush(res, (-d, -idx))
        elif (-d, -idx) > res[0]:
            heapq.heapreplace(res, (-d, -idx))

    while pq:
        d, idx = heapq.heappop(pq)
        if len(res) >= max_search and d > -res[0][0]:
            break
        res_push(d, idx)
        for nbr in adj[idx]:
            if nbr < 0:
                continue
            nbr = int(nbr)
            if nbr not in visited:
                visited.add(nbr)
                nd = angular_dist(vectors[nbr], goal)
                if len(res) < max_search or nd < -res[0][0]:
                    heapq.heappush(pq, (nd, nbr))

    out = sorted(((-negd, -negi) for negd, negi in res))
    return [(i, d) for d, i in out]


def find_entrypoint(layers, vectors, goal):
    ep = 0
    for adj in layers:
        r = search_for_neighbors(adj, ep, vectors, goal, 1)
        ep = r[0][0]
    return ep


def search(layers, vectors, goal, max_search, num_neighbors):
    """Full multi-layer search (mod.rs:963-982)."""
    if not layers:
        return []
    ep = find_entrypoint(layers[:-1], vectors, goal)
    res = search_for_neighbors(layers[-1], ep, vectors, goal, max_search)
    return res[:num_neighbors]


def select_neighbors(vectors, candidates, max_neighbors):
    """Reference heuristic (mod.rs:848-883); candidates sorted ascending."""
    if len(candidates) <= max_neighbors:
        return list(candidates)
    neighbors = []
    for j, d in candidates:
        if len(neighbors) >= max_neighbors:
            break
        vj = vectors[j]
        if all(d <= angular_dist(vectors[n], vj) for n, _ in neighbors):
            neighbors.append((j, d))
    return neighbors


class ScalarHnswBuilder:
    """Sequential builder mirroring GranneBuilder (singlethreaded semantics)."""

    def __init__(
        self,
        vectors: np.ndarray,
        num_neighbors: int = 30,
        max_search: int = 200,
        layer_multiplier: float = 15.0,
        reinsert_elements: bool = True,
        expected_num_elements: int | None = None,
    ):
        self.vectors = normalize_rows(vectors)
        self.M = num_neighbors
        self.max_search = max_search
        self.layer_multiplier = layer_multiplier
        self.reinsert = reinsert_elements
        self.expected = expected_num_elements
        self.layers: list[np.ndarray] = []  # int32[n_l, M]

    # -- internals ---------------------------------------------------------

    def _connect_nodes(self, layer, i, j, d, num_neighbors_limit=None):
        """mod.rs:899-921."""
        if i == j:
            return
        row = layer[i]
        for pos in range(len(row)):
            if row[pos] == UNUSED or row[pos] == j:
                row[pos] = j
                return
        self._add_and_limit(layer, i, [(j, d)], len(row))

    def _add_and_limit(self, layer, node_id, extra, num_neighbors):
        """mod.rs:923-959."""
        row = layer[node_id]
        neighbors = [int(x) for x in row if x != UNUSED]
        vi = self.vectors[node_id]
        candidates = [(n, angular_dist(self.vectors[n], vi)) for n in neighbors]
        candidates.extend(extra)
        candidates.sort(key=lambda t: t[1])
        kept = select_neighbors(self.vectors, candidates, num_neighbors)
        for k in range(len(row)):
            row[k] = kept[k][0] if k < len(kept) else UNUSED

    def _index_element(self, config_m, config_ms, prev_layers, layer, idx):
        """mod.rs:804-846."""
        v = self.vectors[idx]
        if angular_dist(v, v) > EPS100:
            return  # zero element
        ep_res = search(prev_layers, self.vectors, v, 1, 1)
        ep = ep_res[0][0] if ep_res else 0
        candidates = search_for_neighbors(layer, ep, self.vectors, v, config_ms)
        candidates = [(i, d) for i, d in candidates if i != idx]
        neighbors = select_neighbors(self.vectors, candidates, config_m)
        if len(neighbors) > config_m // 2 and neighbors[config_m // 2][1] < EPS100:
            return  # duplicate dead node
        if layer[idx][0] == UNUSED:
            for k, (n, _) in enumerate(neighbors[: layer.shape[1]]):
                layer[idx][k] = n
        else:
            for n, d in neighbors:
                self._connect_nodes(layer, idx, n, d)
        for n, d in neighbors:
            self._connect_nodes(layer, n, idx, d)

    def _index_elements(self, config_m, config_ms, num_elements, prev_layers, layer, reinsert):
        """mod.rs:716-802 (singlethreaded)."""
        already = 0 if reinsert else layer.shape[0]
        if not reinsert and layer.shape[0] < num_elements:
            grown = np.full((num_elements, self.M), UNUSED, np.int32)
            grown[: layer.shape[0]] = layer
            layer = grown
        order = range(layer.shape[0])
        if reinsert:
            order = reversed(order)
        else:
            order = range(already, layer.shape[0])
        for idx in order:
            self._index_element(config_m, config_ms, prev_layers, layer, idx)
        for i in range(layer.shape[0]):
            self._add_and_limit(layer, i, [], config_m)
        return layer

    def _index_layer(self, num_elements):
        """mod.rs:645-713."""
        total = max(self.expected or len(self.vectors), len(self.vectors))
        ideal = num_elements_in_layer(total, self.layer_multiplier, len(self.layers) - 1)
        if ideal <= self.layers[-1].shape[0]:
            return
        target = min(num_elements, ideal)
        m_eff = self.M if ideal >= total else max(1, self.M // 2)
        layer = self.layers.pop()
        prev = self.layers
        layer = self._index_elements(m_eff, self.max_search, target, prev, layer, False)
        if self.reinsert:
            layer = self._index_elements(
                m_eff, max(1, self.max_search // 2), target, prev, layer, True
            )
        self.layers.append(layer)

    # -- public ------------------------------------------------------------

    def build(self, num_elements: int | None = None):
        """mod.rs:374-402."""
        if num_elements is None:
            num_elements = len(self.vectors)
        if num_elements == 0:
            return
        if self.layers:
            self._index_layer(num_elements)
        while (self.layers[-1].shape[0] if self.layers else 0) < num_elements:
            if self.layers:
                self.layers.append(self.layers[-1].copy())
            else:
                self.layers.append(np.full((0, self.M), UNUSED, np.int32))
            self._index_layer(num_elements)

    def search(self, goal, max_search, num_neighbors):
        goal = normalize_rows(np.asarray(goal, np.float32)[None])[0]
        return search(self.layers, self.vectors, goal, max_search, num_neighbors)
