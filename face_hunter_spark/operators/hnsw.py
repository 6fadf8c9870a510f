"""Per-executor HNSW matcher — the reference's default ANN algorithm
(``algorithm: appr`` in config.yaml; nmslib HNSW built per process at
src/models/approximate_k_nearest_neighbors.py:37-62 with M=15,
efConstruction=100) re-implemented as a small pure-numpy HNSW
(Malkov & Yashunin 2016, the public algorithm), since nmslib/hnswlib
are not in this container.

Role in the engine: an ALTERNATIVE physical strategy behind the same
logical kNN-join interface as the broadcast GEMM and LSH matchers
(SURVEY.md §2.3).  The index is built ONCE PER EXECUTOR from the
broadcast gallery arrays (exactly like the reference builds its index
once per process) and queried per Arrow batch — zero shuffle, no
candidate join.  For the gallery sizes this engine broadcasts, the
bucketed-GEMM LSH path is usually faster wall-clock (BLAS beats a
Python graph walk); HNSW wins when the gallery grows to the point
where per-face exhaustive scoring dominates and sub-linear search
pays — which is why it exists as a strategy, not the default.

Deterministic: level draws come from a seeded SplitMix64 stream over
the insertion index, and all tie-breaks are by lowest node id.
"""

from __future__ import annotations

import heapq

import numpy as np

from .. import fakevision as _fv


class HNSWIndex:
    """Cosine-distance HNSW over a fixed matrix.

    Parameters mirror the reference's nmslib config: M=15,
    ef_construction=100 (approximate_k_nearest_neighbors.py:60).
    """

    def __init__(self, mat: np.ndarray, M: int = 15,
                 ef_construction: int = 100, seed: int = 42):
        self.mat = (mat / np.linalg.norm(mat, axis=1, keepdims=True)
                    ).astype(np.float32)
        self.M = M
        self.M0 = 2 * M
        self.ef_construction = ef_construction
        self.mL = 1.0 / np.log(M)
        n = len(self.mat)
        # deterministic level per node: SplitMix64 counter stream
        u = (_fv._splitmix64(np.arange(n, dtype=np.uint64)
                             + np.uint64(seed)) >> np.uint64(11)
             ).astype(np.float64) / float(1 << 53)
        self.levels = np.floor(-np.log(u + 1e-300) * self.mL).astype(np.int64)
        max_level = int(self.levels.max()) if n else 0
        # adjacency: per level, dict node -> np.ndarray of neighbors
        self.graph: list[dict[int, list[int]]] = [
            {} for _ in range(max_level + 1)
        ]
        self.entry = 0
        for i in range(n):
            self._insert(i)

    # ------------------------------------------------------------ build

    def _dist(self, q: np.ndarray, ids) -> np.ndarray:
        return 1.0 - self.mat[ids] @ q

    def _search_layer(self, q: np.ndarray, entry: int, ef: int,
                      level: int) -> list[tuple[float, int]]:
        """Beam search on one layer; returns up to ef (dist, id) pairs
        sorted ascending."""
        d0 = float(1.0 - self.mat[entry] @ q)
        visited = {entry}
        cand = [(d0, entry)]           # min-heap by distance
        best = [(-d0, entry)]          # max-heap of the ef closest
        adj = self.graph[level]
        while cand:
            d, node = heapq.heappop(cand)
            if d > -best[0][0]:
                break
            for nb in adj.get(node, ()):  # noqa: B909 (adj stable here)
                if nb in visited:
                    continue
                visited.add(nb)
                dn = float(1.0 - self.mat[nb] @ q)
                if len(best) < ef or dn < -best[0][0]:
                    heapq.heappush(cand, (dn, nb))
                    heapq.heappush(best, (-dn, nb))
                    if len(best) > ef:
                        heapq.heappop(best)
        out = sorted((-md, node) for md, node in best)
        return out

    def _insert(self, i: int) -> None:
        if i == 0:
            for lv in range(int(self.levels[0]) + 1):
                self.graph[lv][0] = []
            self.entry = 0
            return
        q = self.mat[i]
        lvl = int(self.levels[i])
        ep = self.entry
        top = int(self.levels[self.entry])
        # greedy descent above the insertion level
        for lv in range(top, lvl, -1):
            ep = self._search_layer(q, ep, 1, lv)[0][1]
        for lv in range(min(lvl, top), -1, -1):
            found = self._search_layer(q, ep, self.ef_construction, lv)
            m = self.M0 if lv == 0 else self.M
            neigh = [node for _, node in found[:m]]
            self.graph[lv][i] = list(neigh)
            for nb in neigh:
                links = self.graph[lv].setdefault(nb, [])
                links.append(i)
                if len(links) > m:
                    # prune to the m closest (ties -> lowest id)
                    ds = self._dist(self.mat[nb], np.asarray(links))
                    order = np.lexsort((np.asarray(links), ds))[:m]
                    self.graph[lv][nb] = [links[j] for j in order]
            ep = found[0][1]
        for lv in range(top + 1, lvl + 1):
            self.graph[lv][i] = []
        if lvl > top:
            self.entry = i

    # ----------------------------------------------------------- search

    def search(self, q: np.ndarray, k: int = 1,
               ef: int | None = None) -> tuple[np.ndarray, np.ndarray]:
        """One query vector -> (ids, cosine distances), ascending by
        (distance, id)."""
        ef = ef or max(self.ef_construction, k)
        qn = np.asarray(q, dtype=np.float32)
        qn = qn / np.linalg.norm(qn)
        ep = self.entry
        for lv in range(int(self.levels[self.entry]), 0, -1):
            ep = self._search_layer(qn, ep, 1, lv)[0][1]
        found = self._search_layer(qn, ep, ef, 0)[:k]
        ids = np.asarray([node for _, node in found], dtype=np.int64)
        ds = np.asarray([d for d, _ in found], dtype=np.float32)
        return ids, ds

    def search_batch(self, q: np.ndarray, k: int = 1,
                     ef: int | None = None) -> tuple[np.ndarray, np.ndarray]:
        """(B, dim) queries -> (B, k) ids and distances (padded with
        -1/inf when fewer than k reachable)."""
        out_ids = np.full((len(q), k), -1, dtype=np.int64)
        out_d = np.full((len(q), k), np.inf, dtype=np.float32)
        for b in range(len(q)):
            ids, ds = self.search(q[b], k, ef)
            out_ids[b, : len(ids)] = ids
            out_d[b, : len(ds)] = ds
        return out_ids, out_d


_INDEX_CACHE: dict[int, HNSWIndex] = {}


def executor_index(gallery_arrays, M: int = 15,
                   ef_construction: int = 100) -> tuple:
    """Per-executor lazy singleton over a broadcast's gallery arrays —
    the reference builds its nmslib index once per process
    (flask_api.py:40-45); here the broadcast id keys the cache so each
    Python worker builds the graph exactly once."""
    labels, mat, norms = gallery_arrays.value
    key = id(gallery_arrays)
    idx = _INDEX_CACHE.get(key)
    if idx is None:
        idx = HNSWIndex(mat, M=M, ef_construction=ef_construction)
        _INDEX_CACHE.clear()  # one live gallery per worker is the norm
        _INDEX_CACHE[key] = idx
    return labels, idx


def hnsw_score_batch(q: np.ndarray, labels: np.ndarray, idx: HNSWIndex,
                     distance_threshold: float, k: int = 1):
    """Batch scoring with link-semantics identical to the other
    matchers: nearest neighbor by (distance, gallery index), threshold
    else 'unknown'.  (k=1 is the reference default; majority voting for
    k>1 happens upstream where needed.)"""
    ids, ds = idx.search_batch(q, k=1)
    out_lab = np.full(len(q), "unknown", dtype=object)
    out_d = np.full(len(q), np.nan, dtype=np.float32)
    hit = (ids[:, 0] >= 0) & (ds[:, 0] < distance_threshold)
    out_lab[hit] = labels[ids[hit, 0]]
    out_d[hit] = ds[hit, 0]
    return out_lab, out_d
