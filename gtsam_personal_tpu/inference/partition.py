"""Host-side graph partitioning: nested-dissection-style vertex separators.

The reference orders elimination with COLAMD/METIS (inference/Ordering.h:93-188)
and keeps a pointer-based elimination tree. The TPU-native design instead
partitions the variable graph into p independent interior blocks plus a vertex
separator (SURVEY.md §2.11 P7, §7 "Distribution"): interiors eliminate as one
batched dense operation; the separator forms the reduced system. The same
structure is the multi-device sharding layout (each part -> a device).

Partitioning is recursive BFS level-structure bisection (a lightweight stand-in
for METIS nested dissection, adequate for SLAM/SfM graphs); it runs once per
graph structure on the host in numpy/scipy.
"""

from typing import Dict, List, Tuple

import numpy as np
import scipy.sparse as sp

from gtsam_personal_tpu.core import manifolds


class VarIndex:
    """Flatten (group, index) variables to contiguous ints (host-side)."""

    def __init__(self, counts: Dict[str, int]):
        self.groups = sorted(counts)
        self.counts = dict(counts)
        self.offsets = {}
        off = 0
        for g in self.groups:
            self.offsets[g] = off
            off += counts[g]
        self.num_vars = off
        self.dims = np.zeros(off, dtype=np.int64)
        self.group_of = np.empty(off, dtype=object)
        self.index_of = np.zeros(off, dtype=np.int64)
        for g in self.groups:
            d = manifolds.get(g).dim
            o, n = self.offsets[g], counts[g]
            self.dims[o:o + n] = d
            self.group_of[o:o + n] = g
            self.index_of[o:o + n] = np.arange(n)

    def vid(self, group: str, idx):
        return self.offsets[group] + np.asarray(idx)


def build_adjacency(graph, counts: Dict[str, int]) -> Tuple[VarIndex, sp.csr_matrix]:
    """Variable adjacency from factor connectivity (host, numpy)."""
    vi = VarIndex(counts)
    rows, cols = [], []
    for b in graph.batches:
        ids = [np.asarray(vi.vid(g, np.asarray(b.idx)[:, s]))
               for s, g in enumerate(b.groups)]
        for s in range(len(ids)):
            for t in range(s + 1, len(ids)):
                rows.append(ids[s]); cols.append(ids[t])
    n = vi.num_vars
    if rows:
        r = np.concatenate(rows); c = np.concatenate(cols)
        data = np.ones(len(r), dtype=np.int8)
        A = sp.coo_matrix((data, (r, c)), shape=(n, n))
        A = (A + A.T).tocsr()
        A.data[:] = 1
    else:
        A = sp.csr_matrix((n, n), dtype=np.int8)
    return vi, A


def _bfs_levels(A: sp.csr_matrix, mask: np.ndarray, start: int) -> np.ndarray:
    """BFS level of each node within the masked subgraph (-1 outside/unreached).

    Dispatches to the native C++ traversal (gtsam_personal_tpu/native)."""
    from gtsam_personal_tpu import native
    return native.bfs_levels(A.indptr.astype(np.int64),
                             A.indices.astype(np.int64), mask, start)


def _pseudo_peripheral(A, mask, seed):
    """Double-BFS heuristic for a far-apart start node."""
    lv = _bfs_levels(A, mask, seed)
    reach = np.where((lv >= 0) & mask)[0]
    far = reach[np.argmax(lv[reach])]
    return far


def bisect(A: sp.csr_matrix, nodes: np.ndarray):
    """Split `nodes` into (partA, partB, separator) by BFS level structure.

    The separator is the set of B-side nodes adjacent to A, so removing it
    disconnects A from B-without-separator."""
    mask = np.zeros(A.shape[0], dtype=bool)
    mask[nodes] = True
    start = _pseudo_peripheral(A, mask, nodes[0])
    lv = _bfs_levels(A, mask, start)
    reach = nodes[lv[nodes] >= 0]
    unreached = nodes[lv[nodes] < 0]  # disconnected components -> side A
    if reach.size == 0:
        return nodes, np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    # split at median level of reached nodes
    levels = lv[reach]
    mid = np.median(levels)
    sideA = reach[levels <= mid]
    sideB = reach[levels > mid]
    if sideB.size == 0:
        # tiny/degenerate: split arbitrarily in half
        h = reach.size // 2
        sideA, sideB = reach[:h], reach[h:]
    # separator: B nodes adjacent to A
    inA = np.zeros(A.shape[0], dtype=bool)
    inA[sideA] = True
    sep_mask = np.zeros(A.shape[0], dtype=bool)
    indptr, indices = A.indptr, A.indices
    for u in sideB:
        nbr = indices[indptr[u]:indptr[u + 1]]
        if np.any(inA[nbr]):
            sep_mask[u] = True
    sep = sideB[sep_mask[sideB]]
    rest = sideB[~sep_mask[sideB]]
    sideA = np.concatenate([sideA, unreached])
    return sideA, rest, sep


class Partition:
    """p interior parts + global separator (two-level nested dissection)."""

    def __init__(self, parts: List[np.ndarray], separator: np.ndarray, vi: VarIndex):
        self.parts = parts
        self.separator = separator
        self.vi = vi
        self.part_of = np.full(vi.num_vars, -1, dtype=np.int64)  # -1 = separator
        for k, p in enumerate(parts):
            self.part_of[p] = k

    @property
    def num_parts(self):
        return len(self.parts)

    def stats(self):
        sizes = [p.size for p in self.parts]
        return {"parts": len(self.parts), "max_part": max(sizes) if sizes else 0,
                "min_part": min(sizes) if sizes else 0, "separator": self.separator.size}


def partition_graph(graph, counts: Dict[str, int], max_part_size: int = 256) -> Partition:
    """Recursively bisect until every interior part <= max_part_size.

    All separator vertices (from every level) join one global separator —
    a two-level elimination structure: batched interior elimination, then a
    single reduced separator solve."""
    vi, A = build_adjacency(graph, counts)
    all_nodes = np.arange(vi.num_vars)
    parts: List[np.ndarray] = []
    seps: List[np.ndarray] = []
    stack = [all_nodes]
    while stack:
        nodes = stack.pop()
        if nodes.size == 0:
            continue
        if nodes.size <= max_part_size:
            parts.append(np.sort(nodes))
            continue
        a, b, s = bisect(A, nodes)
        if s.size == 0 and (a.size == 0 or b.size == 0):
            # could not split (clique-ish); accept as one part
            parts.append(np.sort(nodes))
            continue
        seps.append(s)
        stack.append(a)
        stack.append(b)
    separator = np.sort(np.concatenate(seps)) if seps else np.array([], dtype=np.int64)
    return Partition(parts, separator, vi)
