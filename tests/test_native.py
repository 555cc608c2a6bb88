"""Native symbolic library tests: C++ vs numpy fallback agreement + ordering
quality (reference analogue: testOrdering / CCOLAMD behavior)."""

import numpy as np
import scipy.sparse as sp
import pytest

from gtsam_personal_tpu import native


def ring_graph(n):
    rows = np.concatenate([np.arange(n), np.arange(n)])
    cols = np.concatenate([(np.arange(n) + 1) % n, (np.arange(n) - 1) % n])
    A = sp.coo_matrix((np.ones(2 * n), (rows, cols)), shape=(n, n)).tocsr()
    return A


def test_native_lib_builds():
    assert native.get_lib(), "native library failed to build"


def test_bfs_levels_ring():
    A = ring_graph(10)
    mask = np.ones(10, dtype=bool)
    lv = native.bfs_levels(A.indptr.astype(np.int64), A.indices.astype(np.int64),
                           mask, 0)
    assert lv[0] == 0
    assert lv[5] == 5
    assert lv[9] == 1


def test_bfs_respects_mask():
    A = ring_graph(10)
    mask = np.ones(10, dtype=bool)
    mask[3] = False
    mask[8] = False
    lv = native.bfs_levels(A.indptr.astype(np.int64), A.indices.astype(np.int64),
                           mask, 0)
    assert lv[3] == -1 and lv[8] == -1
    assert lv[5] == -1 or lv[5] > 0  # 5 reachable only the long way (blocked)


def test_min_degree_order_is_permutation():
    A = ring_graph(50)
    perm = native.min_degree_order(A.indptr.astype(np.int64),
                                   A.indices.astype(np.int64))
    assert np.array_equal(np.sort(perm), np.arange(50))


def test_min_degree_reduces_fill_vs_natural():
    """On a 2D grid graph, minimum degree should produce far less fill than
    natural ordering (the point of fill-reducing orderings)."""
    n = 12
    N = n * n
    rows, cols = [], []
    for i in range(n):
        for j in range(n):
            u = i * n + j
            if i + 1 < n:
                rows += [u, u + n]; cols += [u + n, u]
            if j + 1 < n:
                rows += [u, u + 1]; cols += [u + 1, u]
    A = sp.coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(N, N)).tocsr()

    def fill_of(order):
        adj = [set(A.indices[A.indptr[u]:A.indptr[u + 1]]) for u in range(N)]
        pos = np.empty(N, dtype=int)
        pos[order] = np.arange(N)
        fill = 0
        elim = set()
        for u in order:
            nbrs = [v for v in adj[u] if v not in elim]
            for a in range(len(nbrs)):
                for b in range(a + 1, len(nbrs)):
                    if nbrs[b] not in adj[nbrs[a]]:
                        adj[nbrs[a]].add(nbrs[b]); adj[nbrs[b]].add(nbrs[a])
                        fill += 1
            elim.add(u)
        return fill

    md = native.min_degree_order(A.indptr.astype(np.int64),
                                 A.indices.astype(np.int64))
    f_md = fill_of(list(md))
    f_nat = fill_of(list(range(N)))
    assert f_md < 0.7 * f_nat, (f_md, f_nat)


def test_classify_factors():
    vids = np.array([[0, 1], [1, 2], [2, 3]])
    part_of = np.array([0, 0, -1, 1])
    fpart = native.classify_factors(vids, part_of)
    assert list(fpart) == [0, 0, 1]
    with pytest.raises(ValueError):
        native.classify_factors(np.array([[0, 3]]), part_of)
