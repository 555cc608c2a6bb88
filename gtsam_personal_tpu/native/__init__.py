"""ctypes bindings for the native symbolic-analysis library.

Compiles `symbolic.cpp` on first use (g++ -O3 -shared) and caches the .so
next to the source. Every entry point has a pure-numpy fallback so the
framework works without a compiler; when the native library is present, the
host-side symbolic phase (BFS partitioning, orderings, factor classification)
runs at C++ speed — the analogue of the reference's native CCOLAMD/elimination
machinery (SURVEY.md §2.2).
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libgtsam_tpu_native.so")
_SRC = os.path.join(_DIR, "symbolic.cpp")

_lib = None


def _build():
    subprocess.run(["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                   check=True, capture_output=True)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        I64 = ctypes.POINTER(ctypes.c_int64)
        U8 = ctypes.POINTER(ctypes.c_uint8)
        lib.bfs_levels.restype = ctypes.c_int64
        lib.bfs_levels.argtypes = [ctypes.c_int64, I64, I64, U8,
                                   ctypes.c_int64, I64]
        lib.min_degree_order.restype = None
        lib.min_degree_order.argtypes = [ctypes.c_int64, I64, I64, I64]
        lib.min_degree_order_grouped.restype = None
        lib.min_degree_order_grouped.argtypes = [ctypes.c_int64, I64, I64,
                                                 I64, I64]
        lib.classify_factors.restype = ctypes.c_int64
        lib.classify_factors.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                         I64, I64, I64]
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def _ptr(a, typ=ctypes.c_int64):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def bfs_levels(indptr, indices, mask, start):
    """BFS levels over the masked CSR subgraph; -1 for unreached."""
    n = len(indptr) - 1
    lib = get_lib()
    level = np.empty(n, dtype=np.int64)
    if lib:
        indptr = np.ascontiguousarray(indptr, dtype=np.int64)
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        m = np.ascontiguousarray(mask, dtype=np.uint8)
        lib.bfs_levels(n, _ptr(indptr), _ptr(indices),
                       _ptr(m, ctypes.c_uint8), int(start), _ptr(level))
        return level
    # numpy fallback
    level[:] = -1
    if not mask[start]:
        return level
    level[start] = 0
    frontier = np.array([start])
    l = 0
    while frontier.size:
        l += 1
        nxt = []
        for u in frontier:
            nbr = indices[indptr[u]:indptr[u + 1]]
            nbr = nbr[mask[nbr] & (level[nbr] < 0)]
            level[nbr] = l
            nxt.append(nbr)
        frontier = np.unique(np.concatenate(nxt)) if nxt else np.array([], dtype=np.int64)
    return level


def min_degree_order(indptr, indices):
    """Fill-reducing minimum-degree elimination ordering (COLAMD analogue)."""
    n = len(indptr) - 1
    lib = get_lib()
    perm = np.empty(n, dtype=np.int64)
    if lib:
        indptr = np.ascontiguousarray(indptr, dtype=np.int64)
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        lib.min_degree_order(n, _ptr(indptr), _ptr(indices), _ptr(perm))
        return perm
    # numpy fallback: simple greedy min-degree without clique update
    deg = np.diff(indptr).astype(np.int64)
    alive = np.ones(n, dtype=bool)
    for k in range(n):
        u = int(np.argmin(np.where(alive, deg, np.iinfo(np.int64).max)))
        perm[k] = u
        alive[u] = False
        nbr = indices[indptr[u]:indptr[u + 1]]
        deg[nbr[alive[nbr]]] -= 1
    return perm


def min_degree_order_grouped(indptr, indices, group):
    """Group-constrained min-degree: all group-g vertices eliminated before
    any group-(g+1) vertex, fill-reducing within a group (reference:
    Ordering::ColamdConstrainedLast/First, inference/Ordering.h:112-139)."""
    n = len(indptr) - 1
    lib = get_lib()
    perm = np.empty(n, dtype=np.int64)
    group = np.ascontiguousarray(group, dtype=np.int64)
    if lib:
        indptr = np.ascontiguousarray(indptr, dtype=np.int64)
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        lib.min_degree_order_grouped(n, _ptr(indptr), _ptr(indices),
                                     _ptr(group), _ptr(perm))
        return perm
    # numpy fallback: greedy (group, degree) selection without clique update
    deg = np.diff(indptr).astype(np.int64)
    alive = np.ones(n, dtype=bool)
    big = np.iinfo(np.int64).max // 4
    for k in range(n):
        score = np.where(alive, group * big + deg, np.iinfo(np.int64).max)
        u = int(np.argmin(score))
        perm[k] = u
        alive[u] = False
        nbr = indices[indptr[u]:indptr[u + 1]]
        deg[nbr[alive[nbr]]] -= 1
    return perm


def classify_factors(vids, part_of):
    """Per-factor interior part ids; raises if a factor spans two interiors."""
    vids = np.ascontiguousarray(vids, dtype=np.int64)
    part_of = np.ascontiguousarray(part_of, dtype=np.int64)
    K, S = vids.shape
    lib = get_lib()
    fpart = np.empty(K, dtype=np.int64)
    if lib:
        bad = lib.classify_factors(K, S, _ptr(vids), _ptr(part_of), _ptr(fpart))
        if bad:
            raise ValueError(f"factor {bad - 1} spans two interior parts")
        return fpart
    parts = part_of[vids]
    fpart = parts.max(axis=1)
    mn = np.where(parts < 0, fpart[:, None], parts).min(axis=1)
    if not np.all((mn == fpart) | (fpart < 0)):
        raise ValueError("factor spans two interior parts")
    return fpart
