"""Gaussian conditionals + GaussianBayesNet: sequential elimination and
backsubstitution.

Reference parity: GaussianConditional (linear/GaussianConditional.h:200
`solve(parents)` backsubstitution), GaussianBayesNet (linear/GaussianBayesNet
.h:123 `optimize`, :203 `optimizeGradientSearch`, :249-257
`backSubstitute(Transpose)`), EliminateQR (linear/JacobianFactor.cpp:804) and
EliminateCholesky (linear/HessianFactor.cpp:516), and the sampling path
(GaussianBayesNet::sample).

TPU-native design: the Bayes net is ONE upper-triangular factor R (plus rhs d
and a variable permutation) over the flat tangent space, produced either by
permuted Cholesky of the assembled normal equations (`method="cholesky"`) or
by dense QR of the whitened Jacobian stack (`method="qr"` — never squares the
condition number; the high-accuracy route, and the exact route for hard
constraints). Per-variable `GaussianConditional` views slice R — the
conditional p(x_i | parents) is rows [off_i : off_i+d_i] of R. All solves are
triangular solves on the MXU rather than per-clique pointer walks.
"""

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from gtsam_personal_tpu.core import manifolds
from gtsam_personal_tpu.core.values import Layout
from gtsam_personal_tpu.linear.linearize import GaussianGraph


class GaussianConditional:
    """View of one variable's rows of the Bayes net: p(x_f | parents) with
    R_ff x_f + sum_p S_fp x_p = d_f (reference: GaussianConditional.h)."""

    def __init__(self, bn: "GaussianBayesNet", pos: int):
        self.bn = bn
        self.group, self.index, self.off, self.dim = bn.order[pos]

    @property
    def R(self):
        o, d = self.off, self.dim
        return self.bn.Rmat[o:o + d, o:o + d]

    @property
    def S(self):
        """Parent block row (everything to the right of the frontal)."""
        o, d = self.off, self.dim
        return self.bn.Rmat[o:o + d, o + d:]

    @property
    def d(self):
        o, d = self.off, self.dim
        return self.bn.dvec[o:o + d]

    def solve(self, parents_flat: jnp.ndarray) -> jnp.ndarray:
        """x_f = R_ff^{-1} (d_f - S x_parents): one backsubstitution step
        (reference: GaussianConditional::solve, GaussianConditional.h:200)."""
        rhs = self.d - self.S @ parents_flat
        return jax.scipy.linalg.solve_triangular(self.R, rhs, lower=False)


class GaussianBayesNet:
    """Result of sequential elimination: R x_perm = d over the flat tangent
    space, plus the elimination order [(group, index, offset, dim)]."""

    def __init__(self, Rmat: jnp.ndarray, dvec: jnp.ndarray,
                 order: List[Tuple[str, int, int, int]], layout: Layout,
                 perm: np.ndarray):
        self.Rmat = Rmat          # [D, D] upper triangular (permuted coords)
        self.dvec = dvec          # [D]
        self.order = order        # elimination order with offsets
        self.layout = layout
        self.perm = perm          # permuted position -> original flat index
        self._iperm = np.argsort(perm)

    # -- solves (reference: GaussianBayesNet.h:123,203,249-257) --------------
    def _unpermute(self, x_p: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return self.layout.unflatten(x_p[jnp.asarray(self._iperm)])

    def _permute(self, delta: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        return self.layout.flatten(delta)[jnp.asarray(self.perm)]

    def optimize(self) -> Dict[str, jnp.ndarray]:
        """Backsubstitution solve R x = d (reference: optimize)."""
        x = jax.scipy.linalg.solve_triangular(self.Rmat, self.dvec, lower=False)
        return self._unpermute(x)

    def optimize_gradient_search(self) -> Dict[str, jnp.ndarray]:
        """Steepest-descent (Cauchy) point of 0.5||Rx - d||^2: the exact
        minimizer along the gradient direction — Dogleg's second anchor
        (reference: optimizeGradientSearch, GaussianBayesNet.h:203)."""
        g = self.Rmat.T @ self.dvec            # descent direction (-gradient)
        Rg = self.Rmat @ g
        alpha = jnp.vdot(g, g) / jnp.maximum(jnp.vdot(Rg, Rg), 1e-300)
        return self._unpermute(alpha * g)

    def back_substitute(self, rhs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """Solve R x = rhs (reference: backSubstitute)."""
        x = jax.scipy.linalg.solve_triangular(
            self.Rmat, self._permute(rhs), lower=False)
        return self._unpermute(x)

    def back_substitute_transpose(self, rhs: Dict[str, jnp.ndarray]):
        """Solve R^T x = rhs (reference: backSubstituteTranspose)."""
        x = jax.scipy.linalg.solve_triangular(
            self.Rmat.T, self._permute(rhs), lower=True)
        return self._unpermute(x)

    def sample(self, key, mean: Optional[Dict[str, jnp.ndarray]] = None):
        """Draw x ~ N(mean, (R^T R)^{-1}) by backsubstituting white noise
        (reference: GaussianBayesNet::sample)."""
        eps = jax.random.normal(key, (self.Rmat.shape[0],),
                                dtype=self.Rmat.dtype)
        x = jax.scipy.linalg.solve_triangular(self.Rmat, self.dvec + eps,
                                              lower=False)
        out = self._unpermute(x)
        if mean is not None:
            out = jax.tree.map(jnp.add, out, mean)
        return out

    def log_determinant(self):
        """sum log |R_ii| (reference: GaussianBayesNet::logDeterminant)."""
        return jnp.sum(jnp.log(jnp.abs(jnp.diag(self.Rmat))))

    def error(self, delta: Dict[str, jnp.ndarray]):
        r = self.Rmat @ self._permute(delta) - self.dvec
        return 0.5 * jnp.vdot(r, r)

    # -- conditional access ---------------------------------------------------
    def __len__(self):
        return len(self.order)

    def conditional(self, pos: int) -> GaussianConditional:
        return GaussianConditional(self, pos)

    def optimize_stepwise(self) -> Dict[str, jnp.ndarray]:
        """Variable-at-a-time backsubstitution through the conditionals —
        exercising GaussianConditional::solve exactly like the reference's
        BayesNet::optimize loop (slow path, used by tests)."""
        D = self.Rmat.shape[0]
        x = jnp.zeros((D,), dtype=self.Rmat.dtype)
        for pos in reversed(range(len(self.order))):
            c = self.conditional(pos)
            o, d = c.off, c.dim
            x = x.at[o:o + d].set(c.solve(x[o + d:]))
        return self._unpermute(x)


def _make_order(layout: Layout, ordering):
    """ordering: list of (group, index) or None (natural). Returns
    (order list with offsets, perm array)."""
    if ordering is None:
        ordering = [(g, i) for g in layout.groups
                    for i in range(layout.counts[g])]
    order = []
    perm = np.zeros(layout.total_dim, dtype=np.int64)
    off = 0
    for (g, i) in ordering:
        d = layout.dims[g]
        src = layout.var_offset(g, i)
        perm[off:off + d] = np.arange(src, src + d)
        order.append((g, i, off, d))
        off += d
    assert off == layout.total_dim, "ordering must cover every variable once"
    return order, perm


def eliminate_sequential(lin: GaussianGraph, layout: Layout,
                         ordering: Optional[Sequence[Tuple[str, int]]] = None,
                         lam: float = 0.0,
                         method: str = "cholesky") -> GaussianBayesNet:
    """Sequential (dense) elimination of the linearized system into a
    GaussianBayesNet (reference: eliminateSequential,
    inference/EliminateableFactorGraph.h:117).

    method="cholesky": permuted Cholesky of the normal equations
      (EliminateCholesky, linear/HessianFactor.cpp:516).
    method="qr": dense QR of the whitened Jacobian stack — never forms J^T J,
      so conditioning is cond(J) not cond(J)^2
      (EliminateQR, linear/JacobianFactor.cpp:804). Damping appends
      sqrt(lam)·I rows, matching LM's buildDampedSystem.
    """
    order, perm = _make_order(layout, ordering)
    permj = jnp.asarray(perm)
    if method == "cholesky":
        H, g = lin.assemble_dense(layout)
        D = layout.total_dim
        Hp = H[permj][:, permj] + lam * jnp.eye(D, dtype=H.dtype)
        L = jnp.linalg.cholesky(Hp)
        R = L.T
        d = jax.scipy.linalg.solve_triangular(L, -g[permj], lower=True)
        return GaussianBayesNet(R, d, order, layout, perm)
    if method == "qr":
        A, b = dense_jacobian(lin, layout)
        D = layout.total_dim
        Ap = A[:, permj]
        # damping rows sqrt(lam)·I (zero rows when lam == 0 — harmless, and
        # keeps the shape static so a traced lam works under jit)
        Ap = jnp.concatenate(
            [Ap, jnp.sqrt(jnp.asarray(lam, dtype=A.dtype))
             * jnp.eye(D, dtype=A.dtype)], axis=0)
        b = jnp.concatenate([b, jnp.zeros((D,), dtype=b.dtype)])
        Q, R = jnp.linalg.qr(Ap, mode="reduced")
        d = -(Q.T @ b)
        # fix signs so diag(R) > 0 (canonical form; solve is sign-invariant)
        s = jnp.sign(jnp.where(jnp.diag(R) == 0, 1.0, jnp.diag(R)))
        return GaussianBayesNet(s[:, None] * R, s * d, order, layout, perm)
    raise ValueError(f"unknown elimination method {method!r}")


def dense_jacobian(lin: GaussianGraph, layout: Layout):
    """Stack the whole whitened system into dense A [rows, D], b [rows]
    (reference: GaussianFactorGraph::jacobian())."""
    rows = sum(b.r.shape[0] * b.r.shape[1] for b in lin.batches)
    D = layout.total_dim
    dtype = lin.batches[0].r.dtype
    A = jnp.zeros((rows, D), dtype=dtype)
    bvec = jnp.zeros((rows,), dtype=dtype)
    row0 = 0
    for b in lin.batches:
        K, rdim = b.r.shape
        rr = row0 + jnp.arange(K * rdim).reshape(K, rdim)
        bvec = bvec.at[rr].set(b.r)
        for s, g in enumerate(b.groups):
            d = layout.dims[g]
            cols = (layout.offsets[g] + b.idx[:, s] * d)[:, None] + jnp.arange(d)
            A = A.at[rr[:, :, None], cols[:, None, :]].add(b.Js[s])
        row0 += K * rdim
    return A, bvec


def solve_qr(lin: GaussianGraph, layout: Layout, lam: float = 0.0):
    """Dense QR solve of the (damped) least-squares system — the
    high-accuracy option (reference: EliminateQR + optimize)."""
    return eliminate_sequential(lin, layout, lam=lam, method="qr").optimize()


# ---------------------------------------------------------------------------
# hard equality constraints — the exact route for Constrained noise models
# (reference: the special-pivot QR in NoiseModel::Constrained::QR,
# linear/NoiseModel.cpp, which eliminates infinite-information rows first)
# ---------------------------------------------------------------------------

def split_constrained(graph, values, layout: Layout):
    """Linearize `graph`, pulling the sigma==0 rows of constrained-noise
    batches out as exact linear equality constraints.

    Returns (lin, E, e): `lin` is the whitened GaussianGraph of all soft rows
    (constrained rows zeroed), and E delta + e = 0 stacks the hard rows
    densely ([m, D], [m])."""
    from gtsam_personal_tpu.core.graph import FactorGraph
    from gtsam_personal_tpu.linear.linearize import (GaussianGraph,
                                                     LinearBatch,
                                                     linearize_batch)
    from gtsam_personal_tpu.linear.noise import (NoiseModel,
                                                 _constrained_weights)
    soft_batches = []
    E_rows, e_rows = [], []
    for b in graph.batches:
        if b.noise.kind != "constrained":
            soft_batches.append(linearize_batch(b, values))
            continue
        sig = np.asarray(b.noise.data)
        if sig.ndim != 1:
            raise ValueError("split_constrained requires shared per-batch "
                             "sigmas for constrained models")
        cmask = sig == 0.0
        # raw linearization (unit noise), then whiten soft rows manually
        raw = linearize_batch(
            type(b)(b.name, b.residual_fn, b.groups, b.rdim, b.idx, b.meas,
                    NoiseModel("unit")), values)
        w = np.asarray(_constrained_weights(jnp.asarray(sig)))
        wsoft = jnp.asarray(np.where(cmask, 0.0, w))
        soft_batches.append(LinearBatch(
            raw.groups, raw.idx,
            tuple(J * wsoft[None, :, None] for J in raw.Js),
            raw.r * wsoft[None, :]))
        # hard rows -> dense E, e
        K = raw.r.shape[0]
        crow = np.where(cmask)[0]
        for ci in crow:
            Ei = jnp.zeros((K, layout.total_dim), dtype=raw.r.dtype)
            for s, g in enumerate(raw.groups):
                d = layout.dims[g]
                cols = (layout.offsets[g] + raw.idx[:, s] * d)[:, None] \
                    + jnp.arange(d)
                Ei = Ei.at[jnp.arange(K)[:, None], cols].add(raw.Js[s][:, ci, :])
            E_rows.append(Ei)
            e_rows.append(raw.r[:, ci])
    counts = {g: layout.counts[g] for g in layout.groups}
    lin = GaussianGraph(soft_batches, counts)
    if E_rows:
        E = jnp.concatenate(E_rows, axis=0)
        e = jnp.concatenate(e_rows, axis=0)
    else:
        E = jnp.zeros((0, layout.total_dim))
        e = jnp.zeros((0,))
    return lin, E, e


def solve_equality_constrained(lin: GaussianGraph, layout: Layout,
                               E: jnp.ndarray, e: jnp.ndarray,
                               lam: float = 0.0):
    """Exact solve of  min ||J x + r||^2 + lam||x||^2  s.t.  E x + e = 0
    by the nullspace method: x = x0 + Z y with E x0 = -e (min-norm) and
    Z an orthonormal nullspace basis of E (full row rank assumed, like the
    reference's constrained QR)."""
    A, b = dense_jacobian(lin, layout)
    D = layout.total_dim
    m = E.shape[0]
    if m == 0:
        return solve_qr(lin, layout, lam)
    # complete orthogonal decomposition via QR of E^T: E^T = Q [R; 0]
    Q, R = jnp.linalg.qr(E.T, mode="complete")      # Q [D, D], R [D, m]
    R1 = R[:m, :]
    # particular solution: x0 = Q1 R1^{-T} (-e)
    y0 = jax.scipy.linalg.solve_triangular(R1.T, -e, lower=True)
    x0 = Q[:, :m] @ y0
    Z = Q[:, m:]                                    # nullspace basis
    if lam > 0.0:
        A = jnp.concatenate([A, jnp.sqrt(lam) * jnp.eye(D, dtype=A.dtype)])
        b = jnp.concatenate([b, jnp.zeros((D,), dtype=b.dtype)])
    AZ = A @ Z
    rhs = -(b + A @ x0)
    y, *_ = jnp.linalg.lstsq(AZ, rhs)
    return layout.unflatten(x0 + Z @ y)
