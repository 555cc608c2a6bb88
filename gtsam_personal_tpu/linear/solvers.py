"""Linear solvers for the Gauss-Newton system (J^T J + damping) delta = -J^T r.

Two paths, mirroring the reference's MULTIFRONTAL vs ITERATIVE split
(nonlinear/NonlinearOptimizer.cpp:132-179):

- `solve_dense`: assemble the full normal equations and factorize — the
  analogue of GaussianFactorGraph::optimizeDensely (linear/GaussianFactorGraph
  .cpp:323). Right choice on TPU for small/medium D: one big MXU Cholesky.
- `solve_pcg`: matrix-free preconditioned conjugate gradient with a
  block-Jacobi preconditioner — the analogue of PCGSolver
  (linear/PCGSolver.h:55). Right choice for large sparse problems; the matvec
  is vmapped gather/scatter (SURVEY.md §7 "Linear solve" path 2).

All solvers take damping (lambda, optionally scaled by diag/diag-blocks) so LM
reuses them directly.
"""

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax as _lax


def _einsum_hp(spec, *ops):
    """einsum pinned to full-f32 accumulation: TPU default matmul
    precision is bf16, which destroys normal-equations conditioning."""
    return jnp.einsum(spec, *ops, precision=_lax.Precision.HIGHEST)


from gtsam_personal_tpu.core.values import (Layout, tree_add, tree_axpy, tree_scale,
                                            tree_sub, tree_vdot, tree_zeros_like)
from gtsam_personal_tpu.linear.linearize import GaussianGraph


def solve_dense(lin: GaussianGraph, layout: Layout, lam=0.0,
                diag_damping: Optional[jnp.ndarray] = None):
    """Solve (H + lam * D) delta = -g densely. D = I or diag(diag_damping)."""
    H, g = lin.assemble_dense(layout)
    D = layout.total_dim
    if diag_damping is not None:
        damp = lam * diag_damping
    else:
        damp = lam * jnp.ones((D,), dtype=H.dtype)
    Hd = H + jnp.diag(damp)
    # Cholesky with tiny jitter for numerical PSD safety
    delta = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(Hd, lower=True), -g)
    return layout.unflatten(delta)


def _block_jacobi_preconditioner(lin: GaussianGraph, lam, diag_damping):
    """Return M^{-1} apply function from per-variable (d,d) Hessian blocks."""
    blocks = lin.hessian_block_diagonal()
    inv_chol = {}
    for g, B in blocks.items():
        d = B.shape[-1]
        eye = jnp.eye(d, dtype=B.dtype)
        if diag_damping is not None:
            B = B + lam * jax.vmap(jnp.diag)(diag_damping[g])
        else:
            B = B + lam * eye
        B = B + 1e-10 * eye
        inv_chol[g] = jax.vmap(lambda M: jnp.linalg.cholesky(M))(B)

    def apply(r):
        out = {}
        for g, L in inv_chol.items():
            out[g] = jax.vmap(
                lambda Lk, rk: jax.scipy.linalg.cho_solve((Lk, True), rk)
            )(L, r[g])
        return out

    return apply


def make_damped_matvec(lin: GaussianGraph, lam, diag_damping):
    def matvec(x):
        hx = lin.hessian_vector_product(x)
        if diag_damping is not None:
            return jax.tree.map(lambda h, xg, dg: h + lam * dg * xg, hx, x, diag_damping)
        return jax.tree.map(lambda h, xg: h + lam * xg, hx, x)
    return matvec


def pcg(matvec, b, precond=None, maxiter=250, tol=1e-8, x0=None):
    """Preconditioned CG for A x = b over tangent-dict pytrees, jit-friendly
    (lax.while_loop with iteration cap + relative-residual tolerance).
    Pass x0 to warm-start (used by the incremental engine).

    Reference analogue: the templated CG loop in linear/iterative-inl.h."""
    if precond is None:
        precond = lambda r: r
    if x0 is None:
        x0 = tree_zeros_like(b)
        r0 = b  # b - A*0
    else:
        r0 = tree_sub(b, matvec(x0))
    z0 = precond(r0)
    p0 = z0
    rz0 = tree_vdot(r0, z0)
    bnorm = jnp.sqrt(tree_vdot(b, b))
    threshold = (tol * bnorm) ** 2

    def cond(state):
        k, x, r, z, p, rz = state
        return jnp.logical_and(k < maxiter, tree_vdot(r, r) > threshold)

    def body(state):
        k, x, r, z, p, rz = state
        Ap = matvec(p)
        pAp = tree_vdot(p, Ap)
        alpha = rz / jnp.where(pAp > 0, pAp, 1.0)
        alpha = jnp.where(pAp > 0, alpha, 0.0)
        x = tree_axpy(alpha, p, x)
        r = tree_axpy(-alpha, Ap, r)
        z = precond(r)
        rz_new = tree_vdot(r, z)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        p = tree_axpy(beta, p, z)
        return k + 1, x, r, z, p, rz_new

    _, x, r, _, _, _ = jax.lax.while_loop(cond, body, (0, x0, r0, z0, p0, rz0))
    return x


def solve_pcg(lin: GaussianGraph, lam=0.0, diag_damping=None,
              maxiter=250, tol=1e-8):
    """PCG solve of the (damped) normal equations with block-Jacobi
    preconditioning; returns the tangent-dict update delta."""
    b = tree_scale(lin.gradient_at_zero(), -1.0)
    matvec = make_damped_matvec(lin, lam, diag_damping)
    precond = _block_jacobi_preconditioner(lin, lam, diag_damping)
    return pcg(matvec, b, precond, maxiter=maxiter, tol=tol)
