"""Feature-major generic linear layer — the BA-layout lesson applied to the
whole-graph Gaussian system.

TPU tiles pad the trailing two array dims to (8, 128), so the `[K, r, d]`
block layout of `linear/linearize.py` wastes up to 100x memory bandwidth on
the small (r, d) of pose-graph factors (r = d = 3 for SE(2)). This module
stores everything *feature-major*: Jacobian blocks as flat `[r*d, K]` arrays
(K on lanes), residuals `[r, K]`, and the tangent as `{group: [d, N]}`. All
tiny contractions (whitening, J·x, Jᵀ·u, JᵀJ blocks) unroll over the static
feature dims into elementwise chains on `[K]` slices — the same treatment
that took the BA path from 0.79 to 0.163 s/iter (PERFORMANCE.md).

Reference analogue: the hot loops of NonlinearFactorGraph::linearize
(nonlinear/NonlinearFactorGraph.cpp:252) and HessianFactor assembly
(linear/HessianFactor.cpp:458), re-laid-out for the TPU memory system.

Exact-match tested against the `[K, r, d]` path (tests/test_fm.py).
"""

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_personal_tpu.core import manifolds
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.linear.noise import NoiseModel, robust_weight


# ---------------------------------------------------------------------------
# flat feature-major kernels (generic r, c; unrolled at trace time)
# ---------------------------------------------------------------------------

def fm_matvec(A, x, r, c):
    """A [r*c, K] (row-major r x c) times x [c, K] -> [r, K]."""
    return jnp.stack(
        [sum(A[i * c + j] * x[j] for j in range(c)) for i in range(r)], axis=0)


def fm_matvec_T(A, y, r, c):
    """Aᵀ y: A [r*c, K] viewed (r, c), y [r, K] -> [c, K]."""
    return jnp.stack(
        [sum(A[i * c + j] * y[i] for i in range(r)) for j in range(c)], axis=0)


def fm_atb(A, B, r, ca, cb):
    """Aᵀ B: A [r*ca, K], B [r*cb, K] -> [ca*cb, K] (row-major ca x cb)."""
    return jnp.stack(
        [sum(A[i * ca + j] * B[i * cb + k] for i in range(r))
         for j in range(ca) for k in range(cb)], axis=0)


def fm_matmat(S, J, r, m, c):
    """S [r*m, K] (r x m) times J [m*c, K] (m x c) -> [r*c, K]."""
    return jnp.stack(
        [sum(S[i * m + l] * J[l * c + j] for l in range(m))
         for i in range(r) for j in range(c)], axis=0)


# ---------------------------------------------------------------------------
# whitening in feature-major layout
# ---------------------------------------------------------------------------

def _noise_fm(noise: NoiseModel, K: int):
    """Noise data with K moved to the last axis (flat for 'full')."""
    if noise.kind == "unit" or noise.data is None:
        return None
    d = noise.data
    if d.ndim >= 1 and d.shape[0] == K:
        # per-factor: [K, r] -> [r, K]; [K, r, r] -> [r*r, K]
        if noise.kind == "diag":
            return d.T
        return d.reshape(K, -1).T
    # shared: broadcast later
    if noise.kind == "diag":
        return d[:, None]
    return d.reshape(-1)[:, None]


def whiten_system_fm(noise: NoiseModel, r_fm, Js_fm, rdim: int,
                     dims: Sequence[int]):
    """Whiten residual [rdim, K] + Jacobians ([rdim*d_s, K]) feature-major,
    then apply sqrt IRLS weights for robust models. Same semantics as
    noise.whiten_system (reference: NoiseModel::WhitenSystem)."""
    nd = _noise_fm(noise, r_fm.shape[-1])
    if noise.kind == "unit":
        rw, Jw = r_fm, tuple(Js_fm)
    elif noise.kind == "constrained":
        # penalty form (see noise.whiten_system): finite rows whitened,
        # constrained rows scaled by sqrt(mu)
        from gtsam_personal_tpu.linear.noise import _constrained_weights
        w = _constrained_weights(nd) * jnp.where(nd > 0, 1.0,
                                                 jnp.sqrt(noise.k))
        rw = r_fm * w
        Jw = []
        for J, d in zip(Js_fm, dims):
            scale = jnp.repeat(w, d, axis=0) if w.shape[0] == rdim else w
            Jw.append(J * scale)
        Jw = tuple(Jw)
    elif noise.kind == "diag":
        rw = r_fm * nd
        Jw = []
        for J, d in zip(Js_fm, dims):
            # row i of the (rdim, d) block scales by nd[i]
            scale = jnp.repeat(nd, d, axis=0) if nd.shape[0] == rdim else nd
            Jw.append(J * scale)
        Jw = tuple(Jw)
    else:  # full sqrt-information S [rdim, rdim], flat [rdim*rdim, K or 1]
        S = jnp.broadcast_to(nd, (rdim * rdim, r_fm.shape[-1]))
        rw = fm_matvec(S, r_fm, rdim, rdim)
        Jw = tuple(fm_matmat(S, J, rdim, rdim, d) for J, d in zip(Js_fm, dims))
    if noise.robust != "none":
        e = jnp.sqrt(jnp.sum(rw * rw, axis=0))
        k = noise.k
        sw = jnp.sqrt(robust_weight(noise.robust, e, k))
        rw = rw * sw[None, :]
        Jw = tuple(J * sw[None, :] for J in Jw)
    return rw, Jw


# ---------------------------------------------------------------------------
# containers
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class FMBatch:
    """Whitened linearized factor batch, feature-major.

    Js[s]: [rdim * d_s, K] (row-major rdim x d_s blocks), r: [rdim, K],
    idx: [S, K] (slot-major so per-slot index rows are contiguous lanes)."""

    def __init__(self, groups: Tuple[str, ...], idx: jnp.ndarray,
                 Js: Tuple[jnp.ndarray, ...], r: jnp.ndarray):
        self.groups = tuple(groups)
        self.idx = idx            # [S, K]
        self.Js = tuple(Js)
        self.r = r                # [rdim, K]

    def tree_flatten(self):
        return (self.idx, self.Js, self.r), self.groups

    @classmethod
    def tree_unflatten(cls, groups, children):
        idx, Js, r = children
        return cls(groups, idx, Js, r)

    @property
    def rdim(self):
        return self.r.shape[0]

    @property
    def size(self):
        return self.r.shape[-1]


@jax.tree_util.register_pytree_node_class
class FMGraph:
    """Feature-major linear system min 0.5||J delta + r||². The tangent is
    `{group: [d, N]}`; all solver entry points mirror GaussianGraph's."""

    def __init__(self, batches, counts: Dict[str, int]):
        self.batches = list(batches)
        self.counts = dict(counts)

    def tree_flatten(self):
        return tuple(self.batches), tuple(sorted(self.counts.items()))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(list(children), dict(aux))

    def _dtype(self):
        return self.batches[0].r.dtype

    def zero_tangent(self, dtype=None):
        dtype = dtype or self._dtype()
        return {g: jnp.zeros((manifolds.get(g).dim, n), dtype=dtype)
                for g, n in self.counts.items()}

    def error_at_zero(self):
        return sum(0.5 * jnp.sum(b.r * b.r) for b in self.batches)

    def apply_J(self, delta):
        """u_b = sum_s J_s · delta[g_s][:, idx_s]  (lane gathers)."""
        outs = []
        for b in self.batches:
            rdim = b.rdim
            u = jnp.zeros_like(b.r)
            for s, g in enumerate(b.groups):
                d = manifolds.get(g).dim
                x = delta[g][:, b.idx[s]]           # [d, K] lane gather
                u = u + fm_matvec(b.Js[s], x, rdim, d)
            outs.append(u)
        return outs

    def apply_Jt(self, us):
        out = self.zero_tangent()
        for b, u in zip(self.batches, us):
            rdim = b.rdim
            for s, g in enumerate(b.groups):
                d = manifolds.get(g).dim
                c = fm_matvec_T(b.Js[s], u, rdim, d)  # [d, K]
                out[g] = out[g].at[:, b.idx[s]].add(c)
        return out

    def hessian_vector_product(self, delta):
        return self.apply_Jt(self.apply_J(delta))

    def gradient_at_zero(self):
        return self.apply_Jt([b.r for b in self.batches])

    def hessian_diagonal(self):
        out = self.zero_tangent()
        for b in self.batches:
            rdim = b.rdim
            for s, g in enumerate(b.groups):
                d = manifolds.get(g).dim
                d2 = jnp.stack([sum(b.Js[s][i * d + j] ** 2 for i in range(rdim))
                                for j in range(d)], axis=0)  # [d, K]
                out[g] = out[g].at[:, b.idx[s]].add(d2)
        return out

    def hessian_block_diagonal(self):
        """Per-variable (d, d) blocks of JᵀJ as flat [d*d, N] arrays."""
        out = {g: jnp.zeros((manifolds.get(g).dim ** 2, n), dtype=self._dtype())
               for g, n in self.counts.items()}
        for b in self.batches:
            rdim = b.rdim
            for s, g in enumerate(b.groups):
                d = manifolds.get(g).dim
                blk = fm_atb(b.Js[s], b.Js[s], rdim, d, d)  # [d*d, K]
                out[g] = out[g].at[:, b.idx[s]].add(blk)
        return out


# ---------------------------------------------------------------------------
# linearization (vmap along the LAST axis so intermediates stay [small, K])
# ---------------------------------------------------------------------------

def _to_fm(x):
    """[K, *ps] -> [*ps, K]."""
    return jnp.moveaxis(x, 0, -1)


def linearize_batch_fm(batch, values: Values) -> FMBatch:
    """One vmap over the lane axis: residual + slot Jacobians via jacfwd
    through the retraction, whitened — all intermediates feature-major."""
    ms = [manifolds.get(g) for g in batch.groups]
    rdim = batch.rdim
    dims = [m.dim for m in ms]
    idx_fm = batch.idx.T                                  # [S, K]
    pts_fm = tuple(_to_fm(values[g])[..., batch.idx[:, s]]
                   for s, g in enumerate(batch.groups))
    meas_fm = jax.tree.map(_to_fm, batch.meas)
    dtype = pts_fm[0].dtype

    def res_local(deltas, points, meas):
        xs = tuple(m.retract(p, dd) for m, p, dd in zip(ms, points, deltas))
        return batch.residual_fn(xs, meas)

    zeros = tuple(jnp.zeros((m.dim,), dtype=dtype) for m in ms)

    def one(points, meas):
        r = res_local(zeros, points, meas)
        Js = jax.jacfwd(res_local, argnums=0)(zeros, points, meas)
        return r, Js

    # NOTE: vmap along the last axis everywhere; no in_axes=None broadcasts
    # (TPU nested-vmap-around-jacfwd corruption — CLAUDE.md).
    r, Js = jax.vmap(one, in_axes=(-1, -1), out_axes=(-1, -1))(pts_fm, meas_fm)
    K = r.shape[-1]
    Js_flat = tuple(J.reshape(rdim * d, K) for J, d in zip(Js, dims))
    rw, Jw = whiten_system_fm(batch.noise, r, Js_flat, rdim, dims)
    return FMBatch(batch.groups, idx_fm, Jw, rw)


def linearize_fm(graph, values: Values) -> FMGraph:
    """Feature-major linearization of the whole graph (hot-path counterpart
    of linearize.linearize; same math, TPU-friendly layout)."""
    return FMGraph([linearize_batch_fm(b, values) for b in graph.batches],
                   values.counts())


# ---------------------------------------------------------------------------
# tangent conversion + PCG on fm tangents
# ---------------------------------------------------------------------------

def tangent_to_fm(delta: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    return {g: v.T for g, v in delta.items()}


def tangent_from_fm(delta_fm: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    return {g: v.T for g, v in delta_fm.items()}


def _block_jacobi_fm(lin: FMGraph, lam, diag_damping=None, blocks=None):
    """Block-Jacobi M⁻¹ from fm Hessian blocks. Blocks are inverted once per
    solve ([N, d, d] vmap-inv, small) and applied per iteration as unrolled
    fm sym-matvecs. Pass `blocks` to reuse precomputed hessian_block_diagonal
    output."""
    if blocks is None:
        blocks = lin.hessian_block_diagonal()
    inv_fm = {}
    for g, Bf in blocks.items():
        d = manifolds.get(g).dim
        N = Bf.shape[-1]
        B = Bf.T.reshape(N, d, d)
        eye = jnp.eye(d, dtype=Bf.dtype)
        if diag_damping is not None:
            B = B + lam * jax.vmap(jnp.diag)(diag_damping[g].T)
        else:
            B = B + lam * eye
        B = B + 1e-10 * eye
        inv = jnp.linalg.inv(B)                        # [N, d, d]
        inv_fm[g] = inv.reshape(N, d * d).T            # [d*d, N]

    def apply(r):
        return {g: fm_matvec(inv_fm[g], r[g], manifolds.get(g).dim,
                             manifolds.get(g).dim)
                for g in inv_fm}

    return apply


def solve_pcg_fm(lin: FMGraph, lam=0.0, diag_damping=None, maxiter=250,
                 tol=1e-8, x0=None):
    """PCG on the damped normal equations, all-fm. Returns a standard
    `{g: [N, d]}` tangent dict (transposed back at the end)."""
    from gtsam_personal_tpu.linear.solvers import pcg
    b = jax.tree.map(lambda x: -x, lin.gradient_at_zero())
    if diag_damping is not None:
        dd = diag_damping

        def matvec(x):
            hx = lin.hessian_vector_product(x)
            return jax.tree.map(lambda h, xg, dg: h + lam * dg * xg, hx, x, dd)
    else:
        def matvec(x):
            hx = lin.hessian_vector_product(x)
            return jax.tree.map(lambda h, xg: h + lam * xg, hx, x)
    precond = _block_jacobi_fm(lin, lam, diag_damping)
    x = pcg(matvec, b, precond, maxiter=maxiter, tol=tol, x0=x0)
    return tangent_from_fm(x)


# ---------------------------------------------------------------------------
# partitioned-Schur assembly values from fm batches
# ---------------------------------------------------------------------------

def schur_values_fm(lin: FMGraph, plan):
    """Per-batch scatter VALUES for schur.solve_partitioned's flat-scatter
    assembly, computed with unrolled fm contractions instead of [K, r, d]
    einsums. Returns (fvals, rvals, svals, srvals) concatenated arrays in the
    plan's fixed iteration order (batches -> slot pairs -> k-major ravel)."""
    dtype = lin._dtype()
    fvals, rvals, svals, srvals = [], [], [], []
    for b, bp in zip(lin.batches, plan.batch_plans):
        rdim = b.rdim
        dims = [manifolds.get(g).dim for g in b.groups]
        nslots = len(b.groups)
        fsel, ssel = bp["front_sel"], bp["sep_sel"]
        Jf = [b.Js[s][:, fsel] for s in range(nslots)]
        Js_ = [b.Js[s][:, ssel] for s in range(nslots)]
        rf, rs = b.r[:, fsel], b.r[:, ssel]
        for s in range(nslots):
            ds = dims[s]
            # -Jᵀ r in k-major ravel order: [d, K] -> [K, d] -> ravel
            rvals.append(-fm_matvec_T(Jf[s], rf, rdim, ds).T.ravel())
            srvals.append(-fm_matvec_T(Js_[s], rs, rdim, ds).T.ravel())
            for t in range(nslots):
                dt = dims[t]
                fvals.append(fm_atb(Jf[s], Jf[t], rdim, ds, dt).T.ravel())
                svals.append(fm_atb(Js_[s], Js_[t], rdim, ds, dt).T.ravel())
    cat = lambda xs: (jnp.concatenate(xs) if xs
                      else jnp.zeros((0,), dtype=dtype))
    return cat(fvals), cat(rvals), cat(svals), cat(srvals)
