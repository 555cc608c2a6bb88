"""Specialized bundle-adjustment engine: implicit Schur complement + PCG.

The reference's BA pipeline (SURVEY.md §3.2) eliminates landmarks per smart
factor via CameraSet::SchurComplement (geometry/CameraSet.h:175) or goes
matrix-free with RegularImplicitSchurFactor (slam/RegularImplicitSchurFactor.h:
y += F'(I - E P E') F x). This module lifts that algebra to the whole problem
as batched segment-sums over the observation array — the TPU-native form:

  Hcc xc  = segsum_cam(Jcam^T (Jcam xc))            (block-diag camera Hessian)
  W z     = segsum_cam(Jcam^T (Jp z[point]))        (camera-point coupling)
  S xc    = Hcc xc - W Hpp^{-1} W^T xc              (implicit Schur matvec)

solved by PCG with an exact per-camera block-Jacobi preconditioner of S, then
landmarks back-substituted in closed form (batched 3x3 Cholesky).

Cameras follow the reference's PinholeCamera<Cal3Bundler> 9-dof manifold
(pose 6 + calibration 3); the camera tangent is [pose xi, dcal].
Cheirality handling: observations behind the camera get zero weight
(reference analogue: TriangulationResult/cheirality degradation, SURVEY §5.3).
"""

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax as _lax

import os
_PRECISION = getattr(_lax.Precision, os.environ.get("GTSAM_TPU_MATMUL_PRECISION", "HIGHEST"))


def _einsum_hp(spec, *ops):
    """einsum pinned to full-f32 accumulation: TPU default matmul
    precision is bf16, which destroys normal-equations conditioning."""
    return jnp.einsum(spec, *ops, precision=_PRECISION)

import numpy as np

from gtsam_personal_tpu.geometry import se3, cameras as cam_geo
from gtsam_personal_tpu.sfm.bal import BalProblem


class BAState(NamedTuple):
    cam_poses: jnp.ndarray   # [C, 3, 4]
    cam_cals: jnp.ndarray    # [C, 3]  Cal3Bundler
    points: jnp.ndarray      # [P, 3]


class BAObservations(NamedTuple):
    cam: jnp.ndarray         # [M] int32
    point: jnp.ndarray       # [M] int32
    uv: jnp.ndarray          # [M, 2]


def state_from_bal(prob: BalProblem, dtype=None) -> "tuple[BAState, BAObservations]":
    cast = (lambda x: jnp.asarray(x, dtype=dtype)) if dtype else jnp.asarray
    return (BAState(cast(prob.cam_poses), cast(prob.cam_cals), cast(prob.points)),
            BAObservations(jnp.asarray(prob.obs_cam), jnp.asarray(prob.obs_point),
                           cast(prob.obs_uv)))


def _residual_one(pose, cal, point, uv):
    """Reprojection residual (reference: GeneralSFMFactor::evaluateError =
    camera.project(point) - measured, slam/GeneralSFMFactor.h:59)."""
    pred = cam_geo.project_point(pose, point, cal, "cal3bundler")
    return pred - uv


def _residual_local(deltas, pose, cal, point, uv):
    dc, dp = deltas  # camera tangent [9] = [pose xi, dcal], point tangent [3]
    pose2 = se3.retract(pose, dc[:6])
    cal2 = cal + dc[6:9]
    point2 = point + dp
    return _residual_one(pose2, cal2, point2, uv)


def linearize_ba(state: BAState, obs: BAObservations, mask_cheirality=True):
    """Batched residuals + Jacobians for every observation: one vmap."""
    dtype = state.points.dtype
    poses = state.cam_poses[obs.cam]
    cals = state.cam_cals[obs.cam]
    pts = state.points[obs.point]

    zeros = (jnp.zeros(9, dtype=dtype), jnp.zeros(3, dtype=dtype))

    def one(pose, cal, point, uv):
        r = _residual_local(zeros, pose, cal, point, uv)
        Jc, Jp = jax.jacfwd(_residual_local, argnums=0)(zeros, pose, cal, point, uv)
        return r, Jc, Jp

    r, Jc, Jp = jax.vmap(one)(poses, cals, pts, obs.uv)
    if mask_cheirality:
        depth = jax.vmap(cam_geo.depth_of)(poses, pts)
        w = (depth > 1e-6).astype(dtype)[:, None]
        r = r * w
        Jc = Jc * w[..., None]
        Jp = Jp * w[..., None]
    return r, Jc, Jp


def ba_error(state: BAState, obs: BAObservations, mask_cheirality=True):
    dtype = state.points.dtype
    poses = state.cam_poses[obs.cam]
    cals = state.cam_cals[obs.cam]
    pts = state.points[obs.point]
    r = jax.vmap(_residual_one)(poses, cals, pts, obs.uv)
    if mask_cheirality:
        depth = jax.vmap(cam_geo.depth_of)(poses, pts)
        r = r * (depth > 1e-6).astype(dtype)[:, None]
    return 0.5 * jnp.sum(r * r)


def _segsum(x, ids, n):
    return jax.ops.segment_sum(x, ids, num_segments=n)


def solve_ba_step(state: BAState, obs: BAObservations, lam,
                  cg_maxiter=100, cg_tol=1e-6):
    """One damped GN step: implicit-Schur PCG on cameras + landmark backsub.

    Returns (delta_cam [C,9], delta_point [P,3])."""
    C = state.cam_poses.shape[0]
    P = state.points.shape[0]
    dtype = state.points.dtype
    r, Jc, Jp = linearize_ba(state, obs)

    eye3 = jnp.eye(3, dtype=dtype)
    eye9 = jnp.eye(9, dtype=dtype)

    Hpp = _segsum(_einsum_hp("mij,mik->mjk", Jp, Jp), obs.point, P) + \
        (lam + 1e-12) * eye3
    Lpp = jnp.linalg.cholesky(Hpp)
    solve_pp = jax.vmap(lambda L, b: jax.scipy.linalg.cho_solve((L, True), b))

    Hcc = _segsum(_einsum_hp("mij,mik->mjk", Jc, Jc), obs.cam, C) + \
        (lam + 1e-12) * eye9
    gc = _segsum(_einsum_hp("mij,mi->mj", Jc, r), obs.cam, C)
    gp = _segsum(_einsum_hp("mij,mi->mj", Jp, r), obs.point, P)

    hp = solve_pp(Lpp, gp)  # Hpp^{-1} gp
    # reduced RHS: -gc + W Hpp^{-1} gp
    b = -gc + _segsum(_einsum_hp("mij,mi->mj", Jc,
                                 _einsum_hp("mij,mj->mi", Jp, hp[obs.point])),
                      obs.cam, C)

    def schur_matvec(xc):
        a = _einsum_hp("mij,mj->mi", Jc, xc[obs.cam])          # [M,2]
        t = _segsum(_einsum_hp("mij,mi->mj", Jp, a), obs.point, P)
        u = solve_pp(Lpp, t)
        bb = _einsum_hp("mij,mj->mi", Jp, u[obs.point])
        y = _segsum(_einsum_hp("mij,mi->mj", Jc, a - bb), obs.cam, C)
        return y + lam * xc

    # exact block-Jacobi preconditioner of S (per-camera diag blocks; exact
    # when each camera observes a track at most once — true for BAL)
    W_obs = _einsum_hp("mij,mik->mjk", Jc, Jp)                 # [M,9,3]
    HppInv_obs = solve_pp(Lpp[obs.point], jnp.broadcast_to(eye3, (obs.cam.shape[0], 3, 3)))
    Sdiag = Hcc - _segsum(_einsum_hp("mab,mbc,mdc->mad", W_obs, HppInv_obs, W_obs),
                          obs.cam, C)
    Ls = jnp.linalg.cholesky(Sdiag + 1e-10 * eye9)
    precond = lambda x: solve_pp(Ls, x)

    # PCG over [C, 9]
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)
    bnorm2 = jnp.vdot(b, b)
    thr = (cg_tol ** 2) * bnorm2

    def cond(s):
        k, x, rr, z, p, rz = s
        return jnp.logical_and(k < cg_maxiter, jnp.vdot(rr, rr) > thr)

    def body(s):
        k, x, rr, z, p, rz = s
        Ap = schur_matvec(p)
        pAp = jnp.vdot(p, Ap)
        alpha = jnp.where(pAp > 0, rz / jnp.where(pAp != 0, pAp, 1.0), 0.0)
        x = x + alpha * p
        rr = rr - alpha * Ap
        z = precond(rr)
        rz_new = jnp.vdot(rr, z)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        p = z + beta * p
        return k + 1, x, rr, z, p, rz_new

    _, xc, *_ = jax.lax.while_loop(cond, body, (0, x0, r0, z0, p0, rz0))

    # landmark back-substitution: xp = Hpp^{-1} (-gp - W^T xc)
    a = _einsum_hp("mij,mj->mi", Jc, xc[obs.cam])
    t = _segsum(_einsum_hp("mij,mi->mj", Jp, a), obs.point, P)
    xp = solve_pp(Lpp, -gp - t)
    return xc, xp


def retract_ba(state: BAState, xc, xp) -> BAState:
    new_poses = jax.vmap(se3.retract)(state.cam_poses, xc[:, :6])
    return BAState(new_poses, state.cam_cals + xc[:, 6:9], state.points + xp)


@partial(jax.jit, static_argnames=("cg_maxiter",))
def ba_try_step(state: BAState, obs: BAObservations, lam, cg_maxiter=100):
    xc, xp = solve_ba_step(state, obs, lam, cg_maxiter=cg_maxiter)
    new_state = retract_ba(state, xc, xp)
    return new_state, ba_error(new_state, obs)


def optimize_ba(state: BAState, obs: BAObservations,
                max_iterations=50, lambda_initial=1e-4, lambda_factor=10.0,
                lambda_upper=1e8, rel_tol=1e-6, abs_tol=1e-6, cg_maxiter=100,
                verbose=False):
    """LM outer loop on the BA problem (reference schedule, see
    nonlinear/optimizers.py)."""
    err = float(jax.jit(ba_error)(state, obs))
    lam = lambda_initial
    it = 0
    for it in range(max_iterations):
        accepted = False
        for _ in range(12):
            new_state, new_err = ba_try_step(
                state, obs, jnp.asarray(lam, dtype=state.points.dtype),
                cg_maxiter=cg_maxiter)
            new_err = float(new_err)
            if np.isfinite(new_err) and new_err < err:
                accepted = True
                break
            lam *= lambda_factor
            if lam > lambda_upper:
                return state, err, it
        if not accepted:
            return state, err, it
        if verbose:
            print(f"BA iter {it}: {err:.6g} -> {new_err:.6g} (lambda {lam:.2g})")
        abs_dec = err - new_err
        rel_dec = abs_dec / err if err > 0 else 1.0
        state, err = new_state, new_err
        lam = max(lam / lambda_factor, 1e-12)
        if abs_dec <= abs_tol or rel_dec <= rel_tol:
            return state, err, it + 1
    return state, err, max_iterations
