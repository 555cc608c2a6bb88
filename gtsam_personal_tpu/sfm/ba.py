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
landmarks back-substituted in closed form.

All per-observation quantities are FLAT [M, k] arrays with the small matrix
algebra unrolled (sfm/ba_kernels.py) — [M, a, b] shapes would be padded to
(8,128) tiles on TPU and waste ~100x bandwidth.

Cameras follow the reference's PinholeCamera<Cal3Bundler> 9-dof manifold
(pose 6 + calibration 3); the camera tangent is [pose xi, dcal].
Cheirality handling: observations behind the camera get zero weight
(reference analogue: TriangulationResult degradation, SURVEY §5.3).
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_personal_tpu.geometry import se3, cameras as cam_geo
from gtsam_personal_tpu.sfm.bal import BalProblem
from gtsam_personal_tpu.sfm import ba_kernels as bk


class BAState(NamedTuple):
    cam_poses: jnp.ndarray   # [C, 3, 4]
    cam_cals: jnp.ndarray    # [C, 3]  Cal3Bundler
    points: jnp.ndarray      # [P, 3]


class BAObservations(NamedTuple):
    cam: jnp.ndarray         # [M] int32
    point: jnp.ndarray       # [M] int32
    uv: jnp.ndarray          # [M, 2]


def state_from_bal(prob: BalProblem, dtype=None):
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
    """Batched residuals + Jacobians for every observation in one vmap.

    Returns r [M,2], Jc [M,18] (row-major 2x9), Jp [M,6] (row-major 2x3)."""
    dtype = state.points.dtype
    poses = state.cam_poses[obs.cam]
    cals = state.cam_cals[obs.cam]
    pts = state.points[obs.point]

    zeros = (jnp.zeros(9, dtype=dtype), jnp.zeros(3, dtype=dtype))

    def one(pose, cal, point, uv):
        r = _residual_local(zeros, pose, cal, point, uv)
        Jc, Jp = jax.jacfwd(_residual_local, argnums=0)(zeros, pose, cal, point, uv)
        return r, Jc.reshape(18), Jp.reshape(6)

    r, Jc, Jp = jax.vmap(one)(poses, cals, pts, obs.uv)
    if mask_cheirality:
        depth = jax.vmap(cam_geo.depth_of)(poses, pts)
        w = (depth > 1e-6).astype(dtype)[:, None]
        r = r * w
        Jc = Jc * w
        Jp = Jp * w
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


def _gather_fm(state: BAState, obs: BAObservations):
    """Feature-major gathers: [small, M] arrays whose trailing dim is the big
    observation axis, so TPU (8,128) tiling pads at most 2-3x. The batch-major
    [M,3,4] / [M,18] layouts of the functions above pad up to ~85x (the
    measured tile-padding tax: ba_error dropped 22.4ms -> ~2ms at
    Ladybug-1723 scale after this change; tools/profile_ba_fm.py)."""
    posesT = state.cam_poses.transpose(1, 2, 0)[:, :, obs.cam]   # [3,4,M]
    calsT = state.cam_cals.T[:, obs.cam]                          # [3,M]
    ptsT = state.points.T[:, obs.point]                           # [3,M]
    return posesT, calsT, ptsT, obs.uv.T


def ba_error_fm(state: BAState, obs: BAObservations, mask_cheirality=True):
    """Feature-major total reprojection error (same value as ba_error)."""
    dtype = state.points.dtype
    posesT, calsT, ptsT, uvT = _gather_fm(state, obs)
    r = jax.vmap(_residual_one, in_axes=(-1, -1, -1, -1), out_axes=-1)(
        posesT, calsT, ptsT, uvT)
    if mask_cheirality:
        depth = jax.vmap(cam_geo.depth_of, in_axes=(-1, -1), out_axes=-1)(
            posesT, ptsT)
        r = r * (depth > 1e-6).astype(dtype)[None, :]
    return 0.5 * jnp.sum(r * r)


def linearize_ba_fm(state: BAState, obs: BAObservations, mask_cheirality=True):
    """Feature-major batched linearization: rT [2,M], JcT [18,M], JpT [6,M].

    Same math as linearize_ba (vmapped jacfwd through the SE(3) retraction +
    Cal3Bundler projection), with the observation axis kept last end-to-end."""
    dtype = state.points.dtype
    posesT, calsT, ptsT, uvT = _gather_fm(state, obs)
    zeros = (jnp.zeros(9, dtype=dtype), jnp.zeros(3, dtype=dtype))

    def one(pose, cal, point, uv):
        r = _residual_local(zeros, pose, cal, point, uv)
        Jc, Jp = jax.jacfwd(_residual_local, argnums=0)(zeros, pose, cal,
                                                        point, uv)
        return r, Jc.reshape(18), Jp.reshape(6)

    r, Jc, Jp = jax.vmap(one, in_axes=(-1, -1, -1, -1), out_axes=-1)(
        posesT, calsT, ptsT, uvT)
    if mask_cheirality:
        depth = jax.vmap(cam_geo.depth_of, in_axes=(-1, -1), out_axes=-1)(
            posesT, ptsT)
        w = (depth > 1e-6).astype(dtype)[None, :]
        r = r * w
        Jc = Jc * w
        Jp = Jp * w
    return r, Jc, Jp


def _segsum(x, ids, n):
    return jax.ops.segment_sum(x, ids, num_segments=n)


def pcg(matvec, b, precond, maxiter, tol):
    """Preconditioned CG on an arbitrary array shape (vdot over all elements).
    Shared by every BA solver variant (obs-major, feature-major, cam-major,
    bucketed). Guards: alpha=0 on non-positive curvature, safe divisions."""
    x0 = jnp.zeros_like(b)
    z0 = precond(b)
    rz0 = jnp.vdot(b, z0)
    thr = (tol ** 2) * jnp.vdot(b, b)

    def cond(s):
        k, x, rr, z, p, rz = s
        return jnp.logical_and(k < maxiter, jnp.vdot(rr, rr) > thr)

    def body(s):
        k, x, rr, z, p, rz = s
        Ap = matvec(p)
        pAp = jnp.vdot(p, Ap)
        alpha = jnp.where(pAp > 0, rz / jnp.where(pAp != 0, pAp, 1.0), 0.0)
        x = x + alpha * p
        rr = rr - alpha * Ap
        z = precond(rr)
        rz_new = jnp.vdot(rr, z)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        p = z + beta * p
        return k + 1, x, rr, z, p, rz_new

    _, x, *_ = jax.lax.while_loop(cond, body, (0, x0, b, z0, z0, rz0))
    return x


def solve_ba_step(state: BAState, obs: BAObservations, layout, lam,
                  cg_maxiter=100, cg_tol=1e-6):
    """One damped GN step: implicit-Schur PCG on cameras + landmark backsub,
    computed over the dual dense layouts (sfm/ba_layout.py) — no scatters or
    small-table gathers anywhere in the CG loop.

    Returns (delta_cam [C,9], delta_point [P,3])."""
    C, P, Q, T = layout.C, layout.P, layout.Q, layout.T
    dtype = state.points.dtype
    r, Jc, Jp = linearize_ba(state, obs)

    es = lambda spec, *ops: jnp.einsum(spec, *ops, precision=jax.lax.Precision.HIGHEST)

    Jc_cm = layout.to_cam_major(Jc).reshape(C, Q, 2, 9)
    r_cm = layout.to_cam_major(r)                       # [C, Q, 2]
    Jp_pm = layout.to_point_major(Jp).reshape(P, T, 2, 3)
    r_pm = layout.to_point_major(r)                     # [P, T, 2]

    # landmark blocks (flat 3x3) + closed-form inverse
    Hpp = es("ptij,ptik->pjk", Jp_pm, Jp_pm).reshape(P, 9)
    Hpp = bk.add_scaled_identity_33(Hpp, lam + 1e-10)
    HppInv = bk.sym33_inv(Hpp)

    gc = es("cqij,cqi->cj", Jc_cm, r_cm)                # [C, 9]
    gp = es("ptij,pti->pj", Jp_pm, r_pm)                # [P, 3]

    hp = bk.sym33_matvec(HppInv, gp)
    b = -gc + es("cqij,cqi->cj", Jc_cm,
                 layout.perm_point_to_cam(es("ptij,pj->pti", Jp_pm, hp)))

    def schur_matvec(xc):
        a = es("cqij,cj->cqi", Jc_cm, xc)               # [C, Q, 2]
        ap = layout.perm_cam_to_point(a)                # [P, T, 2]
        t = es("ptij,pti->pj", Jp_pm, ap)               # [P, 3]
        u = bk.sym33_matvec(HppInv, t)
        bb = es("ptij,pj->pti", Jp_pm, u)               # [P, T, 2]
        bc = layout.perm_point_to_cam(bb)               # [C, Q, 2]
        y = es("cqij,cqi->cj", Jc_cm, a - bc)
        return y + lam * xc

    # block-Jacobi preconditioner of S: per-camera 9x9 blocks
    # (exact when each camera observes a track at most once — true for BAL).
    # Built in flat obs-order + one segment_sum: this runs once per step, and
    # the flat [M, k] stacks compile/run far better than 4-D einsums here.
    Hcc = es("cqij,cqik->cjk", Jc_cm, Jc_cm)            # [C, 9, 9]
    W = bk.atb(Jc, Jp, 2, 9, 3)                         # [M, 27] (9x3)
    Hi = jnp.concatenate([HppInv, jnp.zeros((1, 9), dtype=dtype)])[
        jnp.minimum(obs.point, P - 1)]                  # [M, 9]
    T1 = jnp.stack([
        sum(W[:, i * 3 + j] * Hi[:, j * 3 + k] for j in range(3))
        for i in range(9) for k in range(3)
    ], axis=1)                                          # [M, 27] = W Hpp^-1
    G = jnp.stack([
        sum(T1[:, i * 3 + k] * W[:, l * 3 + k] for k in range(3))
        for i in range(9) for l in range(9)
    ], axis=1)                                          # [M, 81]
    Gc = _segsum(G, obs.cam, C).reshape(C, 9, 9)
    eye9 = jnp.eye(9, dtype=dtype)
    Ls = bk.safe_chol_blocks(Hcc - Gc, lam)
    cho_apply = jax.vmap(lambda L, x: jax.scipy.linalg.cho_solve((L, True), x))
    precond = lambda x: cho_apply(Ls, x)

    xc = pcg(schur_matvec, b, precond, cg_maxiter, cg_tol)

    # landmark back-substitution: xp = Hpp^{-1} (-gp - W^T xc)
    a = es("cqij,cj->cqi", Jc_cm, xc)
    t = es("ptij,pti->pj", Jp_pm, layout.perm_cam_to_point(a))
    xp = bk.sym33_matvec(HppInv, -gp - t)
    return xc, xp


def solve_ba_step_fm(state: BAState, obs: BAObservations, layout, lam,
                     cg_maxiter=100, cg_tol=1e-6):
    """Feature-major variant of the Schur-PCG step: all large arrays are laid
    out [small-feature-dims, BIG] so TPU tiling pads at most ~2x (the
    [C, Q, 2, 9]-style layouts of solve_ba_step pad ~50x), and every small
    contraction is UNROLLED into elementwise multiply-adds on the VPU — exact
    fp32, immune to MXU bf16 lowering. Same math as solve_ba_step.

    Arrays: Jc4 [2][9] of [C, Q], Jp4 [2][3] of [T, P], Hpp/HppInv [9, P],
    gc/x [9, C], gp/u [3, P]."""
    C, P, Q, T = layout.C, layout.P, layout.Q, layout.T
    dtype = state.points.dtype
    rT0, JcT0, JpT0 = linearize_ba_fm(state, obs)       # [2,M], [18,M], [6,M]

    zcol = lambda x: jnp.concatenate(
        [x, jnp.zeros(x.shape[:-1] + (1,), dtype=x.dtype)], axis=-1)
    JcT = zcol(JcT0)                                    # [18, M+1]
    JpT = zcol(JpT0)                                    # [6, M+1]
    rT = zcol(rT0)                                      # [2, M+1]

    Jc4 = JcT[:, layout.g_cam].reshape(2, 9, C, Q)
    r_cm = rT[:, layout.g_cam].reshape(2, C, Q)
    g_pt_tp = layout.g_pt.reshape(P, T).T               # [T, P]
    Jp4 = JpT[:, g_pt_tp].reshape(2, 3, T, P)
    r_pm = rT[:, g_pt_tp]                               # [2, T, P]

    # unrolled small contractions (elementwise on [C,Q] / [T,P] planes)
    def cam_apply(x):                                   # [9,C] -> a [2,C,Q]
        return jnp.stack([
            sum(Jc4[i, j] * x[j][:, None] for j in range(9)) for i in range(2)])

    def cam_reduce(u):                                  # [2,C,Q] -> [9,C]
        return jnp.stack([
            sum(jnp.sum(Jc4[i, j] * u[i], axis=-1) for i in range(2))
            for j in range(9)])

    def pt_reduce(ap):                                  # [2,T,P] -> [3,P]
        return jnp.stack([
            sum(jnp.sum(Jp4[i, k] * ap[i], axis=0) for i in range(2))
            for k in range(3)])

    def pt_apply(u):                                    # [3,P] -> [2,T,P]
        return jnp.stack([
            sum(Jp4[i, k] * u[k][None, :] for k in range(3)) for i in range(2)])

    Hpp = jnp.stack([
        sum(jnp.sum(Jp4[i, k] * Jp4[i, l], axis=0) for i in range(2))
        for k in range(3) for l in range(3)])           # [9, P]
    Hpp = bk.add_scaled_identity_33_T(Hpp, lam + 1e-10)
    HppInv = bk.sym33_inv_T(Hpp)                        # [9, P]

    gc = cam_reduce(r_cm)                               # [9, C]
    gp = pt_reduce(r_pm)                                # [3, P]

    def cam_to_point(x_cq):                             # [2, C, Q] -> [2, T, P]
        flat = jnp.concatenate([x_cq.reshape(2, C * Q),
                                jnp.zeros((2, 1), dtype=dtype)], axis=1)
        return flat[:, layout.p2c_tp]

    def point_to_cam(x_tp):                             # [2, T, P] -> [2, C, Q]
        flat = jnp.concatenate([x_tp.reshape(2, T * P),
                                jnp.zeros((2, 1), dtype=dtype)], axis=1)
        return flat[:, layout.c2p_tp].reshape(2, C, Q)

    hp = bk.sym33_matvec_T(HppInv, gp)
    b = -gc + cam_reduce(point_to_cam(pt_apply(hp)))    # [9, C]

    def schur_matvec(x):                                # x [9, C]
        a = cam_apply(x)                                # [2, C, Q]
        t = pt_reduce(cam_to_point(a))                  # [3, P]
        u = bk.sym33_matvec_T(HppInv, t)
        bc = point_to_cam(pt_apply(u))
        y = cam_reduce(a - bc)
        return y + lam * x

    # block-Jacobi preconditioner (one-time per step; feature-major form:
    # W = Jc^T Jp per obs as [27, M] planes, G = W Hpp^-1 W^T as [81, M])
    Hcc = jnp.stack([
        sum(jnp.sum(Jc4[i, j] * Jc4[i, k], axis=-1) for i in range(2))
        for j in range(9) for k in range(9)]).T.reshape(C, 9, 9)
    Wt = [sum(JcT0[9 * i + a] * JpT0[3 * i + b] for i in range(2))
          for a in range(9) for b in range(3)]          # [27] of [M]
    Hi = HppInv[:, obs.point]                           # [9, M]
    T1 = [sum(Wt[3 * a + b] * Hi[3 * b + c] for b in range(3))
          for a in range(9) for c in range(3)]          # [27] of [M]
    G = jnp.stack([
        sum(T1[3 * a + c] * Wt[3 * d + c] for c in range(3))
        for a in range(9) for d in range(9)], axis=-1)  # [M, 81]
    Gc = _segsum(G, obs.cam, C).reshape(C, 9, 9)
    eye9 = jnp.eye(9, dtype=dtype)
    Ls = bk.safe_chol_blocks(Hcc - Gc, lam)
    cho_apply = jax.vmap(lambda L, x: jax.scipy.linalg.cho_solve((L, True), x))
    precond = lambda x: cho_apply(Ls, x.T).T            # x [9, C]

    xc = pcg(schur_matvec, b, precond, cg_maxiter, cg_tol)

    t = pt_reduce(cam_to_point(cam_apply(xc)))
    xp = bk.sym33_matvec_T(HppInv, -gp - t)
    return xc.T, xp.T


def linearize_ba_cm(state: BAState, obs: BAObservations, layout):
    """Cam-major batched linearization: r [2,C,Q], Jc [2,9,C,Q], Jp [2,3,C,Q].

    The observation-major paths gather 12 pose/cal floats per observation
    (~10M gathered elements at Ladybug scale — the measured cost of
    linearize_ba); in cam-major layout the camera quantities BROADCAST over
    each camera's Q slots and only the 3 point coordinates are gathered
    (pt_of_cm). Outputs land directly in the layout the Schur-CG solver
    consumes — no g_cam relayout pass. Dead slots carry zero (cam_mask)."""
    C, P, Q = layout.C, layout.P, layout.Q
    CQ = C * Q
    dtype = state.points.dtype
    # CRITICAL: camera data is broadcast-TILED to the full slot axis and the
    # vmap runs flat over C*Q with NO in_axes=None. A nested vmap with
    # broadcast (None) axes lowers WRONG on TPU: Jacobians come back with
    # bf16-level corruption (measured 1e-2 relative at every scale —
    # tools/ + PERFORMANCE.md). broadcast_to is free until the consumer reads.
    posesT = jnp.broadcast_to(state.cam_poses.transpose(1, 2, 0)[:, :, :, None],
                              (3, 4, C, Q)).reshape(3, 4, CQ)
    calsT = jnp.broadcast_to(state.cam_cals.T[:, :, None],
                             (3, C, Q)).reshape(3, CQ)
    pts_pad = jnp.concatenate([state.points.T,
                               jnp.zeros((3, 1), dtype=dtype)], axis=1)
    pts_cm = pts_pad[:, layout.pt_of_cm]                 # [3, CQ]
    uv_pad = jnp.concatenate([obs.uv.T, jnp.zeros((2, 1), dtype=dtype)], axis=1)
    uv_cm = uv_pad[:, layout.g_cam]                      # [2, CQ]
    zeros = (jnp.zeros(9, dtype=dtype), jnp.zeros(3, dtype=dtype))

    def one(pose, cal, point, uv):
        r = _residual_local(zeros, pose, cal, point, uv)
        Jc, Jp = jax.jacfwd(_residual_local, argnums=0)(zeros, pose, cal,
                                                        point, uv)
        depth = cam_geo.depth_of(pose, point)
        return r, Jc, Jp, depth

    r, Jc, Jp, depth = jax.vmap(one, in_axes=(-1, -1, -1, -1),
                                out_axes=(-1, -1, -1, -1))(
        posesT, calsT, pts_cm, uv_cm)
    w = (depth > 1e-6).astype(dtype) * layout.cam_mask
    return ((r * w).reshape(2, C, Q), (Jc * w).reshape(2, 9, C, Q),
            (Jp * w).reshape(2, 3, C, Q))


def solve_ba_step_cm(state: BAState, obs: BAObservations, layout, lam,
                     cg_maxiter=100, cg_tol=1e-6):
    """Cam-major-native Schur-PCG step: linearization lands directly in the
    [·,·,C,Q] solver layout (linearize_ba_cm), the point side is ONE fixed
    permutation away, and the block-Jacobi preconditioner's per-camera
    reduction is a dense sum over Q (no segment_sum). Same math as
    solve_ba_step / solve_ba_step_fm."""
    C, P, Q, T = layout.C, layout.P, layout.Q, layout.T
    dtype = state.points.dtype
    r_cm, Jc4, Jp_cm = linearize_ba_cm(state, obs, layout)

    def cam_to_point(x_cq):                             # [k, C, Q] -> [k, T, P]
        k = x_cq.shape[0]
        flat = jnp.concatenate([x_cq.reshape(k, C * Q),
                                jnp.zeros((k, 1), dtype=dtype)], axis=1)
        return flat[:, layout.p2c_tp]

    def point_to_cam(x_tp):                             # [k, T, P] -> [k, C, Q]
        k = x_tp.shape[0]
        flat = jnp.concatenate([x_tp.reshape(k, T * P),
                                jnp.zeros((k, 1), dtype=dtype)], axis=1)
        return flat[:, layout.c2p_tp].reshape(k, C, Q)

    # point-major copies of the point-side quantities (one fixed permutation)
    pm = cam_to_point(jnp.concatenate([Jp_cm.reshape(6, C, Q), r_cm], axis=0))
    Jp4 = pm[:6].reshape(2, 3, T, P)
    r_pm = pm[6:]                                       # [2, T, P]

    def cam_apply(x):                                   # [9,C] -> a [2,C,Q]
        return jnp.stack([
            sum(Jc4[i, j] * x[j][:, None] for j in range(9)) for i in range(2)])

    def cam_reduce(u):                                  # [2,C,Q] -> [9,C]
        return jnp.stack([
            sum(jnp.sum(Jc4[i, j] * u[i], axis=-1) for i in range(2))
            for j in range(9)])

    def pt_reduce(ap):                                  # [2,T,P] -> [3,P]
        return jnp.stack([
            sum(jnp.sum(Jp4[i, k] * ap[i], axis=0) for i in range(2))
            for k in range(3)])

    def pt_apply(u):                                    # [3,P] -> [2,T,P]
        return jnp.stack([
            sum(Jp4[i, k] * u[k][None, :] for k in range(3)) for i in range(2)])

    Hpp = jnp.stack([
        sum(jnp.sum(Jp4[i, k] * Jp4[i, l], axis=0) for i in range(2))
        for k in range(3) for l in range(3)])           # [9, P]
    Hpp = bk.add_scaled_identity_33_T(Hpp, lam + 1e-10)
    HppInv = bk.sym33_inv_T(Hpp)                        # [9, P]

    gc = cam_reduce(r_cm)                               # [9, C]
    gp = pt_reduce(r_pm)                                # [3, P]

    hp = bk.sym33_matvec_T(HppInv, gp)
    b = -gc + cam_reduce(point_to_cam(pt_apply(hp)))    # [9, C]

    def schur_matvec(x):                                # x [9, C]
        a = cam_apply(x)                                # [2, C, Q]
        t = pt_reduce(cam_to_point(a))                  # [3, P]
        u = bk.sym33_matvec_T(HppInv, t)
        bc = point_to_cam(pt_apply(u))
        y = cam_reduce(a - bc)
        return y + lam * x

    # block-Jacobi preconditioner of S, all cam-major: the per-camera
    # segment reduction is a dense sum over Q
    Hcc = jnp.stack([
        sum(jnp.sum(Jc4[i, j] * Jc4[i, k], axis=-1) for i in range(2))
        for j in range(9) for k in range(9)]).T.reshape(C, 9, 9)
    Wt = [sum(Jc4[i, a] * Jp_cm[i, bb] for i in range(2))
          for a in range(9) for bb in range(3)]         # 27 x [C, Q]
    HppInv_pad = jnp.concatenate([HppInv,
                                  jnp.zeros((9, 1), dtype=dtype)], axis=1)
    Hi = HppInv_pad[:, layout.pt_of_cm].reshape(9, C, Q)
    T1 = [sum(Wt[3 * a + bb] * Hi[3 * bb + c] for bb in range(3))
          for a in range(9) for c in range(3)]          # 27 x [C, Q]
    Gc = jnp.stack([
        sum(jnp.sum(T1[3 * a + c] * Wt[3 * d + c], axis=-1) for c in range(3))
        for a in range(9) for d in range(9)]).T.reshape(C, 9, 9)
    eye9 = jnp.eye(9, dtype=dtype)
    Ls = bk.safe_chol_blocks(Hcc - Gc, lam)
    cho_apply = jax.vmap(lambda L, x: jax.scipy.linalg.cho_solve((L, True), x))
    precond = lambda x: cho_apply(Ls, x.T).T            # x [9, C]

    xc = pcg(schur_matvec, b, precond, cg_maxiter, cg_tol)

    t = pt_reduce(cam_to_point(cam_apply(xc)))
    xp = bk.sym33_matvec_T(HppInv, -gp - t)
    return xc.T, xp.T


def ba_error_cm(state: BAState, obs: BAObservations, layout):
    """Cam-major total reprojection error (same value as ba_error).

    Flat vmap with tiled camera broadcasts — see the TPU nested-vmap
    corruption note in linearize_ba_cm."""
    C, P, Q = layout.C, layout.P, layout.Q
    CQ = C * Q
    dtype = state.points.dtype
    posesT = jnp.broadcast_to(state.cam_poses.transpose(1, 2, 0)[:, :, :, None],
                              (3, 4, C, Q)).reshape(3, 4, CQ)
    calsT = jnp.broadcast_to(state.cam_cals.T[:, :, None],
                             (3, C, Q)).reshape(3, CQ)
    pts_pad = jnp.concatenate([state.points.T,
                               jnp.zeros((3, 1), dtype=dtype)], axis=1)
    pts_cm = pts_pad[:, layout.pt_of_cm]
    uv_pad = jnp.concatenate([obs.uv.T, jnp.zeros((2, 1), dtype=dtype)], axis=1)
    uv_cm = uv_pad[:, layout.g_cam]

    def one(pose, cal, point, uv):
        return _residual_one(pose, cal, point, uv), cam_geo.depth_of(pose, point)

    r, depth = jax.vmap(one, in_axes=(-1, -1, -1, -1), out_axes=(-1, -1))(
        posesT, calsT, pts_cm, uv_cm)
    w = (depth > 1e-6).astype(dtype) * layout.cam_mask
    r = r * w
    return 0.5 * jnp.sum(r * r)


def retract_ba(state: BAState, xc, xp) -> BAState:
    new_poses = jax.vmap(se3.retract)(state.cam_poses, xc[:, :6])
    return BAState(new_poses, state.cam_cals + xc[:, 6:9], state.points + xp)


@partial(jax.jit, static_argnames=("cg_maxiter",))
def ba_try_step(state: BAState, obs: BAObservations, layout, lam, cg_maxiter=100):
    xc, xp = solve_ba_step_cm(state, obs, layout, lam, cg_maxiter=cg_maxiter)
    new_state = retract_ba(state, xc, xp)
    return new_state, ba_error_cm(new_state, obs, layout)


def make_layout(obs: BAObservations, C: int, P: int):
    from gtsam_personal_tpu.sfm.ba_layout import BALayout
    return BALayout.build(np.asarray(obs.cam), np.asarray(obs.point), C, P)


def optimize_ba(state: BAState, obs: BAObservations, layout=None,
                max_iterations=50, lambda_initial=1e-4, lambda_factor=10.0,
                lambda_upper=1e8, rel_tol=1e-6, abs_tol=1e-6, cg_maxiter=100,
                verbose=False):
    """LM outer loop on the BA problem (reference schedule, see
    nonlinear/optimizers.py)."""
    if layout is None:
        layout = make_layout(obs, state.cam_poses.shape[0], state.points.shape[0])
    err = float(jax.jit(ba_error)(state, obs))
    lam = lambda_initial
    it = 0
    for it in range(max_iterations):
        accepted = False
        for _ in range(12):
            new_state, new_err = ba_try_step(
                state, obs, layout, jnp.asarray(lam, dtype=state.points.dtype),
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
