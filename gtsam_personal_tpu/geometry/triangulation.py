"""Point triangulation from multiple views: DLT, LOST, nonlinear refinement,
and masked "safe" triangulation.

Reference parity: gtsam/geometry/triangulation.h — triangulateDLT (:65-96),
LOST (:102-111), nonlinear refinement via a tiny factor graph (:179-211),
triangulatePoint3 (:425), and triangulateSafe returning a degenerate/
cheirality-aware TriangulationResult. The reference throws exceptions; here
every camera set is processed batched and the status is a mask (SURVEY §5.3).

All functions take stacked camera poses [N,3,4] (camera-to-world, GTSAM
convention) and either calibrated unit-plane measurements or pixel
measurements + a calibration.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gtsam_personal_tpu.geometry import se3


class TriangulationResult(NamedTuple):
    """status codes matching the reference's TriangulationResult semantics."""
    point: jnp.ndarray       # [3]
    valid: jnp.ndarray       # bool: well-conditioned and in front of cameras
    degenerate: jnp.ndarray  # bool: rank-deficient geometry
    behind: jnp.ndarray      # bool: cheirality failure


def triangulate_dlt(poses, measurements_unit, rank_tol=1e-9):
    """Linear DLT from normalized (unit-plane) measurements.

    poses: [N, 3, 4] camera-to-world; measurements_unit: [N, 2].
    Solves sum_i || [u_i]_x P_i X ||^2 for homogeneous X via SVD."""
    N = poses.shape[0]

    def rows(pose, uv):
        # world->cam projection matrix P = [R^T | -R^T t]
        R = pose[:, :3]
        t = pose[:, 3]
        P = jnp.concatenate([R.T, (-(R.T @ t))[:, None]], axis=1)  # [3,4]
        u, v = uv[0], uv[1]
        return jnp.stack([u * P[2] - P[0], v * P[2] - P[1]])       # [2,4]

    A = jax.vmap(rows)(poses, measurements_unit).reshape(2 * N, 4)
    _, s, vt = jnp.linalg.svd(A, full_matrices=False)
    X = vt[-1]
    w = X[3]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, jnp.where(w < 0, -1e-12, 1e-12), w)
    point = X[:3] / w_safe
    degenerate = s[-2] < rank_tol * jnp.maximum(s[0], 1e-30)
    return point, degenerate


def triangulate_lost(poses, measurements_unit, sigma=1e-3):
    """LOST (linear optimal sine triangulation): statistically optimal linear
    triangulation (reference: triangulation.h:102-111, Henry & Christian).

    Weights each DLT-style constraint by an estimate of inverse measurement
    uncertainty projected through the geometry."""
    N = poses.shape[0]
    centers = poses[:, :, 3]

    # rough scale: pairwise baseline vs ray angle -> weight q (reference uses
    # d_ij between camera i and the 'next' camera)
    def one(pose, uv, other_center):
        R = pose[:, :3]
        t = pose[:, 3]
        ray = R @ jnp.concatenate([uv, jnp.ones(1, dtype=uv.dtype)])
        ray = ray / jnp.linalg.norm(ray)
        b = other_center - t
        cross = jnp.cross(b, ray)
        q = jnp.linalg.norm(cross) / (sigma * jnp.maximum(jnp.linalg.norm(b), 1e-12))
        P = jnp.concatenate([R.T, (-(R.T @ t))[:, None]], axis=1)
        u, v = uv[0], uv[1]
        rows = jnp.stack([u * P[2] - P[0], v * P[2] - P[1]])
        return q * rows

    others = jnp.roll(centers, -1, axis=0)
    A = jax.vmap(one)(poses, measurements_unit, others).reshape(2 * N, 4)
    _, s, vt = jnp.linalg.svd(A, full_matrices=False)
    X = vt[-1]
    w = X[3]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return X[:3] / w_safe, s[-2] < 1e-9 * jnp.maximum(s[0], 1e-30)


def refine_nonlinear(poses, measurements_unit, point0, iters=5):
    """Gauss-Newton refinement of the triangulated point (reference:
    triangulation.h:179-211 builds a tiny factor graph; here: 3x3 normal
    equations in closed form, fixed iteration count)."""
    def step(point, _):
        def resid(pose, uv):
            pc = se3.transform_to(pose, point)
            z = pc[2]
            z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
            return jnp.stack([pc[0] / z_safe, pc[1] / z_safe]) - uv

        def jac(pose, uv):
            return jax.jacfwd(lambda X: (lambda pc: jnp.stack(
                [pc[0] / jnp.where(jnp.abs(pc[2]) < 1e-8, 1e-8, pc[2]),
                 pc[1] / jnp.where(jnp.abs(pc[2]) < 1e-8, 1e-8, pc[2])]))(
                se3.transform_to(pose, X)))(point)

        r = jax.vmap(resid)(poses, measurements_unit)      # [N,2]
        J = jax.vmap(jac)(poses, measurements_unit)        # [N,2,3]
        H = jnp.einsum("nij,nik->jk", J, J) + 1e-12 * jnp.eye(3, dtype=point.dtype)
        g = jnp.einsum("nij,ni->j", J, r)
        return point - jnp.linalg.solve(H, g), None

    point, _ = jax.lax.scan(step, point0, None, length=iters)
    return point


def refine_nonlinear_implicit(poses, measurements_unit, point0, iters=5):
    """refine_nonlinear wrapped in lax.custom_root: the PRIMAL value is the
    same fixed-iteration GN refinement, but DIFFERENTIATION goes through the
    implicit function theorem at the returned point — the derivative of the
    argmin, i.e. the exact Schur-complement ("variable projection")
    Jacobian the reference builds explicitly at the triangulated point
    (slam/SmartFactorBase.h:320 / CameraSet::SchurComplement), instead of
    differentiating through the truncated iteration tape."""
    def resid_all(point):
        def resid(pose, uv):
            pc = se3.transform_to(pose, point)
            z = pc[2]
            z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
            return jnp.stack([pc[0] / z_safe, pc[1] / z_safe]) - uv
        return jax.vmap(resid)(poses, measurements_unit).reshape(-1)

    def grad(point):                      # g(p) = J^T r, zero at the argmin
        r = resid_all(point)
        J = jax.jacfwd(resid_all)(point)
        return J.T @ r

    def solve(_f, x0):
        return refine_nonlinear(poses, measurements_unit, x0, iters=iters)

    def tangent_solve(g, y):
        A = jax.jacfwd(g)(jnp.zeros_like(y))
        A = A + 1e-10 * jnp.eye(3, dtype=y.dtype)   # degenerate-track guard
        return jnp.linalg.solve(A, y)

    return jax.lax.custom_root(grad, point0, solve, tangent_solve)


def triangulate_safe(poses, measurements_unit, rank_tol=1e-9, refine=True,
                     min_depth=1e-3) -> TriangulationResult:
    """triangulateSafe analogue: DLT + optional refinement + cheirality and
    degeneracy masks instead of exceptions."""
    point, degenerate = triangulate_dlt(poses, measurements_unit, rank_tol)
    if refine:
        point = refine_nonlinear(poses, measurements_unit, point)
    depths = jax.vmap(lambda p: se3.transform_to(p, point)[2])(poses)
    behind = jnp.any(depths < min_depth)
    valid = jnp.logical_and(jnp.logical_not(degenerate), jnp.logical_not(behind))
    return TriangulationResult(point, valid, degenerate, behind)


def pixels_to_unit(measurements_px, cal_fxfycxcy):
    """Convert pixel measurements to unit-plane with a simple pinhole cal
    [fx, fy, cx, cy] (no distortion)."""
    fx, fy, cx, cy = cal_fxfycxcy
    return jnp.stack([(measurements_px[..., 0] - cx) / fx,
                      (measurements_px[..., 1] - cy) / fy], axis=-1)
