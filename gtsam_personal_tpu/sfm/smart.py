"""Smart (structureless) projection factors.

Reference parity: SmartProjectionFactor / SmartProjectionPoseFactor
(slam/SmartProjectionFactor.h, SURVEY.md §3.2): a factor over the T cameras of
a track whose landmark is eliminated internally.

TPU-native realization: the residual function *embeds differentiable
triangulation* (geometry/triangulation.py: DLT + fixed-iteration GN refine).
Autodiff through the embedded argmin yields the variable-projection Jacobian —
the same reduced system the reference builds explicitly via
CameraSet::SchurComplement / JacobianFactorSVD — with zero special solver
code: smart factors are ordinary `FactorBatch`es, bucketed by track length so
every bucket is one vmap.

Degenerate / cheirality tracks are zero-weighted (the reference returns
degenerate TriangulationResults and zero Hessians, SmartProjectionFactor.h:173).
"""

from typing import Dict, List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from gtsam_personal_tpu.core.graph import FactorBatch, FactorGraph
from gtsam_personal_tpu.geometry import se3, triangulation as tri
from gtsam_personal_tpu.linear.noise import NoiseModel


def make_smart_residual(track_len: int, refine_iters: int = 3,
                        implicit: bool = True):
    """implicit=True (default) differentiates the embedded triangulation
    via the implicit function theorem (triangulation.py
    refine_nonlinear_implicit) — the EXACT Schur-complement Jacobian at the
    triangulated point, matching the reference's explicit construction
    (slam/SmartFactorBase.h:320) even where a truncated-iteration tape
    would be off; implicit=False keeps the old unrolled-tape autodiff."""
    T = track_len

    def residual(xs, meas):
        poses = jnp.stack(xs)                    # [T, 3, 4]
        uv = meas["uv"]                          # [T, 2] unit-plane
        point, degenerate = tri.triangulate_dlt(poses, uv)
        refine = (tri.refine_nonlinear_implicit if implicit
                  else tri.refine_nonlinear)
        point = refine(poses, uv, point, iters=refine_iters)
        depths = jax.vmap(lambda p: se3.transform_to(p, point)[2])(poses)
        ok = jnp.logical_and(jnp.logical_not(degenerate),
                             jnp.all(depths > 1e-3))
        w = jnp.where(ok, 1.0, 0.0).astype(uv.dtype)

        def reproj(pose, uv_t):
            pc = se3.transform_to(pose, point)
            z = pc[2]
            z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
            return jnp.stack([pc[0] / z_safe, pc[1] / z_safe]) - uv_t

        r = jax.vmap(reproj)(poses, uv)          # [T, 2]
        return (w * r.reshape(-1))

    residual.__name__ = f"smart_projection_T{T}"
    return residual


def _stereo_project(pose, point, cal):
    """Stereo projection (uL, uR, v) (reference: StereoCamera::project,
    geometry/StereoCamera.h). cal = [fx, fy, cx, cy, baseline]."""
    pc = se3.transform_to(pose, point)
    z = pc[2]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    uL = cal[0] * pc[0] / z_safe + cal[2]
    uR = cal[0] * (pc[0] - cal[4]) / z_safe + cal[2]
    v = cal[1] * pc[1] / z_safe + cal[3]
    return jnp.stack([uL, uR, v])


def _stereo_backproject(pose, m, cal):
    """One stereo measurement -> world point (disparity depth)."""
    disp = jnp.maximum(m[0] - m[1], 1e-6)
    z = cal[0] * cal[4] / disp
    x = z * (m[0] - cal[2]) / cal[0]
    y = z * (m[2] - cal[3]) / cal[1]
    return se3.transform_from(pose, jnp.stack([x, y, z]))


def make_smart_stereo_residual(track_len: int, refine_iters: int = 3):
    """Structureless stereo smart factor (reference:
    gtsam_unstable/slam/SmartStereoProjectionFactor.h /
    SmartStereoProjectionPoseFactor.h): the landmark is triangulated from the
    track's stereo measurements (mean of disparity backprojections + embedded
    GN refinement on the stereo reprojection) and eliminated internally;
    autodiff through the embedded argmin gives the Schur-reduced Jacobian.

    meas: uvs [T, 3] (uL, uR, v per camera), cal [5]."""
    T = track_len

    def residual(xs, meas):
        poses = jnp.stack(xs)                    # [T, 3, 4]
        uvs = meas["uvs"]                        # [T, 3]
        cal = meas["cal"]                        # [5]
        pts = jax.vmap(lambda p, m: _stereo_backproject(p, m, cal))(poses, uvs)
        point = jnp.mean(pts, axis=0)

        def gn_step(point, _):
            def r_of(pt):
                return (jax.vmap(lambda p, m: _stereo_project(p, pt, cal) - m)(
                    poses, uvs)).reshape(-1)
            r = r_of(point)
            J = jax.jacfwd(r_of)(point)          # [3T, 3]
            H = J.T @ J + 1e-9 * jnp.eye(3, dtype=point.dtype)
            point = point - jnp.linalg.solve(H, J.T @ r)
            return point, None

        point, _ = jax.lax.scan(gn_step, point, None, length=refine_iters)
        depths = jax.vmap(lambda p: se3.transform_to(p, point)[2])(poses)
        ok = jnp.all(depths > 1e-3)
        w = jnp.where(ok, 1.0, 0.0).astype(uvs.dtype)
        r = jax.vmap(lambda p, m: _stereo_project(p, point, cal) - m)(poses, uvs)
        return w * r.reshape(-1)

    residual.__name__ = f"smart_stereo_T{T}"
    return residual


def build_smart_stereo_batches(tracks: Sequence[Sequence[int]],
                               measurements: Sequence[np.ndarray],
                               cal, sigma: float = 1.0,
                               pose_group: str = "se3",
                               dtype=np.float64) -> List[FactorBatch]:
    """Group stereo tracks by length (reference:
    SmartStereoProjectionPoseFactor usage in gtsam_unstable). cal: [5]
    (fx, fy, cx, cy, baseline), shared across the rig."""
    by_len: Dict[int, List[int]] = {}
    for k, t in enumerate(tracks):
        by_len.setdefault(len(t), []).append(k)
    batches = []
    cal = np.asarray(cal, dtype=dtype)
    for T, ks in sorted(by_len.items()):
        if T < 1:
            continue
        idx = np.asarray([tracks[k] for k in ks], dtype=np.int32)
        uvs = np.asarray([measurements[k] for k in ks], dtype=dtype)
        cals = np.tile(cal, (len(ks), 1))
        noise = NoiseModel("diag", jnp.full((len(ks), 3 * T), 1.0 / sigma,
                                            dtype=jnp.asarray(uvs).dtype))
        batches.append(FactorBatch(
            f"smart_stereo_T{T}", make_smart_stereo_residual(T),
            tuple([pose_group] * T), 3 * T,
            jnp.asarray(idx), {"uvs": jnp.asarray(uvs),
                               "cal": jnp.asarray(cals)}, noise))
    return batches


def build_smart_batches(tracks: Sequence[Sequence[int]],
                        measurements: Sequence[np.ndarray],
                        sigma: float = 1.0, pose_group: str = "se3",
                        dtype=np.float64) -> List[FactorBatch]:
    """Group tracks by length into FactorBatches.

    tracks[k]: camera indices of track k; measurements[k]: [T_k, 2]
    unit-plane measurements."""
    by_len: Dict[int, List[int]] = {}
    for k, t in enumerate(tracks):
        by_len.setdefault(len(t), []).append(k)
    batches = []
    for T, ks in sorted(by_len.items()):
        if T < 2:
            continue
        idx = np.asarray([tracks[k] for k in ks], dtype=np.int32)
        uv = np.asarray([measurements[k] for k in ks], dtype=dtype)
        noise = NoiseModel("diag", jnp.full((len(ks), 2 * T), 1.0 / sigma,
                                            dtype=jnp.asarray(uv).dtype))
        batches.append(FactorBatch(
            f"smart_projection_T{T}", make_smart_residual(T),
            tuple([pose_group] * T), 2 * T,
            jnp.asarray(idx), {"uv": jnp.asarray(uv)}, noise))
    return batches


def make_smart_rig_residual(track_len: int, refine_iters: int = 3):
    """SmartProjectionRigFactor (reference: slam/SmartProjectionRigFactor.h):
    variables are BODY poses; each observation carries its fixed body-to-
    camera extrinsic (the rig) and Cal3_S2 intrinsics in `meas`:
      meas['uv'] [T, 2] pixels, meas['bTc'] [T, 3, 4], meas['cal'] [T, 5].
    The landmark is eliminated by embedded differentiable triangulation,
    exactly like make_smart_residual."""
    from gtsam_personal_tpu.geometry import cameras as cam_geo
    T = track_len

    def residual(xs, meas):
        bodies = jnp.stack(xs)                                    # [T, 3, 4]
        poses = jax.vmap(se3.compose)(bodies, meas["bTc"])        # wTc
        cal = meas["cal"]                                         # [T, 5]
        # normalize pixels to the unit plane for DLT (invert Cal3_S2)
        uv = meas["uv"]
        x = (uv[:, 0] - cal[:, 3]) / cal[:, 0] \
            - cal[:, 2] * (uv[:, 1] - cal[:, 4]) / (cal[:, 0] * cal[:, 1])
        y = (uv[:, 1] - cal[:, 4]) / cal[:, 1]
        uv_n = jnp.stack([x, y], axis=1)
        point, degenerate = tri.triangulate_dlt(poses, uv_n)
        point = tri.refine_nonlinear(poses, uv_n, point, iters=refine_iters)
        depths = jax.vmap(lambda p: se3.transform_to(p, point)[2])(poses)
        ok = jnp.logical_and(jnp.logical_not(degenerate),
                             jnp.all(depths > 1e-3))
        w = jnp.where(ok, 1.0, 0.0).astype(uv.dtype)

        def reproj(pose, cal_t, uv_t):
            return cam_geo.project_point(pose, point, cal_t, "cal3_s2") - uv_t

        r = jax.vmap(reproj)(poses, cal, uv)
        return w * r.reshape(-1)

    residual.__name__ = f"smart_rig_T{T}"
    return residual


def build_smart_rig_batches(tracks: Sequence[Sequence[int]],
                            measurements: Sequence[np.ndarray],
                            cam_ids: Sequence[Sequence[int]],
                            rig_bTc: np.ndarray, rig_cal: np.ndarray,
                            sigma: float = 1.0, pose_group: str = "se3",
                            dtype=np.float64) -> List[FactorBatch]:
    """tracks[k]: body-pose indices; cam_ids[k]: which rig camera took each
    observation; rig_bTc [C, 3, 4], rig_cal [C, 5]."""
    by_len: Dict[int, List[int]] = {}
    for k, t in enumerate(tracks):
        by_len.setdefault(len(t), []).append(k)
    batches = []
    for T, ks in sorted(by_len.items()):
        if T < 2:
            continue
        idx = np.asarray([tracks[k] for k in ks], dtype=np.int32)
        uv = np.asarray([measurements[k] for k in ks], dtype=dtype)
        cams = np.asarray([cam_ids[k] for k in ks], dtype=np.int32)
        bTc = np.asarray(rig_bTc, dtype=dtype)[cams]    # [K, T, 3, 4]
        cal = np.asarray(rig_cal, dtype=dtype)[cams]    # [K, T, 5]
        noise = NoiseModel("diag", jnp.full((len(ks), 2 * T), 1.0 / sigma,
                                            dtype=jnp.asarray(uv).dtype))
        batches.append(FactorBatch(
            f"smart_rig_T{T}", make_smart_rig_residual(T),
            tuple([pose_group] * T), 2 * T,
            jnp.asarray(idx),
            {"uv": jnp.asarray(uv), "bTc": jnp.asarray(bTc),
             "cal": jnp.asarray(cal)}, noise))
    return batches
