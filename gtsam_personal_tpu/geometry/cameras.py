"""Calibration models and pinhole camera projection.

Reference parity: gtsam/geometry/Cal3_S2.h, Cal3f.h, Cal3Bundler.h, Cal3DS2.h,
Cal3Unified.h, Cal3Fisheye.h (calibrate/uncalibrate) and PinholeCamera
projection (gtsam/geometry/PinholeCamera.h / CalibratedCamera.h:
p_cam = pose.transformTo(X), normalize by depth, apply calibration).

Every model is a pure function over a flat parameter vector so calibrations
are optimizable variables like everything else (vector-space groups):

  cal3_s2:      [fx, fy, s, u0, v0]                       (dim 5)
  cal3f:        [f]  (fixed principal point passed via meas) (dim 1)
  cal3bundler:  [f, k1, k2]                               (dim 3)
  cal3ds2:      [fx, fy, s, u0, v0, k1, k2, p1, p2]       (dim 9)
  cal3fisheye:  [fx, fy, s, u0, v0, k1, k2, k3, k4]       (dim 9)

Projection residuals live in sfm/factors.py; this module is geometry only.
"""

import jax.numpy as jnp

from gtsam_personal_tpu.geometry import se3


def uncalibrate_cal3_s2(k, p):
    """Normalized image point -> pixels (reference: Cal3_S2::uncalibrate)."""
    fx, fy, s, u0, v0 = k[0], k[1], k[2], k[3], k[4]
    return jnp.stack([fx * p[0] + s * p[1] + u0, fy * p[1] + v0])


def uncalibrate_cal3bundler(k, p):
    """Bundler model: r2 = |p|^2, scale = f (1 + k1 r2 + k2 r2^2), no
    principal point (reference: Cal3Bundler::uncalibrate)."""
    f, k1, k2 = k[0], k[1], k[2]
    r2 = p[0] * p[0] + p[1] * p[1]
    g = f * (1.0 + k1 * r2 + k2 * r2 * r2)
    return g * p


def uncalibrate_cal3ds2(k, p):
    """Radial-tangential distortion (reference: Cal3DS2_Base::uncalibrate)."""
    fx, fy, s, u0, v0 = k[0], k[1], k[2], k[3], k[4]
    k1, k2, p1, p2 = k[5], k[6], k[7], k[8]
    x, y = p[0], p[1]
    r2 = x * x + y * y
    g = 1.0 + k1 * r2 + k2 * r2 * r2
    dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    dy = 2.0 * p2 * x * y + p1 * (r2 + 2.0 * y * y)
    xd, yd = g * x + dx, g * y + dy
    return jnp.stack([fx * xd + s * yd + u0, fy * yd + v0])


def uncalibrate_cal3fisheye(k, p):
    """Equidistant fisheye (reference: Cal3Fisheye::uncalibrate)."""
    fx, fy, s, u0, v0 = k[0], k[1], k[2], k[3], k[4]
    k1, k2, k3, k4 = k[5], k[6], k[7], k[8]
    x, y = p[0], p[1]
    r2 = x * x + y * y
    r = jnp.sqrt(r2 + 1e-30)
    th = jnp.arctan(r)
    th2 = th * th
    thd = th * (1.0 + k1 * th2 + k2 * th2 ** 2 + k3 * th2 ** 3 + k4 * th2 ** 4)
    scale = jnp.where(r2 < 1e-20, 1.0, thd / r)
    xd, yd = scale * x, scale * y
    return jnp.stack([fx * xd + s * yd + u0, fy * yd + v0])


def uncalibrate_cal3unified(k, p):
    """Unified (omnidirectional/catadioptric) model: the mirror parameter xi
    maps through the unit sphere first, then Cal3DS2 distortion applies
    (reference: Cal3Unified::uncalibrate, Cal3Unified.h:38):
      pn = p / (1 + xi * sqrt(x^2 + y^2 + 1))."""
    xi = k[9]
    den = 1.0 + xi * jnp.sqrt(p[0] * p[0] + p[1] * p[1] + 1.0)
    pn = p / den
    return uncalibrate_cal3ds2(k[:9], pn)


def nplane_to_space_cal3unified(k, pn):
    """Inverse of the unified model's sphere mapping: normalized-plane point
    (post-mirror) back to the perspective-projection plane (reference:
    Cal3Unified::nPlaneToSpace). Standard UCM unprojection: lift to the unit
    sphere with f = (xi + sqrt(1 + (1-xi^2) r^2)) / (1 + r^2), then divide by
    the sphere z minus xi."""
    xi = k[9]
    r2 = pn[0] * pn[0] + pn[1] * pn[1]
    f = (xi + jnp.sqrt(jnp.maximum(1.0 + (1.0 - xi * xi) * r2, 0.0))) / (1.0 + r2)
    return pn * f / jnp.maximum(f - xi, 1e-12)


UNCALIBRATE = {
    "cal3_s2": uncalibrate_cal3_s2,
    "cal3bundler": uncalibrate_cal3bundler,
    "cal3ds2": uncalibrate_cal3ds2,
    "cal3fisheye": uncalibrate_cal3fisheye,
    "cal3unified": uncalibrate_cal3unified,
}

CAL_DIMS = {"cal3_s2": 5, "cal3bundler": 3, "cal3ds2": 9, "cal3fisheye": 9,
            "cal3unified": 10, "cal3_s2stereo": 6}


def stereo_project(k, pc):
    """Cal3_S2Stereo projection of a camera-frame point to (uL, uR, v)
    (reference: Cal3_S2Stereo.h + StereoCamera::project). k = [fx, fy, s,
    u0, v0, b]."""
    fx, fy, s, u0, v0, b = k[0], k[1], k[2], k[3], k[4], k[5]
    z = pc[2]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    x, y = pc[0] / z_safe, pc[1] / z_safe
    uL = fx * x + s * y + u0
    uR = fx * (pc[0] - b) / z_safe + s * y + u0
    v = fy * y + v0
    return jnp.stack([uL, uR, v])


def project_point(pose, point, cal_params, cal_model: str = "cal3_s2",
                  eps: float = 1e-8):
    """Full pinhole projection: world point -> pixel measurement.

    pose: camera-to-world SE(3) (reference convention: PinholeCamera pose is
    wTc; projection uses transformTo). Depth is clamped away from zero so
    autodiff stays finite behind the cheirality mask (the reference throws
    CheiralityException; we mask instead, SURVEY.md §5.3)."""
    pc = se3.transform_to(pose, point)
    z = pc[2]
    z_safe = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    pn = jnp.stack([pc[0] / z_safe, pc[1] / z_safe])
    return UNCALIBRATE[cal_model](cal_params, pn)


def depth_of(pose, point):
    """Camera-frame depth (positive = in front, cheirality check)."""
    return se3.transform_to(pose, point)[2]
