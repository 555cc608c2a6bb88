"""SLAM measurement factors: priors, between, bearing/range, landmarks.

Reference parity: gtsam/slam/BetweenFactor.h, nonlinear/PriorFactor.h,
sam/BearingRangeFactor.h. Each factor type is a pure residual function over
single-element manifold points; Jacobians come from autodiff through the
retraction (see linear/linearize.py), so there are no hand-written Jacobians
to maintain — the analytic-Jacobian capability of the reference is subsumed.

Residual conventions match the reference so costs are comparable:
- prior:    r = Local(prior, x)        (PriorFactor::evaluateError)
- between:  r = Local(measured, between(x1, x2))   (BetweenFactor.h)
"""

import jax.numpy as jnp

from gtsam_personal_tpu.core import manifolds
from gtsam_personal_tpu.geometry import se2, se3, so2, so3


# -- residual functions ------------------------------------------------------

def make_prior_residual(group: str):
    m = manifolds.get(group)

    def residual(xs, meas):
        (x,) = xs
        return m.local(meas["prior"], x)

    residual.__name__ = f"prior_{group}"
    return residual


def make_between_residual(group: str):
    m = manifolds.get(group)
    if group == "se2":
        between = se2.between
    elif group == "se3":
        between = se3.between
    elif group == "so3":
        between = so3.between
    elif group == "so2":
        between = so2.between
    else:
        # vector-space between
        between = lambda a, b: b - a

    def residual(xs, meas):
        x1, x2 = xs
        return m.local(meas["measured"], between(x1, x2))

    residual.__name__ = f"between_{group}"
    return residual


def bearing_range_2d_residual(xs, meas):
    """Pose2 -> Point2 bearing+range (reference: BearingRangeFactor with
    A1=Pose2, A2=Point2). Residual = [wrapped bearing error, range error]."""
    pose, point = xs
    b = se2.bearing(pose, point)
    r = se2.range_to(pose, point)
    db = so2.wrap(b - meas["bearing"])
    return jnp.stack([db, r - meas["range"]])


def range_2d_residual(xs, meas):
    pose, point = xs
    return jnp.atleast_1d(se2.range_to(pose, point) - meas["range"])


def pose_point_2d_residual(xs, meas):
    """Observation of a landmark in the pose frame (simulated2D-style)."""
    pose, point = xs
    return se2.transform_to(pose, point) - meas["measured"]


def pose_point_3d_residual(xs, meas):
    pose, point = xs
    return se3.transform_to(pose, point) - meas["measured"]


# -- builder sugar -----------------------------------------------------------

def add_prior(builder, group, i, prior, noise_dict):
    builder.add(f"prior_{group}", make_prior_residual(group), (group,),
                manifolds.get(group).dim, [i], {"prior": prior}, noise_dict)


def add_between(builder, group, i, j, measured, noise_dict):
    builder.add(f"between_{group}", make_between_residual(group), (group, group),
                manifolds.get(group).dim, [i, j], {"measured": measured}, noise_dict)


def diag_noise(sigmas_arr):
    import numpy as np
    s = np.asarray(sigmas_arr, dtype=np.float64)
    w = np.where(s > 0, 1.0 / np.where(s > 0, s, 1.0), 1e3)
    return {"kind": "diag", "data": w}


def full_info_noise(info):
    """Full information matrix -> sqrt-information upper factor (host-side)."""
    import numpy as np
    info = np.asarray(info, dtype=np.float64)
    info = 0.5 * (info + info.T)
    # numerical PSD safety
    w, V = np.linalg.eigh(info)
    w = np.clip(w, 0.0, None)
    L = np.linalg.cholesky(V @ np.diag(w) @ V.T + 1e-12 * np.eye(info.shape[0]))
    return {"kind": "full", "data": L.T}


# -- additional measurement factors (reference: gtsam/slam/) -----------------

def stereo_residual(xs, meas):
    """StereoFactor: (uL, uR, v) stereo projection residual (reference:
    GenericStereoFactor / StereoCamera::project, geometry/StereoCamera.h).
    meas: measured [3], cal [fx, fy, cx, cy, baseline]."""
    pose, point = xs
    cal = meas["cal"]
    fx, fy, cx, cy, b = cal[0], cal[1], cal[2], cal[3], cal[4]
    pc = se3.transform_to(pose, point)
    z = pc[2]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    uL = fx * pc[0] / z_safe + cx
    uR = fx * (pc[0] - b) / z_safe + cx
    v = fy * pc[1] / z_safe + cy
    return jnp.stack([uL, uR, v]) - meas["measured"]


def projection_residual(xs, meas):
    """GenericProjectionFactor<Pose3, Point3, Cal3_S2> with fixed calibration
    (reference: slam/ProjectionFactor.h). meas: measured [2], cal [5]
    (fx, fy, s, u0, v0)."""
    from gtsam_personal_tpu.geometry import cameras as cam_geo
    pose, point = xs
    pred = cam_geo.project_point(pose, point, meas["cal"], "cal3_s2")
    return pred - meas["measured"]


def essential_factor_residual(xs, meas):
    """EssentialMatrixFactor: epipolar error of a calibrated point pair on an
    essential-matrix variable (reference: slam/EssentialMatrixFactor.h)."""
    from gtsam_personal_tpu.geometry import extra
    (e,) = xs
    return extra.essential_epipolar_error(e, meas["pA"], meas["pB"])


def frobenius_between_residual(xs, meas):
    """FrobeniusBetweenFactor<Rot3>: vec(R2 - R1 R12) (reference:
    slam/FrobeniusFactor.h)."""
    R1, R2 = xs
    return (R2 - R1 @ meas["R12"]).reshape(9)


def pose_translation_prior_residual(xs, meas):
    """PoseTranslationPrior<Pose3> (reference: slam/PoseTranslationPrior.h)."""
    (pose,) = xs
    return se3.translation(pose) - meas["measured"]


def pose_rotation_prior_residual(xs, meas):
    """PoseRotationPrior<Pose3> (reference: slam/PoseRotationPrior.h)."""
    from gtsam_personal_tpu.geometry import so3 as so3m
    (pose,) = xs
    return so3m.logmap(meas["measured"].T @ se3.rotation(pose))
