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
