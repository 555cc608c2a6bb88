"""Experimental-capability factors mirroring `gtsam_unstable/slam` + `geometry`.

TPU-native re-designs (pure residual functions batched by vmap, Jacobians via
autodiff through the retraction — see linear/linearize.py) of:

- inverse-depth visual factors  (gtsam_unstable/slam/InvDepthFactorVariant1.h,
  InvDepthFactorVariant2.h, InvDepthFactorVariant3.h;
  gtsam_unstable/geometry/InvDepthCamera3.h)
- rolling-shutter projection    (gtsam_unstable/slam/ProjectionFactorRollingShutter.h)
- EM inlier/outlier between     (gtsam_unstable/slam/BetweenFactorEM.h)
- time-of-arrival               (gtsam_unstable/geometry/Event.h,
  gtsam_unstable/slam/TOAFactor.h)
- S2 bearing                    (gtsam_unstable/geometry/BearingS2.h)

Conventions follow the reference so costs are comparable; all functions are
jit/vmap-safe (no data-dependent Python control flow).
"""

import jax
import jax.numpy as jnp

from gtsam_personal_tpu.geometry import cameras as cam_geo
from gtsam_personal_tpu.geometry import extra, se3, so3


# -- inverse depth -----------------------------------------------------------

def inv_depth_point(x, y, z, theta, phi, rho):
    """World point of the Civera09tro parameterization
    (reference: InvDepthFactorVariant1.h:91): anchor + ray/rho where the ray
    is (cos t cos p, sin t cos p, sin p)."""
    ray = jnp.stack([jnp.cos(theta) * jnp.cos(phi),
                     jnp.sin(theta) * jnp.cos(phi),
                     jnp.sin(phi)])
    rho_safe = jnp.where(jnp.abs(rho) < 1e-12, 1e-12, rho)
    return jnp.stack([x, y, z]) + ray / rho_safe


def inv_depth_variant1_residual(xs, meas):
    """Pose3 x Vector6 landmark (x,y,z,theta,phi,rho) -> pixel residual
    (reference: InvDepthFactorVariant1::inverseDepthError). meas: measured
    [2], cal [5] (Cal3_S2)."""
    pose, lm = xs
    pt = inv_depth_point(lm[0], lm[1], lm[2], lm[3], lm[4], lm[5])
    pred = cam_geo.project_point(pose, pt, meas["cal"], "cal3_s2")
    return pred - meas["measured"]


def inv_depth_variant2_residual(xs, meas):
    """Pose3 x Vector3 landmark (theta,phi,rho) with a fixed world anchor
    point carried in meas (reference: InvDepthFactorVariant2.h)."""
    pose, lm = xs
    a = meas["anchor"]
    pt = inv_depth_point(a[0], a[1], a[2], lm[0], lm[1], lm[2])
    pred = cam_geo.project_point(pose, pt, meas["cal"], "cal3_s2")
    return pred - meas["measured"]


def inv_depth_variant3_residual(xs, meas):
    """Anchor Pose3 x observing Pose3 x Vector3 (theta,phi,rho) landmark
    expressed in the *anchor camera frame* (reference:
    InvDepthFactorVariant3b.h: the landmark ray is rotated into the world by
    the anchor pose, then projected in the observing camera)."""
    pose_anchor, pose_obs, lm = xs
    ray_cam = jnp.stack([jnp.cos(lm[0]) * jnp.cos(lm[1]),
                         jnp.sin(lm[0]) * jnp.cos(lm[1]),
                         jnp.sin(lm[1])])
    rho = jnp.where(jnp.abs(lm[2]) < 1e-12, 1e-12, lm[2])
    pt_world = se3.transform_from(pose_anchor, ray_cam / rho)
    pred = cam_geo.project_point(pose_obs, pt_world, meas["cal"], "cal3_s2")
    return pred - meas["measured"]


# -- rolling shutter ---------------------------------------------------------

def se3_interpolate(a, b, alpha):
    """Geodesic interpolation on SE(3): a * Exp(alpha * Log(a^-1 b))
    (reference: interpolate<Pose3>, base/Lie.h)."""
    xi = se3.logmap(se3.between(a, b))
    return se3.compose(a, se3.expmap(alpha * xi))


def projection_rolling_shutter_residual(xs, meas):
    """Pose3 x Pose3 x Point3 rolling-shutter projection: the camera pose is
    the geodesic interpolation of the two keyframe poses at the row's
    normalized capture time alpha (reference:
    ProjectionFactorRollingShutter::evaluateError). meas: measured [2],
    alpha [], cal [5] (Cal3_S2); optional body_P_sensor composed on the host
    into the measurement convention."""
    pose_a, pose_b, point = xs
    pose = se3_interpolate(pose_a, pose_b, meas["alpha"])
    pred = cam_geo.project_point(pose, point, meas["cal"], "cal3_s2")
    return pred - meas["measured"]


# -- EM inlier/outlier between factor ----------------------------------------

def make_between_em_residual(group: str):
    """BetweenFactorEM (gtsam_unstable/slam/BetweenFactorEM.h): a between
    measurement with an inlier and an outlier Gaussian hypothesis. The
    whitened residual is the stacked
        [sqrt(p_in) * W_in r ; sqrt(p_out) * W_out r]
    where the responsibilities p are posterior indicator probabilities
    computed from the current residual (held constant under differentiation,
    matching the reference which computes them from Values before taking
    Jacobians). Use with unit noise; meas carries per-factor diagonal
    sqrt-infos and priors.

    meas: measured [D params], w_in [d], w_out [d] (sqrt-info diagonals),
    prior_in [], prior_out []."""
    from gtsam_personal_tpu.core import manifolds
    m = manifolds.get(group)
    if group == "se2":
        from gtsam_personal_tpu.geometry import se2 as _g
        between = _g.between
    elif group == "se3":
        between = se3.between
    else:
        between = lambda a, b: b - a

    def residual(xs, meas):
        x1, x2 = xs
        r = m.local(meas["measured"], between(x1, x2))
        r_c = jax.lax.stop_gradient(r)
        w_in, w_out = meas["w_in"], meas["w_out"]
        # indicator likelihoods: prior * N(r; 0, Sigma) with diag sqrt-info w
        def log_lik(w, prior):
            return (jnp.log(prior) + jnp.sum(jnp.log(w))
                    - 0.5 * jnp.sum((w * r_c) ** 2))
        li = log_lik(w_in, meas["prior_in"])
        lo = log_lik(w_out, meas["prior_out"])
        mx = jnp.maximum(li, lo)
        pi = jnp.exp(li - mx)
        po = jnp.exp(lo - mx)
        s = pi + po
        pi, po = pi / s, po / s
        return jnp.concatenate([jnp.sqrt(pi) * (w_in * r),
                                jnp.sqrt(po) * (w_out * r)])

    residual.__name__ = f"between_em_{group}"
    return residual


# -- time of arrival ----------------------------------------------------------

SPEED_OF_SOUND = 330.0  # m/s, reference default (gtsam_unstable/geometry/Event.h)


def toa_residual(xs, meas):
    """Event (t,x,y,z) with a known sensor location: residual =
    t + |loc - sensor| / c - measured_toa (reference: Event::toa +
    TOAFactor). meas: sensor [3], toa [], speed []."""
    (event,) = xs
    d = jnp.linalg.norm(event[1:4] - meas["sensor"])
    return jnp.atleast_1d(event[0] + d / meas["speed"] - meas["toa"])


def toa2_residual(xs, meas):
    """Event x Point3 (unknown sensor) TOA factor (reference: TOAFactor's
    two-expression constructor)."""
    event, sensor = xs
    d = jnp.linalg.norm(event[1:4] - sensor)
    return jnp.atleast_1d(event[0] + d / meas["speed"] - meas["toa"])


# -- S2 bearing ---------------------------------------------------------------

def bearing_s2_residual(xs, meas):
    """Pose3 -> Point3 direction measurement on the sphere (reference:
    gtsam_unstable/geometry/BearingS2.h): error = Unit3 local coordinates of
    the predicted body-frame direction w.r.t. the measured one. meas:
    measured [3] (unit vector)."""
    pose, point = xs
    p_body = se3.transform_to(pose, point)
    n = p_body / jnp.maximum(jnp.linalg.norm(p_body), 1e-12)
    return extra.unit3_local(meas["measured"], n)
