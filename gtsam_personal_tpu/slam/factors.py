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


# -- slam long-tail factors (reference: gtsam/slam/) --------------------------

def pose2_to_pose3(wTb):
    """Pose3::FromPose2: embed a planar pose in SE(3) (z = 0, yaw only)."""
    c, s = jnp.cos(wTb[2]), jnp.sin(wTb[2])
    z = jnp.zeros((), dtype=wTb.dtype)
    o = jnp.ones((), dtype=wTb.dtype)
    R = jnp.array([[c, -s, z], [s, c, z], [z, z, o]])
    t = jnp.stack([wTb[0], wTb[1], z])
    return se3.make(R, t)


def _planar_project(landmark, wTb, bTc, calib):
    """Predict the pixel of `landmark` seen from camera `bTc` mounted on
    planar body pose `wTb` with Cal3DS2 distortion (reference:
    slam/PlanarProjectionFactor.h:57 PlanarProjectionFactorBase::predict)."""
    from gtsam_personal_tpu.geometry import cameras as cam_geo
    wTc = se3.compose(pose2_to_pose3(wTb), bTc)
    return cam_geo.project_point(wTc, landmark, calib, "cal3ds2")


def planar_projection1_residual(xs, meas):
    """PlanarProjectionFactor1 — localization: unknown planar body pose,
    known landmark/offset/calibration (reference:
    slam/PlanarProjectionFactor.h:109)."""
    (wTb,) = xs
    pred = _planar_project(meas["landmark"], wTb, meas["bTc"], meas["calib"])
    return pred - meas["measured"]


def planar_projection2_residual(xs, meas):
    """PlanarProjectionFactor2 — SLAM: unknown pose AND landmark (reference:
    slam/PlanarProjectionFactor.h:171)."""
    wTb, landmark = xs
    pred = _planar_project(landmark, wTb, meas["bTc"], meas["calib"])
    return pred - meas["measured"]


def planar_projection3_residual(xs, meas):
    """PlanarProjectionFactor3 — calibration: unknown pose, camera offset,
    and calibration (reference: slam/PlanarProjectionFactor.h:237)."""
    wTb, bTc, calib = xs
    pred = _planar_project(meas["landmark"], wTb, bTc, calib)
    return pred - meas["measured"]


def rotate_residual(xs, meas):
    """RotateFactor: predict p = R z from rotated directions of a full
    rotation (reference: slam/RotateFactor.h:56)."""
    (R,) = xs
    return R @ meas["z"] - meas["p"]


def rotate_directions_residual(xs, meas):
    """RotateDirectionsFactor: tangent error between the measured direction
    i_p and iRc * c_z (reference: slam/RotateFactor.h:110)."""
    from gtsam_personal_tpu.geometry import extra
    (iRc,) = xs
    i_q = iRc @ meas["c_z"]
    return extra.unit3_local(meas["i_p"], i_q)


def make_reference_frame_residual(point_group: str = "point3",
                                  transform_group: str = "se3"):
    """ReferenceFrameFactor<Point, Transform>: ties a global point, a frame
    transform, and the point's local-frame coordinates:
    r = transform_from(lTg, p_global) - p_local (reference:
    slam/ReferenceFrameFactor.h:43: 'Point = transformFrom(Transform,
    Point)')."""
    tf = se3.transform_from if transform_group == "se3" else se2.transform_from

    def residual(xs, meas):
        p_global, lTg, p_local = xs
        return tf(lTg, p_global) - p_local

    return residual


def oriented_plane3_residual(xs, meas):
    """OrientedPlane3Factor: measured plane in the sensor frame vs the world
    plane transformed into that frame (reference:
    slam/OrientedPlane3Factor.h:49)."""
    from gtsam_personal_tpu.geometry import extra
    pose, plane = xs
    pred = extra.plane_transform(plane, pose)
    return extra.plane_local(meas["measured"], pred)


def oriented_plane3_direction_prior_residual(xs, meas):
    """OrientedPlane3DirectionPrior (reference:
    slam/OrientedPlane3Factor.h:82): prior on the plane normal direction."""
    from gtsam_personal_tpu.geometry import extra
    (plane,) = xs
    return extra.unit3_local(meas["measured"][:3], plane[:3])


def make_bounding_constraint_residual(value_fn, is_greater_than: bool = True):
    """BoundingConstraint1-style scalar inequality (reference:
    slam/BoundingConstraint.h:78): error is zero while the constraint is
    satisfied and (value - threshold) once violated — a one-sided hinge whose
    weight comes from the attached (tight) noise model.

    value_fn(xs, meas) -> scalar; threshold rides in meas['threshold']."""

    def residual(xs, meas):
        v = value_fn(xs, meas) - meas["threshold"]
        return jnp.atleast_1d(jnp.minimum(v, 0.0) if is_greater_than
                              else jnp.maximum(v, 0.0))

    return residual


def range_bound_residual(xs, meas):
    """Common bounding case: range between two planar poses must stay below
    meas['threshold'] (reference: testBoundingConstraint.cpp usage)."""
    a, b = xs
    d = jnp.linalg.norm(se2.translation(b) - se2.translation(a) + 1e-12)
    return jnp.atleast_1d(jnp.maximum(d - meas["threshold"], 0.0))


# -- transfer factors (reference: gtsam/sfm/TransferFactor.h) -----------------

def transfer_factor_residual(xs, meas):
    """TransferFactor<FundamentalMatrix>: transfer the point pair (pa, pb)
    into view c via two fundamental matrices and compare with pc (reference:
    sfm/TransferFactor.h:86). Variables are (Fca, Fcb) as 'fundamental'
    manifold points; meas carries pa, pb, pc and the transpose flags
    resolved host-side from the EdgeKeys (TransferEdges::getMatrices)."""
    from gtsam_personal_tpu.geometry import fundamental as fm
    F1, F2 = xs
    M1, M2 = fm.fundamental_matrix(F1), fm.fundamental_matrix(F2)
    Fca = jnp.where(meas["transpose1"], M1.T, M1)
    Fcb = jnp.where(meas["transpose2"], M2.T, M2)
    pred = fm.epipolar_transfer(Fca, meas["pa"], Fcb, meas["pb"])
    return pred - meas["pc"]


def essential_transfer_residual(xs, meas):
    """EssentialTransferFactor: same transfer with essential-matrix variables
    and fixed calibrations (reference: sfm/TransferFactor.h
    EssentialTransferFactor); meas carries calibrated Ka/Kb/Kc as 3x3."""
    from gtsam_personal_tpu.geometry import extra, fundamental as fm
    E1, E2 = xs
    F1 = jnp.linalg.inv(meas["Kc"]).T @ extra.essential_matrix(E1) @ \
        jnp.linalg.inv(meas["Ka"])
    F2 = jnp.linalg.inv(meas["Kc"]).T @ extra.essential_matrix(E2) @ \
        jnp.linalg.inv(meas["Kb"])
    Fca = jnp.where(meas["transpose1"], F1.T, F1)
    Fcb = jnp.where(meas["transpose2"], F2.T, F2)
    pred = fm.epipolar_transfer(Fca, meas["pa"], Fcb, meas["pb"])
    return pred - meas["pc"]


# -- round-4 long-tail parity sweep ------------------------------------------

def make_partial_prior_residual(group: str, indices):
    """PartialPriorFactor<VALUE>: soft prior on a SUBSET of the variable's
    Logmap components (reference: gtsam_unstable/slam/PartialPriorFactor.h —
    full_tangent = Logmap(x), residual = full_tangent[indices] - prior).
    `meas["prior"]` holds the compressed prior (len(indices) values)."""
    import numpy as np
    from gtsam_personal_tpu.core import manifolds
    from gtsam_personal_tpu.geometry import se2, se3, so2, so3
    logmaps = {"se2": se2.logmap, "se3": se3.logmap,
               "so2": so2.logmap, "so3": so3.logmap}
    logmap = logmaps.get(group)
    idx = np.asarray(indices, dtype=np.int64)

    def residual(xs, meas):
        (x,) = xs
        full = (logmap(x) if logmap is not None
                else jnp.ravel(x))          # vector groups: Logmap = identity
        return full[idx] - meas["prior"]

    residual.__name__ = f"partial_prior_{group}"
    return residual


def relative_elevation_residual(xs, meas):
    """RelativeElevationFactor: h(pose, pt) = pose.z() - pt.z() (reference:
    gtsam_unstable/slam/RelativeElevationFactor.cpp:22). meas: measured [1]."""
    pose, point = xs
    from gtsam_personal_tpu.geometry import se3
    return (se3.translation(pose)[2] - point[2])[None] - meas["measured"]


def essential_matrix_constraint_residual(xs, meas):
    """EssentialMatrixConstraint: 5-dim local-coordinate error between a
    measured essential matrix and the one induced by the relative pose
    p1.between(p2) (reference: slam/EssentialMatrixConstraint.cpp:45-76).
    meas: measured_R [3,3] + measured_t [3] (the measured E's rotation and
    unit direction)."""
    from gtsam_personal_tpu.geometry import extra, se3
    p1, p2 = xs
    rel = se3.between(p1, p2)
    t = se3.translation(rel)
    tn = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    hx = extra.essential_make(se3.rotation(rel), tn)
    measured = extra.essential_make(meas["measured_R"], meas["measured_t"])
    return extra.essential_local(measured, hx)


def projection_ppp_residual(xs, meas):
    """ProjectionFactorPPP<Pose3, Point3, Cal3_S2>: projection through a
    world pose COMPOSED with an unknown body->camera transform (reference:
    gtsam_unstable/slam/ProjectionFactorPPP.h). xs = (wTb, bTc, point);
    meas: measured [2], cal [5]."""
    from gtsam_personal_tpu.geometry import cameras as cam_geo, se3
    wTb, bTc, point = xs
    pred = cam_geo.project_point(se3.compose(wTb, bTc), point, meas["cal"],
                                 "cal3_s2")
    return pred - meas["measured"]


def make_between_sensor_residual(group: str = "se3"):
    """PoseBetweenFactor with an optional fixed body->sensor transform
    (reference: gtsam_unstable/slam/PoseBetweenFactor.h): the measurement
    relates the SENSOR poses wTb1*bTs and wTb2*bTs."""
    from gtsam_personal_tpu.geometry import se2, se3
    m = se3 if group == "se3" else se2

    def residual(xs, meas):
        a, b = xs
        sa = m.compose(a, meas["body_P_sensor"])
        sb = m.compose(b, meas["body_P_sensor"])
        return m.local(m.compose(sa, meas["measured"]), sb)

    residual.__name__ = f"between_sensor_{group}"
    return residual


def make_prior_sensor_residual(group: str = "se3"):
    """PosePriorFactor with an optional fixed body->sensor transform
    (reference: gtsam_unstable/slam/PosePriorFactor.h)."""
    from gtsam_personal_tpu.geometry import se2, se3
    m = se3 if group == "se3" else se2

    def residual(xs, meas):
        (a,) = xs
        return m.local(meas["prior"], m.compose(a, meas["body_P_sensor"]))

    residual.__name__ = f"prior_sensor_{group}"
    return residual


def local_oriented_plane3_residual(xs, meas):
    """LocalOrientedPlane3Factor: the plane variable lives in a local ANCHOR
    frame; the measurement observes it from a second pose (reference:
    gtsam_unstable/slam/LocalOrientedPlane3Factor.h — predicted =
    plane.transform(anchor.inverse() * pose)). xs = (pose, anchor, plane)."""
    from gtsam_personal_tpu.geometry import extra, se3
    pose, anchor, plane = xs
    rel = se3.compose(se3.inverse(anchor), pose)
    pred = extra.plane_transform(plane, rel)
    return extra.plane_local(meas["measured"], pred)
