"""Inertial-navigation factors: ImuFactor, CombinedImuFactor, GPS, attitude,
constant-velocity, barometric.

Reference parity: gtsam/navigation/ImuFactor.h:170 (5-way factor
Pose_i x Vel_i x Pose_j x Vel_j x Bias), CombinedImuFactor (6-way, adds bias
random walk), GPSFactor (GPSFactor.h:63), AttitudeFactor (Rot3 vs measured
gravity), ConstantVelocityFactor.

Factors plug into the generic batched stack: measurement pytrees carry the
PIM arrays; residual functions reconstruct NavStates from (se3, vel3) slots.
"""

import numpy as np
import jax.numpy as jnp

from gtsam_personal_tpu.core import manifolds
from gtsam_personal_tpu.geometry import se3, so3
from gtsam_personal_tpu.navigation import navstate, preintegration as pre


def imu_residual(xs, meas):
    """9-D residual of ImuFactor (reference: ImuFactor::evaluateError,
    ImuFactor.cpp:153 -> PreintegrationBase::computeErrorAndJacobians)."""
    pose_i, vel_i, pose_j, vel_j, bias = xs
    pim = pre.PIM(meas["zeta"], meas["H_ba"], meas["H_bw"],
                  jnp.zeros((9, 9), dtype=meas["zeta"].dtype),
                  meas["bias_hat"], meas["deltaT"])
    state_i = navstate.from_pose_vel(pose_i, vel_i)
    state_j = navstate.from_pose_vel(pose_j, vel_j)
    zeta = pre.bias_corrected_delta(pim, bias)
    xi = pre.correct_pim(state_i, zeta, pim.deltaT, meas["gravity"])
    pred = navstate.retract(state_i, xi)
    return navstate.local(state_j, pred)


def combined_imu_residual(xs, meas):
    """15-D residual: IMU error + bias random walk (reference:
    CombinedImuFactor, 6-way; bias evolution modeled as identity + noise.
    The reference propagates a joint 15x15 covariance including bias cross
    terms; here the bias-walk block is independent — same factor surface,
    slightly conservative coupling)."""
    pose_i, vel_i, pose_j, vel_j, bias_i, bias_j = xs
    r_imu = imu_residual((pose_i, vel_i, pose_j, vel_j, bias_i), meas)
    r_bias = bias_j - bias_i
    return jnp.concatenate([r_imu, r_bias])


def gps_residual(xs, meas):
    """Position-only factor on a pose (reference: GPSFactor::evaluateError =
    pose.translation() - measured, navigation/GPSFactor.h:63)."""
    (pose,) = xs
    return se3.translation(pose) - meas["measured"]


def attitude_residual(xs, meas):
    """Rot3 attitude vs measured gravity direction (reference:
    AttitudeFactor: error between nZ and R * bRef). 2-dof tangent error of
    unit vectors, realized as the first two components in the nZ frame."""
    (pose,) = xs
    R = se3.rotation(pose)
    pred = R @ meas["bRef"]          # predicted direction in nav frame
    nZ = meas["nZ"]
    # cross-product error vanishes iff directions align (rank-2 but
    # consistent; the reference uses the Unit3 2-dof chart)
    return jnp.cross(pred, nZ)


def constant_velocity_residual(xs, meas):
    """Velocities equal between consecutive states (reference:
    ConstantVelocityFactor)."""
    v1, v2 = xs
    return v2 - v1


def barometric_residual(xs, meas):
    """Height measurement (reference: BarometricFactor — simplified to a
    direct altitude observation with bias slot)."""
    pose, b = xs
    return jnp.atleast_1d(se3.translation(pose)[2] + b[0] - meas["height"])


# ---- builder sugar ----------------------------------------------------------

def add_imu_factor(builder, i, j, bias_key, pim: pre.PIM,
                   params: pre.PreintegrationParams,
                   pose_group="se3", vel_group="vel3", bias_group="imu_bias"):
    """Add an ImuFactor to a GraphBuilder; noise = sqrt-info of the PIM cov."""
    from gtsam_personal_tpu.slam.factors import full_info_noise
    cov = np.asarray(pim.cov)
    info = np.linalg.inv(0.5 * (cov + cov.T))
    meas = {
        "zeta": np.asarray(pim.zeta), "H_ba": np.asarray(pim.H_ba),
        "H_bw": np.asarray(pim.H_bw), "bias_hat": np.asarray(pim.bias_hat),
        "deltaT": np.asarray(pim.deltaT), "gravity": np.asarray(params.gravity),
    }
    builder.add("imu", imu_residual,
                (pose_group, vel_group, pose_group, vel_group, bias_group), 9,
                [i, i, j, j, bias_key], meas, full_info_noise(info))


def add_combined_imu_factor(builder, i, j, bias_i, bias_j, pim: pre.PIM,
                            params: pre.PreintegrationParams, dt_bias=None,
                            pose_group="se3", vel_group="vel3",
                            bias_group="imu_bias"):
    from gtsam_personal_tpu.slam.factors import full_info_noise
    cov = np.asarray(pim.cov)
    info9 = np.linalg.inv(0.5 * (cov + cov.T))
    T = float(pim.deltaT) if dt_bias is None else dt_bias
    bcov = np.zeros((6, 6))
    bcov[:3, :3] = np.asarray(params.bias_acc_cov) * max(T, 1e-9)
    bcov[3:, 3:] = np.asarray(params.bias_omega_cov) * max(T, 1e-9)
    info15 = np.zeros((15, 15))
    info15[:9, :9] = info9
    info15[9:, 9:] = np.linalg.inv(bcov)
    meas = {
        "zeta": np.asarray(pim.zeta), "H_ba": np.asarray(pim.H_ba),
        "H_bw": np.asarray(pim.H_bw), "bias_hat": np.asarray(pim.bias_hat),
        "deltaT": np.asarray(pim.deltaT), "gravity": np.asarray(params.gravity),
    }
    builder.add("combined_imu", combined_imu_residual,
                (pose_group, vel_group, pose_group, vel_group,
                 bias_group, bias_group), 15,
                [i, i, j, j, bias_i, bias_j], meas, full_info_noise(info15))


def add_gps_factor(builder, i, position, noise_dict, pose_group="se3"):
    builder.add("gps", gps_residual, (pose_group,), 3, [i],
                {"measured": np.asarray(position)}, noise_dict)


# -- magnetometer factors (reference: gtsam/navigation/MagFactor.h) ----------

def mag_rot3_residual(xs, meas):
    """MagFactor1: rotation-only unknown; predicted body-frame field
    bM = nRb^T nM + bias (reference: MagFactor.h:121). meas: nM [3] (scale *
    direction), bias [3], measured [3]."""
    (nRb,) = xs
    return nRb.T @ meas["nM"] + meas["bias"] - meas["measured"]


def mag_field_bias_residual(xs, meas):
    """MagFactor2: unknown nav-frame field nM and bias, known attitude bRn
    (reference: MagFactor.h:162)."""
    nM, bias = xs
    return meas["bRn"] @ nM + bias - meas["measured"]


def mag_scale_dir_bias_residual(xs, meas):
    """MagFactor3: unknown scale (r1), field direction (unit3) and bias
    (reference: MagFactor.h:174): bM = scale * bRn * direction + bias."""
    scale, direction, bias = xs
    return scale[0] * (meas["bRn"] @ direction) + bias - meas["measured"]


def mag_pose_residual(xs, meas):
    """MagPoseFactor<Pose3> (reference: navigation/MagPoseFactor.h): field
    measured in the body frame of a full pose."""
    (pose,) = xs
    return se3.rotation(pose).T @ meas["nM"] + meas["bias"] - meas["measured"]


def add_ahrs_factor(builder, i, j, bias_key, apim: "pre.AhrsPIM",
                    rot_group="so3", bias_group="gyro_bias"):
    """Add an AHRSFactor (Rot_i, Rot_j, gyro bias) to a GraphBuilder
    (reference: AHRSFactor.h:135)."""
    from gtsam_personal_tpu.slam.factors import full_info_noise
    manifolds.vector_space(bias_group, 3)
    cov = np.asarray(apim.cov)
    info = np.linalg.inv(0.5 * (cov + cov.T))
    meas = {"theta": np.asarray(apim.theta), "H_bw": np.asarray(apim.H_bw),
            "bias_hat": np.asarray(apim.bias_hat)}
    builder.add("ahrs", pre.ahrs_residual, (rot_group, rot_group, bias_group),
                3, [i, j, bias_key], meas, full_info_noise(info))


def biased_gps_residual(xs, meas):
    """BiasedGPSFactor: GPS measurement with a slowly-varying additive bias
    estimated as its own variable (reference:
    gtsam_unstable/slam/BiasedGPSFactor.h:78 — error = translation(pose) +
    bias - measured, bias in the world frame)."""
    from gtsam_personal_tpu.geometry import se3
    pose, bias = xs
    return se3.translation(pose) + bias - meas["measured"]


def gauss_markov_residual(xs, meas):
    """GaussMarkov1stOrderFactor: first-order Gauss-Markov process prior
    v2 = exp(-dt/tau) * v1 + w_d, elementwise over the state (reference:
    gtsam_unstable/slam/GaussMarkov1stOrderFactor.h:31). meas: dt [1] or
    scalar, tau [d]."""
    import jax.numpy as jnp
    v1, v2 = xs
    alpha = jnp.exp(-meas["dt"] / meas["tau"])
    return v2 - alpha * v1


def gauss_markov_discrete_sigmas(sigmas_ct, dt):
    """Continuous-time process sigmas -> discrete-time factor sigmas,
    Q_d ~= Q * dt (reference: GaussMarkov1stOrderFactor.h:127
    calcDiscreteNoiseModel)."""
    import numpy as np
    return np.asarray(sigmas_ct) * np.sqrt(dt)
