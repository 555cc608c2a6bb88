"""IMU preintegration on the 9-D tangent space, as a `lax.scan`.

Reference parity: gtsam/navigation/TangentPreintegration.{h,cpp} (the default
GTSAM_TANGENT_PREINTEGRATION backend) + PreintegrationBase::biasCorrectedDelta
/ predict / computeError (PreintegrationBase.cpp:117-186) and the covariance
propagation of PreintegratedImuMeasurements.

State zeta = (theta, dpos, dvel) integrates in the tangent frame at t_i
(TangentPreintegration::UpdatePreintegrated, TangentPreintegration.cpp:54):

  theta+ = theta + Jr(theta)^{-1} w dt
  pos+   = pos + vel dt + Exp(theta) a dt^2/2
  vel+   = vel + Exp(theta) a dt

The propagation Jacobians A = d zeta+/d zeta, B = d zeta+/d a, C = d zeta+/d w
come from `jax.jacfwd` of the update (the reference hand-codes them); they
drive both the covariance recursion and the first-order bias correction:
  H_ba+ = A H_ba - B,  H_bw+ = A H_bw - C  (TangentPreintegration.cpp:update)
  cov+  = A cov A^T + B (accCov/dt) B^T + C (gyrCov/dt) C^T + intCov blocks
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gtsam_personal_tpu.geometry import so3
from gtsam_personal_tpu.navigation import navstate


class PreintegrationParams(NamedTuple):
    """Reference: PreintegrationParams (navigation/PreintegrationParams.h)."""
    gravity: jnp.ndarray               # [3] in nav frame, e.g. (0,0,-9.81)
    accel_cov: jnp.ndarray             # [3,3] continuous-time accel noise cov
    gyro_cov: jnp.ndarray              # [3,3]
    integration_cov: jnp.ndarray       # [3,3] position integration noise
    bias_acc_cov: Optional[jnp.ndarray] = None   # [3,3] random walk (Combined)
    bias_omega_cov: Optional[jnp.ndarray] = None

    @staticmethod
    def make_shared_u(g=9.81, accel_sigma=0.1, gyro_sigma=0.01,
                      integration_sigma=1e-4, dtype=jnp.float64):
        """MakeSharedU analogue: Z-up navigation frame, gravity = (0,0,-g)."""
        I = jnp.eye(3, dtype=dtype)
        return PreintegrationParams(
            gravity=jnp.array([0.0, 0.0, -g], dtype=dtype),
            accel_cov=accel_sigma ** 2 * I,
            gyro_cov=gyro_sigma ** 2 * I,
            integration_cov=integration_sigma ** 2 * I,
            bias_acc_cov=1e-5 * I, bias_omega_cov=1e-6 * I)


class PIM(NamedTuple):
    """Preintegrated IMU measurements (reference: PreintegratedImuMeasurements)."""
    zeta: jnp.ndarray       # [9] (theta, dp, dv)
    H_ba: jnp.ndarray       # [9,3] d zeta / d accel bias
    H_bw: jnp.ndarray       # [9,3] d zeta / d gyro bias
    cov: jnp.ndarray        # [9,9] preintMeasCov
    bias_hat: jnp.ndarray   # [6] (ba, bw) used during integration
    deltaT: jnp.ndarray     # scalar total dt


def _right_jacobian_inv(theta):
    """Jr(theta)^{-1} = Jl(-theta)^{-1}."""
    return so3.left_jacobian_inverse(-theta)


def _update_zeta(zeta, a, w, dt):
    """UpdatePreintegrated (TangentPreintegration.cpp:54)."""
    theta, pos, vel = zeta[:3], zeta[3:6], zeta[6:9]
    w_tan = _right_jacobian_inv(theta) @ w
    R = so3.expmap(theta)
    a_nav = R @ a
    dt22 = 0.5 * dt * dt
    return jnp.concatenate([
        theta + w_tan * dt,
        pos + vel * dt + a_nav * dt22,
        vel + a_nav * dt,
    ])


def integrate(params: PreintegrationParams, bias_hat: jnp.ndarray,
              accs: jnp.ndarray, gyros: jnp.ndarray, dts: jnp.ndarray) -> PIM:
    """Integrate a whole IMU segment in one lax.scan.

    accs [N,3], gyros [N,3], dts [N] -> PIM. The per-sample loop of the
    reference (integrateMeasurement called N times) becomes a scan whose body
    autodiffs the update for A, B, C."""
    dtype = accs.dtype
    ba, bw = bias_hat[:3], bias_hat[3:]

    def step(carry, inp):
        zeta, H_ba, H_bw, cov, T = carry
        acc_m, gyro_m, dt = inp
        a = acc_m - ba
        w = gyro_m - bw
        zeta_new = _update_zeta(zeta, a, w, dt)
        A = jax.jacfwd(_update_zeta, argnums=0)(zeta, a, w, dt)
        B = jax.jacfwd(_update_zeta, argnums=1)(zeta, a, w, dt)
        C = jax.jacfwd(_update_zeta, argnums=2)(zeta, a, w, dt)
        H_ba_new = A @ H_ba - B
        H_bw_new = A @ H_bw - C
        dt_safe = jnp.maximum(dt, 1e-12)
        cov_new = A @ cov @ A.T \
            + B @ (params.accel_cov.astype(dtype) / dt_safe) @ B.T \
            + C @ (params.gyro_cov.astype(dtype) / dt_safe) @ C.T
        cov_new = cov_new.at[3:6, 3:6].add(params.integration_cov.astype(dtype) * dt)
        return (zeta_new, H_ba_new, H_bw_new, cov_new, T + dt), None

    init = (jnp.zeros(9, dtype), jnp.zeros((9, 3), dtype), jnp.zeros((9, 3), dtype),
            jnp.zeros((9, 9), dtype), jnp.zeros((), dtype))
    (zeta, H_ba, H_bw, cov, T), _ = jax.lax.scan(step, init, (accs, gyros, dts))
    return PIM(zeta, H_ba, H_bw, cov, bias_hat, T)


def bias_corrected_delta(pim: PIM, bias: jnp.ndarray) -> jnp.ndarray:
    """First-order bias correction (TangentPreintegration::biasCorrectedDelta)."""
    incr = bias - pim.bias_hat
    return pim.zeta + pim.H_ba @ incr[:3] + pim.H_bw @ incr[3:]


def correct_pim(state_i, zeta, dt, gravity):
    """NavState::correctPIM (NavState.cpp:462): add initial velocity and
    gravity contributions in the body frame of state_i."""
    R = navstate.rotation(state_i)
    v = navstate.velocity(state_i)
    dt22 = 0.5 * dt * dt
    xi_R = zeta[:3]
    xi_P = zeta[3:6] + dt * (R.T @ v) + dt22 * (R.T @ gravity)
    xi_V = zeta[6:9] + dt * (R.T @ gravity)
    return jnp.concatenate([xi_R, xi_P, xi_V])


def predict(pim: PIM, params: PreintegrationParams, state_i, bias):
    """PreintegrationBase::predict (PreintegrationBase.cpp:117)."""
    zeta = bias_corrected_delta(pim, bias)
    xi = correct_pim(state_i, zeta, pim.deltaT, params.gravity.astype(zeta.dtype))
    return navstate.retract(state_i, xi)


def compute_error(pim: PIM, params: PreintegrationParams, state_i, state_j, bias):
    """PreintegrationBase::computeError: r = Local(state_j, predict(state_i))."""
    pred = predict(pim, params, state_i, bias)
    return navstate.local(state_j, pred)


# ---------------------------------------------------------------------------
# Manifold preintegration backend (reference: ManifoldPreintegration.{h,cpp})
# ---------------------------------------------------------------------------

def _manifold_scan(bias, accs, gyros, dts):
    """Integrate (deltaR, deltaP, deltaV) ON the manifold — R composes as an
    exact rotation matrix at every step (the reference backend's defining
    property vs the tangent backend's first-order theta update)."""
    dtype = accs.dtype
    ba, bw = bias[:3], bias[3:]

    def step(carry, inp):
        R, p, v = carry
        acc_m, gyro_m, dt = inp
        a = acc_m - ba
        w = gyro_m - bw
        a_nav = R @ a
        p_new = p + v * dt + 0.5 * dt * dt * a_nav
        v_new = v + a_nav * dt
        R_new = R @ so3.expmap(w * dt)
        return (R_new, p_new, v_new), None

    init = (jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype),
            jnp.zeros(3, dtype=dtype))
    (R, p, v), _ = jax.lax.scan(step, init, (accs, gyros, dts))
    return R, p, v


def integrate_manifold(params: PreintegrationParams, bias_hat: jnp.ndarray,
                       accs: jnp.ndarray, gyros: jnp.ndarray,
                       dts: jnp.ndarray) -> PIM:
    """ManifoldPreintegration analogue returning the same PIM record, so
    predict / compute_error / the IMU factors work with either backend.

    The reference hand-propagates delRdelBiasOmega / delPdelBiasAcc / ...
    per sample (ManifoldPreintegration.cpp:77); here the bias Jacobians are
    one `jacfwd` of the whole scan with respect to the bias — exact
    first-order sensitivities of the final (Log deltaR, deltaP, deltaV)."""

    def final_zeta(bias):
        R, p, v = _manifold_scan(bias, accs, gyros, dts)
        return jnp.concatenate([so3.logmap(R), p, v])

    zeta = final_zeta(bias_hat)
    H = jax.jacfwd(final_zeta)(bias_hat)          # [9, 6]
    # covariance: same first-order propagation as the tangent backend (both
    # backends agree on cov to O(dt^2); reference ManifoldPreintegration
    # reuses PreintegratedImuMeasurements' A/B/C recursion)
    pim_t = integrate(params, bias_hat, accs, gyros, dts)
    return PIM(zeta, H[:, :3], H[:, 3:], pim_t.cov, bias_hat,
               jnp.sum(dts))


# ---------------------------------------------------------------------------
# AHRS: rotation-only preintegration (reference: AHRSFactor.h,
# PreintegratedAhrsMeasurements / PreintegratedRotation.h)
# ---------------------------------------------------------------------------

class AhrsPIM(NamedTuple):
    """Preintegrated gyro measurements (reference:
    PreintegratedAhrsMeasurements, AHRSFactor.h:36)."""
    theta: jnp.ndarray      # [3] Log(deltaRij)
    H_bw: jnp.ndarray       # [3,3] d theta / d gyro bias
    cov: jnp.ndarray        # [3,3] preintMeasCov
    bias_hat: jnp.ndarray   # [3]
    deltaT: jnp.ndarray


def integrate_ahrs(gyro_cov: jnp.ndarray, bias_hat: jnp.ndarray,
                   gyros: jnp.ndarray, dts: jnp.ndarray) -> AhrsPIM:
    """PreintegratedAhrsMeasurements::integrateMeasurement as one scan;
    deltaRij composes exactly, the bias Jacobian is jacfwd through the scan."""
    dtype = gyros.dtype

    def final_theta(bw):
        def step(R, inp):
            gyro_m, dt = inp
            return R @ so3.expmap((gyro_m - bw) * dt), None
        R, _ = jax.lax.scan(step, jnp.eye(3, dtype=dtype), (gyros, dts))
        return so3.logmap(R)

    theta = final_theta(bias_hat)
    H = jax.jacfwd(final_theta)(bias_hat)

    def cov_step(cov, inp):
        gyro_m, dt = inp
        w = (gyro_m - bias_hat) * dt
        A = so3.expmap(w).T            # whole-rotation error transport
        Jr = so3.left_jacobian(-w)     # right Jacobian of Exp
        B = Jr * dt
        dt_safe = jnp.maximum(dt, 1e-12)
        return A @ cov @ A.T + B @ (gyro_cov.astype(dtype) / dt_safe) @ B.T, None

    cov, _ = jax.lax.scan(cov_step, jnp.zeros((3, 3), dtype=dtype),
                          (gyros, dts))
    return AhrsPIM(theta, H, cov, bias_hat, jnp.sum(dts))


def ahrs_residual(xs, meas):
    """AHRSFactor::evaluateError (AHRSFactor.cpp): r = Log( (deltaRij *
    Exp(H (b - b_hat)))^{-1} * Ri^{-1} Rj ). Variables: (Ri, Rj, bias[3])."""
    Ri, Rj, bias = xs
    theta_corr = meas["theta"] + meas["H_bw"] @ (bias - meas["bias_hat"])
    dR_corr = so3.expmap(theta_corr)
    return so3.logmap(dR_corr.T @ (Ri.T @ Rj))
