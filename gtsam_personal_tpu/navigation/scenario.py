"""IMU simulation scenarios — ground-truth trajectories + synthetic IMU.

Reference parity: gtsam/navigation/Scenario.h (ConstantTwistScenario) and
ScenarioRunner.h: synthesize ideal body-frame IMU measurements from an
analytic trajectory; tests integrate them and compare against the closed-form
motion (navigation/tests/testImuFactor.cpp strategy).
"""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from gtsam_personal_tpu.geometry import so3, se3
from gtsam_personal_tpu.navigation import navstate


class ConstantTwistScenario(NamedTuple):
    """Body frame moves with constant twist (omega_b, v_b); world pose
    T(t) = Exp(t [omega, v])."""
    omega_b: np.ndarray
    v_b: np.ndarray

    def pose(self, t):
        xi = jnp.concatenate([jnp.asarray(self.omega_b) * t,
                              jnp.asarray(self.v_b) * t])
        return se3.expmap(xi)

    def nav_state(self, t):
        pose = self.pose(t)
        R = se3.rotation(pose)
        v_world = R @ jnp.asarray(self.v_b)
        return navstate.from_pose_vel(pose, v_world)

    def imu_measurements(self, t_end, dt, gravity):
        """Ideal (acc, gyro) samples over [0, t_end): constant in body frame.

        specific force f_b = omega x v (centripetal) - R^T g."""
        n = int(round(t_end / dt))
        ts = np.arange(n) * dt
        w = np.asarray(self.omega_b)
        v = np.asarray(self.v_b)
        a_centripetal = np.cross(w, v)
        accs, gyros = [], []
        for t in ts:
            R = np.asarray(self.pose(float(t)))[:, :3]
            accs.append(a_centripetal - R.T @ np.asarray(gravity))
            gyros.append(w)
        return (np.asarray(accs), np.asarray(gyros), np.full(n, dt))


class AcceleratingScenario(NamedTuple):
    """Accelerating from an initial state with constant nav-frame acceleration
    a_n and constant body rotation rate omega_b (reference: Scenario.h:79
    AcceleratingScenario)."""
    R0: np.ndarray        # [3,3] initial attitude
    p0: np.ndarray        # [3]
    v0: np.ndarray        # [3] nav-frame initial velocity
    a_n: np.ndarray       # [3] nav-frame acceleration
    omega_b: np.ndarray   # [3] body rotation rate

    def pose(self, t):
        R = jnp.asarray(self.R0) @ so3.expmap(jnp.asarray(self.omega_b) * t)
        p = (jnp.asarray(self.p0) + jnp.asarray(self.v0) * t
             + 0.5 * t * t * jnp.asarray(self.a_n))
        return se3.make(R, p)

    def nav_state(self, t):
        v = jnp.asarray(self.v0) + jnp.asarray(self.a_n) * t
        return navstate.from_pose_vel(self.pose(t), v)

    def imu_measurements(self, t_end, dt, gravity):
        """Ideal body-frame IMU: gyro = omega_b; specific force
        f_b = R(t)^T (a_n - g)."""
        n = int(round(t_end / dt))
        accs, gyros = [], []
        for k in range(n):
            t = k * dt
            R = np.asarray(self.pose(float(t)))[:, :3]
            accs.append(R.T @ (np.asarray(self.a_n) - np.asarray(gravity)))
            gyros.append(np.asarray(self.omega_b))
        return (np.asarray(accs), np.asarray(gyros), np.full(n, dt))
