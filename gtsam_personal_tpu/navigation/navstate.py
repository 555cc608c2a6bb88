"""NavState — pose + velocity manifold for inertial navigation.

Reference parity: gtsam/navigation/NavState.h. Storage is a [3, 5] matrix
[R | t | v]; tangent is (theta, dp, dv) with the reference's chart:

  retract(x, xi):  R' = R Exp(xi_R); t' = t + R xi_P; v' = v + R xi_V
                   (NavState::retract, NavState.cpp:309)
  local(x, y):     (Log(R^T R_y), R^T (t_y - t), R^T (v_y - v))
                   (NavState::localCoordinates, NavState.cpp:336)
"""

import jax.numpy as jnp

from gtsam_personal_tpu.geometry import so3

TANGENT_DIM = 9
PARAM_SHAPE = (3, 5)


def make(R, t, v):
    return jnp.concatenate([R, t[:, None], v[:, None]], axis=1)


def rotation(x):
    return x[:, :3]


def position(x):
    return x[:, 3]


def velocity(x):
    return x[:, 4]


def identity(dtype=jnp.float32):
    return jnp.concatenate([jnp.eye(3, dtype=dtype), jnp.zeros((3, 2), dtype=dtype)], axis=1)


def retract(x, xi):
    R, t, v = rotation(x), position(x), velocity(x)
    Rn = R @ so3.expmap(xi[:3])
    return make(Rn, t + R @ xi[3:6], v + R @ xi[6:9])


def local(x, y):
    R, t, v = rotation(x), position(x), velocity(x)
    dR = so3.logmap(R.T @ rotation(y))
    dP = R.T @ (position(y) - t)
    dV = R.T @ (velocity(y) - v)
    return jnp.concatenate([dR, dP, dV])


def from_pose_vel(pose, vel):
    """Build from an SE(3) [3,4] pose and velocity vector."""
    return jnp.concatenate([pose, vel[:, None]], axis=1)


def pose_of(x):
    return x[:, :4]
