"""SE(3) — rigid transforms stored as a 3x4 matrix [R | t].

Capability parity with the reference's `gtsam/geometry/Pose3.h`: full
Expmap/Logmap (the reference default, GTSAM_POSE3_EXPMAP), compose / between /
inverse, transformFrom/transformTo, AdjointMap. Tangent convention matches the
reference: xi = (omega, v) — rotation first (Pose3.h:147-150).

Pure single-element functions; batch with `jax.vmap`.
"""

import jax.numpy as jnp

from gtsam_personal_tpu.geometry import so3

TANGENT_DIM = 6
PARAM_SHAPE = (3, 4)


def identity(dtype=jnp.float32):
    return jnp.eye(3, 4, dtype=dtype)


def make(R, t):
    return jnp.concatenate([R, t[:, None]], axis=1)


def rotation(p):
    return p[:, :3]


def translation(p):
    return p[:, 3]


def expmap(xi):
    """xi = (omega, v); R = Exp(omega), t = J_l(omega) v (chained exponential)."""
    w, v = xi[:3], xi[3:]
    R = so3.expmap(w)
    t = so3.left_jacobian(w) @ v
    return make(R, t)


def logmap(p):
    w = so3.logmap(rotation(p))
    v = so3.left_jacobian_inverse(w) @ translation(p)
    return jnp.concatenate([w, v])


def compose(a, b):
    Ra, ta = rotation(a), translation(a)
    Rb, tb = rotation(b), translation(b)
    return make(Ra @ Rb, ta + Ra @ tb)


def inverse(a):
    R, t = rotation(a), translation(a)
    return make(R.T, -(R.T @ t))


def between(a, b):
    return compose(inverse(a), b)


def transform_from(p, pt):
    return rotation(p) @ pt + translation(p)


def transform_to(p, pt):
    return rotation(p).T @ (pt - translation(p))


def retract(p, xi):
    """Right retraction p * Exp(xi) — reference default chart (GTSAM_POSE3_EXPMAP)."""
    return compose(p, expmap(xi))


def local(a, b):
    return logmap(between(a, b))


def adjoint(p):
    """AdjointMap in (omega, v) ordering (reference: Pose3::AdjointMap, Pose3.h:156)."""
    R, t = rotation(p), translation(p)
    Z = jnp.zeros((3, 3), dtype=p.dtype)
    top = jnp.concatenate([R, Z], axis=1)
    bot = jnp.concatenate([so3.hat(t) @ R, R], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def range_to(p, pt):
    return jnp.linalg.norm(pt - translation(p))


def random(key, dtype=jnp.float32):
    import jax
    xi = jax.random.normal(key, (6,), dtype=dtype)
    return expmap(xi)
