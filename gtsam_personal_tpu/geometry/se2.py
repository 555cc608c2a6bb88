"""SE(2) — planar rigid transforms stored as (x, y, theta).

Capability parity with the reference's `gtsam/geometry/Pose2.h`: Expmap/Logmap,
compose/between/inverse, transformFrom/transformTo, AdjointMap. Tangent
convention matches the reference: xi = (v_x, v_y, omega) with the full
exponential map as the default chart (Pose2::Expmap).

Storage: shape-(3,) array [x, y, theta]. Pure single-element functions; batch
with `jax.vmap`.
"""

import jax.numpy as jnp

from gtsam_personal_tpu.geometry import so2

TANGENT_DIM = 3
PARAM_SHAPE = (3,)

_SMALL = 1e-10


def identity(dtype=jnp.float32):
    return jnp.zeros(3, dtype=dtype)


def translation(p):
    return p[:2]


def rotation(p):
    return p[2]


def make(t, theta):
    return jnp.concatenate([t, jnp.atleast_1d(theta)])


def expmap(xi):
    """xi = (vx, vy, w) -> pose; t = V(w) v with the SE(2) V-matrix."""
    v, w = xi[:2], xi[2]
    w2 = w * w
    small = w2 < _SMALL
    w_safe = jnp.where(small, 1.0, w)
    A = jnp.where(small, 1.0 - w2 / 6.0, jnp.sin(w_safe) / w_safe)          # sin w / w
    B = jnp.where(small, 0.5 * w - w * w2 / 24.0, (1.0 - jnp.cos(w_safe)) / w_safe)  # (1-cos w)/w
    t = jnp.stack([A * v[0] - B * v[1], B * v[0] + A * v[1]])
    return make(t, w)


def logmap(p):
    """Inverse of expmap; returns (vx, vy, w) with w wrapped to (-pi, pi]."""
    t, w = p[:2], so2.wrap(p[2])
    w2 = w * w
    small = w2 < _SMALL
    w_safe = jnp.where(small, 1.0, w)
    A = jnp.where(small, 1.0 - w2 / 6.0, jnp.sin(w_safe) / w_safe)
    B = jnp.where(small, 0.5 * w - w * w2 / 24.0, (1.0 - jnp.cos(w_safe)) / w_safe)
    det = A * A + B * B
    # V^{-1} = 1/det * [[A, B], [-B, A]]
    vx = (A * t[0] + B * t[1]) / det
    vy = (-B * t[0] + A * t[1]) / det
    return jnp.stack([vx, vy, w])


def compose(a, b):
    ta, wa = a[:2], a[2]
    tb, wb = b[:2], b[2]
    t = ta + so2.rotate(wa, tb)
    return make(t, wa + wb)


def inverse(a):
    t, w = a[:2], a[2]
    return make(-so2.unrotate(w, t), -w)


def between(a, b):
    return compose(inverse(a), b)


def transform_from(p, pt):
    """Apply pose to a point in the local frame (reference: Pose2::transformFrom)."""
    return p[:2] + so2.rotate(p[2], pt)


def transform_to(p, pt):
    """World point -> local frame (reference: Pose2::transformTo)."""
    return so2.unrotate(p[2], pt - p[:2])


def retract(p, xi):
    """Right retraction p * Exp(xi) — the reference's default Pose2 chart."""
    return compose(p, expmap(xi))


def local(a, b):
    return logmap(between(a, b))


def adjoint(p):
    """AdjointMap in (v, w) tangent ordering (reference: Pose2::AdjointMap)."""
    c, s = jnp.cos(p[2]), jnp.sin(p[2])
    x, y = p[0], p[1]
    z = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, -s, y]),
        jnp.stack([s, c, -x]),
        jnp.stack([z, z, one]),
    ])


def bearing(p, pt):
    """Bearing angle to a 2D point (reference: BearingRange / Pose2::bearing)."""
    d = transform_to(p, pt)
    return jnp.arctan2(d[1], d[0])


def range_to(p, pt):
    d = pt - p[:2]
    return jnp.linalg.norm(d)
