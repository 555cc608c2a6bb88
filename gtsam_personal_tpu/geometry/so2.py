"""SO(2) — planar rotations stored as a single angle.

Capability parity with the reference's `gtsam/geometry/Rot2.h`. The storage is
the angle theta (shape ()); compose is addition with wrap-around. All ops are
single-element pure functions, batched with `jax.vmap`.
"""

import jax.numpy as jnp

TANGENT_DIM = 1
PARAM_SHAPE = ()


def wrap(theta):
    """Wrap angle to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))


def identity(dtype=jnp.float32):
    return jnp.zeros((), dtype=dtype)


def expmap(w):
    return w[0] if w.ndim == 1 else w


def logmap(theta):
    return jnp.atleast_1d(wrap(theta))


def compose(a, b):
    return a + b


def inverse(a):
    return -a


def between(a, b):
    return b - a


def matrix(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])


def rotate(theta, p):
    return matrix(theta) @ p


def unrotate(theta, p):
    return matrix(theta).T @ p


def retract(theta, w):
    return theta + (w[0] if w.ndim == 1 else w)


def local(a, b):
    return jnp.atleast_1d(wrap(b - a))
