"""SO(3) — rotation matrices, closed-form exp/log, left Jacobians.

Capability parity with the reference's `gtsam/geometry/SO3.h` (`ExpmapFunctor`,
`DexpFunctor` i.e. the left Jacobian, compose/between/inverse) and
`gtsam/geometry/Rot3.h` (matrix backend). Everything here is a pure function on
a single element; batching comes from `jax.vmap` at the call site.

All functions are autodiff-safe: small-angle branches use the
double-`where` guard so gradients never see NaN from 0/0.

Storage: a 3x3 rotation matrix, dtype-polymorphic.
Tangent convention: axis-angle vector omega, R = exp(hat(omega)), matching the
reference (Rot3::Expmap).
"""

import jax.numpy as jnp

TANGENT_DIM = 3
PARAM_SHAPE = (3, 3)

_SMALL = 1e-6  # squared-angle threshold for Taylor branches


def hat(w):
    """3-vector -> skew-symmetric matrix (reference: gtsam/geometry/SO3.h skewSymmetric)."""
    wx, wy, wz = w[0], w[1], w[2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy]),
        jnp.stack([wz, z, -wx]),
        jnp.stack([-wy, wx, z]),
    ])


def vee(W):
    """Inverse of hat."""
    return jnp.stack([W[2, 1], W[0, 2], W[1, 0]])


def identity(dtype=jnp.float32):
    return jnp.eye(3, dtype=dtype)


def _trig_coeffs(theta2):
    """A = sin(t)/t, B = (1-cos t)/t^2, C = (t - sin t)/t^3, all Taylor-guarded.

    These are the coefficients of the exponential map and the left Jacobian
    (reference: gtsam/geometry/SO3.h DexpFunctor).
    """
    small = theta2 < _SMALL
    t2 = jnp.where(small, 1.0, theta2)  # safe value, used only in exact branch
    theta = jnp.sqrt(t2)
    A = jnp.where(small, 1.0 - theta2 / 6.0 + theta2 * theta2 / 120.0,
                  jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0 + theta2 * theta2 / 720.0,
                  (1.0 - jnp.cos(theta)) / t2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0 + theta2 * theta2 / 5040.0,
                  (theta - jnp.sin(theta)) / (t2 * theta))
    return A, B, C


def expmap(w):
    """Rodrigues formula: R = I + A*W + B*W^2."""
    theta2 = jnp.dot(w, w)
    A, B, _ = _trig_coeffs(theta2)
    W = hat(w)
    I = jnp.eye(3, dtype=w.dtype)
    return I + A * W + B * (W @ W)


def logmap(R):
    """Rotation matrix -> axis-angle. Handles theta ~ 0 and theta ~ pi.

    Mirrors the robustness strategy of the reference Rot3::Logmap
    (gtsam/geometry/SO3.cpp): generic atan2-based formula, Taylor branch near
    zero, diagonal-based axis extraction near pi.
    """
    v = 0.5 * vee(R - R.T)            # = sin(theta) * axis
    s2 = jnp.dot(v, v)                # sin(theta)^2
    c = 0.5 * (jnp.trace(R) - 1.0)    # cos(theta)
    s_small = s2 < 1e-12

    # Generic branch: omega = theta / sin(theta) * v. All intermediates are
    # guarded so their gradients stay finite when this branch is NOT selected
    # (jnp.where JVP selects branch tangents, but NaN *primal* intermediates
    # would poison the selected branch).
    s_safe = jnp.sqrt(jnp.where(s_small, 1.0, s2))
    theta_g = jnp.arctan2(s_safe, c)
    generic = (theta_g / s_safe) * v

    # Near zero (s small, c > 0): theta ~ s, theta/sin(theta) as a polynomial
    # in s^2 (no sqrt -> smooth gradient at exactly zero).
    near_zero = (1.0 + s2 / 6.0 + 7.0 * s2 * s2 / 360.0) * v

    # Near pi (s small, c < 0): R ~ 2*a*a^T - I; extract axis from the largest
    # diagonal entry, then fix the sign to agree with v. Gradient here is
    # inherently ill-conditioned; the tiny sqrt offset keeps it finite.
    s_pi = jnp.sqrt(s2 + 1e-30)
    theta_pi = jnp.arctan2(s_pi, c)
    diag = jnp.diagonal(R)
    k = jnp.argmax(diag)
    dk = jnp.clip(diag[k], -1.0 + 1e-12, None)
    ak = jnp.sqrt((dk + 1.0) * 0.5)
    ak_safe = jnp.where(ak < 1e-12, 1.0, ak)
    col = 0.25 * (R[:, k] + R[k, :]) / ak_safe
    a = col.at[k].set(ak)
    a = a / jnp.sqrt(jnp.maximum(jnp.dot(a, a), 1e-24))
    sign = jnp.where(jnp.dot(a, v) < 0.0, -1.0, 1.0)
    near_pi = theta_pi * sign * a

    return jnp.where(s_small, jnp.where(c > 0.0, near_zero, near_pi), generic)


def compose(R1, R2):
    return R1 @ R2


def inverse(R):
    return R.T


def between(R1, R2):
    """R1^{-1} * R2 (reference: LieGroup::between, base/Lie.h)."""
    return R1.T @ R2


def rotate(R, p):
    return R @ p


def unrotate(R, p):
    return R.T @ p


def retract(R, w):
    """Right retraction: R * Exp(w) — the reference's default Rot3 chart."""
    return R @ expmap(w)


def local(R1, R2):
    """Inverse retraction: Log(R1^T R2)."""
    return logmap(R1.T @ R2)


def left_jacobian(w):
    """SO(3) left Jacobian J_l = I + B*W + C*W^2 (reference DexpFunctor.leftJacobian)."""
    theta2 = jnp.dot(w, w)
    _, B, C = _trig_coeffs(theta2)
    W = hat(w)
    I = jnp.eye(3, dtype=w.dtype)
    return I + B * W + C * (W @ W)


def left_jacobian_inverse(w):
    """Inverse left Jacobian: I - W/2 + D*W^2 with D = 1/t^2 - (1+cos)/(2 t sin)."""
    theta2 = jnp.dot(w, w)
    small = theta2 < _SMALL
    t2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(t2)
    s = jnp.sin(theta)
    s_safe = jnp.where(jnp.abs(s) < 1e-12, 1.0, s)
    exact = 1.0 / t2 - (1.0 + jnp.cos(theta)) / (2.0 * theta * s_safe)
    taylor = 1.0 / 12.0 + theta2 / 720.0 + theta2 * theta2 / 30240.0
    D = jnp.where(small, taylor, exact)
    W = hat(w)
    I = jnp.eye(3, dtype=w.dtype)
    return I - 0.5 * W + D * (W @ W)


def adjoint(R):
    """Adjoint map of SO(3) is R itself."""
    return R


def normalize(R):
    """Project a near-rotation back onto SO(3) via SVD (reference: Rot3::ClosestTo)."""
    u, _, vt = jnp.linalg.svd(R)
    d = jnp.linalg.det(u @ vt)
    return u @ jnp.diag(jnp.array([1.0, 1.0, d], dtype=R.dtype)) @ vt


def random(key, dtype=jnp.float32):
    import jax
    w = jax.random.normal(key, (3,), dtype=dtype)
    return expmap(w)
