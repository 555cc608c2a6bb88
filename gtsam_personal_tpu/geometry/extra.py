"""Additional manifold types: Unit3, Sim(3), Sim(2), essential matrix,
oriented plane, stereo point.

Reference parity: gtsam/geometry/Unit3.h, Similarity3.h, Similarity2.h,
EssentialMatrix.h, OrientedPlane3.h, StereoPoint2.h. Pure single-element
functions, batched with vmap; registered as manifolds where optimizable.
"""

import jax.numpy as jnp

from gtsam_personal_tpu.core import manifolds
from gtsam_personal_tpu.geometry import so3, se3


# ---------------------------------------------------------------------------
# Unit3 — direction on S^2, 2-dof tangent (reference: Unit3.h)
# ---------------------------------------------------------------------------

def unit3_basis(n):
    """Two orthonormal tangent vectors at n (reference: Unit3::basis)."""
    # pick the axis least aligned with n
    ax = jnp.where(jnp.abs(n[0]) < 0.9,
                   jnp.array([1.0, 0.0, 0.0], dtype=n.dtype),
                   jnp.array([0.0, 1.0, 0.0], dtype=n.dtype))
    b1 = jnp.cross(n, ax)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-12)
    b2 = jnp.cross(n, b1)
    return b1, b2


def unit3_retract(n, xi):
    """Exponential-map retraction on the sphere."""
    b1, b2 = unit3_basis(n)
    v = xi[0] * b1 + xi[1] * b2
    theta2 = jnp.dot(v, v)
    small = theta2 < 1e-12
    t = jnp.sqrt(jnp.where(small, 1.0, theta2))
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(t) / t)
    out = jnp.cos(t) * n + A * v
    return out / jnp.maximum(jnp.linalg.norm(out), 1e-12)


def unit3_local(n, m):
    b1, b2 = unit3_basis(n)
    c = jnp.clip(jnp.dot(n, m), -1.0, 1.0)
    theta = jnp.arccos(c)
    perp = m - c * n
    s = jnp.linalg.norm(perp)
    s_safe = jnp.where(s < 1e-12, 1.0, s)
    # limit theta/s -> 1 as m -> n; using the limit value in the guard branch
    # keeps autodiff correct at coincidence (v ~= perp there)
    scale = jnp.where(s < 1e-12, 1.0, theta / s_safe)
    v = scale * perp
    return jnp.stack([jnp.dot(v, b1), jnp.dot(v, b2)])


UNIT3 = manifolds.register(manifolds.Manifold(
    "unit3", 2, (3,), unit3_retract, unit3_local,
    lambda dtype=jnp.float32: jnp.array([0.0, 0.0, 1.0], dtype=dtype)))


# ---------------------------------------------------------------------------
# Sim(3) — similarity transforms stored [R | t | s-column], param [3, 5]
# tangent (omega, v, lambda) matching the reference Similarity3 ordering
# (rotation, translation, scale; Similarity3.h)
# ---------------------------------------------------------------------------

def sim3_make(R, t, s):
    col = jnp.concatenate([jnp.atleast_1d(s), jnp.zeros(2, dtype=R.dtype)])
    return jnp.concatenate([R, t[:, None], col[:, None]], axis=1)


def sim3_R(g):
    return g[:, :3]


def sim3_t(g):
    return g[:, 3]


def sim3_s(g):
    return g[0, 4]


def sim3_identity(dtype=jnp.float32):
    return sim3_make(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype),
                     jnp.ones((), dtype=dtype))


def sim3_compose(a, b):
    return sim3_make(sim3_R(a) @ sim3_R(b),
                     sim3_t(a) + sim3_s(a) * (sim3_R(a) @ sim3_t(b)),
                     sim3_s(a) * sim3_s(b))


def sim3_inverse(a):
    Rinv = sim3_R(a).T
    sinv = 1.0 / sim3_s(a)
    return sim3_make(Rinv, -sinv * (Rinv @ sim3_t(a)), sinv)


def sim3_transform(g, p):
    return sim3_s(g) * (sim3_R(g) @ p) + sim3_t(g)


def sim3_expmap(xi):
    """xi = (omega, v, lambda). First-order-in-coupling expmap: exact for
    rotation and scale; translation via the sim(3) 'W' matrix computed by
    numerically robust series (matches the reference's Similarity3::Expmap
    behavior to first order; the chart only needs to be a valid retraction)."""
    w, v, lam = xi[:3], xi[3:6], xi[6]
    R = so3.expmap(w)
    s = jnp.exp(lam)
    # W integral approximated with the SO(3) left Jacobian scaled by the
    # scale integral (exact when lam == 0)
    lam_safe = jnp.where(jnp.abs(lam) < 1e-8, 1.0, lam)
    a = jnp.where(jnp.abs(lam) < 1e-8, 1.0 + lam / 2.0, (s - 1.0) / lam_safe)
    t = a * (so3.left_jacobian(w) @ v)
    return sim3_make(R, t, s)


def sim3_logmap(g):
    w = so3.logmap(sim3_R(g))
    lam = jnp.log(sim3_s(g))
    lam_safe = jnp.where(jnp.abs(lam) < 1e-8, 1.0, lam)
    a = jnp.where(jnp.abs(lam) < 1e-8, 1.0 + lam / 2.0,
                  (sim3_s(g) - 1.0) / lam_safe)
    v = so3.left_jacobian_inverse(w) @ (sim3_t(g) / a)
    return jnp.concatenate([w, v, jnp.atleast_1d(lam)])


SIM3 = manifolds.register(manifolds.Manifold(
    "sim3", 7, (3, 5),
    lambda g, xi: sim3_compose(g, sim3_expmap(xi)),
    lambda a, b: sim3_logmap(sim3_compose(sim3_inverse(a), b)),
    sim3_identity))


# ---------------------------------------------------------------------------
# EssentialMatrix — (R, t-direction) 5-dof (reference: EssentialMatrix.h)
# stored as [3, 4]: rotation + unit translation column
# ---------------------------------------------------------------------------

def essential_make(R, t_unit):
    return jnp.concatenate([R, t_unit[:, None]], axis=1)


def essential_matrix(e):
    """E = [t]_x R."""
    R, t = e[:, :3], e[:, 3]
    return so3.hat(t) @ R


def essential_retract(e, xi):
    R, t = e[:, :3], e[:, 3]
    Rn = so3.retract(R, xi[:3])
    tn = unit3_retract(t, xi[3:5])
    return essential_make(Rn, tn)


def essential_local(a, b):
    return jnp.concatenate([so3.local(a[:, :3], b[:, :3]),
                            unit3_local(a[:, 3], b[:, 3])])


ESSENTIAL = manifolds.register(manifolds.Manifold(
    "essential", 5, (3, 4), essential_retract, essential_local,
    lambda dtype=jnp.float32: essential_make(jnp.eye(3, dtype=dtype),
                                             jnp.array([1.0, 0.0, 0.0], dtype=dtype))))


def essential_epipolar_error(e, pA, pB):
    """Algebraic epipolar error vA^T E vB with E = [aTb]_x aRb (reference:
    EssentialMatrix::error used by EssentialMatrixFactor)."""
    E = essential_matrix(e)
    ha = jnp.concatenate([pA, jnp.ones(1, dtype=pA.dtype)])
    hb = jnp.concatenate([pB, jnp.ones(1, dtype=pB.dtype)])
    return jnp.atleast_1d(ha @ E @ hb)


# ---------------------------------------------------------------------------
# OrientedPlane3 — (unit normal, distance), 3-dof (reference: OrientedPlane3.h)
# stored [4]: (nx, ny, nz, d)
# ---------------------------------------------------------------------------

def plane_retract(p, xi):
    n = unit3_retract(p[:3], xi[:2])
    return jnp.concatenate([n, jnp.atleast_1d(p[3] + xi[2])])


def plane_local(p, q):
    return jnp.concatenate([unit3_local(p[:3], q[:3]), jnp.atleast_1d(q[3] - p[3])])


ORIENTED_PLANE = manifolds.register(manifolds.Manifold(
    "oriented_plane3", 3, (4,), plane_retract, plane_local,
    lambda dtype=jnp.float32: jnp.array([0.0, 0.0, 1.0, 0.0], dtype=dtype)))


def plane_transform(plane, pose):
    """Transform plane to the frame of `pose` (reference:
    OrientedPlane3::transform)."""
    n, d = plane[:3], plane[3]
    R, t = se3.rotation(pose), se3.translation(pose)
    n2 = R.T @ n
    d2 = d - jnp.dot(n, t)
    return jnp.concatenate([n2, jnp.atleast_1d(d2)])


# ---------------------------------------------------------------------------
# Line3 — 3D line manifold, 4-dof (reference: geometry/Line3.h: rotation R
# mapping the line to the z-axis + (a, b) intersection with the z=0 plane
# of the rotated frame)
# ---------------------------------------------------------------------------

def line3_make(R, a, b):
    """Store as [3, 4]: rotation + column (a, b, 0)."""
    col = jnp.stack([a, b, jnp.zeros_like(a)])
    return jnp.concatenate([R, col[:, None]], axis=1)


def line3_retract(l, xi):
    """xi = (w1, w2, da, db): rotate about the two axes orthogonal to the
    line direction, shift (a, b) (reference: Line3::retract)."""
    R = l[:, :3]
    w = jnp.stack([xi[0], xi[1], jnp.zeros((), dtype=xi.dtype)])
    Rn = R @ so3.expmap(w)
    return line3_make(Rn, l[0, 3] + xi[2], l[1, 3] + xi[3])


def line3_local(l1, l2):
    w = so3.logmap(l1[:, :3].T @ l2[:, :3])
    return jnp.stack([w[0], w[1], l2[0, 3] - l1[0, 3], l2[1, 3] - l1[1, 3]])


LINE3 = manifolds.register(manifolds.Manifold(
    "line3", 4, (3, 4), line3_retract, line3_local,
    lambda dtype=jnp.float32: line3_make(jnp.eye(3, dtype=dtype),
                                         jnp.zeros((), dtype=dtype),
                                         jnp.zeros((), dtype=dtype))))


def line3_point(l, t):
    """Point on the line at parameter t (direction is R @ z)."""
    R = l[:, :3]
    base = R @ jnp.stack([l[0, 3], l[1, 3], jnp.zeros((), dtype=l.dtype)])
    return base + t * (R @ jnp.array([0.0, 0.0, 1.0], dtype=l.dtype))


# ---------------------------------------------------------------------------
# SphericalCamera — unit-vector measurements (reference:
# geometry/SphericalCamera.h: project returns the bearing Unit3)
# ---------------------------------------------------------------------------

def spherical_project(pose, point):
    """World point -> unit bearing in the camera frame."""
    pc = se3.transform_to(pose, point)
    return pc / jnp.maximum(jnp.linalg.norm(pc), 1e-12)


def spherical_reprojection_error(pose, point, measured_unit):
    """2-dof tangent error between predicted and measured bearings
    (reference: SphericalCamera::reprojectionError)."""
    pred = spherical_project(pose, point)
    return unit3_local(measured_unit, pred)


# ---------------------------------------------------------------------------
# Sim(2) — planar similarity transforms, 4-dof (reference: Similarity2.h)
# stored [4]: (x, y, theta, s); tangent ordering (u1, u2, theta, lambda)
# matching Similarity2::Expmap (Similarity2.cpp:237)
# ---------------------------------------------------------------------------

def sim2_make(t, theta, s):
    return jnp.concatenate([t, jnp.atleast_1d(theta), jnp.atleast_1d(s)])


def sim2_t(g):
    return g[:2]


def sim2_theta(g):
    return g[2]


def sim2_s(g):
    return g[3]


def sim2_identity(dtype=jnp.float32):
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def sim2_compose(a, b):
    from gtsam_personal_tpu.geometry import so2
    t = sim2_t(a) + sim2_s(a) * so2.rotate(sim2_theta(a), sim2_t(b))
    return sim2_make(t, sim2_theta(a) + sim2_theta(b), sim2_s(a) * sim2_s(b))


def sim2_inverse(a):
    from gtsam_personal_tpu.geometry import so2
    sinv = 1.0 / sim2_s(a)
    t = -sinv * so2.unrotate(sim2_theta(a), sim2_t(a))
    return sim2_make(t, -sim2_theta(a), sinv)


def sim2_transform(g, p):
    from gtsam_personal_tpu.geometry import so2
    return sim2_s(g) * so2.rotate(sim2_theta(g), p) + sim2_t(g)


def _sim2_V(theta, lam):
    """V(theta, lambda) = ∫₀¹ e^{λτ} R(θτ) dτ — computed exactly via the
    complex integral (e^z − 1)/z with z = λ + iθ, which is well-conditioned
    at every (θ, λ) including both → 0, unlike the reference's
    alpha = 1/(1 + θ²/λ²) split (Similarity2.cpp:197 GetV)."""
    dt = jnp.result_type(theta, lam)
    cdt = jnp.complex64 if dt == jnp.float32 else jnp.complex128
    z = lam.astype(cdt) + 1j * theta.astype(cdt)
    small = jnp.abs(z) < 1e-4
    z_safe = jnp.where(small, 1.0, z)
    w = jnp.where(small, 1.0 + z / 2.0 + z * z / 6.0,
                  (jnp.exp(z_safe) - 1.0) / z_safe)
    X, Y = jnp.real(w).astype(dt), jnp.imag(w).astype(dt)
    return jnp.array([[X, -Y], [Y, X]])


def sim2_expmap(xi):
    """xi = (u1, u2, theta, lambda) (reference: Similarity2::Expmap)."""
    u, theta, lam = xi[:2], xi[2], xi[3]
    return sim2_make(_sim2_V(theta, lam) @ u, theta, jnp.exp(lam))


def sim2_logmap(g):
    from gtsam_personal_tpu.geometry import so2
    theta = so2.wrap(sim2_theta(g))
    lam = jnp.log(sim2_s(g))
    V = _sim2_V(theta, lam)
    # V is a scaled rotation [[X,-Y],[Y,X]]: invert in closed form
    det = V[0, 0] ** 2 + V[1, 0] ** 2
    Vinv = jnp.array([[V[0, 0], V[1, 0]], [-V[1, 0], V[0, 0]]]) / det
    u = Vinv @ sim2_t(g)
    return jnp.concatenate([u, jnp.stack([theta, lam])])


SIM2 = manifolds.register(manifolds.Manifold(
    "sim2", 4, (4,),
    lambda g, xi: sim2_compose(g, sim2_expmap(xi)),
    lambda a, b: sim2_logmap(sim2_compose(sim2_inverse(a), b)),
    sim2_identity))


def sim2_align_pairs(src, dst):
    """Closed-form Sim(2) aligning src[i] -> dst[i] (umeyama; reference:
    Similarity2::Align)."""
    ms, md = src.mean(axis=0), dst.mean(axis=0)
    cs, cd = src - ms, dst - md
    Sxx = cd.T @ cs
    # optimal rotation maximizing trace(R S^T); 2x2 closed form
    theta = jnp.arctan2(Sxx[1, 0] - Sxx[0, 1], Sxx[0, 0] + Sxx[1, 1])
    from gtsam_personal_tpu.geometry import so2
    num = jnp.sum(jnp.cos(theta) * (cd[:, 0] * cs[:, 0] + cd[:, 1] * cs[:, 1])
                  + jnp.sin(theta) * (cd[:, 1] * cs[:, 0] - cd[:, 0] * cs[:, 1]))
    s = num / jnp.maximum(jnp.sum(cs ** 2), 1e-12)
    t = md - s * so2.rotate(theta, ms)
    return sim2_make(t, theta, s)
