"""Fundamental matrices and epipolar transfer.

Reference parity: gtsam/geometry/FundamentalMatrix.h —
- FundamentalMatrix: F = U diag(1, s, 0) Vᵀ parameterized by two rotations
  and a scalar (7-dof manifold);
- SimpleFundamentalMatrix: essential matrix + two focal lengths (principal
  points carried as constants), F = Ka⁻ᵀ E Kb⁻¹ (7-dof manifold);
- EpipolarTransfer: intersect the two epipolar lines a point induces in a
  third view (FundamentalMatrix.cpp:15);
- TripleF transfers between three views (used by sfm/TransferFactor.h).

Storage is a single fixed-shape array per element (vmap-friendly):
- fundamental: [3, 7] = [U (3x3) | V (3x3) | col(s, 0, 0)]
- simple_fundamental: [3, 7] = [E (3x4) | col(fa, fb, 0) | col(ca) | col(cb)]
"""

import jax.numpy as jnp

from gtsam_personal_tpu.core import manifolds
from gtsam_personal_tpu.geometry import so3
from gtsam_personal_tpu.geometry.extra import (
    essential_local, essential_make, essential_matrix, essential_retract)


# ---------------------------------------------------------------------------
# FundamentalMatrix — F = U diag(1, s, 0) Vᵀ (reference: FundamentalMatrix.h)
# ---------------------------------------------------------------------------

def fundamental_make(U, s, V):
    col = jnp.concatenate([jnp.atleast_1d(s), jnp.zeros(2, dtype=U.dtype)])
    return jnp.concatenate([U, V, col[:, None]], axis=1)


def fundamental_U(f):
    return f[:, :3]


def fundamental_V(f):
    return f[:, 3:6]


def fundamental_s(f):
    return f[0, 6]


def fundamental_matrix(f):
    """F = U diag(1, s, 0) Vᵀ (reference: FundamentalMatrix::matrix)."""
    d = jnp.stack([jnp.ones_like(fundamental_s(f)), fundamental_s(f),
                   jnp.zeros_like(fundamental_s(f))])
    return fundamental_U(f) * d[None, :] @ fundamental_V(f).T


def fundamental_from_matrix(F):
    """SVD decomposition into (U, s, V), fixing reflections (reference:
    FundamentalMatrix::FundamentalMatrix(const Matrix3&)). Host-side
    construction helper."""
    U, S, Vt = jnp.linalg.svd(F)
    V = Vt.T
    U = jnp.where(jnp.linalg.det(U) < 0, -U, U)
    V = jnp.where(jnp.linalg.det(V) < 0, -V, V)
    return fundamental_make(U, S[1] / S[0], V)


def fundamental_from_essential(Ka, e, Kb):
    """F = Ka⁻ᵀ E Kb⁻¹ (reference: FundamentalMatrix(Ka, E, Kb))."""
    F = jnp.linalg.inv(Ka).T @ essential_matrix(e) @ jnp.linalg.inv(Kb)
    return fundamental_from_matrix(F)


def fundamental_retract(f, xi):
    """xi = (u_U[3], ds, u_V[3]) (reference: FundamentalMatrix::retract)."""
    return fundamental_make(so3.retract(fundamental_U(f), xi[:3]),
                            fundamental_s(f) + xi[3],
                            so3.retract(fundamental_V(f), xi[4:7]))


def fundamental_local(a, b):
    return jnp.concatenate([
        so3.local(fundamental_U(a), fundamental_U(b)),
        jnp.atleast_1d(fundamental_s(b) - fundamental_s(a)),
        so3.local(fundamental_V(a), fundamental_V(b))])


def _fundamental_identity(dtype=jnp.float32):
    return fundamental_make(jnp.eye(3, dtype=dtype),
                            jnp.ones((), dtype=dtype),
                            jnp.eye(3, dtype=dtype))


FUNDAMENTAL = manifolds.register(manifolds.Manifold(
    "fundamental", 7, (3, 7), fundamental_retract, fundamental_local,
    _fundamental_identity))


# ---------------------------------------------------------------------------
# SimpleFundamentalMatrix — E + focal lengths (reference: FundamentalMatrix.h
# :133). Principal points ride along as constants (not on the manifold).
# ---------------------------------------------------------------------------

def simple_fundamental_make(e, fa, fb, ca, cb):
    z = jnp.zeros((), dtype=e.dtype)
    c1 = jnp.stack([fa, fb, z])
    c2 = jnp.concatenate([ca, z[None]])
    c3 = jnp.concatenate([cb, z[None]])
    return jnp.concatenate([e, c1[:, None], c2[:, None], c3[:, None]], axis=1)


def simple_fundamental_E(f):
    return f[:, :4]


def simple_fundamental_fa(f):
    return f[0, 4]


def simple_fundamental_fb(f):
    return f[1, 4]


def _K(focal, c, dtype):
    z = jnp.zeros((), dtype=dtype)
    o = jnp.ones((), dtype=dtype)
    return jnp.array([[focal, z, c[0]], [z, focal, c[1]], [z, z, o]])


def simple_fundamental_matrix(f):
    """F = Ka⁻ᵀ E Kb⁻¹ (reference: SimpleFundamentalMatrix::matrix)."""
    Ka = _K(simple_fundamental_fa(f), f[:2, 5], f.dtype)
    Kb = _K(simple_fundamental_fb(f), f[:2, 6], f.dtype)
    E = essential_matrix(simple_fundamental_E(f))
    return jnp.linalg.inv(Ka).T @ E @ jnp.linalg.inv(Kb)


def simple_fundamental_retract(f, xi):
    """xi = (u_E[5], dfa, dfb) (reference: SimpleFundamentalMatrix::retract)."""
    e = essential_retract(simple_fundamental_E(f), xi[:5])
    return simple_fundamental_make(e, simple_fundamental_fa(f) + xi[5],
                                   simple_fundamental_fb(f) + xi[6],
                                   f[:2, 5], f[:2, 6])


def simple_fundamental_local(a, b):
    return jnp.concatenate([
        essential_local(simple_fundamental_E(a), simple_fundamental_E(b)),
        jnp.stack([simple_fundamental_fa(b) - simple_fundamental_fa(a),
                   simple_fundamental_fb(b) - simple_fundamental_fb(a)])])


def _simple_fundamental_identity(dtype=jnp.float32):
    e = essential_make(jnp.eye(3, dtype=dtype),
                       jnp.array([1.0, 0.0, 0.0], dtype=dtype))
    one = jnp.ones((), dtype=dtype)
    return simple_fundamental_make(e, one, one, jnp.zeros(2, dtype=dtype),
                                   jnp.zeros(2, dtype=dtype))


SIMPLE_FUNDAMENTAL = manifolds.register(manifolds.Manifold(
    "simple_fundamental", 7, (3, 7), simple_fundamental_retract,
    simple_fundamental_local, _simple_fundamental_identity))


# ---------------------------------------------------------------------------
# Epipolar transfer (reference: FundamentalMatrix.cpp:15 EpipolarTransfer,
# TripleF — used by sfm/TransferFactor.h)
# ---------------------------------------------------------------------------

def epipolar_transfer(Fca, pa, Fcb, pb):
    """Intersect the epipolar lines of pa (via Fca) and pb (via Fcb) in view
    c. Returns the 2D intersection point."""
    one = jnp.ones(1, dtype=pa.dtype)
    la = Fca @ jnp.concatenate([pa, one])
    lb = Fcb @ jnp.concatenate([pb, one])
    x = jnp.cross(la, lb)
    w = x[2]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1.0, w)
    return x[:2] / w_safe


def transfer_to_a(Fab, Fca, pb, pc):
    """TripleF::transferToA: intersect lines from b (Fab) and c (Fcaᵀ)."""
    return epipolar_transfer(Fab, pb, Fca.T, pc)


def transfer_to_b(Fab, Fbc, pa, pc):
    return epipolar_transfer(Fab.T, pa, Fbc, pc)


def transfer_to_c(Fca, Fbc, pa, pb):
    return epipolar_transfer(Fca, pa, Fbc.T, pb)
