"""SO(n) — rotations in n dimensions, standalone (reference: geometry/SOn.h,
SO4.h).

The reference parameterizes SO(n) with the full matrix and uses the Cayley
chart as the default retraction for n > 3 (SOn.h:160 ChartAtOrigin::Retract);
Shonan relies on exactly this chart. We mirror that: `retract`/`local` are the
Cayley transform and its inverse (well-defined away from rotations by pi,
exactly like the reference), while `expmap`/`logmap` provide the true
exponential map via the skew-Hermitian eigenstructure (i-omega is Hermitian),
which works on any backend without `expm`.

vec/hat ordering matches the reference's SOn::Hat (SOn.h:110): the tangent
vector is built recursively — the last 2x2 block is xi[-1], growing one
border (column) at a time with alternating signs.
"""

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from gtsam_personal_tpu.core import manifolds


def ambient_dim(d: int) -> int:
    """Matrix size n with d = n(n-1)/2 tangent dims."""
    n = int(round((1 + np.sqrt(1 + 8 * d)) / 2))
    assert n * (n - 1) // 2 == d
    return n


def tangent_dim(n: int) -> int:
    return n * (n - 1) // 2


@lru_cache(maxsize=None)
def _hat_basis(n: int) -> np.ndarray:
    """[d, n, n] basis so hat(xi) = einsum('k,kij->ij', xi, basis), matching
    the reference's recursive SOn::Hat ordering (SOn.h:110)."""
    d = tangent_dim(n)
    basis = np.zeros((d, n, n))

    def fill(m: int, xi_ids):
        # SOn::Hat (SOn.cpp:25): the first m-1 entries fill the last
        # row/column with alternating signs starting at (-1)^{m(m-1)/2};
        # the tail recurses into the top-left (m-1) block.
        if m == 2:
            k = xi_ids[0]
            basis[k, 0, 1] = -1.0
            basis[k, 1, 0] = 1.0
            return
        border, rest = xi_ids[: m - 1], xi_ids[m - 1:]
        sign = (-1.0) ** len(xi_ids)
        for i in range(m - 1):
            j = m - 2 - i
            basis[border[i], m - 1, j] = -sign
            basis[border[i], j, m - 1] = sign
            sign = -sign
        fill(m - 1, rest)

    fill(n, list(range(d)))
    return basis


def hat(xi, n=None):
    n = n or ambient_dim(xi.shape[-1])
    B = jnp.asarray(_hat_basis(n), dtype=xi.dtype)
    return jnp.einsum("k,kij->ij", xi, B)


def vee(W):
    n = W.shape[-1]
    B = jnp.asarray(_hat_basis(n), dtype=W.dtype)
    # basis elements are orthogonal with squared norm 2
    return jnp.einsum("ij,kij->k", W, B) / 2.0


def identity(n: int, dtype=jnp.float32):
    return jnp.eye(n, dtype=dtype)


def expmap(xi, n=None):
    """exp(hat(xi)) via the Hermitian eigendecomposition of i·hat(xi)
    (backend-portable; no expm needed)."""
    n = n or ambient_dim(xi.shape[-1])
    W = hat(xi, n)
    cdt = jnp.complex64 if W.dtype == jnp.float32 else jnp.complex128
    lam, Q = jnp.linalg.eigh(1j * W.astype(cdt))   # W = Q (-i lam) Q^H
    E = Q @ (jnp.exp(-1j * lam)[:, None] * Q.conj().T)
    return jnp.real(E).astype(W.dtype)


def logmap(R):
    """Principal log of R ∈ SO(n) via Schur-free complex eigendecomposition.
    CPU-oriented (jnp.linalg.eig); certification paths run on CPU by design."""
    cdt = jnp.complex64 if R.dtype == jnp.float32 else jnp.complex128
    lam, Q = np.linalg.eig(np.asarray(R, dtype=np.complex128))
    L = Q @ np.diag(np.log(lam)) @ np.linalg.inv(Q)
    W = np.real(L)
    W = (W - W.T) / 2.0
    return vee(jnp.asarray(W, dtype=R.dtype))


def cayley(W):
    """(I - W/2)⁻¹(I + W/2) — the reference's Cayley chart (SOn.h:160)."""
    n = W.shape[-1]
    I = jnp.eye(n, dtype=W.dtype)
    return jnp.linalg.solve(I - W / 2.0, I + W / 2.0)


def cayley_inverse(C):
    """W with cayley(W) = C: W = 2 (C - I)(C + I)⁻¹."""
    n = C.shape[-1]
    I = jnp.eye(n, dtype=C.dtype)
    W = 2.0 * jnp.linalg.solve((C + I).T, (C - I).T).T
    return (W - W.T) / 2.0


def retract(R, xi):
    return R @ cayley(hat(xi, R.shape[-1]))


def local(R1, R2):
    return vee(cayley_inverse(R1.T @ R2))


def compose(R1, R2):
    return R1 @ R2


def inverse(R):
    return R.T


def between(R1, R2):
    return R1.T @ R2


def register_son(n: int) -> manifolds.Manifold:
    """Get-or-create the 'son<n>' manifold (reference: SOn fixed/dynamic)."""
    name = f"son{n}"
    try:
        return manifolds.get(name)
    except KeyError:
        pass
    d = tangent_dim(n)
    m = manifolds.Manifold(
        name, d, (n, n), retract, local,
        lambda dtype=jnp.float32, n=n: jnp.eye(n, dtype=dtype))
    return manifolds.register(m)


SO4 = register_son(4)
