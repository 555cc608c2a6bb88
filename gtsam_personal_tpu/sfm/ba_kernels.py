"""Flat small-matrix kernels for the BA hot path.

TPU tiling pads the last two array dimensions to (8, 128); arrays shaped
[M, 3, 3] or [M, 2, 9] therefore waste 100x memory/bandwidth. These helpers
keep every per-observation quantity as a flat [M, r*c] array and unroll the
tiny matrix algebra over the static (r, c) dims at trace time — each output
element is a short fused chain of elementwise multiplies over [M]-slices,
which is exactly what the VPU wants.

This is the TPU-native counterpart of the reference's fixed-size Eigen kernels
(RegularHessianFactor / RegularImplicitSchurFactor, SURVEY.md §2.5, §3.2).
"""

import jax.numpy as jnp


def matvec(Aflat, x, r, c):
    """[M, r*c] (row-major r x c) times [M, c] -> [M, r], unrolled."""
    cols = [
        sum(Aflat[:, i * c + j] * x[:, j] for j in range(c))
        for i in range(r)
    ]
    return jnp.stack(cols, axis=1)


def matvec_T(Aflat, y, r, c):
    """A^T y: [M, r*c] viewed (r,c), y [M, r] -> [M, c]."""
    cols = [
        sum(Aflat[:, i * c + j] * y[:, i] for i in range(r))
        for j in range(c)
    ]
    return jnp.stack(cols, axis=1)


def ata(Aflat, r, c):
    """A^T A flattened: [M, r*c] -> [M, c*c] (row-major c x c)."""
    out = []
    for j in range(c):
        for k in range(c):
            out.append(sum(Aflat[:, i * c + j] * Aflat[:, i * c + k]
                           for i in range(r)))
    return jnp.stack(out, axis=1)


def atb(Aflat, Bflat, r, ca, cb):
    """A^T B flattened: A [M, r*ca], B [M, r*cb] -> [M, ca*cb]."""
    out = []
    for j in range(ca):
        for k in range(cb):
            out.append(sum(Aflat[:, i * ca + j] * Bflat[:, i * cb + k]
                           for i in range(r)))
    return jnp.stack(out, axis=1)


def sym33_inv(Hflat, eps=0.0):
    """Closed-form inverse of symmetric 3x3 matrices stored flat [N, 9]
    (row-major). Assumes SPD (damped Hessian blocks); adjugate/determinant."""
    a, b, c = Hflat[:, 0], Hflat[:, 1], Hflat[:, 2]
    d, e = Hflat[:, 4], Hflat[:, 5]
    f = Hflat[:, 8]
    # | a b c |
    # | b d e |
    # | c e f |
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    inv_det = 1.0 / det
    D = a * f - c * c
    E = b * c - a * e
    F = a * d - b * b
    return jnp.stack([A, B, C, B, D, E, C, E, F], axis=1) * inv_det[:, None]


def sym33_matvec(Hflat, x):
    """[N, 9] symmetric times [N, 3] -> [N, 3]."""
    return jnp.stack([
        Hflat[:, 0] * x[:, 0] + Hflat[:, 1] * x[:, 1] + Hflat[:, 2] * x[:, 2],
        Hflat[:, 3] * x[:, 0] + Hflat[:, 4] * x[:, 1] + Hflat[:, 5] * x[:, 2],
        Hflat[:, 6] * x[:, 0] + Hflat[:, 7] * x[:, 1] + Hflat[:, 8] * x[:, 2],
    ], axis=1)


def add_scaled_identity_33(Hflat, lam):
    """H + lam I for flat [N, 9] 3x3 matrices."""
    out = Hflat
    for k in (0, 4, 8):
        out = out.at[:, k].add(lam)
    return out


# ---- feature-major (transposed) variants: arrays [k, N] with N on lanes ----

def sym33_inv_T(Hflat):
    """Inverse of symmetric 3x3 matrices stored flat-transposed [9, N]."""
    a, b, c = Hflat[0], Hflat[1], Hflat[2]
    d, e = Hflat[4], Hflat[5]
    f = Hflat[8]
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    inv_det = 1.0 / det
    D = a * f - c * c
    E = b * c - a * e
    F = a * d - b * b
    return jnp.stack([A, B, C, B, D, E, C, E, F], axis=0) * inv_det[None, :]


def sym33_matvec_T(Hflat, x):
    """[9, N] symmetric (row-major 3x3) times [3, N] -> [3, N]."""
    return jnp.stack([
        Hflat[0] * x[0] + Hflat[1] * x[1] + Hflat[2] * x[2],
        Hflat[3] * x[0] + Hflat[4] * x[1] + Hflat[5] * x[2],
        Hflat[6] * x[0] + Hflat[7] * x[1] + Hflat[8] * x[2],
    ], axis=0)


def add_scaled_identity_33_T(Hflat, lam):
    out = Hflat
    for k in (0, 4, 8):
        out = out.at[k].add(lam)
    return out


def safe_chol_blocks(H, lam, jitter=1e-8):
    """NaN-guarded batched Cholesky of damped preconditioner blocks
    [C, d, d] -> lower factors [C, d, d].

    The Schur block Hcc - Gc is PSD in exact arithmetic but can come out
    slightly indefinite in fp32 (measured: 64-cam skewed problem, fp32 —
    cholesky NaN poisoned the whole CG solve). Blocks whose factor contains
    a non-finite entry fall back to the diagonal preconditioner
    sqrt(clip(diag) + lam)."""
    d = H.shape[-1]
    eye = jnp.eye(d, dtype=H.dtype)
    Ls = jnp.linalg.cholesky(H + (lam + jitter) * eye)
    bad = ~jnp.all(jnp.isfinite(Ls), axis=(-2, -1))
    diag = jnp.clip(jnp.diagonal(H, axis1=-2, axis2=-1), 0.0) + lam + jitter
    Ld = jnp.sqrt(diag)[..., :, None] * eye
    return jnp.where(bad[..., None, None], Ld, Ls)
