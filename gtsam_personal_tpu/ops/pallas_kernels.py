"""Pallas TPU kernels for the hot per-landmark block operations.

The BA/Schur hot paths are expressed as flat feature-major arrays with
unrolled small contractions (see sfm/ba.py) — XLA fuses those well. These
Pallas kernels push the remaining fusion further: the landmark block solve
u = (Hpp + lam I)^{-1} t streams Hpp [9, P] and t [3, P] through VMEM once and
emits u without materializing the inverse (closed-form 3x3 adjugate in
registers).

Kernels run compiled on TPU and in interpreter mode elsewhere (tests), with a
jnp fallback path (`use_pallas=False`).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from gtsam_personal_tpu.sfm import ba_kernels as bk


def _block_solve_kernel(h_ref, t_ref, lam_ref, u_ref):
    """One block of landmarks: solve (H + lam I) u = t, H sym 3x3 flat [9, B]."""
    lam = lam_ref[0]
    a = h_ref[0, :] + lam
    b = h_ref[1, :]
    c = h_ref[2, :]
    d = h_ref[4, :] + lam
    e = h_ref[5, :]
    f = h_ref[8, :] + lam
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    inv = 1.0 / det
    D = a * f - c * c
    E = b * c - a * e
    F = a * d - b * b
    t0 = t_ref[0, :]
    t1 = t_ref[1, :]
    t2 = t_ref[2, :]
    u_ref[0, :] = (A * t0 + B * t1 + C * t2) * inv
    u_ref[1, :] = (B * t0 + D * t1 + E * t2) * inv
    u_ref[2, :] = (C * t0 + E * t1 + F * t2) * inv


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def landmark_block_solve(Hpp, t, lam, block: int = 4096, interpret: bool = False):
    """u = (Hpp + lam I)^{-1} t for P symmetric 3x3 blocks.

    Hpp: [9, P] flat-transposed, t: [3, P]. Pads P to a block multiple."""
    P = Hpp.shape[1]
    padded = ((P + block - 1) // block) * block
    if padded != P:
        Hpp = jnp.pad(Hpp, ((0, 0), (0, padded - P)),
                      constant_values=0.0)
        # unit diagonal on padding so the solve stays finite
        pad_diag = jnp.zeros((9, padded - P), dtype=Hpp.dtype)
        pad_diag = pad_diag.at[0].set(1.0).at[4].set(1.0).at[8].set(1.0)
        Hpp = Hpp.at[:, P:].set(pad_diag)
        t = jnp.pad(t, ((0, 0), (0, padded - P)))
    lam_arr = jnp.reshape(lam.astype(Hpp.dtype), (1,))
    grid = (padded // block,)
    u = pl.pallas_call(
        _block_solve_kernel,
        out_shape=jax.ShapeDtypeStruct((3, padded), Hpp.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((9, block), lambda i: (0, i)),
            pl.BlockSpec((3, block), lambda i: (0, i)),
            pl.BlockSpec((1,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((3, block), lambda i: (0, i)),
        interpret=interpret,
    )(Hpp, t, lam_arr)
    return u[:, :P]


def landmark_block_solve_jnp(Hpp, t, lam):
    """jnp reference path (same math, XLA-fused)."""
    Hd = bk.add_scaled_identity_33_T(Hpp, lam)
    return bk.sym33_matvec_T(bk.sym33_inv_T(Hd), t)
