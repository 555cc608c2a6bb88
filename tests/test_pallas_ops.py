"""Pallas kernel correctness tests (interpreter mode on the CPU backend)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.ops import pallas_kernels as pk


def test_landmark_block_solve_matches_jnp():
    rng = np.random.default_rng(0)
    P = 1000
    A = rng.normal(size=(P, 2, 3))
    Hpp = np.einsum("pij,pik->pjk", A, A) + 0.1 * np.eye(3)
    Hflat = jnp.asarray(Hpp.reshape(P, 9).T)          # [9, P]
    t = jnp.asarray(rng.normal(size=(3, P)))
    lam = jnp.asarray(1e-3)
    u_ref = pk.landmark_block_solve_jnp(Hflat, t, lam)
    u_pl = pk.landmark_block_solve(Hflat, t, lam, block=256, interpret=True)
    np.testing.assert_allclose(np.asarray(u_pl), np.asarray(u_ref), rtol=1e-10)


def test_landmark_block_solve_padding():
    rng = np.random.default_rng(1)
    P = 77  # not a block multiple
    A = rng.normal(size=(P, 3, 3))
    Hpp = np.einsum("pij,pik->pjk", A, A) + np.eye(3)
    Hflat = jnp.asarray(Hpp.reshape(P, 9).T)
    t = jnp.asarray(rng.normal(size=(3, P)))
    u_pl = pk.landmark_block_solve(Hflat, t, jnp.asarray(0.0), block=64,
                                   interpret=True)
    u_ref = pk.landmark_block_solve_jnp(Hflat, t, jnp.asarray(1e-30))
    np.testing.assert_allclose(np.asarray(u_pl), np.asarray(u_ref), rtol=1e-8)
