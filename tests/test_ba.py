"""Bundle adjustment on BAL golden data (reference: SFMExample_bal.cpp over
dubrovnik-3-7-pre.txt) + internal consistency of the implicit-Schur solver."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.sfm import bal, ba
from gtsam_personal_tpu.slam.dataset import find_example_data


@pytest.fixture(scope="module")
def dubrovnik():
    prob = bal.load_bal(find_example_data("dubrovnik-3-7-pre.txt"))
    return ba.state_from_bal(prob)


def test_load_bal_shapes(dubrovnik):
    state, obs = dubrovnik
    assert state.cam_poses.shape == (3, 3, 4)
    assert state.points.shape == (7, 3)
    assert obs.uv.shape == (19, 2)


def test_initial_error_reasonable(dubrovnik):
    """BAL 'pre' files are near-converged; initial reprojection errors should
    be small in pixels (checks the OpenGL->GTSAM conversion end to end)."""
    state, obs = dubrovnik
    r, _, _ = ba.linearize_ba(state, obs)
    rms = float(jnp.sqrt(jnp.mean(jnp.sum(r * r, axis=-1))))
    assert rms < 20.0, f"projection convention broken, rms={rms}"


def test_schur_step_matches_full_dense(dubrovnik):
    """The implicit-Schur PCG step must equal the dense normal-equations
    solve of the full (cameras+points) system."""
    state, obs = dubrovnik
    lam = 1e-3
    r, Jc, Jp = ba.linearize_ba(state, obs)
    C, P, M = 3, 7, 19
    D = C * 9 + P * 3
    A = np.zeros((D, D))
    g = np.zeros(D)
    Jc_n = np.asarray(Jc).reshape(-1, 2, 9)
    Jp_n = np.asarray(Jp).reshape(-1, 2, 3)
    r_n = np.asarray(r)
    cam_off = lambda c: 9 * c
    pt_off = lambda p: C * 9 + 3 * p
    for m in range(M):
        c, p = int(obs.cam[m]), int(obs.point[m])
        J = np.zeros((2, D))
        J[:, cam_off(c):cam_off(c) + 9] = Jc_n[m]
        J[:, pt_off(p):pt_off(p) + 3] = Jp_n[m]
        A += J.T @ J
        g += J.T @ r_n[m]
    A += lam * np.eye(D)
    ref = np.linalg.solve(A, -g)
    layout = ba.make_layout(obs, C, P)
    xc, xp = ba.solve_ba_step(state, obs, layout, lam, cg_maxiter=500, cg_tol=1e-14)
    got = np.concatenate([np.asarray(xc).ravel(), np.asarray(xp).ravel()])
    np.testing.assert_allclose(got, ref, atol=1e-7)


def test_optimize_dubrovnik(dubrovnik):
    state, obs = dubrovnik
    e0 = float(ba.ba_error(state, obs))
    final, err, iters = ba.optimize_ba(state, obs, max_iterations=20)
    assert err < e0
    # dubrovnik-3-7-pre should converge to sub-pixel rms
    rms = np.sqrt(2 * err / obs.uv.shape[0])
    assert rms < 2.0


def test_jacobians_vs_fd(dubrovnik):
    state, obs = dubrovnik
    r, Jc, Jp = ba.linearize_ba(state, obs)
    m = 5
    pose = state.cam_poses[obs.cam[m]]
    cal = state.cam_cals[obs.cam[m]]
    pt = state.points[obs.point[m]]
    uv = obs.uv[m]
    eps = 1e-7
    for i in range(9):
        d = np.zeros(9); d[i] = eps
        rp = ba._residual_local((jnp.asarray(d), jnp.zeros(3)), pose, cal, pt, uv)
        rm = ba._residual_local((jnp.asarray(-d), jnp.zeros(3)), pose, cal, pt, uv)
        fd = (np.asarray(rp) - np.asarray(rm)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(Jc[m]).reshape(2, 9)[:, i], fd, atol=1e-4, rtol=1e-4)


def test_cm_step_matches_bm(dubrovnik):
    """The cam-major-native step (solve_ba_step_cm) must match the
    batch-major reference step and the fm variant exactly (same math,
    different layout)."""
    state, obs = dubrovnik
    layout = ba.make_layout(obs, state.cam_poses.shape[0], state.points.shape[0])
    lam = jnp.float64(1e-3)
    xc0, xp0 = ba.solve_ba_step(state, obs, layout, lam, cg_maxiter=300,
                                cg_tol=1e-13)
    xc1, xp1 = ba.solve_ba_step_cm(state, obs, layout, lam, cg_maxiter=300,
                                   cg_tol=1e-13)
    np.testing.assert_allclose(np.asarray(xc1), np.asarray(xc0), atol=1e-7)
    np.testing.assert_allclose(np.asarray(xp1), np.asarray(xp0), atol=1e-7)
    e_bm = float(ba.ba_error(state, obs))
    e_cm = float(ba.ba_error_cm(state, obs, layout))
    e_fm = float(ba.ba_error_fm(state, obs))
    np.testing.assert_allclose(e_cm, e_bm, rtol=1e-12)
    np.testing.assert_allclose(e_fm, e_bm, rtol=1e-12)
    r_fm, Jc_fm, Jp_fm = ba.linearize_ba_fm(state, obs)
    r_bm, Jc_bm, Jp_bm = ba.linearize_ba(state, obs)
    np.testing.assert_allclose(np.asarray(r_fm), np.asarray(r_bm).T, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Jc_fm), np.asarray(Jc_bm).T, atol=1e-12)
