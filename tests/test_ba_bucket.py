"""Bucketed (skew-robust) BA layout: exact match vs the uniform cam-major
path, and padding-waste bounds on a skewed problem (VERDICT r1 item 2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.sfm import ba, ba_bucket, synthetic


def _small_skewed(seed=0):
    return synthetic.make_skewed_problem(
        num_cameras=24, num_points=300, mean_track=4.0, max_track=12,
        seed=seed, cam_zipf=1.2)


def test_error_matches_obs_major():
    prob = _small_skewed()
    state, obs = ba.state_from_bal(prob)
    bl = ba_bucket.make_bucket_layout(obs, state.cam_poses.shape[0],
                                      state.points.shape[0], dtype=np.float64)
    e_ref = float(ba.ba_error(state, obs))
    e_bl = float(ba_bucket.ba_error_bl(state, obs, bl))
    assert e_bl == pytest.approx(e_ref, rel=1e-12)


def test_step_matches_cam_major():
    prob = _small_skewed()
    state, obs = ba.state_from_bal(prob)
    C, P = state.cam_poses.shape[0], state.points.shape[0]
    layout = ba.make_layout(obs, C, P)
    bl = ba_bucket.make_bucket_layout(obs, C, P, dtype=np.float64)
    assert len(bl.cam_shapes) > 1  # actually exercises multiple buckets

    lam = jnp.asarray(1e-4, dtype=state.points.dtype)
    xc_ref, xp_ref = ba.solve_ba_step_cm(state, obs, layout, lam,
                                         cg_maxiter=200, cg_tol=1e-12)
    xc_bl, xp_bl = ba_bucket.solve_ba_step_bl(state, obs, bl, lam,
                                              cg_maxiter=200, cg_tol=1e-12)
    # both are PCG solves of the same system with different reduction orders;
    # agreement is limited by conditioning, not layout correctness
    np.testing.assert_allclose(np.asarray(xc_bl), np.asarray(xc_ref),
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xp_bl), np.asarray(xp_ref),
                               rtol=1e-3, atol=1e-6)
    e_ref = float(ba.ba_error(ba.retract_ba(state, xc_ref, xp_ref), obs))
    e_bl = float(ba.ba_error(ba.retract_ba(state, jnp.asarray(xc_bl),
                                           jnp.asarray(xp_bl)), obs))
    assert e_bl == pytest.approx(e_ref, rel=1e-6)


def test_try_step_reduces_error():
    prob = _small_skewed(seed=3)
    state, obs = ba.state_from_bal(prob)
    bl = ba_bucket.make_bucket_layout(obs, state.cam_poses.shape[0],
                                      state.points.shape[0], dtype=np.float64)
    e0 = float(ba_bucket.ba_error_bl(state, obs, bl))
    st2, e1 = ba_bucket.ba_try_step_bl(state, obs, bl,
                                       jnp.asarray(1e-4, state.points.dtype),
                                       cg_maxiter=50)
    assert float(e1) < e0


def test_padding_waste_bounded_under_skew():
    # Ladybug-shaped skew at 1/8 scale: global-max padding would be ~50-100x;
    # the bucketed layout must stay under 4x on both sides.
    prob = synthetic.make_skewed_problem(
        num_cameras=215, num_points=19500, mean_track=4.0, max_track=40,
        seed=2, cam_zipf=1.2)
    state, obs = ba.state_from_bal(prob)
    C, P = state.cam_poses.shape[0], state.points.shape[0]
    bl = ba_bucket.make_bucket_layout(obs, C, P)
    cam_w, pt_w = bl.padding_waste()
    # the uniform layout's waste for comparison
    cnt = np.bincount(np.asarray(obs.cam), minlength=C)
    uniform_cam_w = C * cnt.max() / bl.M
    assert uniform_cam_w > 10.0        # the problem IS badly skewed
    assert cam_w < 4.0
    assert pt_w < 4.0


def test_uniform_problem_degenerates_to_few_buckets():
    prob = synthetic.make_ring_problem(num_cameras=16, num_points=200,
                                       obs_per_point=4, seed=1)
    state, obs = ba.state_from_bal(prob)
    bl = ba_bucket.make_bucket_layout(obs, 16, 200)
    assert len(bl.cam_shapes) <= 2
    # logical layout waste (the tiled default adds the unavoidable
    # 8x128-tile floor, which dominates at toy scale)
    cam_w, pt_w = bl.padding_waste(tiled=False)
    assert cam_w < 2.5 and pt_w < 2.5


def test_analytic_jacobians_match_jacfwd():
    """Closed-form reprojection Jacobians (unrolled elementwise) must equal
    the jacfwd-through-retraction oracle to machine precision (the repo's
    universal Jacobian-oracle strategy, SURVEY.md §4)."""
    prob = synthetic.make_skewed_problem(num_cameras=24, num_points=200,
                                         mean_track=4.0, max_track=12, seed=0)
    state, obs = ba.state_from_bal(prob)
    bl = ba_bucket.make_bucket_layout(obs, 24, 200)
    lin_a = ba_bucket.linearize_ba_bl(state, obs, bl, analytic=True)
    lin_j = ba_bucket.linearize_ba_bl(state, obs, bl, analytic=False)
    for (ra, Ja, Pa), (rj, Jj, Pj) in zip(lin_a, lin_j):
        np.testing.assert_allclose(np.asarray(ra), np.asarray(rj),
                                   rtol=1e-12, atol=1e-10)
        np.testing.assert_allclose(np.asarray(Ja), np.asarray(Jj),
                                   rtol=1e-12, atol=1e-9)
        np.testing.assert_allclose(np.asarray(Pa), np.asarray(Pj),
                                   rtol=1e-12, atol=1e-10)


def test_lm_run_scan_matches_iter_loop():
    """ba_lm_run_bl (single-dispatch lax.scan, what bench.py times) must
    reproduce the per-call ba_lm_iter_bl loop exactly."""
    prob = _small_skewed(seed=5)
    state, obs = ba.state_from_bal(prob)
    bl = ba_bucket.make_bucket_layout(obs, state.cam_poses.shape[0],
                                      state.points.shape[0], dtype=np.float64)
    lam0 = jnp.asarray(1e-3, state.points.dtype)
    err0 = ba_bucket.ba_error_bl(state, obs, bl)

    st_l, lam_l, err_l = state, lam0, err0
    for _ in range(4):
        st_l, lam_l, err_l = ba_bucket.ba_lm_iter_bl(st_l, obs, bl, lam_l,
                                                     err_l, cg_maxiter=5)
    st_s, lam_s, err_s = ba_bucket.ba_lm_run_bl(state, obs, bl, lam0, err0,
                                                n_iters=4, cg_maxiter=5)
    assert float(err_s) == pytest.approx(float(err_l), rel=1e-12)
    assert float(lam_s) == pytest.approx(float(lam_l), rel=1e-12)
    np.testing.assert_allclose(np.asarray(st_s.points),
                               np.asarray(st_l.points), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(st_s.cam_poses),
                               np.asarray(st_l.cam_poses), rtol=1e-10)
    assert float(err_s) < float(err0)
