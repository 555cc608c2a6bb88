"""Packed-tile BA layout (sfm/ba_pack.py): index-plan invariants, exact
error match, step match vs the uniform cam-major path, and the LM scan."""

import numpy as np
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.sfm import ba, ba_pack, synthetic


def _small_skewed(seed=0):
    return synthetic.make_skewed_problem(
        num_cameras=24, num_points=300, mean_track=4.0, max_track=12,
        seed=seed, cam_zipf=1.2)


def _layouts(prob):
    state, obs = ba.state_from_bal(prob)
    C, P = state.cam_poses.shape[0], state.points.shape[0]
    pl = ba_pack.make_pack_layout(obs, C, P, dtype=np.float64)
    return state, obs, C, P, pl


def test_index_plan_invariants():
    state, obs, C, P, pl = _layouts(_small_skewed())
    M = pl.M
    g = np.asarray(pl.g_cam)
    live = g[g < M]
    assert len(live) == M and len(np.unique(live)) == M  # cam side bijection
    p2c = np.asarray(pl.p2c_tp).ravel()
    livep = p2c[p2c < pl.S]
    assert len(livep) == M and len(np.unique(livep)) == M  # pt side bijection
    # cam slot <-> point slot round trip for every observation
    c2p = np.asarray(pl.c2p_tp)
    f = np.argsort(g)[:M]                 # cam slot of each obs (g[f]=obs id)
    order = g[f]
    fp = c2p[f]
    np.testing.assert_array_equal(p2c[fp], f)
    assert np.all(order == np.arange(M))


def test_error_matches_obs_major():
    state, obs, C, P, pl = _layouts(_small_skewed())
    e_ref = float(ba.ba_error(state, obs))
    e_pk = float(ba_pack.ba_error_pk(state, obs, pl))
    assert e_pk == pytest.approx(e_ref, rel=1e-12)


def test_step_matches_cam_major():
    state, obs, C, P, pl = _layouts(_small_skewed())
    assert len(pl.cam_classes) > 1 and len(pl.pt_classes) > 1
    layout = ba.make_layout(obs, C, P)
    lam = jnp.asarray(1e-4, dtype=state.points.dtype)
    xc_ref, xp_ref = ba.solve_ba_step_cm(state, obs, layout, lam,
                                         cg_maxiter=200, cg_tol=1e-12)
    xc_pk, xp_pk = ba_pack.solve_ba_step_pk(state, obs, pl, lam,
                                            cg_maxiter=200, cg_tol=1e-12)
    # both PCG solves of the same system; agreement limited by conditioning
    np.testing.assert_allclose(np.asarray(xc_pk), np.asarray(xc_ref),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(xp_pk), np.asarray(xp_ref),
                               rtol=1e-3, atol=1e-6)
    e_ref = float(ba.ba_error(ba.retract_ba(state, xc_ref, xp_ref), obs))
    e_pk = float(ba.ba_error(ba.retract_ba(state, jnp.asarray(xc_pk),
                                           jnp.asarray(xp_pk)), obs))
    assert e_pk == pytest.approx(e_ref, rel=1e-6)


def test_linearize_matches_bucket():
    """Per-observation (r, Jc, Jp) values must agree with the bucketed
    layout's (same analytic kernel, different packing) when de-permuted."""
    from gtsam_personal_tpu.sfm import ba_bucket
    state, obs, C, P, pl = _layouts(_small_skewed(seed=2))
    M = pl.M
    r, Jc, Jp = ba_pack.linearize_ba_pk(state, obs, pl)
    g = np.asarray(pl.g_cam)
    f_of_obs = np.empty(M, dtype=np.int64)
    f_of_obs[g[g < M]] = np.where(g < M)[0]
    bl = ba_bucket.make_bucket_layout(obs, C, P, dtype=np.float64)
    lin = ba_bucket.linearize_ba_bl(state, obs, bl)
    # bucket side: recover per-obs values from its own g_cam maps
    for b, (rb, Jcb, Jpb) in enumerate(lin):
        gb = np.asarray(bl.g_cam[b])
        livemask = gb < M
        obs_ids = gb[livemask]
        rb = np.asarray(rb).reshape(2, -1)[:, livemask]
        r_pk = np.asarray(r)[:, f_of_obs[obs_ids]]
        np.testing.assert_allclose(r_pk, rb, rtol=1e-10, atol=1e-12)
        Jcb = np.asarray(Jcb).reshape(2, 9, -1)[:, :, livemask]
        Jc_pk = np.asarray(Jc)[:, :, f_of_obs[obs_ids]]
        np.testing.assert_allclose(Jc_pk, Jcb, rtol=1e-10, atol=1e-12)


def test_lm_run_reduces_error():
    state, obs, C, P, pl = _layouts(_small_skewed(seed=3))
    err0 = ba_pack.ba_error_pk(state, obs, pl)
    st, lam1, err1 = ba_pack.ba_lm_run_pk(
        state, obs, pl, jnp.asarray(1e-3, state.points.dtype), err0,
        n_iters=5, cg_maxiter=8)
    assert float(err1) < 0.2 * float(err0)
    # scan == per-iteration loop
    st_l, lam_l, err_l = state, jnp.asarray(1e-3, state.points.dtype), err0
    for _ in range(5):
        st_l, lam_l, err_l = ba_pack.ba_lm_iter_pk(st_l, obs, pl, lam_l,
                                                   err_l, cg_maxiter=8)
    assert float(err1) == pytest.approx(float(err_l), rel=1e-12)


def test_uniform_problem():
    """Uniform rings exercise the degenerate single-class path."""
    prob = synthetic.make_ring_problem(num_cameras=16, num_points=200,
                                       obs_per_point=4, seed=1)
    state, obs = ba.state_from_bal(prob)
    pl = ba_pack.make_pack_layout(obs, 16, 200, dtype=np.float64)
    e_ref = float(ba.ba_error(state, obs))
    assert float(ba_pack.ba_error_pk(state, obs, pl)) == pytest.approx(
        e_ref, rel=1e-12)
    err0 = ba_pack.ba_error_pk(state, obs, pl)
    _, _, err1 = ba_pack.ba_lm_run_pk(
        state, obs, pl, jnp.asarray(1e-3, state.points.dtype), err0,
        n_iters=4, cg_maxiter=8)
    assert float(err1) < float(err0)


def test_robust_huber_downweights_outliers():
    """Robust (IRLS) BA: 5% gross outlier observations pull the L2 solution
    off; Huber recovers near the clean optimum (reference: Robust noise on
    projection factors, linear/LossFunctions.h semantics)."""
    import jax
    prob = _small_skewed(seed=7)
    state, obs = ba.state_from_bal(prob)
    C, P = state.cam_poses.shape[0], state.points.shape[0]
    rng = np.random.default_rng(0)
    uv = np.asarray(obs.uv).copy()
    n_out = max(4, uv.shape[0] // 20)
    sel = rng.choice(uv.shape[0], size=n_out, replace=False)
    uv[sel] += rng.normal(scale=80.0, size=(n_out, 2))   # gross outliers
    obs_c = ba.BAObservations(obs.cam, obs.point, jnp.asarray(uv))
    pl = ba_pack.make_pack_layout(obs_c, C, P, dtype=np.float64)

    # robust linearize rows == sqrt(IRLS weight) * plain rows
    from gtsam_personal_tpu.linear.noise import robust_weight
    r0, Jc0, Jp0 = ba_pack.linearize_ba_pk(state, obs_c, pl)
    rh, Jch, Jph = ba_pack.linearize_ba_pk(state, obs_c, pl,
                                           robust="huber", robust_k=3.0)
    e = np.sqrt(np.asarray(r0[0])**2 + np.asarray(r0[1])**2)
    sw = np.sqrt(np.asarray(robust_weight("huber", jnp.asarray(e), 3.0)))
    np.testing.assert_allclose(np.asarray(rh), np.asarray(r0) * sw,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Jch), np.asarray(Jc0) * sw,
                               rtol=1e-9, atol=1e-12)

    # judge on observations of UNCONTAMINATED points only: a min-track-2
    # point with one gross outlier is legitimately under-constrained once
    # the outlier is downweighted, so its clean residual says nothing about
    # the solver
    bad_pts = set(np.asarray(obs.point)[sel].tolist())
    keep = np.asarray([int(p) not in bad_pts
                       for p in np.asarray(obs.point)])
    clean_sub = ba.BAObservations(obs.cam[jnp.asarray(keep)],
                                  obs.point[jnp.asarray(keep)],
                                  obs.uv[jnp.asarray(keep)])

    lam0 = jnp.asarray(1e-3, state.points.dtype)
    def run(robust):
        e0 = ba_pack.ba_error_pk(state, obs_c, pl, robust, 3.0)
        st, _, _ = ba_pack.ba_lm_run_pk(state, obs_c, pl, lam0, e0,
                                        n_iters=15, cg_maxiter=8,
                                        robust=robust, robust_k=3.0)
        return float(ba.ba_error(st, clean_sub))

    err_l2 = run("none")
    err_huber = run("huber")
    assert err_huber < 0.5 * err_l2, (err_huber, err_l2)
