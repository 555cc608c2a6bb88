"""Distributed PACKED-TILE BA (shared global class geometry under
shard_map + psum) must exact-match the single-device packed solver on the
8-device virtual mesh — the flagship engine's distribution path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.sfm import ba, ba_pack, synthetic
from gtsam_personal_tpu.parallel import mesh as pmesh
from gtsam_personal_tpu.parallel import dist_ba, dist_ba_pack


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return pmesh.make_mesh(8, axis="dp")


@pytest.fixture(scope="module")
def prob():
    # skewed: power-law tracks + Zipf camera counts — exercises multiple
    # stack AND wrap classes on both sides
    p = synthetic.make_skewed_problem(num_cameras=29, num_points=300,
                                      mean_track=4.0, max_track=24, seed=5,
                                      cam_zipf=1.2)
    state, obs = ba.state_from_bal(p)   # fp64 on CPU tests
    return state, obs, p.num_cameras, p.num_points


def test_dist_pack_solve_matches_single_pack(prob, mesh8):
    state, obs, C, P = prob
    pl = ba_pack.make_pack_layout(obs, C, P, dtype=np.float64)
    lam = jnp.asarray(1e-4, dtype=state.points.dtype)
    xc_ref, xp_ref = ba_pack.solve_ba_step_pk(state, obs, pl, lam,
                                              cg_maxiter=20, cg_tol=1e-12)
    state_pad = dist_ba.pad_cameras(state, 8)
    dpl = dist_ba_pack.build_dist_pack_layout(obs, C, P, 8, dtype=np.float64)
    xc, xp = dist_ba_pack.dist_pack_solve_step(state_pad, dpl, lam, mesh8,
                                               cg_maxiter=20, cg_tol=1e-12)
    np.testing.assert_allclose(np.asarray(xc)[:C], np.asarray(xc_ref),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(xp), np.asarray(xp_ref), atol=1e-8)
    np.testing.assert_allclose(np.asarray(xc)[C:], 0.0, atol=1e-12)


def test_dist_pack_try_step_reduces_error(prob, mesh8):
    state, obs, C, P = prob
    state_pad = dist_ba.pad_cameras(state, 8)
    dpl = dist_ba_pack.build_dist_pack_layout(obs, C, P, 8, dtype=np.float64)
    e0 = float(ba.ba_error(state_pad, obs))
    st, e1 = dist_ba_pack.dist_pack_try_step(
        state_pad, obs, dpl, jnp.asarray(1e-4, dtype=state.points.dtype),
        mesh8, cg_maxiter=20)
    assert float(e1) < e0


def test_dist_pack_lone_device(prob):
    """n=1 degenerates to the single-device solve (no boundary points)."""
    state, obs, C, P = prob
    mesh1 = pmesh.make_mesh(1, axis="dp")
    pl = ba_pack.make_pack_layout(obs, C, P, dtype=np.float64)
    lam = jnp.asarray(3e-4, dtype=state.points.dtype)
    xc_ref, xp_ref = ba_pack.solve_ba_step_pk(state, obs, pl, lam,
                                              cg_maxiter=12, cg_tol=1e-12)
    dpl = dist_ba_pack.build_dist_pack_layout(obs, C, P, 1, dtype=np.float64)
    n, Cl, rowsC, PTC, C_slots, P_slots, Ps, _P, _cc, _pc = dpl.dims
    assert Ps == 0                       # no multi-device points
    xc, xp = dist_ba_pack.dist_pack_solve_step(state, dpl, lam, mesh1,
                                               cg_maxiter=12, cg_tol=1e-12)
    np.testing.assert_allclose(np.asarray(xc)[:C], np.asarray(xc_ref),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(xp), np.asarray(xp_ref), atol=1e-8)


def test_dist_pack_lm_run_matches_single(prob, mesh8):
    """The FULL distributed LM loop (accept/reject + lambda adaptation +
    reject-try caching, one scan inside shard_map) tracks the single-device
    ba_lm_run_pk iteration-for-iteration."""
    state, obs, C, P = prob
    pl = ba_pack.make_pack_layout(obs, C, P, dtype=np.float64)
    lam0 = jnp.asarray(1e-3, dtype=state.points.dtype)
    err0 = ba_pack.ba_error_pk(state, obs, pl)
    st_ref, lam_ref, err_ref = ba_pack.ba_lm_run_pk(
        state, obs, pl, lam0, err0, n_iters=5, cg_maxiter=8)

    state_pad = dist_ba.pad_cameras(state, 8)
    dpl = dist_ba_pack.build_dist_pack_layout(obs, C, P, 8, dtype=np.float64)
    err0_d = dist_ba_pack.dist_pack_error(state_pad, dpl, mesh8)
    np.testing.assert_allclose(float(err0_d), float(err0), rtol=1e-10)
    st_d, lam_d, err_d = dist_ba_pack.dist_pack_lm_run(
        state_pad, dpl, lam0, err0_d, n_iters=5, mesh=mesh8, cg_maxiter=8)
    assert float(err_d) < float(err0)
    np.testing.assert_allclose(float(err_d), float(err_ref), rtol=1e-8)
    np.testing.assert_allclose(float(lam_d), float(lam_ref), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(st_d.cam_poses)[:C],
                               np.asarray(st_ref.cam_poses), atol=1e-8)
    np.testing.assert_allclose(np.asarray(st_d.points),
                               np.asarray(st_ref.points), atol=1e-8)


def test_dist_pack_padding_bounded(prob):
    """Shared-geometry padding must stay within a small factor of the
    single-device packed layout (the whole point of the global ladder)."""
    state, obs, C, P = prob
    pl = ba_pack.make_pack_layout(obs, C, P, dtype=np.float64)
    cam_w1, pt_w1 = pl.padding_waste()
    dpl = dist_ba_pack.build_dist_pack_layout(obs, C, P, 8, dtype=np.float64)
    cam_w8, pt_w8 = dist_ba_pack.padding_waste(dpl, pl.M)
    # this toy is small (29 cams / 8 devices) so tile rounding dominates;
    # the bound just guards against an accidental uniform-rect regression
    assert cam_w8 < 20 * cam_w1
    assert pt_w8 < 20 * pt_w1


def test_collective_overhead_runs(prob, mesh8):
    state, obs, C, P = prob
    state_pad = dist_ba.pad_cameras(state, 8)
    dpl = dist_ba_pack.build_dist_pack_layout(obs, C, P, 8, dtype=np.float64)
    t_full, t_local, frac = dist_ba_pack.collective_overhead(
        state_pad, dpl, mesh8, cg_maxiter=5, iters=1)
    assert t_full > 0 and t_local > 0 and 0.0 <= frac < 1.0
