"""Camera-sharded distributed BA (explicit shard_map + psum) must match the
single-device cam-major solver on the 8-device virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.sfm import ba, synthetic
from gtsam_personal_tpu.parallel import mesh as pmesh
from gtsam_personal_tpu.parallel import dist_ba


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return pmesh.make_mesh(8, axis="dp")


@pytest.fixture(scope="module")
def prob():
    p = synthetic.make_ring_problem(num_cameras=19, num_points=80,
                                    obs_per_point=4, seed=11)
    state, obs = ba.state_from_bal(p)   # fp64 on CPU tests
    return state, obs, p.num_cameras, p.num_points


def test_dist_solve_matches_cm(prob, mesh8):
    state, obs, C, P = prob
    layout = ba.make_layout(obs, C, P)
    lam = jnp.asarray(1e-4, dtype=state.points.dtype)
    xc_ref, xp_ref = ba.solve_ba_step_cm(state, obs, layout, lam,
                                         cg_maxiter=30, cg_tol=1e-12)
    state_pad = dist_ba.pad_cameras(state, 8)
    dl = dist_ba.build_dist_layout(obs, C, P, 8, dtype=np.float64)
    xc, xp = dist_ba.dist_solve_ba_step(state_pad, dl, lam, mesh8,
                                        cg_maxiter=30, cg_tol=1e-12)
    np.testing.assert_allclose(np.asarray(xc)[:C], np.asarray(xc_ref),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(xp), np.asarray(xp_ref), atol=1e-8)
    # padded cameras stay fixed
    np.testing.assert_allclose(np.asarray(xc)[C:], 0.0, atol=1e-12)


def test_dist_try_step_reduces_error(prob, mesh8):
    state, obs, C, P = prob
    state_pad = dist_ba.pad_cameras(state, 8)
    dl = dist_ba.build_dist_layout(obs, C, P, 8, dtype=np.float64)
    e0 = float(ba.ba_error(state_pad, obs))
    st, e1 = dist_ba.dist_ba_try_step(
        state_pad, obs, dl, jnp.asarray(1e-4, dtype=state.points.dtype),
        mesh8, cg_maxiter=30)
    assert float(e1) < e0


def test_collective_overhead_runs(prob, mesh8):
    state, obs, C, P = prob
    state_pad = dist_ba.pad_cameras(state, 8)
    dl = dist_ba.build_dist_layout(obs, C, P, 8, dtype=np.float64)
    t_full, t_local, frac = dist_ba.collective_overhead(
        state_pad, dl, mesh8, cg_maxiter=5, iters=2)
    assert t_full > 0 and t_local > 0 and 0.0 <= frac < 1.0


def test_ownership_partitioned_layout_matches(mesh8):
    """Sequential-covisibility problem: most landmarks are exclusive to one
    device's camera block (small boundary), and the boundary-only psum path
    still matches the single-device solver exactly."""
    p = synthetic.make_skewed_problem(num_cameras=64, num_points=400,
                                      mean_track=4.0, max_track=10, seed=3)
    state, obs = ba.state_from_bal(p)
    C, P = p.num_cameras, p.num_points
    layout = ba.make_layout(obs, C, P)
    lam = jnp.asarray(1e-4, dtype=state.points.dtype)
    xc_ref, xp_ref = ba.solve_ba_step_cm(state, obs, layout, lam,
                                         cg_maxiter=30, cg_tol=1e-12)
    state_pad = dist_ba.pad_cameras(state, 8)
    dl = dist_ba.build_dist_layout(obs, C, P, 8, dtype=np.float64)
    n, Cl, Q, T, Pd, Ps, offs = dl.dims
    assert Ps < P // 2, f"expected small boundary, got {Ps}/{P}"
    assert offs[-1] == P
    xc, xp = dist_ba.dist_solve_ba_step(state_pad, dl, lam, mesh8,
                                        cg_maxiter=30, cg_tol=1e-12)
    np.testing.assert_allclose(np.asarray(xc)[:C], np.asarray(xc_ref),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(xp), np.asarray(xp_ref), atol=1e-8)


def test_partition_points_off_matches(mesh8):
    """partition_points=False (all landmarks boundary) must agree too."""
    p = synthetic.make_skewed_problem(num_cameras=24, num_points=100,
                                      mean_track=3.0, max_track=8, seed=5)
    state, obs = ba.state_from_bal(p)
    C, P = p.num_cameras, p.num_points
    state_pad = dist_ba.pad_cameras(state, 8)
    lam = jnp.asarray(1e-4, dtype=state.points.dtype)
    dl_on = dist_ba.build_dist_layout(obs, C, P, 8, dtype=np.float64)
    dl_off = dist_ba.build_dist_layout(obs, C, P, 8, dtype=np.float64,
                                       partition_points=False)
    assert dl_off.dims[5] == P
    xc1, xp1 = dist_ba.dist_solve_ba_step(state_pad, dl_on, lam, mesh8,
                                          cg_maxiter=25, cg_tol=1e-12)
    xc2, xp2 = dist_ba.dist_solve_ba_step(state_pad, dl_off, lam, mesh8,
                                          cg_maxiter=25, cg_tol=1e-12)
    np.testing.assert_allclose(np.asarray(xc1), np.asarray(xc2), atol=1e-9)
    np.testing.assert_allclose(np.asarray(xp1), np.asarray(xp2), atol=1e-9)
