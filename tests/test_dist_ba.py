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
