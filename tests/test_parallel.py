"""Multi-device sharding tests on the 8-device virtual CPU mesh: sharded
results must match single-device results exactly; collectives are exercised
through GSPMD (SURVEY.md §7 'Distributed correctness')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.parallel import mesh as pmesh
from gtsam_personal_tpu.parallel import ba_sharded
from gtsam_personal_tpu.sfm import ba, synthetic
from gtsam_personal_tpu.linear.linearize import linearize
from gtsam_personal_tpu.linear import solvers
from gtsam_personal_tpu.nonlinear import optimizers


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return pmesh.make_mesh(8, axis="dp")


def test_sharded_pose_graph_matches_single(mesh8):
    from __graft_entry__ import _synthetic_pose_graph
    graph, initial = _synthetic_pose_graph(n_poses=48, dtype=np.float64)

    @jax.jit
    def step(graph, values, lam):
        lin = linearize(graph, values)
        delta = solvers.solve_pcg(lin, lam, maxiter=100, tol=1e-10)
        nv = values.retract(delta)
        return nv, graph.error(nv)

    lam = jnp.asarray(1e-4)
    v_single, e_single = step(graph, initial, lam)
    sharded = pmesh.shard_graph(graph, mesh8, axis="dp")
    values = pmesh.replicate_values(initial, mesh8)
    v_shard, e_shard = step(sharded, values, lam)
    np.testing.assert_allclose(float(e_shard), float(e_single), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(v_shard["se2"]),
                               np.asarray(v_single["se2"]), atol=1e-10)


def test_sharded_ba_matches_single(mesh8):
    prob = synthetic.make_ring_problem(num_cameras=16, num_points=64,
                                       obs_per_point=4, seed=5)
    state, obs = ba.state_from_bal(prob)
    layout = ba.make_layout(obs, 16, 64)
    lam = jnp.asarray(1e-4, dtype=state.points.dtype)
    s1, e1 = ba.ba_try_step(state, obs, layout, lam, cg_maxiter=50)
    st, ob, ly = ba_sharded.shard_ba(state, obs, layout, mesh8)
    s2, e2 = ba_sharded.sharded_ba_step(st, ob, ly, lam, cg_maxiter=50)
    np.testing.assert_allclose(float(e2), float(e1), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(s2.points), np.asarray(s1.points),
                               atol=1e-8)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_bootstrap_noop_and_validation():
    """Multi-host bootstrap: flag off -> no-op; enabled without a
    coordinator -> explicit error; process_info valid single-process."""
    import os
    import pytest
    from gtsam_personal_tpu.parallel import bootstrap
    assert bootstrap.maybe_init_distributed() is False
    old = os.environ.pop("GTSAM_TPU_COORD", None)
    os.environ["GTSAM_TPU_DIST"] = "1"
    try:
        with pytest.raises(ValueError):
            bootstrap.maybe_init_distributed()
    finally:
        del os.environ["GTSAM_TPU_DIST"]
        if old is not None:
            os.environ["GTSAM_TPU_COORD"] = old
    pi, pc, ld, gd = bootstrap.process_info()
    assert pi == 0 and pc == 1 and ld == gd == 8  # conftest virtual mesh
