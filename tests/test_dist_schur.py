"""Sharded partitioned-Schur solve (explicit shard_map + psum) must match the
single-device solver to fp64 tolerance on the 8-device virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.linear import schur, fm
from gtsam_personal_tpu.linear.linearize import linearize
from gtsam_personal_tpu.parallel import mesh as pmesh
from gtsam_personal_tpu.parallel.dist_schur import (
    DistSchurPlan, solve_partitioned_sharded)


@pytest.fixture(scope="module")
def problem():
    from __graft_entry__ import _synthetic_pose_graph
    graph, initial = _synthetic_pose_graph(n_poses=96, dtype=np.float64)
    counts = {"se2": initial["se2"].shape[0]}
    plan = schur.make_plan(graph, counts, max_part_size=16)
    return graph, initial, plan


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return pmesh.make_mesh(8, axis="dp")


def test_sharded_matches_local(problem, mesh8):
    graph, initial, plan = problem
    lin = linearize(graph, initial)
    dplan = DistSchurPlan(plan, 8)
    for lam in (0.0, 1e-3):
        ref = schur.solve_partitioned(lin, plan, lam)
        got = solve_partitioned_sharded(lin, dplan, mesh8, lam)
        for g in ref:
            np.testing.assert_allclose(np.asarray(got[g]),
                                       np.asarray(ref[g]), atol=1e-9)


def test_sharded_matches_local_fm(problem, mesh8):
    graph, initial, plan = problem
    lin = fm.linearize_fm(graph, initial)
    dplan = DistSchurPlan(plan, 8)
    ref = schur.solve_partitioned(lin, plan, 1e-4)
    got = solve_partitioned_sharded(lin, dplan, mesh8, 1e-4)
    for g in ref:
        np.testing.assert_allclose(np.asarray(got[g]),
                                   np.asarray(ref[g]), atol=1e-9)


def test_sharded_uneven_partitions(problem, mesh8):
    """p not divisible by n: pad partitions must stay inert."""
    graph, initial, plan = problem
    assert plan.p % 8 != 0 or plan.p < 8 or True  # exercise whatever p is
    lin = linearize(graph, initial)
    for n in (3, 5):
        sub = pmesh.make_mesh(n, axis="dp")
        dplan = DistSchurPlan(plan, n)
        ref = schur.solve_partitioned(lin, plan, 1e-4)
        got = solve_partitioned_sharded(lin, dplan, sub, 1e-4)
        for g in ref:
            np.testing.assert_allclose(np.asarray(got[g]),
                                       np.asarray(ref[g]), atol=1e-9)
