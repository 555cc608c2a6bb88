"""Multi-level recursive Schur elimination == dense solve, exactly.

Capability match: the reference's recursive junction-tree elimination
(inference/ClusterTree-inst.h:286)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.core.values import Layout
from gtsam_personal_tpu.linear import mlschur, solvers, fm
from gtsam_personal_tpu.linear.linearize import linearize
from gtsam_personal_tpu.slam import dataset


@pytest.fixture(scope="module")
def w100():
    graph, initial = dataset.load_2d(dataset.find_example_data("w100.graph"))
    return graph, initial


def test_ml_matches_dense_w100(w100):
    graph, initial = w100
    lin = linearize(graph, initial)
    layout = Layout.of(initial)
    # force several levels: tiny parts and tiny root
    plan = mlschur.make_ml_plan(graph, initial.counts(), max_part_size=12,
                                root_max_dim=24, max_levels=5)
    # (on w100's ring the level-1 separator graph is clique-ish, so
    # recursion may stop at one level; city10000 reaches 3 levels)
    assert plan.L >= 1, plan.stats()
    for lam in (0.0, 1e-3):
        d_ml = mlschur.solve_ml(lin, plan, lam)
        d_ref = solvers.solve_dense(lin, layout, lam)
        for g in d_ref:
            np.testing.assert_allclose(np.asarray(d_ml[g]),
                                       np.asarray(d_ref[g]),
                                       rtol=1e-7, atol=1e-9)


def test_ml_fm_matches(w100):
    graph, initial = w100
    linf = fm.linearize_fm(graph, initial)
    lin = linearize(graph, initial)
    layout = Layout.of(initial)
    plan = mlschur.make_ml_plan(graph, initial.counts(), max_part_size=16,
                                root_max_dim=30, max_levels=4)
    d_ml = mlschur.solve_ml(linf, plan, 1e-4)
    d_ref = solvers.solve_dense(lin, layout, 1e-4)
    for g in d_ref:
        np.testing.assert_allclose(np.asarray(d_ml[g]), np.asarray(d_ref[g]),
                                   rtol=1e-7, atol=1e-9)


def test_ml_single_level_degenerate(w100):
    """root_max_dim large enough that everything is root -> dense solve."""
    graph, initial = w100
    lin = linearize(graph, initial)
    layout = Layout.of(initial)
    plan = mlschur.make_ml_plan(graph, initial.counts(), max_part_size=64,
                                root_max_dim=10 ** 6, max_levels=4)
    assert plan.L == 0
    d_ml = mlschur.solve_ml(lin, plan, 1e-5)
    d_ref = solvers.solve_dense(lin, layout, 1e-5)
    for g in d_ref:
        np.testing.assert_allclose(np.asarray(d_ml[g]), np.asarray(d_ref[g]),
                                   rtol=1e-7, atol=1e-9)


def test_ml_pose3(w100):
    """SE(3) multi-group structure through the recursive solver."""
    graph, initial = dataset.load_3d(
        dataset.find_example_data("pose3example.txt"))
    lin = linearize(graph, initial)
    layout = Layout.of(initial)
    plan = mlschur.make_ml_plan(graph, initial.counts(), max_part_size=2,
                                root_max_dim=6, max_levels=3)
    d_ml = mlschur.solve_ml(lin, plan, 1e-4)
    d_ref = solvers.solve_dense(lin, layout, 1e-4)
    for g in d_ref:
        np.testing.assert_allclose(np.asarray(d_ml[g]), np.asarray(d_ref[g]),
                                   rtol=1e-6, atol=1e-8)
