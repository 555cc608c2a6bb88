"""SE(3) pose-graph SLAM: chordal initialization + LM on golden datasets
(reference: Pose3SLAMExample_initializePose3.cpp over sphere2500, and the
pose3example regression files)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.slam import dataset, initialize
from gtsam_personal_tpu.nonlinear import optimizers
from gtsam_personal_tpu.linear import schur


def test_pose3_example_small():
    """pose3example.txt: small 3D pose graph with vertices; LM converges."""
    graph, initial = dataset.load_3d(dataset.find_example_data("pose3example.txt"))
    res = optimizers.optimize_lm(graph, initial)
    assert res.converged
    assert res.error < float(optimizers.graph_error(graph, initial)) + 1e-12


def test_chordal_init_recovers_consistent_graph():
    """On a noise-free consistent graph, chordal init should give (near) exact
    rotations; after LM, error ~ 0."""
    rng = np.random.default_rng(3)
    from gtsam_personal_tpu.core.graph import GraphBuilder
    from gtsam_personal_tpu.slam import factors as F
    from gtsam_personal_tpu.geometry import se3 as se3m

    n = 12
    truth = [np.eye(3, 4)]
    for i in range(n - 1):
        xi = rng.normal(scale=0.4, size=6)
        truth.append(np.asarray(se3m.compose(jnp.asarray(truth[-1]),
                                             se3m.expmap(jnp.asarray(xi)))))
    b = GraphBuilder()
    F.add_prior(b, "se3", 0, truth[0], F.diag_noise([0.1] * 6))
    for i in range(n - 1):
        rel = np.asarray(se3m.between(jnp.asarray(truth[i]), jnp.asarray(truth[i + 1])))
        F.add_between(b, "se3", i, i + 1, rel, F.diag_noise([0.05] * 6))
    rel = np.asarray(se3m.between(jnp.asarray(truth[0]), jnp.asarray(truth[n - 1])))
    F.add_between(b, "se3", 0, n - 1, rel, F.diag_noise([0.05] * 6))
    graph = b.build()

    init = initialize.chordal_init(graph, n)
    e_init = float(optimizers.graph_error(graph, init))
    res = optimizers.optimize_gn(graph, init)
    assert res.error < 1e-12
    # chordal on noise-free data should already be very good
    assert e_init < 1e-6


@pytest.mark.slow
def test_sphere2500_chordal_plus_lm():
    graph, initial = dataset.load_3d(dataset.find_example_data("sphere2500.txt"))
    n = initial["se3"].shape[0]
    init = initialize.chordal_init(graph, n)
    e_odo = float(optimizers.graph_error(graph, initial))
    e_chordal = float(optimizers.graph_error(graph, init))
    assert e_chordal < e_odo  # chordal init should beat odometry composition
    plan = schur.make_plan(graph, init.counts(), max_part_size=128)
    res = optimizers.optimize_lm(
        graph, init, optimizers.Params(solver="schur", max_iterations=25), plan=plan)
    # regression value: LM fixed point 1133.015 (verified identical via dense
    # PCG trajectory); odometry error is 1.2e7, chordal 4397
    assert res.error < 1140.0
