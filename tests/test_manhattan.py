"""Manhattan-world generator + M3500-shape parity at reduced scale."""

import numpy as np

from gtsam_personal_tpu.nonlinear import optimizers
from gtsam_personal_tpu.slam import manhattan, metrics


def test_manhattan_pose2slam_converges():
    graph, initial, truth = manhattan.make_manhattan(300, seed=1)
    n_factors = sum(b.idx.shape[0] for b in graph.batches)
    assert n_factors > 300  # odometry + prior + at least some closures

    res = optimizers.optimize_lm(
        graph, initial,
        optimizers.Params(max_iterations=30, lambda_initial=1e-4))
    est = np.asarray(res.values["se2"])
    init_ate = metrics.ate(np.asarray(initial["se2"])[:, :2],
                           truth[:, :2], align=True)["rmse"]
    ate = metrics.ate(est[:, :2], truth[:, :2], align=True)["rmse"]
    assert res.converged
    assert ate < 0.25, f"ATE {ate}"
    assert ate < init_ate  # beat the drifted odometry init
