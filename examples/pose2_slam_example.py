"""Pose2SLAMExample — 5-pose 2D pose graph with a loop closure.

Mirrors the reference's examples/Pose2SLAMExample.cpp:66: prior on the first
pose, odometry constraints, one loop closure; Gauss-Newton converges to the
exact square. Run: python examples/pose2_slam_example.py
"""

import numpy as np
import jax.numpy as jnp

from gtsam_personal_tpu.core.graph import GraphBuilder
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.nonlinear import optimizers
from gtsam_personal_tpu.nonlinear.marginals import Marginals
from gtsam_personal_tpu.slam import factors as F


def main():
    builder = GraphBuilder()
    F.add_prior(builder, "se2", 0, np.zeros(3), F.diag_noise([0.3, 0.3, 0.1]))
    odo_noise = F.diag_noise([0.2, 0.2, 0.1])
    F.add_between(builder, "se2", 0, 1, np.array([2.0, 0.0, 0.0]), odo_noise)
    for i in (1, 2, 3):
        F.add_between(builder, "se2", i, i + 1,
                      np.array([2.0, 0.0, np.pi / 2]), odo_noise)
    F.add_between(builder, "se2", 4, 1, np.array([2.0, 0.0, np.pi / 2]), odo_noise)
    graph = builder.build()

    initial = Values({"se2": jnp.asarray([
        [0.5, 0.0, 0.2], [2.3, 0.1, -0.2], [4.1, 0.1, np.pi / 2],
        [4.0, 2.0, np.pi], [2.1, 2.1, -np.pi / 2]])})

    print("initial error:", float(optimizers.graph_error(graph, initial)))
    result = optimizers.optimize_gn(graph, initial)
    print("final error:  ", result.error, f"({result.iterations} iterations)")
    print("optimized poses:\n", np.asarray(result.values["se2"]))

    marginals = Marginals(graph, result.values)
    for i in range(5):
        print(f"P(x{i}) cov diag:",
              np.diag(np.asarray(marginals.marginal_covariance("se2", i))))


if __name__ == "__main__":
    main()
