"""Manhattan-world pose-graph generator (M3500 shape).

The classic Olson M3500 benchmark (3500 poses on a city grid, ~5600
constraints) is referenced by BASELINE.md config 2 but the dataset file is
not shipped in the reference's examples/Data; this generator reproduces its
statistics: unit grid steps with 90-degree turns, odometry between every
consecutive pair, and proximity loop closures between revisit pairs — so the
Pose2SLAM parity/perf runs (examples/pose2_m3500.py) exercise the same
problem shape. Reference consumer: examples/Pose2SLAMExample_g2o.cpp with
w3500-class inputs.
"""

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from gtsam_personal_tpu.core.graph import FactorGraph, GraphBuilder
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.geometry import se2
from gtsam_personal_tpu.slam import factors as F


def _se2_np(x):
    return jnp.asarray(x, dtype=jnp.float64)


def make_manhattan(n_poses: int = 3500, seed: int = 42,
                   turn_prob: float = 0.25, closure_radius: float = 1.5,
                   max_closures_per_pose: int = 1,
                   trans_sigma: float = 0.05, rot_sigma: float = 0.01,
                   init_from_odometry: bool = True,
                   dtype=np.float64) -> Tuple[FactorGraph, Values, np.ndarray]:
    """Returns (graph, initial, truth[n,3]). Odometry chain + loop closures;
    initial estimate composed from noisy odometry (the hard, realistic init:
    drift grows with path length)."""
    rng = np.random.default_rng(seed)

    # ground-truth trajectory: grid walk with 90-degree turns, biased to stay
    # near the origin (city-block revisits generate closures)
    truth = np.zeros((n_poses, 3))
    heading = 0
    pos = np.zeros(2)
    dirs = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
    for i in range(1, n_poses):
        if rng.random() < turn_prob:
            # prefer turning back toward the origin to keep the map compact
            cand = [(heading + 1) % 4, (heading + 3) % 4]
            scores = [-(pos + dirs[c]) @ (pos + dirs[c]) for c in cand]
            heading = cand[int(np.argmax(scores))] \
                if rng.random() < 0.7 else cand[rng.integers(2)]
        pos = pos + dirs[heading]
        truth[i] = [pos[0], pos[1], heading * np.pi / 2]

    # odometry measurements
    b = GraphBuilder()
    F.add_prior(b, "se2", 0, truth[0], F.diag_noise([0.1, 0.1, 0.05]))
    odo_noise = F.diag_noise([trans_sigma, trans_sigma, rot_sigma])
    meas = np.zeros((n_poses - 1, 3))
    for i in range(n_poses - 1):
        rel = np.asarray(se2.between(_se2_np(truth[i]), _se2_np(truth[i + 1])))
        rel = rel + rng.normal(scale=[trans_sigma, trans_sigma, rot_sigma])
        rel[2] = np.arctan2(np.sin(rel[2]), np.cos(rel[2]))
        meas[i] = rel
        F.add_between(b, "se2", i, i + 1, rel, odo_noise)

    # loop closures: revisited grid cells within closure_radius
    cell = np.round(truth[:, :2]).astype(np.int64)
    seen = {}
    n_closures = 0
    for i in range(n_poses):
        key = (cell[i, 0], cell[i, 1])
        prev = seen.get(key, [])
        added = 0
        for j in prev:
            if i - j > 50 and added < max_closures_per_pose:
                d = np.linalg.norm(truth[i, :2] - truth[j, :2])
                if d <= closure_radius:
                    rel = np.asarray(se2.between(_se2_np(truth[j]),
                                                 _se2_np(truth[i])))
                    rel = rel + rng.normal(
                        scale=[trans_sigma, trans_sigma, rot_sigma])
                    rel[2] = np.arctan2(np.sin(rel[2]), np.cos(rel[2]))
                    F.add_between(b, "se2", int(j), int(i), rel, odo_noise)
                    added += 1
                    n_closures += 1
        prev.append(i)
        seen[key] = prev

    graph = b.build(dtype=dtype)

    if init_from_odometry:
        init = np.zeros((n_poses, 3))
        init[0] = truth[0]
        for i in range(n_poses - 1):
            init[i + 1] = np.asarray(se2.compose(_se2_np(init[i]),
                                                 _se2_np(meas[i])))
    else:
        init = truth + rng.normal(scale=0.1, size=truth.shape)
    initial = Values({"se2": jnp.asarray(init, dtype=dtype)})
    return graph, initial, truth
