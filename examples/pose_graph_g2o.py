"""Pose-graph SLAM from g2o/TORO files — 2D and 3D.

Mirrors the reference's Pose2SLAMExample_g2o.cpp and
Pose3SLAMExample_initializePose3.cpp: load the dataset, (for 3D) chordal
initialization, batch LM with the partitioned-Schur exact solver, write the
result.

  python examples/pose_graph_g2o.py [path] [--3d] [--out out.g2o]

Defaults to the reference datasets mounted at /root/reference/examples/Data.
"""

import argparse
import time

import numpy as np

from gtsam_personal_tpu.slam import dataset, initialize
from gtsam_personal_tpu.nonlinear import optimizers
from gtsam_personal_tpu.linear import schur


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs="?", default=None)
    ap.add_argument("--3d", dest="three_d", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--max-part", type=int, default=128)
    ap.add_argument("--fmt", default="quat", choices=["quat", "edge3"],
                    help="3D output format: EDGE_SE3:QUAT or EDGE3")
    args = ap.parse_args()

    if args.path is None:
        args.path = dataset.find_example_data(
            "sphere2500.txt" if args.three_d else "w100.graph")

    t0 = time.time()
    if args.three_d:
        graph, initial = dataset.load_3d(args.path)
        n = initial["se3"].shape[0]
        print(f"loaded {n} poses, {graph.num_factors} factors "
              f"({time.time()-t0:.2f}s)")
        print("odometry error:", float(optimizers.graph_error(graph, initial)))
        # host-side fp64 chordal relaxation regardless of compute dtype: the
        # fp32 chordal point lands LM in a measurably worse basin
        # (PERFORMANCE.md round 3: sphere2500 gap 2.8% -> 1.5%)
        initial = initialize.chordal_init_f64(graph, n)
        print("chordal-init error:", float(optimizers.graph_error(graph, initial)))
    else:
        graph, initial = dataset.load_2d(args.path)
        print(f"loaded {initial['se2'].shape[0]} poses, "
              f"{graph.num_factors} factors ({time.time()-t0:.2f}s)")
        print("initial error:", float(optimizers.graph_error(graph, initial)))

    t0 = time.time()
    plan = schur.make_plan(graph, initial.counts(), max_part_size=args.max_part)
    print("partition:", plan.stats(), f"({time.time()-t0:.2f}s)")

    t0 = time.time()
    res = optimizers.optimize_lm(graph, initial,
                                 optimizers.Params(solver="schur",
                                                   max_iterations=30),
                                 plan=plan)
    print(f"final error: {res.error:.6g} in {res.iterations} iterations "
          f"({time.time()-t0:.2f}s), converged={res.converged}")

    if args.out:
        if args.three_d:
            dataset.write_g2o_3d(args.out, res.values, graph, fmt=args.fmt)
        else:
            dataset.write_g2o_2d(args.out, res.values, graph)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
