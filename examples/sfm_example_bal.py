"""Bundle adjustment on a BAL file.

Mirrors the reference's examples/SFMExample_bal.cpp: load the BAL problem
(or a Bundler .out file such as the shipped Balbianello.out), run LM with
the implicit-Schur PCG engine, report reprojection statistics.

  python examples/sfm_example_bal.py [path-to-bal.txt]
"""

import argparse
import time

import numpy as np

from gtsam_personal_tpu.sfm import bal, ba, ba_pack
from gtsam_personal_tpu.slam.dataset import find_example_data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs="?", default=None)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--engine", choices=["pack", "cm"], default="pack",
                    help="pack = packed-tile engine (production path); "
                         "cm = round-1 uniform cam-major engine")
    ap.add_argument("--robust", default="none",
                    help="optional m-estimator for the pack engine "
                         "(huber, cauchy, ...)")
    args = ap.parse_args()
    if args.path is None:
        args.path = find_example_data("dubrovnik-3-7-pre.txt")

    prob = (bal.load_bundler(args.path) if args.path.endswith(".out")
            else bal.load_bal(args.path))
    print(f"cameras={prob.num_cameras} points={prob.num_points} "
          f"observations={prob.num_observations}")
    state, obs = ba.state_from_bal(prob)
    e0 = float(ba.ba_error(state, obs))
    print("initial: error %.6g, rms %.3f px" % (
        e0, np.sqrt(2 * e0 / prob.num_observations)))
    t0 = time.time()
    if args.engine == "pack":
        final, err, iters = ba_pack.optimize_ba_pk(
            state, obs, max_iterations=args.iters, robust=args.robust,
            verbose=True)
    else:
        layout = ba.make_layout(obs, prob.num_cameras, prob.num_points)
        final, err, iters = ba.optimize_ba(state, obs, layout,
                                           max_iterations=args.iters,
                                           verbose=True)
    dt = time.time() - t0
    print("final: error %.6g, rms %.3f px, %d iterations in %.2fs "
          "(%.2f it/s)" % (err, np.sqrt(2 * err / prob.num_observations),
                           iters, dt, iters / max(dt, 1e-9)))


if __name__ == "__main__":
    main()
