"""M3500-shape Manhattan-world Pose2SLAM (BASELINE config 2).

The Olson M3500 file is not shipped in the reference's Data directory;
slam/manhattan.py generates a problem with matching statistics (3500 poses,
grid odometry, proximity loop closures). Runs batch LM with the partitioned-
Schur solver and reports convergence + ATE vs ground truth.

  python examples/pose2_m3500.py [--n 3500] [--solver schur|pcg|dense]
"""

import argparse
import time

import numpy as np
import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3500)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--solver", default="schur")
    ap.add_argument("--platform", default=None,
                    help="e.g. cpu; default = environment's device")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
        jax.config.update("jax_enable_x64", True)

    from gtsam_personal_tpu.linear.schur import make_plan
    from gtsam_personal_tpu.nonlinear import optimizers
    from gtsam_personal_tpu.slam import manhattan, metrics

    graph, initial, truth = manhattan.make_manhattan(args.n, seed=args.seed)
    n_factors = sum(b.idx.shape[0] for b in graph.batches)
    print(f"M3500-shape problem: {args.n} poses, {n_factors} factors")

    plan = None
    if args.solver == "schur":
        plan = make_plan(graph, {"se2": args.n}, max_part_size=256)
    params = optimizers.Params(solver=args.solver, max_iterations=50,
                               pcg_maxiter=500, pcg_tol=1e-10,
                               lambda_initial=1e-4, verbose=True)
    t0 = time.time()
    res = optimizers.optimize_lm(graph, initial, params, plan=plan)
    wall = time.time() - t0

    est = np.asarray(res.values["se2"])
    init_ate = metrics.ate(np.asarray(initial["se2"])[:, :2], truth[:, :2],
                           align=True)["rmse"]
    stats = metrics.ate(est[:, :2], truth[:, :2], align=True)
    print(f"\nconverged={res.converged} iters={res.iterations} "
          f"error={res.error:.4f} wall={wall:.1f}s")
    print(f"ATE RMSE: odometry init {init_ate:.3f} m -> optimized "
          f"{stats['rmse']:.4f} m")
    ok = res.converged and stats["rmse"] < 0.5
    print("PARITY OK" if ok else "PARITY FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
