"""sphere2500 ATE vs the shipped ground truth (BASELINE.md parity protocol).

The reference ships `sphere2500_groundtruth.txt` as a NOISE-FREE edge list
(no VERTEX lines); the ground-truth trajectory is the composition of its
sequential odometry edges — exactly what dataset.load_3d's compose-chain
initial produces. Estimate: fp64 host chordal init + LM on sphere2500.txt,
then Sim(3)-aligned ATE (slam/metrics.py umeyama/ate).

Usage: python tools/sphere2500_ate.py [--platform cpu] [--solver schur]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=[None, "cpu"])
    ap.add_argument("--solver", default="schur")
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    from gtsam_personal_tpu.core.values import Values
    from gtsam_personal_tpu.linear import schur
    from gtsam_personal_tpu.nonlinear import optimizers
    from gtsam_personal_tpu.slam import dataset, metrics
    from gtsam_personal_tpu.slam.initialize import chordal_init_f64

    graph, initial = dataset.load_3d(
        dataset.find_example_data("sphere2500.txt"))
    n = initial["se3"].shape[0]
    _, gt_init = dataset.load_3d(
        dataset.find_example_data("sphere2500_groundtruth.txt"))
    gt_pos = np.asarray(gt_init["se3"])[:, :, 3]
    print(f"sphere2500: {n} poses; ground truth {gt_pos.shape[0]} poses",
          flush=True)

    t0 = time.time()
    est0 = chordal_init_f64(graph, n)
    print(f"fp64 chordal init in {time.time()-t0:.1f}s, error "
          f"{float(optimizers.graph_error(graph, est0)):.1f}", flush=True)

    plan = (schur.make_plan(graph, {"se3": n}, max_part_size=256)
            if args.solver == "schur" else None)
    params = optimizers.Params(solver=args.solver, max_iterations=args.iters)
    t0 = time.time()
    res = optimizers.optimize_lm(graph, est0, params, plan=plan)
    print(f"LM: error {res.error:.2f} in {res.iterations} iters "
          f"({time.time()-t0:.1f}s), converged={res.converged}", flush=True)

    est_pos = np.asarray(res.values["se3"])[:, :, 3]
    m_se3 = metrics.ate(est_pos, gt_pos, align=True, with_scale=False)
    m_sim3 = metrics.ate(est_pos, gt_pos, align=True, with_scale=True)
    print(f"ATE (SE3-aligned):  rmse {m_se3['rmse']:.4f} m  "
          f"mean {m_se3['mean']:.4f}  max {m_se3['max']:.4f}")
    print(f"ATE (Sim3-aligned): rmse {m_sim3['rmse']:.4f} m  "
          f"mean {m_sim3['mean']:.4f}  max {m_sim3['max']:.4f}")
    print("SPHERE2500-ATE OK")


if __name__ == "__main__":
    main()
