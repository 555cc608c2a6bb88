"""Incremental City10000 — the reference's examples/ISAM2_City10000.cpp:73
benchmark shape: stream ALL city10000 edges (odometry + 10,688 loop closures,
half of them spanning >2,800 poses) through the bounded-cost ISAM2 engine
(nonlinear/isam2.py), update after every measurement (relinearizeSkip=1,
relinearizeThreshold=0.01 like the reference harness), and report throughput,
per-update cost growth, final error, and ATE vs the shipped ground truth
(examples/Data/ISAM2_GT_city10000.txt).

  python examples/isam2_city10000.py [--n 10000] [--cg 40] [--update-every 1]
"""

import argparse
import time

import numpy as np
import jax.numpy as jnp

from gtsam_personal_tpu.nonlinear.isam2 import ISAM2, ISAM2Params
from gtsam_personal_tpu.linear import noise as nz
from gtsam_personal_tpu.slam import dataset, metrics
from gtsam_personal_tpu.slam import factors as F
from gtsam_personal_tpu.geometry import se2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10000, help="number of poses")
    ap.add_argument("--cg", type=int, default=40)
    ap.add_argument("--cg-tol", type=float, default=1e-3)
    ap.add_argument("--relin", type=float, default=0.01)
    ap.add_argument("--update-every", type=int, default=1)
    ap.add_argument("--dtype", choices=["f32", "f64"], default="f64")
    ap.add_argument("--precond", default="chain:se2",
                    help="'jacobi' or 'chain:se2' (SPCG odometry chain)")
    args = ap.parse_args()

    graph, initial = dataset.load_2d(dataset.find_example_data("city10000.g2o"))
    between = [b for b in graph.batches if b.name == "between_se2"][0]
    ij = np.asarray(between.idx)
    meas = np.asarray(between.meas["measured"])
    S = np.asarray(between.noise.data)  # [K, 3, 3] sqrt information
    keep = ij.max(axis=1) < args.n
    ij, meas, S = ij[keep], meas[keep], S[keep]

    dt = np.float32 if args.dtype == "f32" else np.float64
    isam = ISAM2(ISAM2Params(relinearize_threshold=args.relin,
                             cg_maxiter=args.cg, cg_tol=args.cg_tol,
                             relin_chunk=256, dtype=dt,
                             precond=args.precond,
                             min_var_cap=args.n + 1,
                             min_fac_cap=len(ij) + 8))
    rb = F.make_between_residual("se2")
    pr = F.make_prior_residual("se2")
    isam.add_variable("se2", np.zeros(3))
    isam.add_factor("prior_se2", pr, ["se2"], 3, [0], {"prior": np.zeros(3)},
                    nz.NoiseModel("diag", jnp.asarray([1e3, 1e3, 1e4], dtype=dt)))
    isam.update()

    t0 = time.time()
    added = 1
    checkpoints = {}
    t_seg = time.time()
    seg_updates = 0
    for k in range(len(ij)):
        i, j = int(ij[k, 0]), int(ij[k, 1])
        if j == added:
            init = np.asarray(se2.compose(
                jnp.asarray(isam.estimate_at("se2", i)), jnp.asarray(meas[k])))
            isam.add_variable("se2", init)
            added += 1
        isam.add_factor("between_se2", rb, ["se2", "se2"], 3, [i, j],
                        {"measured": meas[k]},
                        nz.NoiseModel("full", jnp.asarray(S[k], dtype=dt)))
        if k % args.update_every == 0:
            isam.update()
            seg_updates += 1
        if added % 1000 == 0 and added not in checkpoints:
            dt_seg = time.time() - t_seg
            checkpoints[added] = dt_seg / max(seg_updates, 1)
            print(f"  poses {added:6d}: {checkpoints[added]*1e3:7.2f} ms/update "
                  f"(segment of {seg_updates} updates)", flush=True)
            t_seg, seg_updates = time.time(), 0
    # final polish: repeated same-shape updates (extra_cg would change the
    # static cg_maxiter and force a full retrace of the city-scale program —
    # minutes of XLA compile on CPU for zero benefit)
    for _ in range(6):
        res = isam.update()
    wall = time.time() - t0
    err = isam.error()

    print(f"\nprocessed {len(ij)} factors / {added} poses in {wall:.2f}s "
          f"({len(ij)/wall:.1f} factors/s, {(len(ij)//args.update_every)/wall:.1f} updates/s)")
    print(f"final error: {err:.6g}")

    est = isam.estimate_array("se2")[:added]
    gt = np.loadtxt(dataset.find_example_data("ISAM2_GT_city10000.txt"))
    stats = metrics.ate(est[:, :2], gt[:added, :2], align=True)
    print(f"ATE RMSE vs ISAM2_GT_city10000: {stats['rmse']:.4f} m")


if __name__ == "__main__":
    main()
