"""Incremental City10000 — the reference's examples/ISAM2_City10000.cpp
benchmark shape: stream the city10000 edges (odometry + loop closures) into
the incremental smoother and report throughput + final error.

  python examples/isam2_city10000.py [--n 2000] [--relin 50]
"""

import argparse
import time

import numpy as np
import jax.numpy as jnp

from gtsam_personal_tpu.nonlinear.incremental import IncrementalSmoother
from gtsam_personal_tpu.slam import dataset
from gtsam_personal_tpu.geometry import se2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000, help="number of poses")
    ap.add_argument("--relin", type=int, default=50)
    args = ap.parse_args()

    graph, initial = dataset.load_2d(dataset.find_example_data("city10000.g2o"))
    between = [b for b in graph.batches if b.name == "between_se2"][0]
    ij = np.asarray(between.idx)
    meas = np.asarray(between.meas["measured"])
    S = np.asarray(between.noise.data)
    keep = ij.max(axis=1) < args.n
    ij, meas, S = ij[keep], meas[keep], S[keep]

    inc = IncrementalSmoother(group="se2", relinearize_every=args.relin,
                              iters_per_update=3, dtype=np.float32)
    inc.set_prior(np.zeros(3), [0.3, 0.3, 0.1])
    t0 = time.time()
    added = 1
    for k in range(len(ij)):
        i, j = int(ij[k, 0]), int(ij[k, 1])
        if j == added:
            init = np.asarray(se2.compose(jnp.asarray(inc._poses[i]),
                                          jnp.asarray(meas[k])))
            inc.add_pose(init)
            added += 1
        inc.add_between(i, j, meas[k], S[k])
    err = inc.solve(iters=6)
    dt = time.time() - t0
    print(f"processed {len(ij)} factors / {added} poses in {dt:.2f}s "
          f"({len(ij)/dt:.1f} factors/s)")
    print(f"final error: {err:.6g}")


if __name__ == "__main__":
    main()
