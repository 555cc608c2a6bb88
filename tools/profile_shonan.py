"""Shonan rotation averaging timing (reference: timing/timeShonanAveraging.cpp
— there driven by a pose3 dataset's rotation graph; here sphere2500's).

Reports: per-stage wall (chordal init, each staircase level's LM, the
certificate min-eigenvalue power method) and the end-to-end run.

Usage: python tools/profile_shonan.py [--n-edges 4000] [--platform cpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-edges", type=int, default=None)
    ap.add_argument("--platform", default=None, choices=[None, "cpu"])
    args = ap.parse_args()
    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    from gtsam_personal_tpu.slam import dataset
    from gtsam_personal_tpu.sfm import shonan

    graph, initial = dataset.load_3d(
        dataset.find_example_data("sphere2500.txt"))
    bet = [b for b in graph.batches if b.name == "between_se3"][0]
    ij = np.asarray(bet.idx)
    R = np.asarray(bet.meas["measured"])[:, :, :3]
    if args.n_edges:
        keep = np.arange(len(ij)) < args.n_edges
        # keep the node set contiguous: restrict to nodes under the max
        nmax = int(ij[keep].max()) + 1
        keep = (ij[:, 0] < nmax) & (ij[:, 1] < nmax)
        ij, R = ij[keep], R[keep]
    n = int(ij.max()) + 1
    print(f"shonan: {n} rotations, {len(ij)} edges", flush=True)

    t0 = time.perf_counter()
    res = shonan.shonan_averaging(ij, R, p_min=3, p_max=6)
    wall = time.perf_counter() - t0
    print(f"staircase: certified={res.certified} at p={res.p_final}, "
          f"min-eig {res.min_eig:.2e}, cost {res.cost:.3f}, "
          f"{wall:.1f}s end-to-end")
    print("PROFILE-SHONAN OK" if np.isfinite(res.cost) else "FAIL")


if __name__ == "__main__":
    main()
