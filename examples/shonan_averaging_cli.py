"""Shonan rotation averaging from a g2o pose graph.

Mirrors the reference's examples/ShonanAveragingCLI.cpp: extract relative
rotations from a 2D/3D pose-graph file, run the certifiably-correct staircase,
report the certificate.

  python examples/shonan_averaging_cli.py [path] [--pmax 7]
"""

import argparse

import numpy as np

from gtsam_personal_tpu.slam import dataset
from gtsam_personal_tpu.sfm import shonan


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs="?", default=None)
    ap.add_argument("--pmax", type=int, default=7)
    args = ap.parse_args()
    if args.path is None:
        args.path = dataset.find_example_data("pose3example.txt")

    graph, initial = dataset.load_3d(args.path)
    b = [x for x in graph.batches if x.name == "between_se3"][0]
    edges = np.asarray(b.idx)
    R_meas = np.asarray(b.meas["measured"])[:, :, :3]
    print(f"{initial['se3'].shape[0]} rotations, {len(edges)} measurements")

    res = shonan.shonan_averaging(edges, R_meas, p_min=3, p_max=args.pmax)
    print(f"certified={res.certified} at p={res.p_final}, "
          f"min_eig={res.min_eig:.2e}, cost={res.cost:.6g}")


if __name__ == "__main__":
    main()
