"""Stereo visual odometry on the reference's recorded VO dataset.

Mirrors examples/StereoVOExample_large.cpp: 25 real camera poses + 8189
GenericStereoFactor measurements (uL, uR, v) of ~4700 landmarks, landmarks
initialized by back-projecting the recorded camera-frame triangulations,
first pose held fixed, batch LM.

Run (CPU):
  python -c "import jax; jax.config.update('jax_platforms','cpu'); \
             jax.config.update('jax_enable_x64', True); \
             exec(open('examples/stereo_vo_large.py').read())"
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax.numpy as jnp
    from gtsam_personal_tpu.geometry import se3
    from gtsam_personal_tpu.core.graph import GraphBuilder
    from gtsam_personal_tpu.core.values import Values
    from gtsam_personal_tpu.nonlinear import optimizers
    from gtsam_personal_tpu.slam.factors import (stereo_residual,
                                                 make_prior_residual)
    from gtsam_personal_tpu.slam.dataset import find_example_data

    fx, fy, s, u0, v0, b = np.loadtxt(find_example_data("VO_calibration.txt"))
    cal = np.array([fx, fy, u0, v0, b])    # stereo_residual layout
    rows = np.loadtxt(find_example_data("VO_camera_poses_large.txt"))
    pose_ids = rows[:, 0].astype(int)
    mats = rows[:, 1:].reshape(-1, 4, 4)
    id2ix = {pid: i for i, pid in enumerate(pose_ids)}
    poses0 = mats[:, :3, :]                 # wTc [3, 4]

    fac = np.loadtxt(find_example_data("VO_stereo_factors_large.txt"))
    x_id = fac[:, 0].astype(int)
    l_id = fac[:, 1].astype(int)
    uLuRv = fac[:, 2:5]
    cam_pt = fac[:, 5:8]
    print(f"read {len(poses0)} poses, {len(fac)} stereo factors, "
          f"{len(set(l_id.tolist()))} landmarks")

    # landmark initialization: first sighting's camera-frame triangulation
    # transformed into the world (reference: transformFrom)
    lmap = {}
    l_init = []
    for i in range(len(fac)):
        l = l_id[i]
        if l not in lmap:
            lmap[l] = len(lmap)
            wp = np.asarray(se3.transform_from(
                jnp.asarray(poses0[id2ix[x_id[i]]]), jnp.asarray(cam_pt[i])))
            l_init.append(wp)
    l_init = np.asarray(l_init)

    bgraph = GraphBuilder()
    # first pose fixed (reference: NonlinearEquality -> tight prior here)
    bgraph.add("prior_se3", make_prior_residual("se3"), ("se3",), 6,
               [id2ix[pose_ids[0]]], {"prior": poses0[id2ix[pose_ids[0]]]},
               {"kind": "diag", "data": np.full(6, 1e6)})
    K = len(fac)
    for i in range(K):
        bgraph.add("stereo", stereo_residual, ("se3", "point3"), 3,
                   [id2ix[x_id[i]], lmap[l_id[i]]],
                   {"measured": uLuRv[i], "cal": cal}, {"kind": "unit"})
    graph = bgraph.build(dtype=np.float64)
    init = Values({"se3": jnp.asarray(poses0), "point3": jnp.asarray(l_init)})

    t0 = time.perf_counter()
    res = optimizers.optimize_lm(graph, init,
                                 optimizers.Params(max_iterations=args.iters))
    dt = time.perf_counter() - t0
    rms = np.sqrt(2 * res.error / (3 * K))
    print(f"final error {res.error:.2f} in {res.iterations} iterations, "
          f"{dt:.1f}s; rms {rms:.3f}px per stereo coordinate")
    d0 = np.asarray(res.values["se3"])[:, :, 3] - poses0[:, :, 3]
    print(f"pose position corrections: mean {np.linalg.norm(d0, axis=1).mean():.4f} m, "
          f"max {np.linalg.norm(d0, axis=1).max():.4f} m")
    ok = np.isfinite(res.error) and rms < 1.0
    print("STEREO-VO OK" if ok else "STEREO-VO FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
