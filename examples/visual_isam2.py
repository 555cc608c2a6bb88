"""Incremental visual SLAM (structure from motion) with the ISAM2 engine.

Mirrors the reference's examples/VisualISAM2Example.cpp: a rig of poses on a
circle observing the 8 corners of a cube through GenericProjectionFactor
<Pose3, Point3, Cal3_S2> measurements; each new pose streams its projection
factors into ISAM2 and the whole map is re-estimated at bounded cost. The
first pose gets a prior; the first landmark gets a scale-fixing prior
(reference lines 83-131). Larger problems via --poses/--points.

Run (CPU):
  python -c "import jax; jax.config.update('jax_platforms','cpu'); \
             exec(open('examples/visual_isam2.py').read())"
"""

import argparse
import time

import numpy as np


def make_scene(n_poses=8, n_points=8, radius=30.0, height=0.0, seed=0):
    """Cube corners + circle of cameras looking at the origin (the
    reference's SFMdata.h createPoints/createPoses)."""
    rng = np.random.default_rng(seed)
    if n_points == 8:
        d = 10.0
        pts = np.array([[d, d, d], [-d, d, d], [-d, -d, d], [d, -d, d],
                        [d, d, -d], [-d, d, -d], [-d, -d, -d], [d, -d, -d]])
    else:
        pts = rng.uniform(-10, 10, size=(n_points, 3))
    poses = []
    for i in range(n_poses):
        th = 2 * np.pi * i / n_poses
        eye = np.array([radius * np.cos(th), radius * np.sin(th), height])
        zc = -eye / np.linalg.norm(eye)            # forward: at the origin
        up = np.array([0.0, 0.0, 1.0])
        xc = np.cross(zc, up)
        xc = xc / np.linalg.norm(xc)
        yc = np.cross(zc, xc)
        R = np.stack([xc, yc, zc], axis=1)         # wRc columns
        poses.append(np.concatenate([R, eye[:, None]], axis=1))
    return np.asarray(poses), pts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=8)
    ap.add_argument("--points", type=int, default=8)
    ap.add_argument("--pixel-sigma", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--prealloc", type=int, default=0,
                    help="pre-size engine capacities (avoids capacity-"
                         "doubling recompiles; use on TPU)")
    args = ap.parse_args()

    import jax.numpy as jnp
    from gtsam_personal_tpu.geometry import cameras as cam_geo
    from gtsam_personal_tpu.nonlinear.isam2 import ISAM2, ISAM2Params
    from gtsam_personal_tpu.slam.factors import (projection_residual,
                                                 make_prior_residual)
    from gtsam_personal_tpu.linear import noise as nm

    rng = np.random.default_rng(args.seed)
    poses, points = make_scene(args.poses, args.points, seed=args.seed)
    cal = np.array([50.0, 50.0, 0.0, 50.0, 50.0])   # Cal3_S2(50,50,0,50,50)

    # ground-truth measurements + pixel noise
    def project(pose, pt):
        return np.asarray(cam_geo.project_point(
            jnp.asarray(pose), jnp.asarray(pt), jnp.asarray(cal)))

    meas = {}                                       # (i, j) -> uv
    for i in range(args.poses):
        for j in range(args.points):
            uv = project(poses[i], points[j])
            meas[(i, j)] = uv + rng.normal(scale=args.pixel_sigma, size=2)

    params = (ISAM2Params(min_var_cap=args.prealloc,
                          min_fac_cap=4 * args.prealloc)
              if args.prealloc else ISAM2Params())
    isam = ISAM2(params)
    px_noise = nm.isotropic(2, args.pixel_sigma, dtype=jnp.float64)
    # (rot 0.3 rad, trans 0.1 m) — matches the reference example's CODE
    # (VisualISAM2Example.cpp noise constructor), whose own comment has the
    # two swapped
    pose_prior = nm.sigmas(np.r_[np.full(3, 0.3), np.full(3, 0.1)])
    point_prior = nm.isotropic(3, 0.1, dtype=jnp.float64)

    delta_pose = np.array([-0.1, 0.2, 0.25, 0.05, -0.10, 0.20])  # (w, v)
    delta_point = np.array([-0.25, 0.20, 0.15])

    t0 = time.perf_counter()
    for i in range(args.poses):
        from gtsam_personal_tpu.geometry import se3
        noisy_pose = np.asarray(se3.retract(jnp.asarray(poses[i]),
                                            jnp.asarray(delta_pose)))
        pi = isam.add_variable("se3", noisy_pose)
        if i == 0:
            isam.add_factor("prior_se3", make_prior_residual("se3"),
                            ("se3",), 6, [pi], {"prior": poses[0]},
                            pose_prior)
            for j in range(args.points):
                isam.add_variable("point3", points[j] + delta_point)
            isam.add_factor("prior_point3", make_prior_residual("point3"),
                            ("point3",), 3, [0], {"prior": points[0]},
                            point_prior)
        for j in range(args.points):
            isam.add_factor("proj", projection_residual, ("se3", "point3"),
                            2, [pi, j], {"measured": meas[(i, j)],
                                         "cal": cal}, px_noise)
        if i == 0:
            continue           # need >= 2 views before the map is solvable
        # the reference example calls update() again after each step to
        # perform extra GN refinement (VisualISAM2Example.cpp:140); three
        # bounded-cost updates keep the strongly nonlinear circle-rig
        # problem tracking the batch optimum
        for _ in range(3):
            res = isam.update()
        est = isam.calculate_estimate()
        pe = np.linalg.norm(np.asarray(est["se3"][pi])[:, 3] - poses[i][:, 3])
        print(f"step {i}: err {isam.error():10.4f}  "
              f"newest-pose position error {pe:.4f} m")
    dt = time.perf_counter() - t0

    est = isam.calculate_estimate()
    pos_err = np.linalg.norm(
        np.asarray(est["se3"])[:, :, 3] - poses[:, :, 3], axis=1)
    pt_err = np.linalg.norm(np.asarray(est["point3"]) - points, axis=1)
    print(f"final: mean pose position error {pos_err.mean():.4f} m, "
          f"mean landmark error {pt_err.mean():.4f} m, "
          f"{args.poses / dt:.1f} poses/s")

    # cross-check vs batch LM on the same graph
    from gtsam_personal_tpu.core.graph import GraphBuilder
    from gtsam_personal_tpu.core.values import Values
    from gtsam_personal_tpu.nonlinear import optimizers
    b = GraphBuilder()
    pose_prior_d = {"kind": "diag",
                    "data": 1.0 / np.r_[np.full(3, 0.3), np.full(3, 0.1)]}
    point_prior_d = {"kind": "diag", "data": np.full(3, 1.0 / 0.1)}
    px_noise_d = {"kind": "diag", "data": np.full(2, 1.0 / args.pixel_sigma)}
    b.add("prior_se3", make_prior_residual("se3"), ("se3",), 6, [0],
          {"prior": poses[0]}, pose_prior_d)
    b.add("prior_point3", make_prior_residual("point3"), ("point3",), 3,
          [0], {"prior": points[0]}, point_prior_d)
    ij = sorted(meas.keys())
    for i, jx in ij:
        b.add("proj", projection_residual, ("se3", "point3"), 2,
              [i, jx], {"measured": meas[(i, jx)], "cal": cal}, px_noise_d)
    graph = b.build(dtype=np.float64)
    init = Values({
        "se3": jnp.asarray(np.asarray(
            [np.asarray(se3.retract(jnp.asarray(p), jnp.asarray(delta_pose)))
             for p in poses])),
        "point3": jnp.asarray(points + delta_point)})
    result = optimizers.optimize_lm(graph, init,
                                    optimizers.Params(max_iterations=30))
    print(f"batch LM error {result.error:.6f} vs incremental "
          f"{isam.error():.6f}")
    # success = incremental tracks the batch OPTIMUM (deviation from ground
    # truth is dominated by the 1px measurement noise itself: at f=50px and
    # 30m radius, 1px ~ 0.6m — both solvers land ~1m from truth, together)
    dpos = np.linalg.norm(np.asarray(est["se3"])[:, :, 3]
                          - np.asarray(result.values["se3"])[:, :, 3], axis=1)
    dpt = np.linalg.norm(np.asarray(est["point3"])
                         - np.asarray(result.values["point3"]), axis=1)
    print(f"incremental vs batch: max pose diff {dpos.max():.4f} m, "
          f"max landmark diff {dpt.max():.4f} m")
    # the binding criterion is ENERGY parity: with only a pose0+point0
    # prior the cost surface is near-flat along residual gauge directions,
    # so two solutions at the same energy can sit ~1 m apart in parameters
    # (the gap grows with rig size); the param diff above is advisory
    ok = (isam.error() < result.error * 1.05 + 1e-6
          and pos_err.mean() < 3.0)
    print("VISUAL-ISAM2 OK" if ok else "VISUAL-ISAM2 FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
