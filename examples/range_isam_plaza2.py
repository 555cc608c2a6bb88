"""Range-only SLAM on the recorded Plaza2 dataset, incrementally with ISAM2.

Mirrors the reference's examples/RangeISAMExample_plaza2.cpp: 4090 odometry
steps (Plaza2_DR.txt: time, delta-distance, delta-heading) + 1816 UWB range
measurements to 4 fixed beacons (Plaza2_TD.txt: time, sender, beacon id,
range), Tukey(15)-robust isotropic range noise, batch-LM initialization
after the first `minK` ranges, then one ISAM2 update per `incK` new ranges.

Run (CPU):
  python -c "import jax; jax.config.update('jax_platforms','cpu'); \
             jax.config.update('jax_enable_x64', True); \
             exec(open('examples/range_isam_plaza2.py').read())"
"""

import argparse
import time

import numpy as np


def load_plaza2():
    from gtsam_personal_tpu.slam.dataset import find_example_data
    dr = np.loadtxt(find_example_data("Plaza2_DR.txt"))
    td = np.loadtxt(find_example_data("Plaza2_TD.txt"))
    # DR rows: t, delta_distance, delta_heading -> Pose2(dist, 0, dheading)
    # TD rows: t, sender(const 2), beacon id, range
    return dr, td


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=None,
                    help="truncate the odometry stream (default: all 4090)")
    ap.add_argument("--minK", type=int, default=150)
    ap.add_argument("--incK", type=int, default=25)
    ap.add_argument("--no-robust", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp
    from gtsam_personal_tpu.geometry import se2
    from gtsam_personal_tpu.core.graph import GraphBuilder
    from gtsam_personal_tpu.core.values import Values
    from gtsam_personal_tpu.nonlinear import optimizers
    from gtsam_personal_tpu.nonlinear.isam2 import ISAM2, ISAM2Params
    from gtsam_personal_tpu.slam.factors import (make_between_residual,
                                                 make_prior_residual,
                                                 range_2d_residual)
    from gtsam_personal_tpu.linear import noise as nm

    dr, td = load_plaza2()
    if args.steps:
        dr = dr[:args.steps]
    print(f"read {len(dr)} odometry entries, {len(td)} range triples")

    prior_sig = np.array([1.0, 1.0, np.pi])
    odo_sig = np.array([0.05, 0.01, 0.1])
    sigma_r = 100.0
    pose0 = np.array([-34.2086489999201, 45.3007639991120, np.pi - 2.021089])

    range_noise = nm.isotropic(1, sigma_r, dtype=jnp.float64)
    if not args.no_robust:
        range_noise = range_noise.with_robust("tukey", 15.0)

    rng = np.random.default_rng(42)
    landmarks = {}                  # beacon id -> point2 variable index
    poses = [pose0]
    # host-side staging until batch init (reference: initial LM at minK)
    stage_odo = []                  # (i-1, i, odometry)
    stage_rng = []                  # (pose i, beacon id, range)

    k = 0
    K = len(td)
    isam = None
    count_k = 0
    t_start = time.perf_counter()
    n_updates = 0
    for i in range(1, len(dr) + 1):
        t, dist, dhead = dr[i - 1][0], dr[i - 1][1], dr[i - 1][2]
        odom = np.array([dist, 0.0, dhead])
        pred = np.asarray(se2.compose(jnp.asarray(poses[-1]),
                                      jnp.asarray(odom)))
        poses.append(pred)
        if isam is None:
            stage_odo.append((i - 1, i, odom))
        else:
            pi = isam.add_variable("se2", pred)
            isam.add_factor("odo", make_between_residual("se2"),
                            ("se2", "se2"), 3, [pi - 0 - 1, pi],
                            {"measured": odom}, nm.sigmas(odo_sig))
        while k < K and t >= td[k][0]:
            j, rng_m = int(td[k][2]), float(td[k][3])
            if j not in landmarks:
                landmarks[j] = len(landmarks)
                print(f"  beacon {j} first seen at t={t:.1f}")
                if isam is not None:
                    isam.add_variable("point2",
                                      rng.normal(scale=100.0, size=2))
            if isam is None:
                stage_rng.append((i, j, rng_m))
            else:
                isam.add_factor("range", range_2d_residual,
                                ("se2", "point2"), 1, [i, landmarks[j]],
                                {"range": np.array([rng_m])}, range_noise)
            k += 1
            count_k += 1

        if k > args.minK and count_k > args.incK and isam is None:
            # batch initialization (reference: LevenbergMarquardtOptimizer)
            b = GraphBuilder()
            b.add("prior_se2", make_prior_residual("se2"), ("se2",), 3, [0],
                  {"prior": pose0}, {"kind": "diag", "data": 1.0 / prior_sig})
            for a, c, o in stage_odo:
                b.add("odo", make_between_residual("se2"), ("se2", "se2"), 3,
                      [a, c], {"measured": o},
                      {"kind": "diag", "data": 1.0 / odo_sig})
            for pi_, j, r_ in stage_rng:
                b.add("range", range_2d_residual, ("se2", "point2"), 1,
                      [pi_, landmarks[j]], {"range": np.array([r_])},
                      {"kind": "diag", "data": np.array([1.0 / sigma_r]),
                       "robust": "none" if args.no_robust else "tukey",
                       "k": np.array(15.0)})
            # loose prior fixing the landmark gauge (reference looseNoise)
            for j, lj in landmarks.items():
                b.add("lprior", make_prior_residual("point2"), ("point2",),
                      2, [lj], {"prior": np.zeros(2)},
                      {"kind": "diag", "data": np.full(2, 1.0 / 1000.0)})
            graph = b.build(dtype=np.float64)
            init = Values({
                "se2": jnp.asarray(np.asarray(poses)),
                "point2": jnp.asarray(rng.normal(scale=100.0,
                                                 size=(len(landmarks), 2)))})
            res = optimizers.optimize_lm(graph, init,
                                         optimizers.Params(max_iterations=50))
            print(f"batch init at step {i} ({k} ranges): error {res.error:.2f}")
            # seed ISAM2 with the batch solution
            isam = ISAM2(ISAM2Params(min_var_cap=8192, min_fac_cap=8192))
            vals = res.values
            for p in np.asarray(vals["se2"]):
                isam.add_variable("se2", p)
            for ptv in np.asarray(vals["point2"]):
                isam.add_variable("point2", ptv)
            isam.add_factor("prior_se2", make_prior_residual("se2"),
                            ("se2",), 3, [0], {"prior": pose0},
                            nm.sigmas(prior_sig))
            for a, c, o in stage_odo:
                isam.add_factor("odo", make_between_residual("se2"),
                                ("se2", "se2"), 3, [a, c], {"measured": o},
                                nm.sigmas(odo_sig))
            for pi_, j, r_ in stage_rng:
                isam.add_factor("range", range_2d_residual,
                                ("se2", "point2"), 1, [pi_, landmarks[j]],
                                {"range": np.array([r_])}, range_noise)
            isam.update()
            count_k = 0
        elif isam is not None and count_k > args.incK:
            isam.update()
            est = isam.calculate_estimate()
            poses[-1] = np.asarray(est["se2"][i])     # re-anchor prediction
            n_updates += 1
            count_k = 0

    isam.update()
    dt = time.perf_counter() - t_start
    est = isam.calculate_estimate()
    lm_pos = np.asarray(est["point2"])
    print(f"done: {len(dr)} poses, {len(landmarks)} beacons, "
          f"{n_updates + 1} ISAM2 updates, final error {isam.error():.2f}, "
          f"{dt:.1f}s ({len(dr) / dt:.0f} poses/s)")
    for j, lj in sorted(landmarks.items()):
        print(f"  beacon {j}: ({lm_pos[lj][0]:8.2f}, {lm_pos[lj][1]:8.2f})")
    # internal consistency: the final whitened error per measurement should
    # be O(1) if ranges + odometry are being fused sanely
    n_meas = len(dr) * 3 + k
    ok = np.isfinite(isam.error()) and isam.error() / n_meas < 5.0
    print("PLAZA2 OK" if ok else "PLAZA2 FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
