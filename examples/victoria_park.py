"""Victoria Park: the classic landmark-SLAM benchmark, batch-optimized.

Mirrors the reference's load2D handling of the shipped victoria_park.txt
(gtsam/slam/dataset.cpp:301,465): ODOMETRY lines are Pose2 between factors
with per-edge covariance; LANDMARK lines are local (x, y) sightings
converted to bearing-range with the reference's covariance heuristic
(dataset.cpp: bearing_std = sqrt(v1/10), range_std = sqrt(v1)). The file's
single id space interleaves poses and the 151 landmark ids (exactly the
ids never touched by odometry).

Run (CPU):
  python -c "import jax; jax.config.update('jax_platforms','cpu'); \
             jax.config.update('jax_enable_x64', True); \
             exec(open('examples/victoria_park.py').read())"
"""

import argparse
import time

import numpy as np


def load_victoria(path, n_limit=None):
    odo, lmk = [], []
    with open(path) as f:
        for line in f:
            t = line.split()
            if not t:
                continue
            if t[0] == "ODOMETRY":
                odo.append((int(t[1]), int(t[2]),
                            np.array([float(t[3]), float(t[4]), float(t[5])]),
                            np.array([float(v) for v in t[6:12]])))
            elif t[0] == "LANDMARK":
                lmk.append((int(t[1]), int(t[2]),
                            np.array([float(t[3]), float(t[4])]),
                            np.array([float(v) for v in t[5:8]])))
    if n_limit:
        odo = odo[:n_limit]
        last = max(max(a, b) for a, b, _, _ in odo)
        lmk = [x for x in lmk if x[0] <= last]
    return odo, lmk


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=None,
                    help="truncate to the first N odometry edges")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--robust", action="store_true",
                    help="Huber on the landmark sightings (the full dataset "
                         "has data-association outliers)")
    args = ap.parse_args()

    import jax.numpy as jnp
    from gtsam_personal_tpu.geometry import se2
    from gtsam_personal_tpu.core.graph import GraphBuilder
    from gtsam_personal_tpu.core.values import Values
    from gtsam_personal_tpu.nonlinear import optimizers
    from gtsam_personal_tpu.slam.factors import (make_between_residual,
                                                 make_prior_residual,
                                                 bearing_range_2d_residual)
    from gtsam_personal_tpu.slam.dataset import find_example_data

    odo, lmk = load_victoria(find_example_data("victoria_park.txt"), args.n)
    pose_ids = sorted({i for e in odo for i in e[:2]})
    pix = {p: i for i, p in enumerate(pose_ids)}
    lmk = [x for x in lmk if x[0] in pix]
    lm_ids = sorted({j for _, j, _, _ in lmk})
    lix = {l: i for i, l in enumerate(lm_ids)}
    print(f"victoria park: {len(pose_ids)} poses, {len(odo)} odometry, "
          f"{len(lmk)} sightings of {len(lm_ids)} landmarks")

    # dead-reckoning initialization along the odometry chain
    init_pose = np.zeros((len(pose_ids), 3))
    cur = {pose_ids[0]: np.zeros(3)}
    for a, b_, d, _ in odo:
        cur[b_] = np.asarray(se2.compose(jnp.asarray(cur[a]),
                                         jnp.asarray(d)))
    for p, i in pix.items():
        init_pose[i] = cur.get(p, np.zeros(3))

    b = GraphBuilder()
    b.add("prior_se2", make_prior_residual("se2"), ("se2",), 3, [0],
          {"prior": np.zeros(3)}, {"kind": "diag", "data": np.full(3, 1e3)})
    for a, b_, d, cov6 in odo:
        # cov upper-tri (xx, xy, xt, yy, yt, tt) -> diagonal sigmas (the
        # shipped file's off-diagonals are zero)
        sig = np.sqrt(np.maximum([cov6[0], cov6[3], cov6[5]], 1e-12))
        b.add("odo", make_between_residual("se2"), ("se2", "se2"), 3,
              [pix[a], pix[b_]], {"measured": d},
              {"kind": "diag", "data": 1.0 / sig})
    init_lm = np.zeros((len(lm_ids), 2))
    seen = set()
    for p, j, xy, cov3 in lmk:
        bear = np.arctan2(xy[1], xy[0])
        rng = np.linalg.norm(xy)
        v1 = cov3[0]
        bstd, rstd = np.sqrt(v1 / 10.0), np.sqrt(v1)
        noise = {"kind": "diag",
                 "data": np.array([1.0 / bstd, 1.0 / rstd])}
        if args.robust:
            noise["robust"] = "huber"
            noise["k"] = np.array(1.345)
        b.add("br", bearing_range_2d_residual, ("se2", "point2"), 2,
              [pix[p], lix[j]],
              {"bearing": np.array(bear), "range": np.array(rng)}, noise)
        if j not in seen:
            seen.add(j)
            pw = np.asarray(se2.transform_from(jnp.asarray(init_pose[pix[p]]),
                                               jnp.asarray(xy)))
            init_lm[lix[j]] = pw
    graph = b.build(dtype=np.float64)
    init = Values({"se2": jnp.asarray(init_pose),
                   "point2": jnp.asarray(init_lm)})

    t0 = time.perf_counter()
    # ~21k tangent dims at full scale: the dense solver would form a
    # 3.5 GB Hessian — use the partitioned-Schur solver (the
    # city10000-scale path: exact, bounded memory)
    from gtsam_personal_tpu.linear.schur import make_plan
    plan = make_plan(graph, {"se2": len(pose_ids),
                             "point2": len(lm_ids)}, max_part_size=256)
    res = optimizers.optimize_lm(graph, init,
                                 optimizers.Params(max_iterations=args.iters,
                                                   solver="schur"),
                                 plan=plan)
    dt = time.perf_counter() - t0
    n_meas = 3 * (len(odo) + 1) + 2 * len(lmk)
    print(f"final error {res.error:.2f} in {res.iterations} iterations, "
          f"{dt:.1f}s; {res.error / n_meas:.4f} per measurement dim")
    ok = np.isfinite(res.error) and res.error / n_meas < 5.0
    print("VICTORIA-PARK OK" if ok else "VICTORIA-PARK FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
