"""Smart (structureless) projection factors streamed into ISAM2.

Mirrors the reference's examples/ISAM2Example_SmartFactor.cpp: camera poses
stream in with odometry; landmarks are never variables — each track's
smart factor eliminates its landmark internally (differentiable DLT+GN
triangulation embedded in the residual, sfm/smart.py). The reference
mutates existing smart factors via ISAM2's factor-replacement; this engine
has no removal, so a track's factor is added ONCE when its observation
window completes — the streaming pattern natural to append-only ISAM2.

Run (CPU):
  python -c "import jax; jax.config.update('jax_platforms','cpu'); \
             jax.config.update('jax_enable_x64', True); \
             exec(open('examples/isam2_smart_factor.py').read())"
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=12)
    ap.add_argument("--landmarks", type=int, default=30)
    ap.add_argument("--track-len", type=int, default=4)
    ap.add_argument("--noise", type=float, default=0.002,
                    help="unit-plane measurement sigma (~1px at f=500)")
    args = ap.parse_args()

    import jax.numpy as jnp
    from gtsam_personal_tpu.geometry import se3
    from gtsam_personal_tpu.nonlinear.isam2 import ISAM2, ISAM2Params
    from gtsam_personal_tpu.nonlinear import optimizers
    from gtsam_personal_tpu.core.graph import GraphBuilder
    from gtsam_personal_tpu.core.values import Values
    from gtsam_personal_tpu.sfm.smart import make_smart_residual
    from gtsam_personal_tpu.slam.factors import (make_between_residual,
                                                 make_prior_residual)
    from gtsam_personal_tpu.linear import noise as nm

    rng = np.random.default_rng(0)
    T = args.track_len

    # circle rig + landmarks in the interior
    poses = []
    for i in range(args.poses):
        th = 2 * np.pi * i / args.poses
        eye = np.array([30 * np.cos(th), 30 * np.sin(th),
                        2.0 * np.sin(2 * th)])
        zc = -eye / np.linalg.norm(eye)
        xc = np.cross(zc, [0.0, 0.0, 1.0]); xc /= np.linalg.norm(xc)
        R = np.stack([xc, np.cross(zc, xc), zc], axis=1)
        poses.append(np.concatenate([R, eye[:, None]], axis=1))
    poses = np.asarray(poses)
    pts = rng.uniform(-8, 8, size=(args.landmarks, 3))

    def unit_project(pose, pt):
        pc = np.asarray(se3.transform_to(jnp.asarray(pose), jnp.asarray(pt)))
        return pc[:2] / pc[2]

    # each landmark is observed by a window of T consecutive poses
    tracks = []                              # (first_pose, [uv_0..uv_T-1])
    for j in range(args.landmarks):
        i0 = int(rng.integers(0, args.poses - T + 1))
        uvs = [unit_project(poses[i0 + t], pts[j])
               + rng.normal(scale=args.noise, size=2) for t in range(T)]
        tracks.append((i0, np.asarray(uvs)))

    # noisy odometry chain
    odo = [np.asarray(se3.local(jnp.asarray(poses[i]),
                                jnp.asarray(poses[i + 1])))
           + rng.normal(scale=0.005, size=6)
           for i in range(args.poses - 1)]

    smart_noise = nm.isotropic(2 * T, args.noise, dtype=jnp.float64)
    odo_noise = nm.isotropic(6, 0.005, dtype=jnp.float64)
    prior_noise = nm.sigmas(np.r_[np.full(3, 0.01), np.full(3, 0.03)])
    smart_res = make_smart_residual(T)
    delta0 = np.array([0.02, -0.01, 0.03, 0.1, -0.1, 0.05])

    isam = ISAM2(ISAM2Params())
    t0 = time.perf_counter()
    est_pose = np.asarray(se3.retract(jnp.asarray(poses[0]),
                                      jnp.asarray(delta0)))
    n_smart = 0
    for i in range(args.poses):
        pi = isam.add_variable("se3", est_pose)
        if i == 0:
            isam.add_factor("prior_se3", make_prior_residual("se3"),
                            ("se3",), 6, [0], {"prior": poses[0]},
                            prior_noise)
        else:
            isam.add_factor("odo", make_between_residual("se3"),
                            ("se3", "se3"), 6, [i - 1, i],
                            {"measured": np.asarray(se3.expmap(
                                jnp.asarray(odo[i - 1])))}, odo_noise)
        # tracks whose window just completed at pose i
        for i0, uvs in tracks:
            if i0 + T - 1 == i:
                isam.add_factor(f"smart_T{T}", smart_res, ("se3",) * T,
                                2 * T, list(range(i0, i0 + T)),
                                {"uv": uvs}, smart_noise)
                n_smart += 1
        if i > 0:
            isam.update()
            isam.update()        # extra GN refinement pass (visual_isam2)
            est = isam.calculate_estimate()
            # dead-reckon the next pose from the current estimate
            if i + 1 < args.poses:
                est_pose = np.asarray(se3.compose(
                    jnp.asarray(np.asarray(est["se3"][i])),
                    se3.expmap(jnp.asarray(odo[i]))))
    dt = time.perf_counter() - t0

    est = isam.calculate_estimate()
    pos_err = np.linalg.norm(np.asarray(est["se3"])[:, :, 3]
                             - poses[:, :, 3], axis=1)
    print(f"{args.poses} poses, {n_smart} smart factors (T={T}): "
          f"mean position error {pos_err.mean():.4f} m, "
          f"{args.poses / dt:.1f} poses/s")

    # batch cross-check on the identical smart graph
    b = GraphBuilder()
    b.add("prior_se3", make_prior_residual("se3"), ("se3",), 6, [0],
          {"prior": poses[0]},
          {"kind": "diag", "data": 1.0 / np.r_[np.full(3, 0.01),
                                               np.full(3, 0.03)]})
    for i in range(args.poses - 1):
        b.add("odo", make_between_residual("se3"), ("se3", "se3"), 6,
              [i, i + 1],
              {"measured": np.asarray(se3.expmap(jnp.asarray(odo[i])))},
              {"kind": "diag", "data": np.full(6, 1.0 / 0.005)})
    for i0, uvs in tracks:
        b.add(f"smart_T{T}", smart_res, ("se3",) * T, 2 * T,
              list(range(i0, i0 + T)), {"uv": uvs},
              {"kind": "diag", "data": np.full(2 * T, 1.0 / args.noise)})
    graph = b.build(dtype=np.float64)
    init = Values({"se3": jnp.asarray([np.asarray(se3.retract(
        jnp.asarray(p), jnp.asarray(delta0))) for p in poses])})
    res = optimizers.optimize_lm(graph, init,
                                 optimizers.Params(max_iterations=30))
    print(f"batch LM error {res.error:.6f} vs incremental {isam.error():.6f}")
    dpos = np.linalg.norm(np.asarray(est["se3"])[:, :, 3]
                          - np.asarray(res.values["se3"])[:, :, 3], axis=1)
    print(f"incremental vs batch: max pose diff {dpos.max():.4f} m")
    # binding criterion: energy parity + agreement with the batch OPTIMUM
    # (ground-truth deviation is measurement-noise/gauge-limited)
    ok = (isam.error() < res.error * 1.10 + 1e-9 and dpos.max() < 0.25
          and pos_err.mean() < 2.0)
    print("ISAM2-SMART OK" if ok else "ISAM2-SMART FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
