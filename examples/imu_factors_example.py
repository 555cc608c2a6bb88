"""IMU preintegration + GPS fusion.

Mirrors the reference's examples/ImuFactorsExample.cpp /
IMUKittiExampleGPS.cpp shape: integrate IMU segments between keyframes with
the scan-based preintegrator, fuse with position (GPS) factors, solve the
smoothing problem.
"""

import numpy as np
import jax.numpy as jnp

from gtsam_personal_tpu.core.graph import GraphBuilder
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.navigation import navstate, preintegration as pre
from gtsam_personal_tpu.navigation import factors as nav
from gtsam_personal_tpu.navigation.scenario import ConstantTwistScenario
from gtsam_personal_tpu.nonlinear import optimizers
from gtsam_personal_tpu.slam import factors as F


def main():
    params = pre.PreintegrationParams.make_shared_u(
        g=9.81, accel_sigma=0.02, gyro_sigma=0.002)
    scen = ConstantTwistScenario(np.array([0.0, 0.0, 0.2]),
                                 np.array([1.5, 0.0, 0.0]))
    n_seg, seg_t, dt = 8, 0.5, 0.005
    rng = np.random.default_rng(0)

    b = GraphBuilder()
    states = [scen.nav_state(seg_t * k) for k in range(n_seg + 1)]
    F.add_prior(b, "se3", 0, np.asarray(navstate.pose_of(states[0])),
                F.diag_noise([1e-3] * 6))
    b.add("vel_prior", lambda xs, m: xs[0] - m["prior"], ("vel3",), 3, [0],
          {"prior": np.asarray(navstate.velocity(states[0]))},
          F.diag_noise([1e-3] * 3))
    b.add("bias_prior", lambda xs, m: xs[0] - m["prior"], ("imu_bias",), 6, [0],
          {"prior": np.zeros(6)}, F.diag_noise([1e-2] * 6))

    for k in range(n_seg):
        t0 = seg_t * k
        nmeas = int(round(seg_t / dt))
        accs, gyros = [], []
        w, v = scen.omega_b, scen.v_b
        for s in range(nmeas):
            R = np.asarray(scen.pose(t0 + s * dt))[:, :3]
            accs.append(np.cross(w, v) - R.T @ np.asarray(params.gravity)
                        + rng.normal(scale=0.02, size=3))
            gyros.append(w + rng.normal(scale=0.002, size=3))
        pim = pre.integrate(params, jnp.zeros(6), jnp.asarray(np.asarray(accs)),
                            jnp.asarray(np.asarray(gyros)),
                            jnp.full(nmeas, dt))
        nav.add_imu_factor(b, k, k + 1, 0, pim, params)
        # GPS fix every other keyframe
        if (k + 1) % 2 == 0:
            pos = np.asarray(navstate.position(states[k + 1]))
            nav.add_gps_factor(b, k + 1, pos + rng.normal(scale=0.05, size=3),
                               F.diag_noise([0.05] * 3))
    graph = b.build()

    poses = np.stack([np.asarray(navstate.pose_of(s)) for s in states])
    vels = np.stack([np.asarray(navstate.velocity(s)) for s in states])
    poses_init = poses.copy()
    poses_init[1:, :, 3] += rng.normal(scale=0.3, size=(n_seg, 3))
    initial = Values({"se3": jnp.asarray(poses_init),
                      "vel3": jnp.asarray(vels + rng.normal(scale=0.2, size=vels.shape)),
                      "imu_bias": jnp.zeros((1, 6))})

    print("initial error:", float(optimizers.graph_error(graph, initial)))
    res = optimizers.optimize_lm(graph, initial)
    print(f"final error: {res.error:.4f} ({res.iterations} iters)")
    err = np.linalg.norm(np.asarray(res.values["se3"])[:, :, 3] - poses[:, :, 3],
                         axis=1)
    print("position error per keyframe:", np.round(err, 4))
    print("estimated bias:", np.asarray(res.values["imu_bias"][0]))


if __name__ == "__main__":
    main()
