"""The reference's small tutorial examples, end-to-end with asserts.

Mirrors: OdometryExample.cpp, LocalizationExample.cpp,
PlanarSLAMExample.cpp, SimpleRotation.cpp, CameraResectioning.cpp,
SelfCalibrationExample.cpp — each as a function with the reference's
known outcome asserted.

Run:
  python -c "import jax; jax.config.update('jax_platforms','cpu'); \
             jax.config.update('jax_enable_x64', True); \
             exec(open('examples/tutorials.py').read())"
"""

import numpy as np


def _optimize(b, init_dict, iters=30):
    import jax.numpy as jnp
    from gtsam_personal_tpu.core.values import Values
    from gtsam_personal_tpu.nonlinear import optimizers
    graph = b.build(dtype=np.float64)
    init = Values({k: jnp.asarray(np.asarray(v))
                   for k, v in init_dict.items()})
    return optimizers.optimize_lm(graph, init,
                                  optimizers.Params(max_iterations=iters))


def odometry_example():
    """OdometryExample.cpp: prior at origin + two (2, 0, 0) odometries."""
    from gtsam_personal_tpu.core.graph import GraphBuilder
    from gtsam_personal_tpu.slam import factors as F
    b = GraphBuilder()
    F.add_prior(b, "se2", 0, np.zeros(3), F.diag_noise([0.3, 0.3, 0.1]))
    for i in range(2):
        F.add_between(b, "se2", i, i + 1, np.array([2.0, 0.0, 0.0]),
                      F.diag_noise([0.2, 0.2, 0.1]))
    res = _optimize(b, {"se2": np.full((3, 3), 0.1)})
    got = np.asarray(res.values["se2"])
    np.testing.assert_allclose(got[:, 0], [0, 2, 4], atol=1e-8)
    np.testing.assert_allclose(got[:, 1:], 0, atol=1e-8)
    print(f"odometry: poses x = {np.round(got[:, 0], 6).tolist()}  OK")


def localization_example():
    """LocalizationExample.cpp: odometry + GPS-like unary position factors
    (the reference's custom UnaryFactor)."""
    import jax.numpy as jnp
    from gtsam_personal_tpu.core.graph import GraphBuilder
    from gtsam_personal_tpu.slam import factors as F

    def unary_gps(xs, meas):
        (pose,) = xs
        return pose[:2] - meas["measured"]

    b = GraphBuilder()
    for i in range(2):
        F.add_between(b, "se2", i, i + 1, np.array([2.0, 0.0, 0.0]),
                      F.diag_noise([0.2, 0.2, 0.1]))
    for i, xy in enumerate([(0.0, 0.0), (2.0, 0.0), (4.0, 0.0)]):
        b.add("gps", unary_gps, ("se2",), 2, [i],
              {"measured": np.asarray(xy)},
              {"kind": "diag", "data": np.full(2, 10.0)})
    res = _optimize(b, {"se2": np.array([[0.5, 0.0, 0.2], [2.3, 0.1, -0.2],
                                         [4.1, 0.1, 0.1]])})
    got = np.asarray(res.values["se2"])
    np.testing.assert_allclose(got[:, 0], [0, 2, 4], atol=1e-6)
    print(f"localization: poses x = {np.round(got[:, 0], 6).tolist()}  OK")


def planar_slam_example():
    """PlanarSLAMExample.cpp: 3 poses, 2 landmarks, bearing-range factors;
    landmarks are at (2, 2) and (4, 2)."""
    from gtsam_personal_tpu.core.graph import GraphBuilder
    from gtsam_personal_tpu.slam import factors as F
    truth_l = np.array([[2.0, 2.0], [4.0, 2.0]])
    poses = np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0], [4.0, 0.0, 0.0]])
    b = GraphBuilder()
    F.add_prior(b, "se2", 0, poses[0], F.diag_noise([0.3, 0.3, 0.1]))
    for i in range(2):
        F.add_between(b, "se2", i, i + 1, np.array([2.0, 0.0, 0.0]),
                      F.diag_noise([0.2, 0.2, 0.1]))
    import jax.numpy as jnp
    from gtsam_personal_tpu.geometry import se2
    obs = [(0, 0), (1, 0), (1, 1), (2, 1)]
    for pi, li in obs:
        bear = float(se2.bearing(jnp.asarray(poses[pi]),
                                 jnp.asarray(truth_l[li])))
        rng = float(se2.range_to(jnp.asarray(poses[pi]),
                                 jnp.asarray(truth_l[li])))
        b.add("br", F.bearing_range_2d_residual, ("se2", "point2"), 2,
              [pi, li], {"bearing": np.array(bear), "range": np.array(rng)},
              {"kind": "diag", "data": np.array([10.0, 5.0])})
    res = _optimize(b, {"se2": poses + 0.1,
                        "point2": truth_l + np.array([0.3, -0.2])})
    got_l = np.asarray(res.values["point2"])
    np.testing.assert_allclose(got_l, truth_l, atol=1e-6)
    print(f"planar SLAM: landmarks = {np.round(got_l, 4).tolist()}  OK")


def simple_rotation():
    """SimpleRotation.cpp: a single Rot2 prior at 30 deg, initial 20 deg."""
    from gtsam_personal_tpu.core.graph import GraphBuilder
    b = GraphBuilder()

    def rot_prior(xs, meas):
        import jax.numpy as jnp
        (th,) = xs
        from gtsam_personal_tpu.geometry import so2
        return jnp.atleast_1d(so2.wrap(th[0] - meas["prior"]))

    b.add("rp", rot_prior, ("r1",), 1, [0],
          {"prior": np.deg2rad(30.0)}, {"kind": "diag", "data": np.array([10.0])})
    res = _optimize(b, {"r1": np.array([[np.deg2rad(20.0)]])})
    got = float(np.asarray(res.values["r1"])[0, 0])
    np.testing.assert_allclose(np.rad2deg(got), 30.0, atol=1e-8)
    print(f"simple rotation: {np.rad2deg(got):.4f} deg  OK")


def camera_resectioning():
    """CameraResectioning.cpp: recover the camera pose from 4 known
    world points and their pixels; the answer is the camera at (0,0,2)
    looking straight down at the x-y plane."""
    import jax.numpy as jnp
    from gtsam_personal_tpu.core.graph import GraphBuilder
    from gtsam_personal_tpu.geometry import cameras as cam_geo, se3
    cal = np.array([1.0, 1.0, 0.0, 50.0, 50.0])
    # ground truth: camera at (0,0,2), looking down (z toward -z world)
    R = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
    truth = np.concatenate([R, np.array([[0.0], [0.0], [2.0]])], axis=1)
    pts = np.array([[10, 10, 0], [-10, 10, 0], [-10, -10, 0], [10, -10, 0]],
                   dtype=float)

    def resection(xs, meas):
        (pose,) = xs
        pred = cam_geo.project_point(pose, meas["point"], meas["cal"],
                                     "cal3_s2")
        return pred - meas["measured"]

    b = GraphBuilder()
    for p in pts:
        uv = np.asarray(cam_geo.project_point(jnp.asarray(truth),
                                              jnp.asarray(p),
                                              jnp.asarray(cal)))
        b.add("resection", resection, ("se3",), 2, [0],
              {"point": p, "cal": cal, "measured": uv},
              {"kind": "diag", "data": np.full(2, 2.0)})
    init = np.asarray(se3.retract(jnp.asarray(truth),
                                  jnp.asarray([0.1, -0.1, 0.05, 0.2, 0.1,
                                               -0.1])))
    res = _optimize(b, {"se3": init[None]})
    got = np.asarray(res.values["se3"])[0]
    np.testing.assert_allclose(got, truth, atol=1e-6)
    print("camera resectioning: pose recovered  OK")


def self_calibration():
    """SelfCalibrationExample.cpp: joint estimation of ONE shared Cal3_S2
    with all poses and points (the calibration is its own variable, shared
    by every projection factor)."""
    import jax.numpy as jnp
    from gtsam_personal_tpu.core.graph import GraphBuilder
    from gtsam_personal_tpu.geometry import cameras as cam_geo, se3
    from gtsam_personal_tpu.slam.factors import make_prior_residual
    rng = np.random.default_rng(0)
    true_cal = np.array([320.0, 320.0, 0.0, 320.0, 240.0])
    d = 10.0
    pts = np.array([[d, d, d], [-d, d, d], [-d, -d, d], [d, -d, d],
                    [d, d, -d], [-d, d, -d], [-d, -d, -d], [d, -d, -d]])
    poses = []
    for i in range(6):
        th = 2 * np.pi * i / 8
        # vary heights: an all-coplanar rig makes (fy, cy) near-degenerate
        eye = np.array([30 * np.cos(th), 30 * np.sin(th), 4.0 * (i % 3 - 1)])
        zc = -eye / np.linalg.norm(eye)
        xc = np.cross(zc, [0.0, 0.0, 1.0]); xc /= np.linalg.norm(xc)
        Rm = np.stack([xc, np.cross(zc, xc), zc], axis=1)
        poses.append(np.concatenate([Rm, eye[:, None]], axis=1))
    poses = np.asarray(poses)

    def proj_cal(xs, meas):
        pose, cal, point = xs
        pred = cam_geo.project_point(pose, point, cal, "cal3_s2")
        return pred - meas["measured"]

    b = GraphBuilder()
    b.add("prior_se3", make_prior_residual("se3"), ("se3",), 6, [0],
          {"prior": poses[0]}, {"kind": "diag", "data": np.full(6, 100.0)})
    b.add("prior_pt", make_prior_residual("point3"), ("point3",), 3, [0],
          {"prior": pts[0]}, {"kind": "diag", "data": np.full(3, 100.0)})
    for i in range(len(poses)):
        for j in range(len(pts)):
            uv = np.asarray(cam_geo.project_point(
                jnp.asarray(poses[i]), jnp.asarray(pts[j]),
                jnp.asarray(true_cal)))
            b.add("projc", proj_cal, ("se3", "cal5", "point3"), 2,
                  [i, 0, j], {"measured": uv},
                  {"kind": "unit"})
    from gtsam_personal_tpu.core import manifolds
    manifolds.vector_space("cal5", 5)
    res = _optimize(b, {"se3": poses, "point3": pts,
                        "cal5": (true_cal * np.array([1.1, 1.1, 1, 1.02,
                                                      0.98]))[None]},
                    iters=60)
    got_cal = np.asarray(res.values["cal5"])[0]
    np.testing.assert_allclose(got_cal, true_cal, atol=1e-3)
    print(f"self-calibration: K = {np.round(got_cal, 3).tolist()}  OK")


def main():
    odometry_example()
    localization_example()
    planar_slam_example()
    simple_rotation()
    camera_resectioning()
    self_calibration()
    print("TUTORIALS OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
