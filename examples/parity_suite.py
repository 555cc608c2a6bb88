"""Long-tail reference-example parity suite: one file, many subcommands.

Each function mirrors a reference example end-to-end and ASSERTS its known
outcome (the library capability behind each was already present and tested;
this closes the demonstration surface):

  gnc              GNCExample.cpp
  lago             Pose2SLAMExample_lago.cpp (noisyToyGraph.txt)
  spcg             Pose2SLAMwSPCG.cpp (LM with the subgraph PCG solver)
  lost             TriangulationLOSTExample.cpp (DLT vs LOST, noisy trials)
  fisheye          FisheyeExample.cpp (Cal3Fisheye SfM, GN)
  combined_imu     CombinedImuFactorsExample.cpp (per-keyframe bias chain)
  kalman_easy      easyPoint2KalmanFilter.cpp (closed-form KF)
  kalman_elaborate elaboratePoint2KalmanFilter.cpp (KF via graph elimination)
  essential_view   EssentialViewGraphExample.cpp (essential transfer factors)
  metis            METISOrderingExample.cpp (fill-reducing ordering)
  pose3_chordal    Pose3SLAMExample_initializePose3Chordal.cpp

Run all:
  python -c "import jax; jax.config.update('jax_platforms','cpu'); \
             jax.config.update('jax_enable_x64', True); \
             exec(open('examples/parity_suite.py').read())"
Run one: append the subcommand name to argv.
"""

import sys

import numpy as np


# ---------------------------------------------------------------------------
# shared scene helpers (reference examples/SFMdata.h)
# ---------------------------------------------------------------------------

def create_points(d=10.0):
    """The 8 cube-corner landmarks of SFMdata::createPoints."""
    return np.array([[d, d, d], [-d, d, d], [-d, -d, d], [d, -d, d],
                     [d, d, -d], [-d, d, -d], [-d, -d, -d], [d, -d, -d]])


def poses_on_circle(n=8, radius=30.0):
    """SFMdata::createPoses/posesOnCircle: cameras on a circle in the z=0
    plane looking at the origin, [3, 4] pose matrices."""
    poses = []
    for i in range(n):
        th = 2 * np.pi * i / n
        eye = np.array([radius * np.cos(th), radius * np.sin(th), 0.0])
        zc = -eye / np.linalg.norm(eye)             # optical axis at origin
        xc = np.cross(zc, [0.0, 0.0, 1.0])
        xc /= np.linalg.norm(xc)
        yc = np.cross(zc, xc)
        R = np.stack([xc, yc, zc], axis=1)
        poses.append(np.concatenate([R, eye[:, None]], axis=1))
    return poses


# ---------------------------------------------------------------------------

def gnc():
    """GNCExample.cpp: 3-pose odometry chain through the GNC-TLS solver —
    with no outliers GNC must keep every weight at 1 and land on the LM
    optimum."""
    import jax.numpy as jnp
    from gtsam_personal_tpu.core.graph import GraphBuilder
    from gtsam_personal_tpu.core.values import Values
    from gtsam_personal_tpu.nonlinear import optimizers
    from gtsam_personal_tpu.nonlinear.gnc import GncParams, optimize_gnc
    from gtsam_personal_tpu.slam import factors as F

    b = GraphBuilder()
    F.add_prior(b, "se2", 0, np.zeros(3), F.diag_noise([0.1] * 3))
    F.add_between(b, "se2", 0, 1, np.array([1.0, 0.0, 0.1]),
                  F.diag_noise([0.2] * 3))
    F.add_between(b, "se2", 1, 2, np.array([0.0, 1.0, 0.1]),
                  F.diag_noise([0.4] * 3))
    graph = b.build(dtype=np.float64)
    init = Values({"se2": jnp.asarray([[0.2, 0.5, -0.1],
                                       [0.8, 0.3, 0.1],
                                       [0.8, 0.2, 0.3]])})
    ref = optimizers.optimize_lm(graph, init)
    bi = [i for i, bb in enumerate(graph.batches)
          if bb.name == "between_se2"][0]
    vals, weights, res = optimize_gnc(graph, init, bi,
                                      GncParams(loss_type="tls"))
    np.testing.assert_allclose(np.asarray(weights), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vals["se2"]),
                               np.asarray(ref.values["se2"]), atol=1e-5)
    print(f"gnc: weights all 1, matches LM optimum "
          f"(err {res.error:.3e})  OK")


def lago():
    """Pose2SLAMExample_lago.cpp: LAGO initialization on noisyToyGraph.txt —
    the LAGO estimate must land in the optimum's basin (LM from it reaches
    the same optimum as LM from the file's initial, in fewer iterations)."""
    import jax.numpy as jnp
    from gtsam_personal_tpu.slam import dataset
    from gtsam_personal_tpu.slam.initialize import lago_init_2d
    from gtsam_personal_tpu.nonlinear import optimizers

    graph, initial = dataset.load_2d(
        dataset.find_example_data("noisyToyGraph.txt"),
        prior_sigmas=(1e-3, 1e-3, 1e-4))
    n = initial["se2"].shape[0]
    est = lago_init_2d(graph, n)
    e_init = float(optimizers.graph_error(graph, initial))
    e_lago = float(optimizers.graph_error(graph, est))
    res_ref = optimizers.optimize_lm(graph, initial)
    res_lago = optimizers.optimize_lm(graph, est)
    assert abs(res_lago.error - res_ref.error) < 1e-6 * max(res_ref.error, 1.0)
    print(f"lago: error at init {e_init:.4f} -> LAGO {e_lago:.4f}; both "
          f"LM runs reach {res_ref.error:.6f}  OK")


def spcg():
    """Pose2SLAMwSPCG.cpp: the 5-pose loop solved by LM whose inner linear
    solver is subgraph-preconditioned CG; must reach the dense optimum."""
    import jax.numpy as jnp
    from gtsam_personal_tpu.core.graph import GraphBuilder
    from gtsam_personal_tpu.core.values import Layout, Values
    from gtsam_personal_tpu.linear import subgraph
    from gtsam_personal_tpu.linear.linearize import linearize
    from gtsam_personal_tpu.nonlinear import optimizers
    from gtsam_personal_tpu.slam import factors as F

    b = GraphBuilder()
    F.add_prior(b, "se2", 0, np.zeros(3), F.diag_noise([0.3, 0.3, 0.1]))
    for i in range(4):
        F.add_between(b, "se2", i, i + 1, np.array([2.0, 0.0, np.pi / 2]),
                      F.diag_noise([0.2, 0.2, 0.1]))
    F.add_between(b, "se2", 4, 0, np.zeros(3), F.diag_noise([0.2, 0.2, 0.1]))
    graph = b.build(dtype=np.float64)
    init = Values({"se2": jnp.asarray([[0.5, 0.0, 0.2], [2.3, 0.1, 1.1],
                                       [2.1, 1.9, 2.8], [-0.3, 2.5, 4.2],
                                       [0.1, -0.7, 5.8]])})
    ref = optimizers.optimize_lm(graph, init)

    values = init
    masks = subgraph.build_spanning_tree_selection(graph.batches, {"se2": 5})
    layout = Layout.of(values)
    err = float(optimizers.graph_error(graph, values))
    for _ in range(15):                      # GN with SPCG inner solves
        lin = linearize(graph, values)
        delta = subgraph.solve_spcg(lin, masks, layout, lam=1e-9,
                                    maxiter=50, tol=1e-12)
        trial = values.retract(delta)
        e = float(optimizers.graph_error(graph, trial))
        if not np.isfinite(e) or e > err:
            break
        values, err = trial, e
    assert err < ref.error + 1e-8, (err, ref.error)
    print(f"spcg: subgraph-PCG LM error {err:.3e} == dense optimum "
          f"{ref.error:.3e}  OK")


def lost():
    """TriangulationLOSTExample.cpp: DLT vs LOST on the 500-camera dataset
    with 1e-2 measurement noise; both must recover the landmark, LOST at
    least as well on average."""
    import jax
    import jax.numpy as jnp
    from gtsam_personal_tpu.geometry import triangulation as tri

    rng = np.random.default_rng(42)
    n_cams = 500
    point = np.array([0.0, 0.0, 10.0])
    centers = np.stack([rng.uniform(-10, 10, n_cams),
                        rng.uniform(-10, 10, n_cams),
                        rng.uniform(-20, 0, n_cams)], axis=1)
    poses = np.zeros((n_cams, 3, 4))
    poses[:, :, :3] = np.eye(3)
    poses[:, :, 3] = centers
    # identity calibration: pixel == unit-plane coordinates
    pc = point[None, :] - centers
    meas = pc[:, :2] / pc[:, 2:3]
    sigma = 1e-2

    poses_j = jnp.asarray(poses)
    errs_dlt, errs_lost = [], []
    for _ in range(25):
        noisy = jnp.asarray(meas + rng.normal(scale=sigma, size=meas.shape))
        p_dlt = np.asarray(tri.triangulate_dlt(poses_j, noisy)[0])
        p_lost = np.asarray(tri.triangulate_lost(poses_j, noisy,
                                                 sigma=sigma)[0])
        errs_dlt.append(np.linalg.norm(p_dlt - point))
        errs_lost.append(np.linalg.norm(p_lost - point))
    m_dlt, m_lost = np.mean(errs_dlt), np.mean(errs_lost)
    assert m_lost < 0.1 and m_dlt < 0.5, (m_lost, m_dlt)
    assert m_lost <= m_dlt * 1.05, (m_lost, m_dlt)
    print(f"lost: mean landmark error DLT {m_dlt:.4f}, LOST {m_lost:.4f} "
          f"(500 cams, sigma {sigma})  OK")


def fisheye():
    """FisheyeExample.cpp: cube + circle rig observed through a Cal3Fisheye
    camera, Gauss-Newton from perturbed initials back to ~zero error."""
    import jax
    import jax.numpy as jnp
    from gtsam_personal_tpu.core.graph import GraphBuilder
    from gtsam_personal_tpu.core.values import Values
    from gtsam_personal_tpu.geometry import se3, cameras as cam_geo
    from gtsam_personal_tpu.nonlinear import optimizers
    from gtsam_personal_tpu.slam import factors as F

    cal = np.array([278.66, 278.48, 0.0, 319.75, 241.96,
                    -0.013721808247486035, 0.020727425669427896,
                    -0.012786476702685545, 0.0025242267320687625])
    points = create_points()
    poses = poses_on_circle(8, 30.0)

    def residual(xs, meas):
        pose, point = xs
        pred = cam_geo.project_point(pose, point, meas["cal"], "cal3fisheye")
        return pred - meas["measured"]

    b = GraphBuilder()
    F.add_prior(b, "se3", 0, poses[0],
                F.diag_noise([0.1] * 3 + [0.3] * 3))
    b.add("point_prior", lambda xs, m: xs[0] - m["prior"], ("point3",), 3,
          [0], {"prior": points[0]}, F.diag_noise([0.1] * 3))
    for i, pose in enumerate(poses):
        for j, pt in enumerate(points):
            uv = np.asarray(cam_geo.project_point(
                jnp.asarray(pose), jnp.asarray(pt), jnp.asarray(cal),
                "cal3fisheye"))
            b.add("proj_fisheye", residual, ("se3", "point3"), 2, [i, j],
                  {"measured": uv, "cal": cal}, F.diag_noise([1.0, 1.0]))
    graph = b.build(dtype=np.float64)

    dpose = jnp.asarray(np.r_[[-0.1, 0.2, 0.25], [0.05, -0.10, 0.20]])
    init_poses = np.stack([np.asarray(se3.retract(jnp.asarray(p), dpose))
                           for p in poses])
    initial = Values({"se3": jnp.asarray(init_poses),
                      "point3": jnp.asarray(points + [-0.25, 0.20, 0.15])})
    e0 = float(optimizers.graph_error(graph, initial))
    res = optimizers.optimize_lm(graph, initial,
                                 optimizers.Params(max_iterations=50))
    assert res.error < 1e-8, res.error
    np.testing.assert_allclose(np.asarray(res.values["point3"]), points,
                               atol=1e-4)
    print(f"fisheye: error {e0:.1f} -> {res.error:.2e}, landmarks "
          f"recovered  OK")


def combined_imu():
    """CombinedImuFactorsExample.cpp: IMU keyframe chain with PER-KEYFRAME
    bias variables joined by the 6-way CombinedImuFactor (bias random
    walk inside the factor), GPS fixes; keyframe positions recovered."""
    import jax.numpy as jnp
    from gtsam_personal_tpu.core.graph import GraphBuilder
    from gtsam_personal_tpu.core.values import Values
    from gtsam_personal_tpu.navigation import navstate, preintegration as pre
    from gtsam_personal_tpu.navigation import factors as nav
    from gtsam_personal_tpu.navigation.scenario import ConstantTwistScenario
    from gtsam_personal_tpu.nonlinear import optimizers
    from gtsam_personal_tpu.slam import factors as F

    params = pre.PreintegrationParams.make_shared_u(
        g=9.81, accel_sigma=0.02, gyro_sigma=0.002)
    scen = ConstantTwistScenario(np.array([0.0, 0.0, 0.2]),
                                 np.array([1.5, 0.0, 0.0]))
    n_seg, seg_t, dt = 6, 0.5, 0.005
    rng = np.random.default_rng(1)

    b = GraphBuilder()
    states = [scen.nav_state(seg_t * k) for k in range(n_seg + 1)]
    F.add_prior(b, "se3", 0, np.asarray(navstate.pose_of(states[0])),
                F.diag_noise([1e-3] * 6))
    b.add("vel_prior", lambda xs, m: xs[0] - m["prior"], ("vel3",), 3, [0],
          {"prior": np.asarray(navstate.velocity(states[0]))},
          F.diag_noise([1e-3] * 3))
    b.add("bias_prior", lambda xs, m: xs[0] - m["prior"], ("imu_bias",), 6,
          [0], {"prior": np.zeros(6)}, F.diag_noise([1e-2] * 6))

    w, v = scen.omega_b, scen.v_b
    for k in range(n_seg):
        t0 = seg_t * k
        nmeas = int(round(seg_t / dt))
        accs, gyros = [], []
        for s in range(nmeas):
            R = np.asarray(scen.pose(t0 + s * dt))[:, :3]
            accs.append(np.cross(w, v) - R.T @ np.asarray(params.gravity)
                        + rng.normal(scale=0.02, size=3))
            gyros.append(w + rng.normal(scale=0.002, size=3))
        pim = pre.integrate(params, jnp.zeros(6),
                            jnp.asarray(np.asarray(accs)),
                            jnp.asarray(np.asarray(gyros)),
                            jnp.full(nmeas, dt))
        nav.add_combined_imu_factor(b, k, k + 1, k, k + 1, pim, params)
        if (k + 1) % 2 == 0:
            pos = np.asarray(navstate.position(states[k + 1]))
            nav.add_gps_factor(b, k + 1,
                               pos + rng.normal(scale=0.05, size=3),
                               F.diag_noise([0.05] * 3))
    graph = b.build(dtype=np.float64)

    poses = np.stack([np.asarray(navstate.pose_of(s)) for s in states])
    vels = np.stack([np.asarray(navstate.velocity(s)) for s in states])
    poses_init = poses.copy()
    poses_init[1:, :, 3] += rng.normal(scale=0.3, size=(n_seg, 3))
    initial = Values({
        "se3": jnp.asarray(poses_init),
        "vel3": jnp.asarray(vels + rng.normal(scale=0.2, size=vels.shape)),
        "imu_bias": jnp.zeros((n_seg + 1, 6))})
    res = optimizers.optimize_lm(graph, initial)
    err = np.linalg.norm(
        np.asarray(res.values["se3"])[:, :, 3] - poses[:, :, 3], axis=1)
    assert err.max() < 0.2, err
    print(f"combined_imu: {n_seg} keyframes, per-keyframe bias chain, max "
          f"position error {err.max():.4f} m  OK")


def _kalman_reference():
    """Closed-form 3-step KF of easyPoint2KalmanFilter (numpy oracle)."""
    x = np.zeros(2)
    P = np.eye(2) * 0.01          # sigmas 0.1
    Fm, Bm = np.eye(2), np.eye(2)
    Q = np.eye(2) * 0.01
    R = np.eye(2) * 0.0625        # sigma 0.25
    H = np.eye(2)
    for step in range(1, 4):
        u = np.array([1.0, 0.0])
        z = np.array([float(step), 0.0])
        x = Fm @ x + Bm @ u
        P = Fm @ P @ Fm.T + Q
        S = H @ P @ H.T + R
        K = P @ H.T @ np.linalg.inv(S)
        x = x + K @ (z - H @ x)
        P = (np.eye(2) - K @ H) @ P
    return x, P


def kalman_easy():
    """easyPoint2KalmanFilter.cpp: Point2 moving right 1 unit/step, 3
    predict/update cycles; final state (3, 0) with the closed-form
    covariance."""
    import jax.numpy as jnp
    from gtsam_personal_tpu.linear.kalman import GaussianState, kf_run

    x_ref, P_ref = _kalman_reference()
    s0 = GaussianState(jnp.zeros(2), jnp.eye(2) * 0.01)
    us = jnp.tile(jnp.asarray([1.0, 0.0]), (3, 1))
    zs = jnp.asarray([[1.0, 0.0], [2.0, 0.0], [3.0, 0.0]])
    final, means = kf_run(s0, jnp.eye(2), jnp.eye(2), jnp.eye(2) * 0.01,
                          jnp.eye(2), jnp.eye(2) * 0.0625, us, zs)
    np.testing.assert_allclose(np.asarray(final.mean), [3.0, 0.0],
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(final.mean), x_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(final.cov), P_ref, atol=1e-10)
    print(f"kalman_easy: final mean {np.round(np.asarray(final.mean), 6)}, "
          f"cov[0,0] {float(final.cov[0, 0]):.6f} == closed form  OK")


def kalman_elaborate():
    """elaboratePoint2KalmanFilter.cpp: the SAME filter realized as factor-
    graph elimination — a 4-state linear chain (prior + 3 between + 3
    measurement priors); the smoothed last state and its marginal
    covariance must equal the filter's."""
    import jax.numpy as jnp
    from gtsam_personal_tpu.core.graph import GraphBuilder
    from gtsam_personal_tpu.core.values import Values
    from gtsam_personal_tpu.nonlinear import optimizers
    from gtsam_personal_tpu.nonlinear.marginals import Marginals
    from gtsam_personal_tpu.slam import factors as F

    x_ref, P_ref = _kalman_reference()
    b = GraphBuilder()
    b.add("prior", lambda xs, m: xs[0] - m["prior"], ("point2",), 2, [0],
          {"prior": np.zeros(2)}, F.diag_noise([0.1, 0.1]))
    for k in range(3):
        b.add("motion",
              lambda xs, m: xs[1] - xs[0] - m["u"], ("point2", "point2"),
              2, [k, k + 1], {"u": np.array([1.0, 0.0])},
              F.diag_noise([0.1, 0.1]))
        b.add("meas", lambda xs, m: xs[0] - m["z"], ("point2",), 2,
              [k + 1], {"z": np.array([float(k + 1), 0.0])},
              F.diag_noise([0.25, 0.25]))
    graph = b.build(dtype=np.float64)
    init = Values({"point2": jnp.zeros((4, 2))})
    res = optimizers.optimize_gn(graph, init,
                                 optimizers.Params(max_iterations=2))
    np.testing.assert_allclose(np.asarray(res.values["point2"])[-1], x_ref,
                               atol=1e-10)
    P = Marginals(graph, res.values).marginal_covariance("point2", 3)
    np.testing.assert_allclose(np.asarray(P), P_ref, atol=1e-10)
    print(f"kalman_elaborate: graph-elimination posterior == KF "
          f"(mean {np.round(np.asarray(res.values['point2'])[-1], 6)})  OK")


def essential_view():
    """EssentialViewGraphExample.cpp: 4 circle poses / 8 cube points; the 8
    edge essential matrices estimated from EssentialTransferFactors
    (calibrated transfer across view triplets), starting from perturbed
    truth."""
    import jax.numpy as jnp
    from gtsam_personal_tpu.core.graph import GraphBuilder
    from gtsam_personal_tpu.core.values import Values
    from gtsam_personal_tpu.geometry import se3, extra, cameras as cam_geo
    from gtsam_personal_tpu.nonlinear import optimizers
    from gtsam_personal_tpu.slam.factors import essential_transfer_residual

    cal = np.array([50.0, 50.0, 0.0, 50.0, 50.0])
    K = np.array([[50.0, 0.0, 50.0], [0.0, 50.0, 50.0], [0.0, 0.0, 1.0]])
    points = create_points()
    poses = poses_on_circle(4, 30.0)
    pix = np.asarray([[np.asarray(cam_geo.project_point(
        jnp.asarray(p), jnp.asarray(pt), jnp.asarray(cal)))
        for pt in points] for p in poses])          # [4, 8, 2]

    def E_between(a, b):
        aTb = np.asarray(se3.between(jnp.asarray(poses[a]),
                                     jnp.asarray(poses[b])))
        R, t = aTb[:, :3], aTb[:, 3]
        return np.concatenate([R, (t / np.linalg.norm(t))[:, None]], axis=1)

    edges = [(a, (a + 1) % 4) for a in range(4)] + \
            [(a, (a + 2) % 4) for a in range(4)]
    eix = {e: i for i, e in enumerate(edges)}

    def edge_var(a, b):
        """(edge index, transpose flag): variable stores E_{ab}; transfer
        needs E with a consistent direction per triplet role."""
        if (a, b) in eix:
            return eix[(a, b)], False
        return eix[(b, a)], True

    b = GraphBuilder()
    for a in range(4):
        bb, c = (a + 1) % 4, (a + 2) % 4
        for (i, j, k) in ((a, bb, c), (a, c, bb), (c, bb, a)):
            # transfer INTO view k from views i and j (factor over the
            # edges (k, i) and (k, j); reference tuples1/2/3)
            v1, t1 = edge_var(k, i)
            v2, t2 = edge_var(k, j)
            for m in range(8):
                b.add("etransfer", essential_transfer_residual,
                      ("essential", "essential"), 2, [v1, v2],
                      {"pa": pix[i, m], "pb": pix[j, m], "pc": pix[k, m],
                       "Ka": K, "Kb": K, "Kc": K,
                       "transpose1": np.asarray(t1),
                       "transpose2": np.asarray(t2)},
                      F_noise_iso2())
    graph = b.build(dtype=np.float64)

    truth = np.stack([E_between(a, bb) for a, bb in edges])
    delta = jnp.full(5, 1e-2)
    init_E = np.stack([np.asarray(extra.essential_retract(
        jnp.asarray(truth[i]), delta)) for i in range(8)])
    initial = Values({"essential": jnp.asarray(init_E)})
    e0 = float(optimizers.graph_error(graph, initial))
    res = optimizers.optimize_lm(
        graph, initial,
        optimizers.Params(max_iterations=100, relative_error_tol=1e-14,
                          absolute_error_tol=1e-14))
    assert res.error < 1e-8, res.error
    for i in range(8):
        got = np.asarray(res.values["essential"][i])
        dE = np.asarray(extra.essential_local(jnp.asarray(truth[i]),
                                              jnp.asarray(got)))
        assert np.abs(dE).max() < 1e-4, (i, dE)
    print(f"essential_view: 8 essential matrices from 96 transfer factors, "
          f"err {e0:.2e} -> {res.error:.2e}, all match truth  OK")


def F_noise_iso2():
    from gtsam_personal_tpu.slam import factors as F
    return F.diag_noise([1.0, 1.0])


def metis():
    """METISOrderingExample.cpp analogue: a fill-reducing ordering from the
    native symbolic layer on a 2D grid graph; must be a valid permutation
    and produce less symbolic fill than the identity ordering."""
    from gtsam_personal_tpu.native import min_degree_order
    import scipy.sparse as sp

    n = 10                                  # 10x10 grid
    N = n * n
    rows, cols = [], []
    for i in range(n):
        for j in range(n):
            v = i * n + j
            if j + 1 < n:
                rows += [v, v + 1]; cols += [v + 1, v]
            if i + 1 < n:
                rows += [v, v + n]; cols += [v + n, v]
    A = sp.csr_matrix((np.ones(len(rows)), (rows, cols)), shape=(N, N))

    def fill(order):
        """Symbolic elimination fill count under `order`."""
        pos = np.empty(N, dtype=np.int64)
        pos[order] = np.arange(N)
        adj = [set(A.indices[A.indptr[v]:A.indptr[v + 1]]) for v in range(N)]
        total = 0
        for v in order:
            nb = [u for u in adj[v] if pos[u] > pos[v]]
            total += len(nb)
            for x in nb:
                for y in nb:
                    if x != y and y not in adj[x]:
                        adj[x].add(y)
        return total

    order = np.asarray(min_degree_order(A.indptr.astype(np.int64),
                                        A.indices.astype(np.int64)))
    assert sorted(order.tolist()) == list(range(N))
    f_md, f_id = fill(order), fill(np.arange(N))
    assert f_md < f_id, (f_md, f_id)
    print(f"metis: min-degree ordering fill {f_md} < identity fill {f_id} "
          f"on the 10x10 grid  OK")


def pose3_chordal():
    """Pose3SLAMExample_initializePose3Chordal.cpp: chordal initialization
    on pose3example.txt lands in the optimum's basin."""
    from gtsam_personal_tpu.slam import dataset
    from gtsam_personal_tpu.slam.initialize import chordal_init
    from gtsam_personal_tpu.nonlinear import optimizers

    graph, initial = dataset.load_3d(
        dataset.find_example_data("pose3example.txt"))
    n = initial["se3"].shape[0]
    est = chordal_init(graph, n)
    e_chordal = float(optimizers.graph_error(graph, est))
    res_file = optimizers.optimize_lm(graph, initial)
    res_chordal = optimizers.optimize_lm(graph, est)
    assert abs(res_chordal.error - res_file.error) < \
        1e-4 * max(res_file.error, 1.0), \
        (res_chordal.error, res_file.error)
    print(f"pose3_chordal: chordal init error {e_chordal:.4f}; LM reaches "
          f"{res_chordal.error:.6f} (== file-init optimum "
          f"{res_file.error:.6f})  OK")


ALL = dict(gnc=gnc, lago=lago, spcg=spcg, lost=lost, fisheye=fisheye,
           combined_imu=combined_imu, kalman_easy=kalman_easy,
           kalman_elaborate=kalman_elaborate, essential_view=essential_view,
           metis=metis, pose3_chordal=pose3_chordal)


def main():
    which = sys.argv[1:] or list(ALL)
    for name in which:
        ALL[name]()
    print("PARITY-SUITE OK")


if __name__ == "__main__":
    main()
