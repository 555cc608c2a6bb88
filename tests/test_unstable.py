"""Tests for the gtsam_unstable-analogue capabilities (SURVEY §2.12):
inverse-depth factors, rolling-shutter projection, EM between factor, TOA,
BearingS2, dynamics factors (VelocityConstraint/Pendulum), CSP + Scheduler.

Strategy mirrors the reference's unit tests: zero residual at ground truth,
finite-difference Jacobian oracles, and small end-to-end solves
(gtsam_unstable/slam/tests, gtsam_unstable/dynamics/tests,
gtsam_unstable/discrete/tests)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.core import manifolds
from gtsam_personal_tpu.core.graph import GraphBuilder
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.geometry import cameras as cam_geo
from gtsam_personal_tpu.geometry import se2, se3
from gtsam_personal_tpu.navigation import dynamics as dyn
from gtsam_personal_tpu.nonlinear import optimizers
from gtsam_personal_tpu.slam import factors as F
from gtsam_personal_tpu.slam import unstable as U
from gtsam_personal_tpu.testing.numerical import numerical_jacobian

CAL = jnp.array([500.0, 500.0, 0.0, 320.0, 240.0])


def _invdepth6_of(anchor, point):
    """Encode a world point as (x,y,z,theta,phi,rho) about an anchor."""
    ray = np.asarray(point) - np.asarray(anchor)
    d = np.linalg.norm(ray)
    theta = np.arctan2(ray[1], ray[0])
    phi = np.arcsin(ray[2] / d)
    return np.concatenate([np.asarray(anchor), [theta, phi, 1.0 / d]])


class TestInvDepth:
    def test_zero_residual_at_truth(self):
        pose = se3.identity(jnp.float64)
        point = np.array([0.3, -0.2, 5.0])
        lm = jnp.asarray(_invdepth6_of([0.0, 0.0, 1.0], point))
        uv = cam_geo.project_point(pose, jnp.asarray(point), CAL, "cal3_s2")
        r = U.inv_depth_variant1_residual((pose, lm), {"measured": uv, "cal": CAL})
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-9)

    def test_jacobian_matches_fd(self):
        pose = se3.retract(se3.identity(jnp.float64),
                           jnp.array([0.05, -0.02, 0.01, 0.1, 0.2, -0.1]))
        lm = jnp.asarray(_invdepth6_of([0.1, 0.0, 0.5], [0.3, -0.2, 5.0]))
        uv = jnp.array([300.0, 250.0])
        meas = {"measured": uv, "cal": CAL}
        f = lambda x: U.inv_depth_variant1_residual((pose, jnp.asarray(x)), meas)
        J_ad = jax.jacfwd(lambda x: U.inv_depth_variant1_residual(
            (pose, x), meas))(lm)
        J_fd = numerical_jacobian(lambda x: np.asarray(f(x)), np.asarray(lm))
        np.testing.assert_allclose(np.asarray(J_ad), J_fd, atol=1e-5)

    def test_optimize_recovers_point(self):
        """Two cameras observing one inverse-depth landmark (reference:
        gtsam_unstable/slam/tests/testInvDepthFactorVariant1.cpp)."""
        pose0 = se3.identity(jnp.float64)
        pose1 = se3.make(jnp.eye(3, dtype=jnp.float64),
                         jnp.array([0.5, 0.0, 0.0]))
        point = np.array([0.3, -0.2, 5.0])
        b = GraphBuilder()
        for i, pose in enumerate([pose0, pose1]):
            uv = cam_geo.project_point(pose, jnp.asarray(point), CAL, "cal3_s2")
            b.add("invdepth1", U.inv_depth_variant1_residual,
                  ("se3", "r6"), 2, [i, 0],
                  {"measured": np.asarray(uv), "cal": np.asarray(CAL)},
                  F.diag_noise([1.0, 1.0]))
            F.add_prior(b, "se3", i, np.asarray(pose), F.diag_noise([1e-6] * 6))
        graph = b.build(dtype=jnp.float64)
        lm0 = _invdepth6_of([0.0, 0.0, 1.0], point + np.array([0.3, 0.2, 1.0]))
        initial = Values({"se3": jnp.stack([pose0, pose1]),
                          "r6": jnp.asarray(lm0)[None, :]})
        res = optimizers.optimize_lm(graph, initial,
                                     optimizers.Params(max_iterations=50))
        lm = np.asarray(res.values["r6"][0])
        rec = np.asarray(U.inv_depth_point(*lm))
        np.testing.assert_allclose(rec, point, atol=1e-5)

    def test_variant3_anchored(self):
        """Variant3: landmark in the anchor camera frame."""
        pose_a = se3.retract(se3.identity(jnp.float64),
                             jnp.array([0.0, 0.1, 0.0, 0.2, -0.1, 0.3]))
        pose_b = se3.make(jnp.eye(3, dtype=jnp.float64),
                          jnp.array([0.4, 0.1, 0.0]))
        point = jnp.array([0.3, -0.2, 5.0])
        pc = np.asarray(se3.transform_to(pose_a, point))
        d = np.linalg.norm(pc)
        lm = jnp.array([np.arctan2(pc[1], pc[0]), np.arcsin(pc[2] / d), 1.0 / d])
        uv = cam_geo.project_point(pose_b, point, CAL, "cal3_s2")
        r = U.inv_depth_variant3_residual((pose_a, pose_b, lm),
                                          {"measured": uv, "cal": CAL})
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-9)


class TestRollingShutter:
    def test_alpha_endpoints(self):
        pose_a = se3.identity(jnp.float64)
        pose_b = se3.retract(pose_a, jnp.array([0.02, -0.01, 0.03, 0.3, 0.1, 0.0]))
        point = jnp.array([0.2, 0.1, 4.0])
        for alpha, pose in [(0.0, pose_a), (1.0, pose_b)]:
            uv = cam_geo.project_point(pose, point, CAL, "cal3_s2")
            r = U.projection_rolling_shutter_residual(
                (pose_a, pose_b, point),
                {"measured": uv, "alpha": jnp.float64(alpha), "cal": CAL})
            np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-9)

    def test_interpolation_midpoint(self):
        """Midpoint pose is the SE(3) geodesic midpoint."""
        a = se3.identity(jnp.float64)
        xi = jnp.array([0.1, 0.2, -0.1, 1.0, 2.0, 3.0])
        b = se3.expmap(xi)
        mid = U.se3_interpolate(a, b, 0.5)
        np.testing.assert_allclose(np.asarray(mid),
                                   np.asarray(se3.expmap(0.5 * xi)), atol=1e-12)

    def test_optimize_point(self):
        """Recover a landmark from rolling-shutter observations with known
        keyframe poses (reference: testProjectionFactorRollingShutter.cpp)."""
        rng = np.random.default_rng(0)
        poses = [se3.retract(se3.identity(jnp.float64),
                             jnp.asarray(np.concatenate([rng.normal(0, 0.02, 3),
                                                         [0.3 * k, 0.0, 0.0]])))
                 for k in range(4)]
        point = np.array([0.3, -0.2, 5.0])
        b = GraphBuilder()
        for k in range(3):
            for alpha in (0.2, 0.7):
                pose = U.se3_interpolate(poses[k], poses[k + 1], alpha)
                uv = cam_geo.project_point(pose, jnp.asarray(point), CAL, "cal3_s2")
                b.add("rs_proj", U.projection_rolling_shutter_residual,
                      ("se3", "se3", "point3"), 2, [k, k + 1, 0],
                      {"measured": np.asarray(uv), "alpha": alpha,
                       "cal": np.asarray(CAL)},
                      F.diag_noise([1.0, 1.0]))
        for k, pose in enumerate(poses):
            F.add_prior(b, "se3", k, np.asarray(pose), F.diag_noise([1e-7] * 6))
        graph = b.build(dtype=jnp.float64)
        initial = Values({"se3": jnp.stack(poses),
                          "point3": jnp.asarray(point + np.array([0.5, -0.4, 1.0]))[None, :]})
        res = optimizers.optimize_lm(graph, initial,
                                     optimizers.Params(max_iterations=50))
        np.testing.assert_allclose(np.asarray(res.values["point3"][0]), point,
                                   atol=1e-5)


class TestBetweenEM:
    def test_outlier_rejected(self):
        """Odometry chain + one wildly wrong loop closure wrapped in the EM
        factor: the posterior responsibilities park it on the outlier model
        and the trajectory stays at the odometry solution (reference:
        gtsam_unstable/slam/tests/testBetweenFactorEM.cpp)."""
        step = np.array([1.0, 0.0, 0.0])
        truth = [np.asarray(se2.identity(jnp.float64))]
        for _ in range(2):
            truth.append(np.asarray(se2.compose(jnp.asarray(truth[-1]),
                                                se2.retract(se2.identity(jnp.float64), jnp.asarray(step)))))
        b = GraphBuilder()
        F.add_prior(b, "se2", 0, truth[0], F.diag_noise([1e-4] * 3))
        for i in range(2):
            F.add_between(b, "se2", i, i + 1, np.asarray(
                se2.between(jnp.asarray(truth[i]), jnp.asarray(truth[i + 1]))),
                F.diag_noise([0.05, 0.05, 0.02]))
        # outlier loop closure 0 -> 2: claims they're 0.5m apart (truth: 2m)
        bad = np.asarray(se2.retract(se2.identity(jnp.float64),
                                     jnp.array([0.5, 0.0, 0.0])))
        b.add("between_em_se2", U.make_between_em_residual("se2"),
              ("se2", "se2"), 6, [0, 2],
              {"measured": bad,
               "w_in": 1.0 / np.array([0.05, 0.05, 0.02]),
               "w_out": 1.0 / np.array([20.0, 20.0, 20.0]),
               "prior_in": 0.5, "prior_out": 0.5},
              {"kind": "unit"})
        graph = b.build(dtype=jnp.float64)
        initial = Values({"se2": jnp.asarray(np.stack(truth))})
        res = optimizers.optimize_lm(graph, initial,
                                     optimizers.Params(max_iterations=30))
        final = np.asarray(res.values["se2"])
        np.testing.assert_allclose(final[2][:2], truth[2][:2], atol=0.05)

    def test_inlier_pulls(self):
        """With a *consistent* loop closure the EM factor acts like the
        inlier model and corrects drifted odometry."""
        b = GraphBuilder()
        F.add_prior(b, "se2", 0, np.asarray(se2.identity(jnp.float64)),
                    F.diag_noise([1e-4] * 3))
        drift = np.array([1.1, 0.05, 0.0])
        for i in range(2):
            b2 = np.asarray(se2.retract(se2.identity(jnp.float64), jnp.asarray(drift)))
            F.add_between(b, "se2", i, i + 1, b2, F.diag_noise([0.2, 0.2, 0.1]))
        good = np.asarray(se2.retract(se2.identity(jnp.float64),
                                      jnp.array([2.0, 0.0, 0.0])))
        b.add("between_em_se2", U.make_between_em_residual("se2"),
              ("se2", "se2"), 6, [0, 2],
              {"measured": good,
               "w_in": 1.0 / np.array([0.1, 0.1, 0.1]),
               "w_out": 1.0 / np.array([20.0, 20.0, 20.0]),
               "prior_in": 0.5, "prior_out": 0.5},
              {"kind": "unit"})
        graph = b.build(dtype=jnp.float64)
        init = np.stack([np.asarray(se2.identity(jnp.float64))] * 3)
        init[1] = np.asarray(se2.retract(jnp.asarray(init[0]), jnp.asarray(drift)))
        init[2] = np.asarray(se2.retract(jnp.asarray(init[1]), jnp.asarray(drift)))
        res = optimizers.optimize_lm(graph, Values({"se2": jnp.asarray(init)}),
                                     optimizers.Params(max_iterations=30))
        final = np.asarray(res.values["se2"])
        # loop closure (tight inlier) wins over loose odometry
        np.testing.assert_allclose(final[2][0], 2.0, atol=0.05)


class TestTOA:
    def test_localize_event(self):
        """Four microphones localize an acoustic event (reference:
        gtsam_unstable/slam/tests/testTOAFactor.cpp)."""
        manifolds.vector_space("event", 4)
        truth = np.array([0.1, 1.0, 2.0, 0.5])  # (t, x, y, z)
        mics = np.array([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0],
                         [0.0, 10.0, 0.0], [10.0, 10.0, 1.0],
                         [5.0, 5.0, 4.0]])
        b = GraphBuilder()
        for m in mics:
            d = np.linalg.norm(truth[1:] - m)
            toa = truth[0] + d / U.SPEED_OF_SOUND
            b.add("toa", U.toa_residual, ("event",), 1, [0],
                  {"sensor": m, "toa": toa, "speed": U.SPEED_OF_SOUND},
                  F.diag_noise([1e-4]))
        graph = b.build(dtype=jnp.float64)
        initial = Values({"event": jnp.array([[0.0, 4.0, 4.0, 0.0]])})
        res = optimizers.optimize_lm(graph, initial,
                                     optimizers.Params(max_iterations=50))
        np.testing.assert_allclose(np.asarray(res.values["event"][0]), truth,
                                   atol=1e-6)


class TestBearingS2:
    def test_zero_at_truth_and_fd(self):
        pose = se3.retract(se3.identity(jnp.float64),
                           jnp.array([0.1, -0.2, 0.05, 0.5, 1.0, -0.3]))
        point = jnp.array([2.0, 1.0, 3.0])
        p_body = se3.transform_to(pose, point)
        measured = p_body / jnp.linalg.norm(p_body)
        meas = {"measured": measured}
        r = U.bearing_s2_residual((pose, point), meas)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)
        J_ad = jax.jacfwd(lambda p: U.bearing_s2_residual((pose, p), meas))(point)
        # delta=1e-4: near coincidence the FD probe loses half its precision
        # to arccos cancellation (theta ~ sqrt(2(1-c))); AD is the stable side
        J_fd = numerical_jacobian(
            lambda p: np.asarray(U.bearing_s2_residual((pose, jnp.asarray(p)), meas)),
            np.asarray(point), delta=1e-4)
        np.testing.assert_allclose(np.asarray(J_ad), J_fd, atol=1e-5)


class TestDynamics:
    def test_velocity_constraint_consistent(self):
        x1 = se3.identity(jnp.float64)
        v1 = jnp.array([1.0, 0.0, 0.5])
        v2 = jnp.array([2.0, 0.0, -0.5])
        dt = 0.5
        t2 = np.asarray(se3.translation(x1)) + 0.5 * np.asarray(v1 + v2) * dt
        x2 = se3.make(jnp.eye(3, dtype=jnp.float64), jnp.asarray(t2))
        res = dyn.make_velocity_constraint_residual(dyn.TRAPEZOIDAL)
        r = res((x1, v1, x2, v2), {"dt": jnp.float64(dt)})
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)
        r_e = dyn.make_velocity_constraint_residual(dyn.EULER_START)(
            (x1, v1, x2, v2), {"dt": jnp.float64(dt)})
        np.testing.assert_allclose(np.asarray(r_e), 0.5 * np.asarray(v2 - v1) * dt,
                                   atol=1e-12)

    def test_pendulum_chain_matches_integration(self):
        """Solve the pendulum's discrete dynamics as a factor graph with
        hard-weight constraints; must match explicit semi-implicit Euler
        integration (reference: gtsam_unstable/dynamics/tests/testSimpleHelicopter
        -style chain tests + Pendulum.h update rules)."""
        h, g, r = 0.01, 9.81, 1.0
        N = 50
        q = np.zeros(N + 1)
        v = np.zeros(N + 1)
        q[0] = 0.5
        for k in range(N):
            v[k + 1] = v[k] - h * g / r * np.sin(q[k])
            q[k + 1] = q[k] + v[k + 1] * h
        b = GraphBuilder()
        hard = F.diag_noise([1e-3])  # mu = 1000, reference default
        F.add_prior(b, "r1", 0, np.array([q[0]]), F.diag_noise([1e-8]))
        F.add_prior(b, "r1", N + 1, np.array([v[0]]), F.diag_noise([1e-8]))
        for k in range(N):
            # slots (qk1, qk, vk1): q index k+1, k; v index N+1+k+1
            b.add("pendulum1", dyn.pendulum1_residual, ("r1", "r1", "r1"), 1,
                  [k + 1, k, N + 1 + k + 1], {"h": h}, hard)
            # slots (vk1, vk, qk): note PendulumFactor2 uses q at the *start*
            b.add("pendulum2", dyn.pendulum2_residual, ("r1", "r1", "r1"), 1,
                  [N + 1 + k + 1, N + 1 + k, k], {"h": h, "g": g, "r": r}, hard)
        graph = b.build(dtype=jnp.float64)
        initial = Values({"r1": jnp.full((2 * (N + 1), 1), 0.25, dtype=jnp.float64)})
        res = optimizers.optimize_lm(graph, initial,
                                     optimizers.Params(max_iterations=100))
        sol = np.asarray(res.values["r1"]).ravel()
        np.testing.assert_allclose(sol[:N + 1], q, atol=1e-5)
        np.testing.assert_allclose(sol[N + 1:], v, atol=1e-5)

    def test_pendulum_momenta_factors(self):
        """Pk/Pk1 residuals vanish on momenta computed from their defining
        discrete Euler-Lagrange formulas."""
        h, m, r, g, alpha = 0.1, 2.0, 1.5, 9.81, 0.3
        qk, qk1 = 0.4, 0.45
        qmid = (1 - alpha) * qk + alpha * qk1
        pk = m * r * r / h * (qk1 - qk) + m * g * r * h * (1 - alpha) * np.sin(qmid)
        pk1 = m * r * r / h * (qk1 - qk) - m * g * r * h * alpha * np.sin(qmid)
        meas = {"h": h, "m": m, "r": r, "g": g, "alpha": alpha}
        r1 = dyn.pendulum_pk_residual(
            (jnp.array([pk]), jnp.array([qk]), jnp.array([qk1])), meas)
        r2 = dyn.pendulum_pk1_residual(
            (jnp.array([pk1]), jnp.array([qk]), jnp.array([qk1])), meas)
        np.testing.assert_allclose(np.asarray(r1), 0.0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(r2), 0.0, atol=1e-12)


class TestCSP:
    def test_map_coloring(self):
        """WA/NT/SA 3-coloring (reference: gtsam_unstable/discrete/tests/
        testCSP.cpp)."""
        from gtsam_personal_tpu.discrete.csp import CSP
        csp = CSP()
        WA, NT, SA = 0, 1, 2
        for v in (WA, NT, SA):
            csp.add_variable(v, 3)
        csp.add_single_value(WA, 0)
        csp.add_all_diff([WA, NT, SA])
        sol = csp.optimal_assignment()
        assert csp.is_satisfied(sol)
        assert sol[WA] == 0
        assert len({sol[WA], sol[NT], sol[SA]}) == 3
        dom = csp.run_arc_consistency()
        np.testing.assert_array_equal(dom[WA], [1.0, 0.0, 0.0])
        # NT and SA keep the two remaining colors
        assert dom[NT][0] == 0.0 and dom[SA][0] == 0.0

    def test_infeasible_detected(self):
        from gtsam_personal_tpu.discrete.csp import CSP
        csp = CSP()
        for v in (0, 1):
            csp.add_variable(v, 2)
        csp.add_single_value(0, 1)
        csp.add_single_value(1, 1)
        csp.add_binary_all_diff(0, 1)
        with pytest.raises(ValueError):
            csp.run_arc_consistency()

    def test_scheduler(self):
        """Two students, one committee slot each, AllDiff rooms (reference:
        gtsam_unstable/discrete/tests/testScheduler.cpp)."""
        from gtsam_personal_tpu.discrete.csp import Scheduler
        s = Scheduler(num_slots=3, faculty=["Frank", "Cindy", "Martin"])
        s.add_student("Ana", {"AI": ["Frank", "Cindy"],
                              "Systems": ["Martin", "Cindy"]},
                      available_slots=[0, 1])
        s.add_student("Bob", {"AI": ["Frank"]}, available_slots=[1, 2],
                      advisor=None)
        out = s.schedule()
        assert out["Ana"]["slot"] != out["Bob"]["slot"]
        assert out["Ana"]["slot"] in (0, 1) and out["Bob"]["slot"] in (1, 2)
        c = out["Ana"]["committee"]
        assert c["AI"] in ("Frank", "Cindy") and c["Systems"] in ("Martin", "Cindy")
        assert c["AI"] != c["Systems"]
        assert out["Bob"]["committee"]["AI"] == "Frank"
