"""Navigation tests mirroring the reference's testImuFactor.cpp strategy:
integrate ideal IMU from an analytic scenario, compare predict() against the
closed-form trajectory; then solve a small VIO-style smoothing problem."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.core.graph import GraphBuilder
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.geometry import se3
from gtsam_personal_tpu.navigation import navstate, preintegration as pre
from gtsam_personal_tpu.navigation import factors as nav_factors
from gtsam_personal_tpu.navigation.scenario import ConstantTwistScenario
from gtsam_personal_tpu.nonlinear import optimizers
from gtsam_personal_tpu.slam import factors as F

PARAMS = pre.PreintegrationParams.make_shared_u(
    g=9.81, accel_sigma=0.01, gyro_sigma=0.001, integration_sigma=1e-6)


class TestNavState:
    def test_retract_local_roundtrip(self):
        x = navstate.identity(jnp.float64)
        xi = jnp.array([0.1, -0.2, 0.3, 1.0, 2.0, 3.0, 0.5, -0.5, 0.1])
        y = navstate.retract(x, xi)
        np.testing.assert_allclose(np.asarray(navstate.local(x, y)), np.asarray(xi), atol=1e-12)


class TestPreintegration:
    def test_straight_line_no_rotation(self):
        """Constant forward acceleration, no rotation, no gravity effect on
        comparison (we include gravity in measurements)."""
        scen = ConstantTwistScenario(np.zeros(3), np.array([2.0, 0.0, 0.0]))
        accs, gyros, dts = scen.imu_measurements(1.0, 0.01, PARAMS.gravity)
        pim = pre.integrate(PARAMS, jnp.zeros(6), jnp.asarray(accs),
                            jnp.asarray(gyros), jnp.asarray(dts))
        state0 = scen.nav_state(0.0)
        pred = pre.predict(pim, PARAMS, state0, jnp.zeros(6))
        truth = scen.nav_state(1.0)
        np.testing.assert_allclose(np.asarray(pred), np.asarray(truth), atol=1e-6)

    def test_circular_motion(self):
        """Constant twist (turning while moving): predict matches closed form
        (reference: testImuFactor.cpp 'Accelerating' / circle scenarios)."""
        scen = ConstantTwistScenario(np.array([0.0, 0.0, 0.5]),
                                     np.array([1.0, 0.0, 0.0]))
        accs, gyros, dts = scen.imu_measurements(2.0, 0.001, PARAMS.gravity)
        pim = pre.integrate(PARAMS, jnp.zeros(6), jnp.asarray(accs),
                            jnp.asarray(gyros), jnp.asarray(dts))
        pred = pre.predict(pim, PARAMS, scen.nav_state(0.0), jnp.zeros(6))
        truth = scen.nav_state(2.0)
        # first-order (Euler) integration, same scheme as the reference:
        # discretization error O(dt)
        np.testing.assert_allclose(np.asarray(pred), np.asarray(truth), atol=5e-4)

    def test_bias_correction_first_order(self):
        """H_ba/H_bw Jacobians: re-integration with a shifted bias should
        match the first-order bias-corrected delta."""
        scen = ConstantTwistScenario(np.array([0.1, -0.2, 0.3]),
                                     np.array([1.0, 0.5, -0.2]))
        accs, gyros, dts = scen.imu_measurements(0.5, 0.01, PARAMS.gravity)
        accs, gyros, dts = map(jnp.asarray, (accs, gyros, dts))
        b0 = jnp.zeros(6)
        db = jnp.array([1e-4, -2e-4, 1.5e-4, 1e-4, 2e-4, -1e-4])
        pim0 = pre.integrate(PARAMS, b0, accs, gyros, dts)
        # integrating with biasHat = db means correcting measurements by -db
        pim1 = pre.integrate(PARAMS, db, accs, gyros, dts)
        corrected = pre.bias_corrected_delta(pim0, db)
        np.testing.assert_allclose(np.asarray(corrected), np.asarray(pim1.zeta),
                                   atol=1e-6)

    def test_covariance_psd_and_growing(self):
        scen = ConstantTwistScenario(np.array([0.0, 0.0, 0.3]),
                                     np.array([1.0, 0.0, 0.0]))
        accs, gyros, dts = scen.imu_measurements(1.0, 0.01, PARAMS.gravity)
        pim = pre.integrate(PARAMS, jnp.zeros(6), jnp.asarray(accs),
                            jnp.asarray(gyros), jnp.asarray(dts))
        cov = np.asarray(pim.cov)
        w = np.linalg.eigvalsh(0.5 * (cov + cov.T))
        assert w.min() > -1e-15
        assert cov.trace() > 0


class TestImuFactor:
    def test_zero_residual_at_truth(self):
        scen = ConstantTwistScenario(np.array([0.0, 0.0, 0.4]),
                                     np.array([1.0, 0.0, 0.1]))
        accs, gyros, dts = scen.imu_measurements(1.0, 0.001, PARAMS.gravity)
        pim = pre.integrate(PARAMS, jnp.zeros(6), jnp.asarray(accs),
                            jnp.asarray(gyros), jnp.asarray(dts))
        s0, s1 = scen.nav_state(0.0), scen.nav_state(1.0)
        meas = {"zeta": pim.zeta, "H_ba": pim.H_ba, "H_bw": pim.H_bw,
                "bias_hat": pim.bias_hat, "deltaT": pim.deltaT,
                "gravity": PARAMS.gravity}
        r = nav_factors.imu_residual(
            (navstate.pose_of(s0), navstate.velocity(s0),
             navstate.pose_of(s1), navstate.velocity(s1), jnp.zeros(6)), meas)
        # residual ~ Euler discretization error, O(dt)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=5e-4)

    def test_imu_smoothing_recovers_trajectory(self):
        """3-keyframe IMU chain + priors: optimization recovers ground truth
        from perturbed initial values (ImuFactorsExample-style)."""
        scen = ConstantTwistScenario(np.array([0.0, 0.0, 0.3]),
                                     np.array([1.0, 0.0, 0.0]))
        n_seg, seg_t = 3, 0.5
        states = [scen.nav_state(seg_t * k) for k in range(n_seg + 1)]

        b = GraphBuilder()
        F.add_prior(b, "se3", 0, np.asarray(navstate.pose_of(states[0])),
                    F.diag_noise([1e-3] * 6))
        b.add("vel_prior", lambda xs, m: xs[0] - m["prior"], ("vel3",), 3, [0],
              {"prior": np.asarray(navstate.velocity(states[0]))},
              F.diag_noise([1e-3] * 3))
        b.add("bias_prior", lambda xs, m: xs[0] - m["prior"], ("imu_bias",), 6, [0],
              {"prior": np.zeros(6)}, F.diag_noise([1e-2] * 6))
        for k in range(n_seg):
            accs, gyros, dts = scen.imu_measurements(seg_t, 0.01, PARAMS.gravity)
            # shift time origin: measurements are body-frame; for constant
            # twist they are time-invariant except R^T g. Recompute per segment:
            t0 = seg_t * k
            nmeas = len(dts)
            accs = []
            w = scen.omega_b; v = scen.v_b
            for s in range(nmeas):
                t = t0 + s * 0.01
                R = np.asarray(scen.pose(t))[:, :3]
                accs.append(np.cross(w, v) - R.T @ np.asarray(PARAMS.gravity))
            accs = np.asarray(accs)
            pim = pre.integrate(PARAMS, jnp.zeros(6), jnp.asarray(accs),
                                jnp.asarray(gyros), jnp.asarray(dts))
            nav_factors.add_imu_factor(b, k, k + 1, 0, pim, PARAMS)
        graph = b.build()

        rng = np.random.default_rng(0)
        poses = np.stack([np.asarray(navstate.pose_of(s)) for s in states])
        vels = np.stack([np.asarray(navstate.velocity(s)) for s in states])
        poses_init = poses.copy()
        poses_init[1:, :, 3] += rng.normal(scale=0.05, size=(n_seg, 3))
        vels_init = vels + rng.normal(scale=0.05, size=vels.shape)
        initial = Values({"se3": jnp.asarray(poses_init),
                          "vel3": jnp.asarray(vels_init),
                          "imu_bias": jnp.zeros((1, 6))})
        res = optimizers.optimize_lm(graph, initial)
        assert res.converged
        final_poses = np.asarray(res.values["se3"])
        np.testing.assert_allclose(final_poses[:, :, 3], poses[:, :, 3], atol=1e-3)


class TestGpsFactor:
    def test_gps_residual(self):
        pose = se3.expmap(jnp.array([0.1, 0.2, 0.3, 1.0, 2.0, 3.0]))
        r = nav_factors.gps_residual((pose,), {"measured": se3.translation(pose)})
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)


class TestScenarioRunner:
    def test_monte_carlo_covariance(self):
        """Sampled preintegration covariance should match the propagated
        covariance (reference: ScenarioRunner::estimateCovariance /
        Monte-Carlo checks in testImuFactor.cpp)."""
        import jax
        scen = ConstantTwistScenario(np.array([0.0, 0.0, 0.3]),
                                     np.array([1.0, 0.0, 0.0]))
        params = pre.PreintegrationParams.make_shared_u(
            g=9.81, accel_sigma=0.05, gyro_sigma=0.02, integration_sigma=0.0)
        dt, t_end = 0.01, 0.5
        accs, gyros, dts = scen.imu_measurements(t_end, dt, params.gravity)
        accs, gyros, dts = map(jnp.asarray, (accs, gyros, dts))
        pim = pre.integrate(params, jnp.zeros(6), accs, gyros, dts)

        def sample_zeta(key):
            k1, k2 = jax.random.split(key)
            # discrete-time noise: sigma/sqrt(dt)
            na = 0.05 / np.sqrt(dt) * jax.random.normal(k1, accs.shape)
            ng = 0.02 / np.sqrt(dt) * jax.random.normal(k2, gyros.shape)
            return pre.integrate(params, jnp.zeros(6), accs + na, gyros + ng,
                                 dts).zeta

        N = 300
        keys = jax.random.split(jax.random.PRNGKey(0), N)
        zetas = np.asarray(jax.vmap(sample_zeta)(keys))
        sample_cov = np.cov(zetas.T)
        prop_cov = np.asarray(pim.cov)
        # compare the dominant diagonal entries within Monte-Carlo tolerance
        d_s = np.diag(sample_cov)
        d_p = np.diag(prop_cov)
        mask = d_p > 1e-10
        ratio = d_s[mask] / d_p[mask]
        assert np.all(ratio > 0.6) and np.all(ratio < 1.6), ratio
