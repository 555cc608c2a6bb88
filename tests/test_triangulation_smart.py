"""Triangulation + smart factor tests (reference:
geometry/tests/testTriangulation.cpp, slam/tests/testSmartProjectionFactor)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.core.graph import FactorGraph, GraphBuilder
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.geometry import se3, triangulation as tri
from gtsam_personal_tpu.nonlinear import optimizers
from gtsam_personal_tpu.sfm import smart
from gtsam_personal_tpu.slam import factors as F


def make_scene(n_cams=4, seed=0):
    rng = np.random.default_rng(seed)
    poses = []
    for i in range(n_cams):
        # cameras along x axis looking forward (+z)
        t = np.array([i * 0.5, 0.0, 0.0])
        poses.append(np.concatenate([np.eye(3), t[:, None]], axis=1))
    poses = np.asarray(poses)
    point = np.array([0.7, 0.3, 4.0])
    uv = []
    for p in poses:
        pc = np.asarray(se3.transform_to(jnp.asarray(p), jnp.asarray(point)))
        uv.append(pc[:2] / pc[2])
    return jnp.asarray(poses), jnp.asarray(np.asarray(uv)), point


class TestTriangulation:
    def test_dlt_exact(self):
        poses, uv, point = make_scene()
        est, degen = tri.triangulate_dlt(poses, uv)
        assert not bool(degen)
        np.testing.assert_allclose(np.asarray(est), point, atol=1e-8)

    def test_lost(self):
        poses, uv, point = make_scene()
        est, degen = tri.triangulate_lost(poses, uv)
        np.testing.assert_allclose(np.asarray(est), point, atol=1e-6)

    def test_refine_improves_noisy(self):
        poses, uv, point = make_scene()
        noisy = uv + 1e-3 * jax.random.normal(jax.random.PRNGKey(0), uv.shape)
        est, _ = tri.triangulate_dlt(poses, noisy)
        refined = tri.refine_nonlinear(poses, noisy, est)
        def cost(X):
            pc = jax.vmap(lambda p: se3.transform_to(p, X))(poses)
            rr = pc[:, :2] / pc[:, 2:3] - noisy
            return float(jnp.sum(rr * rr))
        assert cost(refined) <= cost(est) + 1e-12

    def test_safe_detects_behind(self):
        poses, uv, point = make_scene()
        # point behind: flip z
        uv_bad = -uv
        res = tri.triangulate_safe(poses, uv_bad)
        assert not bool(res.valid)

    def test_degenerate_single_direction(self):
        # all cameras at same center -> no parallax -> degenerate
        pose = jnp.asarray(np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1))
        poses = jnp.stack([pose, pose, pose])
        uv = jnp.asarray(np.tile([[0.1, 0.2]], (3, 1)))
        res = tri.triangulate_safe(poses, uv, refine=False)
        assert bool(res.degenerate) or not bool(res.valid)


class TestSmartFactors:
    def test_smart_factor_zero_at_truth(self):
        poses, uv, point = make_scene()
        batches = smart.build_smart_batches([[0, 1, 2, 3]], [np.asarray(uv)])
        graph = FactorGraph(batches)
        vals = Values({"se3": poses})
        assert float(optimizers.graph_error(graph, vals)) < 1e-16

    def test_smart_only_pose_optimization(self):
        """Perturbed cameras + several smart tracks + prior on two cameras:
        optimization recovers the camera poses (structureless BA)."""
        rng = np.random.default_rng(1)
        n_cams = 4
        poses_np = []
        for i in range(n_cams):
            t = np.array([i * 0.5, 0.0, 0.0])
            poses_np.append(np.concatenate([np.eye(3), t[:, None]], axis=1))
        poses_np = np.asarray(poses_np)
        points = rng.normal(size=(12, 3)) * np.array([1.0, 1.0, 0.5]) + \
            np.array([0.5, 0.0, 5.0])
        tracks, meas = [], []
        for X in points:
            uv = []
            for p in poses_np:
                pc = p[:, :3].T @ (X - p[:, 3])
                uv.append(pc[:2] / pc[2])
            tracks.append(list(range(n_cams)))
            meas.append(np.asarray(uv) + rng.normal(scale=1e-4, size=(n_cams, 2)))
        batches = smart.build_smart_batches(tracks, meas, sigma=1e-3)

        b = GraphBuilder()
        F.add_prior(b, "se3", 0, poses_np[0], F.diag_noise([1e-4] * 6))
        F.add_prior(b, "se3", 1, poses_np[1], F.diag_noise([1e-4] * 6))
        graph = FactorGraph(list(b.build().batches) + batches)

        pert = poses_np.copy()
        for i in range(2, n_cams):
            noise = np.asarray(se3.expmap(jnp.asarray(
                rng.normal(scale=0.02, size=6))))
            pert[i] = np.asarray(se3.compose(jnp.asarray(pert[i]), jnp.asarray(noise)))
        res = optimizers.optimize_lm(FactorGraph(graph.batches),
                                     Values({"se3": jnp.asarray(pert)}),
                                     optimizers.Params(max_iterations=30))
        final = np.asarray(res.values["se3"])
        np.testing.assert_allclose(final[:, :, 3], poses_np[:, :, 3], atol=5e-3)


class TestSmartStereo:
    """SmartStereoProjectionFactor analogue (gtsam_unstable)."""

    CAL = np.array([500.0, 500.0, 320.0, 240.0, 0.2])

    def _rig(self):
        poses = [se3.identity(jnp.float64),
                 se3.make(jnp.eye(3, dtype=jnp.float64), jnp.array([0.6, 0.0, 0.0])),
                 se3.retract(se3.identity(jnp.float64),
                             jnp.array([0.02, -0.01, 0.03, 1.2, 0.1, 0.0]))]
        point = np.array([0.4, -0.3, 6.0])
        return poses, point

    def test_zero_residual_at_truth(self):
        from gtsam_personal_tpu.sfm import smart
        poses, point = self._rig()
        uvs = np.stack([np.asarray(smart._stereo_project(p, jnp.asarray(point),
                                                         jnp.asarray(self.CAL)))
                        for p in poses])
        res = smart.make_smart_stereo_residual(3)
        r = res(tuple(poses), {"uvs": jnp.asarray(uvs), "cal": jnp.asarray(self.CAL)})
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-8)

    def test_pulls_displaced_pose(self):
        """End-to-end: stereo smart factors + priors recover a displaced pose
        (reference: testSmartStereoProjectionPoseFactor.cpp)."""
        from gtsam_personal_tpu.sfm import smart
        from gtsam_personal_tpu.core.graph import FactorGraph
        from gtsam_personal_tpu.core.values import Values
        from gtsam_personal_tpu.nonlinear import optimizers
        from gtsam_personal_tpu.slam import factors as F
        from gtsam_personal_tpu.core.graph import GraphBuilder
        rng = np.random.default_rng(1)
        poses, _ = self._rig()
        points = rng.normal(0, 1.5, (12, 3)) + np.array([0.3, 0.0, 6.0])
        tracks, meas = [], []
        for pt in points:
            tracks.append([0, 1, 2])
            meas.append(np.stack([np.asarray(smart._stereo_project(
                p, jnp.asarray(pt), jnp.asarray(self.CAL))) for p in poses]))
        batches = smart.build_smart_stereo_batches(tracks, meas, self.CAL,
                                                   sigma=1.0)
        b = GraphBuilder()
        F.add_prior(b, "se3", 0, np.asarray(poses[0]), F.diag_noise([1e-6] * 6))
        F.add_prior(b, "se3", 1, np.asarray(poses[1]), F.diag_noise([1e-6] * 6))
        graph = FactorGraph(b.build(dtype=jnp.float64).batches + batches)
        init = np.stack([np.asarray(p) for p in poses])
        init[2] = np.asarray(se3.retract(jnp.asarray(init[2]),
                                         jnp.array([0.03, -0.02, 0.01, 0.2, -0.1, 0.15])))
        res = optimizers.optimize_lm(graph, Values({"se3": jnp.asarray(init)}),
                                     optimizers.Params(max_iterations=50))
        np.testing.assert_allclose(np.asarray(res.values["se3"][2]),
                                   np.asarray(poses[2]), atol=1e-5)


class TestImplicitSmartJacobian:
    """The smart residual's Jacobian must be the EXACT Schur-complement
    (variable-projection) Jacobian at the triangulated point (reference:
    SmartFactorBase.h:320), not an autodiff tape through truncated GN."""

    def _jacobians(self, poses, uv, refine_iters, implicit):
        res = smart.make_smart_residual(poses.shape[0],
                                        refine_iters=refine_iters,
                                        implicit=implicit)
        meas = {"uv": uv}

        def f(xi_flat):
            xis = xi_flat.reshape(poses.shape[0], 6)
            xs = tuple(se3.retract(poses[t], xis[t])
                       for t in range(poses.shape[0]))
            return res(xs, meas)

        return f

    def test_implicit_matches_fd_converged(self):
        poses, uv, point = make_scene(4)
        # noisy measurements so the argmin is a genuine compromise point
        uv = uv + 1e-3 * jnp.asarray(
            np.random.default_rng(0).normal(size=uv.shape))
        f = self._jacobians(poses, uv, refine_iters=8, implicit=True)
        x0 = jnp.zeros(24)
        J_ad = np.asarray(jax.jacfwd(f)(x0))
        from gtsam_personal_tpu.testing.numerical import numerical_jacobian
        J_fd = np.asarray(numerical_jacobian(
            lambda x: f(jnp.asarray(x)), np.zeros(24)))
        np.testing.assert_allclose(J_ad, J_fd, atol=5e-5)

    def test_implicit_beats_unrolled_when_truncated(self):
        """At a stressed geometry with a TRUNCATED inner solve, the
        implicit Jacobian stays close to the fully-converged reference
        Jacobian; the unrolled tape drifts further."""
        rng = np.random.default_rng(3)
        # short-baseline cameras -> ill-conditioned triangulation
        poses = []
        for i in range(4):
            t = np.array([i * 0.02, 0.0, 0.0])
            poses.append(np.concatenate([np.eye(3), t[:, None]], axis=1))
        poses = jnp.asarray(np.asarray(poses))
        point = np.array([0.4, -0.2, 6.0])
        uv = []
        for p in np.asarray(poses):
            pc = np.asarray(se3.transform_to(jnp.asarray(p),
                                             jnp.asarray(point)))
            uv.append(pc[:2] / pc[2])
        uv = jnp.asarray(np.asarray(uv) + 2e-3 * rng.normal(size=(4, 2)))

        x0 = jnp.zeros(24)
        # reference: fully converged inner solve, implicit diff
        f_ref = self._jacobians(poses, uv, refine_iters=50, implicit=True)
        J_ref = np.asarray(jax.jacfwd(f_ref)(x0))
        f_imp = self._jacobians(poses, uv, refine_iters=2, implicit=True)
        J_imp = np.asarray(jax.jacfwd(f_imp)(x0))
        f_unr = self._jacobians(poses, uv, refine_iters=2, implicit=False)
        J_unr = np.asarray(jax.jacfwd(f_unr)(x0))
        err_imp = np.abs(J_imp - J_ref).max()
        err_unr = np.abs(J_unr - J_ref).max()
        assert err_imp <= err_unr + 1e-12, (err_imp, err_unr)
        assert err_imp < 0.05 * max(np.abs(J_ref).max(), 1e-12), \
            (err_imp, np.abs(J_ref).max())
