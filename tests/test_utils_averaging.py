"""Tests: timing, serialization round-trip, dot export, ATE, Karcher mean,
translation recovery, MFAS, stereo/essential factors."""

import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.core.graph import GraphBuilder, FactorGraph
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.geometry import so3, se3, extra
from gtsam_personal_tpu.nonlinear import optimizers
from gtsam_personal_tpu.sfm import averaging
from gtsam_personal_tpu.slam import factors as F, metrics
from gtsam_personal_tpu.utils import timing, serialization, dot


class TestUtils:
    def test_timing_tree(self):
        timing.reset()
        with timing.tic("outer"):
            with timing.tic("inner"):
                pass
        rep = timing.report()
        assert "outer" in rep and "inner" in rep

    def test_serialization_roundtrip(self, tmp_path):
        b = GraphBuilder()
        F.add_prior(b, "se2", 0, np.zeros(3), F.diag_noise([0.3, 0.3, 0.1]))
        F.add_between(b, "se2", 0, 1, np.array([1.0, 0, 0.1]),
                      F.diag_noise([0.1, 0.1, 0.1]))
        graph = b.build()
        values = Values({"se2": jnp.asarray([[0.0, 0, 0], [1.0, 0, 0.1]])})
        gp = str(tmp_path / "graph.npz")
        vp = str(tmp_path / "values.npz")
        serialization.save_graph(gp, graph)
        serialization.save_values(vp, values)
        g2 = serialization.load_graph(gp)
        v2 = serialization.load_values(vp)
        e1 = float(optimizers.graph_error(graph, values))
        e2 = float(optimizers.graph_error(g2, v2))
        np.testing.assert_allclose(e1, e2, rtol=1e-12)

    def test_serialization_mixed_graph_auto_resolve(self, tmp_path):
        """A graph mixing closure factories, module-level residual functions
        (projection, GPS, bearing-range, stereo) and an AntiFactor batch
        round-trips with NO manual register_residual calls: module-level
        functions resolve by recorded (module, qualname), factory closures
        by reconstruction, and the anti sign survives."""
        rng = np.random.default_rng(0)
        b = GraphBuilder()
        # closure factories over several groups
        F.add_prior(b, "se2", 0, np.zeros(3), F.diag_noise([0.3, 0.3, 0.1]))
        F.add_between(b, "se2", 0, 1, np.array([1.0, 0, 0.1]),
                      F.diag_noise([0.1] * 3))
        pose3 = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
        F.add_prior(b, "se3", 0, pose3, F.diag_noise([0.1] * 6))
        F.add_prior(b, "point3", 0, np.zeros(3), F.diag_noise([0.1] * 3))
        # module-level residual functions (no registry entries)
        b.add("proj", F.projection_residual, ("se3", "point3"), 2, [0, 0],
              {"measured": np.array([1.0, 2.0]),
               "cal": np.array([500.0, 500.0, 0.0, 320.0, 240.0])},
              F.diag_noise([1.0, 1.0]))
        b.add("brange", F.bearing_range_2d_residual, ("se2", "point2"), 2,
              [1, 0], {"bearing": np.array(0.3), "range": np.array(2.0)},
              F.diag_noise([0.1, 0.2]))
        b.add("stereo", F.stereo_residual, ("se3", "point3"), 3, [0, 0],
              {"measured": np.array([100.0, 90.0, 50.0]),
               "cal": np.array([500.0, 500.0, 0.0, 320.0, 240.0, 0.1])},
              F.diag_noise([1.0] * 3))
        graph = b.build()
        # an anti twin of the between batch (sign must round-trip)
        bi = [i for i, bb in enumerate(graph.batches)
              if bb.name == "between_se2"][0]
        graph = FactorGraph(list(graph.batches) +
                            [graph.batches[bi].negated()])
        values = Values({
            "se2": jnp.asarray(rng.normal(size=(2, 3))),
            "se3": jnp.asarray(pose3)[None],
            "point3": jnp.asarray([[0.1, 0.2, 5.0]]),
            "point2": jnp.asarray([[1.5, 0.5]])})
        gp = str(tmp_path / "mixed.npz")
        serialization.save_graph(gp, graph)
        g2 = serialization.load_graph(gp)
        e1 = float(optimizers.graph_error(graph, values))
        e2 = float(optimizers.graph_error(g2, values))
        np.testing.assert_allclose(e1, e2, rtol=1e-12)
        assert g2.batches[-1].sign == -1.0

    def test_dot_export(self):
        b = GraphBuilder()
        F.add_between(b, "se2", 0, 1, np.array([1.0, 0, 0]), F.diag_noise([1, 1, 1]))
        s = dot.to_dot(b.build())
        assert "se20 -- " in s or "-- se20" in s or "se20" in s

    def test_ate_alignment(self):
        rng = np.random.default_rng(0)
        ref = rng.normal(size=(50, 3))
        R = np.asarray(so3.expmap(jnp.asarray([0.3, -0.2, 0.5])))
        est = (R @ ref.T).T + np.array([1.0, 2.0, 3.0])
        out = metrics.ate(est, ref, align=True)
        assert out["rmse"] < 1e-10
        out2 = metrics.ate(est, ref, align=False)
        assert out2["rmse"] > 1.0


class TestAveraging:
    def test_karcher_mean(self):
        rng = np.random.default_rng(1)
        base = so3.expmap(jnp.asarray([0.4, -0.1, 0.2]))
        Rs = [np.asarray(so3.compose(base, so3.expmap(
            jnp.asarray(rng.normal(scale=0.05, size=3))))) for _ in range(20)]
        mean = averaging.karcher_mean_so3(jnp.asarray(np.asarray(Rs)))
        err = np.linalg.norm(np.asarray(so3.logmap(
            jnp.asarray(np.asarray(base)).T @ mean)))
        assert err < 0.03

    def test_translation_recovery(self):
        rng = np.random.default_rng(2)
        truth = rng.normal(scale=2.0, size=(6, 3))
        truth -= truth[0]
        edges, dirs = [], []
        for i in range(6):
            for j in range(i + 1, 6):
                d = truth[j] - truth[i]
                edges.append((i, j))
                dirs.append(d / np.linalg.norm(d))
        edges = np.asarray(edges); dirs = np.asarray(dirs)
        scale0 = np.linalg.norm(truth[edges[0, 1]] - truth[edges[0, 0]])
        est = averaging.translation_recovery(edges, dirs, scale=scale0)
        out = metrics.ate(est, truth, align=True, with_scale=True)
        assert out["rmse"] < 1e-3, out

    def test_mfas_order_consistent(self):
        """Points on a line with consistent direction measurements: MFAS order
        should match the line order."""
        truth = np.array([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0], [3.0, 0, 0]])
        edges, dirs = [], []
        for i in range(4):
            for j in range(i + 1, 4):
                d = truth[j] - truth[i]
                edges.append((i, j)); dirs.append(d / np.linalg.norm(d))
        order = averaging.mfas_order(np.asarray(edges), np.asarray(dirs),
                                     np.array([1.0, 0, 0]))
        assert order == [0, 1, 2, 3]
        w = averaging.mfas_outlier_weights(np.asarray(edges), np.asarray(dirs),
                                           [np.array([1.0, 0, 0])])
        assert w.max() < 1e-12  # no inconsistency


class TestExtraFactors:
    def test_stereo_factor_zero_at_truth(self):
        pose = se3.expmap(jnp.asarray([0.1, 0.0, 0.0, 0.5, 0.0, 0.0]))
        point = jnp.asarray([0.3, -0.2, 3.0])
        cal = jnp.asarray([500.0, 500.0, 320.0, 240.0, 0.1])
        pc = se3.transform_to(pose, point)
        meas = jnp.asarray([500 * pc[0] / pc[2] + 320,
                            500 * (pc[0] - 0.1) / pc[2] + 320,
                            500 * pc[1] / pc[2] + 240])
        r = F.stereo_residual((pose, point), {"cal": cal, "measured": meas})
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-9)

    def test_essential_factor(self):
        """Epipolar error vanishes for corresponding points of a true E."""
        R = np.asarray(so3.expmap(jnp.asarray([0.05, -0.1, 0.02])))
        t = np.array([1.0, 0.2, -0.1]); t /= np.linalg.norm(t)
        e = extra.essential_make(jnp.asarray(R), jnp.asarray(t))
        rng = np.random.default_rng(3)
        # world points, camera A at origin, camera B with (R, t)
        # GTSAM convention: E = [t]x R with pB' E pA = 0 for calibrated points
        for _ in range(5):
            X = rng.normal(size=3) + np.array([0, 0, 5.0])
            pA = X[:2] / X[2]
            Xb = R.T @ (X - t)
            pB = Xb[:2] / Xb[2]
            r = F.essential_factor_residual(
                (e,), {"pA": jnp.asarray(pA), "pB": jnp.asarray(pB)})
            assert abs(float(r[0])) < 1e-9

    def test_frobenius_between(self):
        R1 = np.asarray(so3.expmap(jnp.asarray([0.1, 0.2, 0.3])))
        R12 = np.asarray(so3.expmap(jnp.asarray([-0.2, 0.1, 0.05])))
        r = F.frobenius_between_residual(
            (jnp.asarray(R1), jnp.asarray(R1 @ R12)), {"R12": jnp.asarray(R12)})
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)


class TestDebugSampler:
    def test_debug_flags(self):
        from gtsam_personal_tpu.utils import debug
        debug.clear_debug()
        assert not debug.is_debug("x")
        debug.set_debug("x")
        assert debug.is_debug("x")
        debug.clear_debug()

    def test_noise_sampler_covariance(self):
        import jax
        from gtsam_personal_tpu.linear import sampler
        from gtsam_personal_tpu.linear import noise as nm
        cov = np.array([[2.0, 0.5], [0.5, 1.0]])
        model = nm.covariance(cov)
        v = sampler.sample_noise(jax.random.PRNGKey(0), model, (4000,))
        sample_cov = np.cov(np.asarray(v).T)
        np.testing.assert_allclose(sample_cov, cov, atol=0.15)

    def test_weighted_sampling(self):
        import jax
        from gtsam_personal_tpu.linear.sampler import weighted_sample_without_replacement
        w = np.array([0.01, 0.01, 10.0, 0.01])
        counts = np.zeros(4)
        for s in range(100):
            idx = weighted_sample_without_replacement(jax.random.PRNGKey(s), w, 1)
            counts[int(idx[0])] += 1
        assert counts[2] > 80
