"""Shonan rotation averaging + GNC + dogleg/NCG + marginals + EKF tests
(reference: sfm/tests/testShonanAveraging.cpp, tests/testGncOptimizer.cpp,
tests/testDoglegOptimizer.cpp, testMarginals, testKalmanFilter)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.core.graph import GraphBuilder, FactorGraph
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.geometry import so3, se2
from gtsam_personal_tpu.nonlinear import optimizers
from gtsam_personal_tpu.nonlinear.dogleg import optimize_dogleg, optimize_ncg
from gtsam_personal_tpu.nonlinear.gnc import optimize_gnc, GncParams
from gtsam_personal_tpu.nonlinear.marginals import Marginals
from gtsam_personal_tpu.linear.kalman import (GaussianState, kf_predict, kf_update,
                                              ExtendedKalmanFilter)
from gtsam_personal_tpu.sfm import shonan
from gtsam_personal_tpu.slam import factors as F


def make_rotation_problem(n=10, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    truth = [np.eye(3)]
    for _ in range(n - 1):
        truth.append(truth[-1] @ np.asarray(so3.expmap(
            jnp.asarray(rng.normal(scale=0.5, size=3)))))
    truth = np.asarray(truth)
    edges, meas = [], []
    for i in range(n - 1):
        edges.append((i, i + 1))
        meas.append(truth[i].T @ truth[i + 1])
    for i in range(0, n - 3, 2):  # extra loop edges
        edges.append((i, i + 3))
        meas.append(truth[i].T @ truth[i + 3])
    edges = np.asarray(edges)
    meas = np.asarray(meas)
    if noise > 0:
        for k in range(len(meas)):
            meas[k] = meas[k] @ np.asarray(so3.expmap(
                jnp.asarray(rng.normal(scale=noise, size=3))))
    return truth, edges, meas


class TestShonan:
    def test_exact_recovery(self):
        truth, edges, meas = make_rotation_problem(8, noise=0.0)
        res = shonan.shonan_averaging(edges, meas, p_min=3, p_max=5)
        assert res.certified
        # compare up to global gauge: res is anchored at R_0 = I
        truth_anchored = np.einsum("ab,nbc->nac", truth[0].T, truth)
        for k in range(len(truth)):
            err = np.linalg.norm(res.rotations[k] - truth_anchored[k])
            assert err < 1e-4, (k, err)

    def test_noisy_certified(self):
        truth, edges, meas = make_rotation_problem(8, noise=0.01)
        res = shonan.shonan_averaging(edges, meas, p_min=3, p_max=6)
        assert res.certified
        assert res.cost < 0.02


class TestGnc:
    def test_outlier_rejection_pose2(self):
        """Pose graph with injected outlier loop closures: GNC downweights
        them (reference: testGncOptimizer.cpp)."""
        rng = np.random.default_rng(4)
        n = 12
        truth = np.zeros((n, 3))
        for i in range(1, n):
            truth[i] = np.asarray(se2.compose(jnp.asarray(truth[i - 1]),
                                              jnp.asarray([1.0, 0.0, 0.3])))
        b = GraphBuilder()
        F.add_prior(b, "se2", 0, truth[0], F.diag_noise([0.1, 0.1, 0.05]))
        prior_graph = b.build()

        b2 = GraphBuilder()
        for i in range(n - 1):
            m = np.asarray(se2.between(jnp.asarray(truth[i]), jnp.asarray(truth[i + 1])))
            F.add_between(b2, "se2", i, i + 1, m + rng.normal(scale=0.005, size=3),
                          F.diag_noise([0.05, 0.05, 0.02]))
        # good loop closure + 2 outliers
        m = np.asarray(se2.between(jnp.asarray(truth[0]), jnp.asarray(truth[n - 1])))
        F.add_between(b2, "se2", 0, n - 1, m, F.diag_noise([0.05, 0.05, 0.02]))
        F.add_between(b2, "se2", 1, 8, np.array([5.0, -3.0, 1.5]),
                      F.diag_noise([0.05, 0.05, 0.02]))
        F.add_between(b2, "se2", 2, 9, np.array([-4.0, 2.0, -2.0]),
                      F.diag_noise([0.05, 0.05, 0.02]))
        between_graph = b2.build()
        graph = FactorGraph(list(prior_graph.batches) + list(between_graph.batches))
        robust_idx = len(graph.batches) - 1

        init = Values({"se2": jnp.asarray(truth +
                                          rng.normal(scale=0.05, size=truth.shape))})
        values, w, res = optimize_gnc(graph, init, robust_idx,
                                      GncParams(loss_type="tls"))
        K = graph.batches[robust_idx].size
        # the two outliers are the last two factors in insertion order
        assert w[-1] < 0.1 and w[-2] < 0.1, w
        assert w[:-2].min() > 0.9, w
        final = np.asarray(values["se2"])
        np.testing.assert_allclose(final[:, :2], truth[:, :2], atol=0.05)


class TestDoglegNcg:
    def _problem(self):
        from tests.test_pose2slam import build_example
        return build_example()

    def test_dogleg(self):
        graph, initial, expected = self._problem()
        res = optimize_dogleg(graph, initial)
        assert res.error < 1e-8

    def test_ncg(self):
        graph, initial, expected = self._problem()
        res = optimize_ncg(graph, initial,
                           optimizers.Params(max_iterations=200,
                                             relative_error_tol=1e-8))
        assert res.error < float(optimizers.graph_error(graph, initial)) * 1e-3


class TestMarginals:
    def test_prior_only_covariance(self):
        b = GraphBuilder()
        F.add_prior(b, "se2", 0, np.zeros(3), F.diag_noise([0.3, 0.3, 0.1]))
        graph = b.build()
        vals = Values({"se2": jnp.zeros((1, 3))})
        m = Marginals(graph, vals)
        cov = np.asarray(m.marginal_covariance("se2", 0))
        np.testing.assert_allclose(np.diag(cov), [0.09, 0.09, 0.01], atol=1e-10)

    def test_chain_marginals_grow(self):
        b = GraphBuilder()
        F.add_prior(b, "se2", 0, np.zeros(3), F.diag_noise([0.1, 0.1, 0.1]))
        for i in range(3):
            F.add_between(b, "se2", i, i + 1, np.array([1.0, 0, 0]),
                          F.diag_noise([0.1, 0.1, 0.1]))
        graph = b.build()
        poses = np.zeros((4, 3)); poses[:, 0] = np.arange(4)
        m = Marginals(graph, Values({"se2": jnp.asarray(poses)}))
        t0 = np.trace(np.asarray(m.marginal_covariance("se2", 0)))
        t3 = np.trace(np.asarray(m.marginal_covariance("se2", 3)))
        assert t3 > t0  # uncertainty grows along the chain


class TestKalman:
    def test_linear_kf_converges(self):
        """Constant state, repeated measurements: covariance shrinks
        (reference: linear/tests/testKalmanFilter.cpp)."""
        F_ = jnp.eye(2); B = jnp.zeros((2, 1)); Q = 1e-4 * jnp.eye(2)
        H = jnp.eye(2); R = 0.1 * jnp.eye(2)
        s = GaussianState(jnp.zeros(2), jnp.eye(2))
        for _ in range(20):
            s = kf_predict(s, F_, B, jnp.zeros(1), Q)
            s = kf_update(s, H, jnp.array([1.0, -1.0]), R)
        np.testing.assert_allclose(np.asarray(s.mean), [1.0, -1.0], atol=1e-2)
        assert float(jnp.trace(s.cov)) < 0.05

    def test_ekf_se2(self):
        ekf = ExtendedKalmanFilter("se2", jnp.zeros(3), 0.01 * jnp.eye(3))
        motion = lambda x: se2.compose(x, jnp.array([1.0, 0.0, 0.1]))
        ekf.predict(motion, 1e-4 * jnp.eye(3))
        h = lambda x: x[:2]
        truth = np.asarray(se2.compose(jnp.zeros(3), jnp.asarray([1.0, 0.0, 0.1])))
        s = ekf.update(h, jnp.asarray(truth[:2]), 1e-4 * jnp.eye(2))
        np.testing.assert_allclose(np.asarray(s.mean)[:2], truth[:2], atol=1e-2)


def test_accelerated_power_method_matches_plain_and_dense():
    """min_eigenvalue: accelerated (momentum) variant must agree with the
    plain shifted power method and with a dense eig of the certificate
    matrix (reference: linear/AcceleratedPowerMethod.h)."""
    import jax.numpy as jnp
    from gtsam_personal_tpu.sfm.shonan import (min_eigenvalue,
                                               _connection_laplacian_matvec)

    rng = np.random.default_rng(4)
    n = 12
    edges, R_meas = [], []
    Rg = [np.asarray(so3.expmap(jnp.asarray(rng.normal(scale=0.8, size=3))))
          for _ in range(n)]
    for i in range(n):
        jj = (i + 1) % n
        edges.append((i, jj))
        R_meas.append(Rg[i].T @ Rg[jj])
    for _ in range(4):
        i, jj = rng.choice(n, size=2, replace=False)
        edges.append((i, jj))
        R_meas.append(Rg[i].T @ Rg[jj])
    edges = np.asarray(edges)
    R_meas = np.stack(R_meas)
    kappa = np.ones(len(edges))
    Y = np.stack([R.T[:, :] for R in Rg])        # [n, 3, 3] -> transpose rows
    Y = np.swapaxes(np.stack(Rg), 1, 2)          # [n, p=3, 3]

    lam_acc, _ = min_eigenvalue(edges, R_meas, kappa, Y, iters=300,
                                accelerated=True)
    lam_plain, _ = min_eigenvalue(edges, R_meas, kappa, Y, iters=2000,
                                  accelerated=False)

    # dense certificate matrix S = L - blockdiag(Lambda)
    Z = np.swapaxes(Y, 1, 2)
    L = np.zeros((3 * n, 3 * n))
    for (i, jj), R, k in zip(edges, R_meas, kappa):
        L[3*i:3*i+3, 3*i:3*i+3] += k * np.eye(3)
        L[3*jj:3*jj+3, 3*jj:3*jj+3] += k * np.eye(3)
        L[3*i:3*i+3, 3*jj:3*jj+3] -= k * R
        L[3*jj:3*jj+3, 3*i:3*i+3] -= k * R.T
    LZ = _connection_laplacian_matvec(jnp.asarray(edges), jnp.asarray(R_meas),
                                      jnp.asarray(kappa), jnp.asarray(Z))
    Lam = np.einsum("nip,njp->nij", np.asarray(LZ), Z)
    Lam = 0.5 * (Lam + np.swapaxes(Lam, 1, 2))
    S = L.copy()
    for i in range(n):
        S[3*i:3*i+3, 3*i:3*i+3] -= Lam[i]
    lam_true = np.linalg.eigvalsh(S).min()

    np.testing.assert_allclose(lam_acc, lam_true, atol=1e-4)
    np.testing.assert_allclose(lam_plain, lam_true, atol=1e-3)
