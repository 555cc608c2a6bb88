"""Basis fitting + LP/QP tests (reference: gtsam/basis/tests,
gtsam_unstable/linear QP tests on HS* problems)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.basis.chebyshev import (chebyshev2_points,
                                                chebyshev2_weights,
                                                chebyshev2_differentiation_matrix,
                                                fourier_weights, fit_basis)
from gtsam_personal_tpu.linear.lpqp import solve_qp, solve_lp


class TestChebyshev:
    def test_interpolation_exact_at_points(self):
        n = 8
        pts = chebyshev2_points(n)
        f = np.sin(pts)
        for k in range(n):
            w = np.asarray(chebyshev2_weights(pts[k], n))
            np.testing.assert_allclose(w @ f, f[k], atol=1e-12)

    def test_interpolates_smooth_function(self):
        n = 16
        pts = chebyshev2_points(n)
        f = np.exp(pts) * np.sin(2 * pts)
        xq = 0.3217
        w = np.asarray(chebyshev2_weights(xq, n))
        np.testing.assert_allclose(w @ f, np.exp(xq) * np.sin(2 * xq), atol=1e-9)

    def test_differentiation_matrix(self):
        n = 20
        pts = chebyshev2_points(n)
        D = np.asarray(chebyshev2_differentiation_matrix(n))
        f = np.sin(pts)
        np.testing.assert_allclose(D @ f, np.cos(pts), atol=1e-8)

    def test_fit_basis_recovers_function(self):
        rng = np.random.default_rng(0)
        xs = rng.uniform(-1, 1, size=60)
        zs = np.tanh(2 * xs)
        coeffs, res = fit_basis(xs, zs, n=12)
        pts_check = np.linspace(-0.9, 0.9, 7)
        for x in pts_check:
            w = np.asarray(chebyshev2_weights(x, 12))
            np.testing.assert_allclose(w @ coeffs, np.tanh(2 * x), atol=1e-3)

    def test_fourier_weights(self):
        w = np.asarray(fourier_weights(jnp.asarray(0.5), 3))
        np.testing.assert_allclose(w, [1.0, np.cos(0.5), np.sin(0.5)], atol=1e-12)


class TestQP:
    def test_unconstrained(self):
        G = np.diag([2.0, 4.0]); g = np.array([-2.0, -4.0])
        res = solve_qp(G, g)
        assert res.converged
        np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-8)

    def test_equality_constrained(self):
        # min x^2 + y^2 s.t. x + y = 1 -> (0.5, 0.5)
        res = solve_qp(2 * np.eye(2), np.zeros(2),
                       A_eq=np.array([[1.0, 1.0]]), b_eq=np.array([1.0]))
        assert res.converged
        np.testing.assert_allclose(res.x, [0.5, 0.5], atol=1e-8)

    def test_inequality_active(self):
        # min (x-2)^2 + (y-2)^2 s.t. x + y <= 2 -> (1, 1)
        res = solve_qp(2 * np.eye(2), np.array([-4.0, -4.0]),
                       A_in=np.array([[1.0, 1.0]]), b_in=np.array([2.0]))
        assert res.converged
        np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-6)

    def test_inequality_inactive(self):
        # same objective, constraint x + y <= 10: unconstrained optimum (2,2)
        res = solve_qp(2 * np.eye(2), np.array([-4.0, -4.0]),
                       A_in=np.array([[1.0, 1.0]]), b_in=np.array([10.0]))
        assert res.converged
        np.testing.assert_allclose(res.x, [2.0, 2.0], atol=1e-6)

    def test_lp_box(self):
        # min -x - 2y s.t. x <= 1, y <= 1, -x <= 0, -y <= 0 -> (1, 1)
        res = solve_lp(np.array([-1.0, -2.0]),
                       A_in=np.array([[1.0, 0], [0, 1.0], [-1.0, 0], [0, -1.0]]),
                       b_in=np.array([1.0, 1.0, 0.0, 0.0]))
        assert res.converged
        np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-5)
