"""Misc nonlinear factors + constrained ordering + geodetic + basis factors
(reference: nonlinear/LinearContainerFactor.h, FunctorizedFactor.h,
WhiteNoiseFactor.h, inference/Ordering.h constrained variants,
navigation/GPSFactor.h GeographicLib path, basis/BasisFactors.h)."""

import numpy as np
import jax.numpy as jnp

from gtsam_personal_tpu.core import manifolds
from gtsam_personal_tpu.core.graph import GraphBuilder
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.nonlinear import optimizers
from gtsam_personal_tpu.nonlinear.misc import (
    add_linear_container, make_functorized_residual,
    make_functorized2_residual, white_noise_residual, white_noise_mle)

from gtsam_personal_tpu.slam import factors as F


class TestLinearContainer:
    def test_reproduces_linear_solution(self):
        """GN on the wrapped factor == the linear least-squares solution in
        the anchor's tangent space."""
        rng = np.random.default_rng(0)
        A0 = rng.normal(size=(3, 3))
        A1 = rng.normal(size=(3, 3))
        b = rng.normal(size=3)
        anchor0 = rng.normal(size=3)
        anchor1 = rng.normal(size=3)

        builder = GraphBuilder()
        add_linear_container(builder, ["r3", "r3"], [0, 1], [A0, A1], b,
                            [anchor0, anchor1])
        # pin x0 at its anchor so the system is determined
        F.add_prior(builder, "r3", 0, anchor0, F.diag_noise([1e-6] * 3))
        graph = builder.build()
        init = Values({"r3": jnp.asarray(np.stack([anchor0, anchor1]))})
        res = optimizers.optimize_gn(graph, init,
                                     optimizers.Params(max_iterations=5))
        # with xi0 = 0: A1 xi1 = b  ->  x1 = anchor1 + lstsq
        xi1 = np.linalg.solve(A1, b)
        np.testing.assert_allclose(np.asarray(res.values["r3"][1]),
                                   anchor1 + xi1, atol=1e-6)


class TestFunctorized:
    def test_unary(self):
        fn = lambda x: jnp.array([x[0] ** 2 + x[1], x[1] * 3.0])
        builder = GraphBuilder()
        builder.add("func", make_functorized_residual(fn), ("r2",), 2, [0],
                    {"z": jnp.asarray([5.0, 6.0])}, {"kind": "unit"})
        res = optimizers.optimize_lm(
            builder.build(), Values({"r2": jnp.asarray([[1.0, 1.0]])}),
            optimizers.Params(max_iterations=30))
        x = np.asarray(res.values["r2"][0])
        np.testing.assert_allclose([x[0] ** 2 + x[1], 3 * x[1]], [5.0, 6.0],
                                   atol=1e-5)

    def test_binary(self):
        fn = lambda a, b: jnp.atleast_1d(jnp.dot(a, b))
        builder = GraphBuilder()
        builder.add("func2", make_functorized2_residual(fn),
                    ("r2", "r2"), 1, [0, 1], {"z": jnp.asarray([2.0])},
                    {"kind": "unit"})
        F.add_prior(builder, "r2", 0, np.array([1.0, 1.0]),
                    F.diag_noise([1e-3, 1e-3]))
        res = optimizers.optimize_lm(
            builder.build(),
            Values({"r2": jnp.asarray([[1.0, 1.0], [0.5, 0.5]])}),
            optimizers.Params(max_iterations=30))
        a = np.asarray(res.values["r2"][0])
        b = np.asarray(res.values["r2"][1])
        np.testing.assert_allclose(np.dot(a, b), 2.0, atol=1e-4)


class TestWhiteNoise:
    def test_recovers_ml_mean_and_precision(self):
        rng = np.random.default_rng(1)
        z = rng.normal(loc=2.5, scale=0.5, size=200)
        mu_ml, tau_ml = white_noise_mle(z)

        builder = GraphBuilder()
        for k, zk in enumerate(z):
            builder.add("white_noise", white_noise_residual, ("r1", "r1"), 2,
                        [0, 1], {"z": jnp.asarray(float(zk)),
                                 "umax": jnp.asarray(np.log(1e8))},
                        {"kind": "unit"})
        init = Values({"r1": jnp.asarray([[0.0], [0.0]])})
        res = optimizers.optimize_lm(
            builder.build(), init,
            optimizers.Params(max_iterations=300, relative_error_tol=1e-12,
                              absolute_error_tol=1e-12))
        mu = float(res.values["r1"][0, 0])
        tau = float(np.exp(res.values["r1"][1, 0]))
        np.testing.assert_allclose(mu, mu_ml, atol=1e-3)
        np.testing.assert_allclose(tau, tau_ml, rtol=1e-2)


class TestConstrainedOrdering:
    def test_constrained_last(self):
        from gtsam_personal_tpu.inference.symbolic import SymbolicFactorGraph
        g = SymbolicFactorGraph()
        for i in range(9):
            g.add(i, i + 1)
        order = g.default_ordering(constrained_last=[3, 7])
        assert set(order[-2:]) == {3, 7}
        assert set(order) == set(range(10))

    def test_constrained_first(self):
        from gtsam_personal_tpu.inference.symbolic import SymbolicFactorGraph
        g = SymbolicFactorGraph()
        for i in range(9):
            g.add(i, i + 1)
        order = g.default_ordering(constrained_first=[0, 5])
        assert set(order[:2]) == {0, 5}

    def test_numpy_fallback_matches_contract(self):
        from gtsam_personal_tpu import native
        indptr = np.array([0, 1, 3, 5, 7, 8])
        indices = np.array([1, 0, 2, 1, 3, 2, 4, 3])
        group = np.array([1, 1, 2, 1, 1])
        # force the fallback path
        lib = native._lib
        try:
            native._lib = False
            perm = native.min_degree_order_grouped(indptr, indices, group)
        finally:
            native._lib = lib
        assert int(perm[-1]) == 2
        assert sorted(perm.tolist()) == [0, 1, 2, 3, 4]


class TestGeodetic:
    def test_lla_ecef_roundtrip(self):
        from gtsam_personal_tpu.navigation import geodetic
        lat, lon, h = 47.3769, 8.5417, 408.0   # Zurich
        xyz = geodetic.lla_to_ecef(lat, lon, h)
        lat2, lon2, h2 = geodetic.ecef_to_lla(xyz)
        np.testing.assert_allclose([lat2, lon2, h2], [lat, lon, h],
                                   atol=1e-7)

    def test_enu_origin_and_axes(self):
        from gtsam_personal_tpu.navigation import geodetic
        origin = (47.0, 8.0, 0.0)
        np.testing.assert_allclose(
            geodetic.lla_to_enu(47.0, 8.0, 0.0, origin), np.zeros(3),
            atol=1e-9)
        # a point 0.001 deg north is ~111m in +N (ENU y), tiny elsewhere
        enu = geodetic.lla_to_enu(47.001, 8.0, 0.0, origin)
        assert 100.0 < enu[1] < 120.0
        assert abs(enu[0]) < 1.0
        # up
        enu_up = geodetic.lla_to_enu(47.0, 8.0, 100.0, origin)
        np.testing.assert_allclose(enu_up[2], 100.0, atol=1e-6)

    def test_enu_roundtrip(self):
        from gtsam_personal_tpu.navigation import geodetic
        origin = (47.0, 8.0, 100.0)
        pts = np.array([[10.0, -20.0, 5.0], [1000.0, 2000.0, -50.0]])
        xyz = geodetic.enu_to_ecef(pts, origin)
        back = geodetic.ecef_to_enu(xyz, origin)
        np.testing.assert_allclose(back, pts, atol=1e-8)


class TestBasisFactors:
    def test_vector_evaluation(self):
        from gtsam_personal_tpu.basis.chebyshev import (
            chebyshev2_points, chebyshev2_weights, vector_evaluation_residual)
        n, m = 12, 2
        pts = chebyshev2_points(n)
        # truth: f(x) = [sin x, cos x]; coefficients = values at points
        C = np.stack([np.sin(pts), np.cos(pts)])          # [m, n]
        group = manifolds.vector_space(f"coeffs_{m}x{n}", m * n)
        builder = GraphBuilder()
        rng = np.random.default_rng(0)
        xs = rng.uniform(-1, 1, size=40)
        for x in xs:
            w = np.asarray(chebyshev2_weights(x, n))
            z = np.array([np.sin(x), np.cos(x)])
            builder.add("veval", vector_evaluation_residual(m),
                        (group.name,), m, [0],
                        {"w": jnp.asarray(w), "z": jnp.asarray(z)},
                        {"kind": "unit"})
        init = Values({group.name: jnp.zeros((1, m * n))})
        res = optimizers.optimize_gn(builder.build(), init,
                                     optimizers.Params(max_iterations=3))
        Cfit = np.asarray(res.values[group.name][0]).reshape(m, n)
        np.testing.assert_allclose(Cfit, C, atol=1e-6)

    def test_derivative_factor(self):
        from gtsam_personal_tpu.basis.chebyshev import (
            chebyshev2_points, chebyshev2_weights,
            chebyshev2_derivative_weights, derivative_residual,
            evaluation_residual)
        n = 16
        pts = chebyshev2_points(n)
        group = manifolds.vector_space(f"coeffs_{n}", n)
        builder = GraphBuilder()
        rng = np.random.default_rng(1)
        # fit f from noisy evaluations AND exact derivative constraints
        for x in rng.uniform(-1, 1, size=30):
            w = np.asarray(chebyshev2_weights(x, n))
            builder.add("eval", evaluation_residual, (group.name,), 1, [0],
                        {"w": jnp.asarray(w),
                         "z": jnp.asarray(float(np.sin(2 * x)))},
                        {"kind": "unit"})
        for x in rng.uniform(-1, 1, size=30):
            d = np.asarray(chebyshev2_derivative_weights(x, n))
            builder.add("deriv", derivative_residual, (group.name,), 1, [0],
                        {"d": jnp.asarray(d),
                         "z": jnp.asarray(float(2 * np.cos(2 * x)))},
                        {"kind": "unit"})
        init = Values({group.name: jnp.zeros((1, n))})
        res = optimizers.optimize_gn(builder.build(), init,
                                     optimizers.Params(max_iterations=3))
        f = np.asarray(res.values[group.name][0])
        np.testing.assert_allclose(f, np.sin(2 * pts), atol=1e-5)

    def test_chebyshev1_weights(self):
        from gtsam_personal_tpu.basis.chebyshev import chebyshev1_weights
        # T_k(cos t) = cos(k t)
        x = 0.4321
        w = np.asarray(chebyshev1_weights(x, 6))
        t = np.arccos(x)
        np.testing.assert_allclose(w, np.cos(np.arange(6) * t), atol=1e-12)
