"""Lie group property tests — the analogue of the reference's
gtsam/geometry/tests/testPose3.cpp / testRot3.cpp / testPose2.cpp and the
generic concept checks in base/testLie.h: group axioms, exp/log round trips,
chart consistency, Jacobians vs central differences."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.geometry import so2, so3, se2, se3
from gtsam_personal_tpu.core import manifolds

KEY = jax.random.PRNGKey(42)


def rand_so3(k):
    return so3.expmap(jax.random.normal(k, (3,), dtype=jnp.float64))


def rand_se3(k):
    return se3.expmap(jax.random.normal(k, (6,), dtype=jnp.float64))


def rand_se2(k):
    return se2.expmap(jax.random.normal(k, (3,), dtype=jnp.float64) * jnp.array([1.0, 1.0, 0.8]))


class TestSO3:
    def test_exp_log_roundtrip(self):
        for i in range(20):
            w = np.array(jax.random.normal(jax.random.PRNGKey(i), (3,))) * (0.1 + i * 0.15)
            if np.linalg.norm(w) > 3.1:
                w = w / np.linalg.norm(w) * 3.1
            R = so3.expmap(jnp.array(w))
            w2 = so3.logmap(R)
            np.testing.assert_allclose(np.array(w2), w, atol=1e-9)

    def test_log_near_pi(self):
        for axis in [np.array([1.0, 0, 0]), np.array([0, 1.0, 0]),
                     np.array([0.6, 0.8, 0.0]), np.array([0.36, 0.48, 0.8])]:
            for theta in [np.pi - 1e-7, np.pi - 1e-3, np.pi]:
                w = axis * theta
                R = so3.expmap(jnp.array(w))
                w2 = np.array(so3.logmap(R))
                # at exactly pi, +/- axis are equivalent
                err = min(np.linalg.norm(w2 - w), np.linalg.norm(w2 + w))
                assert err < 1e-6, (axis, theta, w2)

    def test_log_identity(self):
        np.testing.assert_allclose(np.array(so3.logmap(jnp.eye(3))), np.zeros(3), atol=1e-12)

    def test_group_axioms(self):
        R1, R2 = rand_so3(jax.random.PRNGKey(0)), rand_so3(jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.array(so3.compose(R1, so3.inverse(R1))), np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.array(so3.between(R1, R2)), np.array(R1.T @ R2), atol=1e-12)

    def test_retract_local_inverse(self):
        R = rand_so3(jax.random.PRNGKey(3))
        w = jnp.array([0.1, -0.2, 0.3])
        np.testing.assert_allclose(np.array(so3.local(R, so3.retract(R, w))), np.array(w), atol=1e-10)

    def test_left_jacobian_vs_fd(self):
        # J_l(w) = d/deps Log(Exp(w+eps) Exp(w)^{-1}): check Exp(w+dw) ~ Exp(J_l dw) Exp(w)
        w = jnp.array([0.3, -0.5, 0.7])
        dw = jnp.array([1e-6, -2e-6, 1.5e-6])
        lhs = so3.expmap(w + dw)
        rhs = so3.compose(so3.expmap(so3.left_jacobian(w) @ dw), so3.expmap(w))
        np.testing.assert_allclose(np.array(lhs), np.array(rhs), atol=1e-10)

    def test_left_jacobian_inverse(self):
        w = jnp.array([0.4, 0.1, -0.9])
        J = so3.left_jacobian(w)
        Jinv = so3.left_jacobian_inverse(w)
        np.testing.assert_allclose(np.array(J @ Jinv), np.eye(3), atol=1e-10)

    def test_autodiff_through_retract_no_nan_at_zero(self):
        R = rand_so3(jax.random.PRNGKey(7))
        f = lambda w: so3.logmap(so3.retract(R, w))
        J = jax.jacfwd(f)(jnp.zeros(3))
        assert np.all(np.isfinite(np.array(J)))

    def test_expmap_grad_at_zero(self):
        J = jax.jacfwd(so3.expmap)(jnp.zeros(3))
        # dR/dw at 0 is the hat-map generators
        for i in range(3):
            e = np.zeros(3); e[i] = 1.0
            np.testing.assert_allclose(np.array(J[..., i]), np.array(so3.hat(jnp.array(e))), atol=1e-12)


class TestSE3:
    def test_exp_log_roundtrip(self):
        for i in range(20):
            xi = np.array(jax.random.normal(jax.random.PRNGKey(100 + i), (6,)))
            if np.linalg.norm(xi[:3]) > 3.0:
                xi[:3] *= 3.0 / np.linalg.norm(xi[:3])
            T = se3.expmap(jnp.array(xi))
            xi2 = np.array(se3.logmap(T))
            np.testing.assert_allclose(xi2, xi, atol=1e-9)

    def test_compose_inverse(self):
        a, b = rand_se3(jax.random.PRNGKey(5)), rand_se3(jax.random.PRNGKey(6))
        ab = se3.compose(a, b)
        np.testing.assert_allclose(np.array(se3.compose(ab, se3.inverse(ab))), np.eye(3, 4), atol=1e-12)
        np.testing.assert_allclose(np.array(se3.between(a, ab)), np.array(b), atol=1e-12)

    def test_transform(self):
        T = rand_se3(jax.random.PRNGKey(9))
        p = jnp.array([1.0, -2.0, 0.5])
        q = se3.transform_from(T, p)
        np.testing.assert_allclose(np.array(se3.transform_to(T, q)), np.array(p), atol=1e-12)

    def test_adjoint(self):
        # Adjoint identity: T Exp(xi) T^{-1} = Exp(Ad_T xi)
        T = rand_se3(jax.random.PRNGKey(11))
        xi = jnp.array([0.01, -0.02, 0.03, 0.1, -0.05, 0.2])
        lhs = se3.compose(se3.compose(T, se3.expmap(xi)), se3.inverse(T))
        rhs = se3.expmap(se3.adjoint(T) @ xi)
        np.testing.assert_allclose(np.array(lhs), np.array(rhs), atol=1e-9)

    def test_retract_jacobian_finite(self):
        T = rand_se3(jax.random.PRNGKey(13))
        f = lambda xi: se3.transform_from(se3.retract(T, xi), jnp.array([1.0, 2.0, 3.0]))
        J = jax.jacfwd(f)(jnp.zeros(6))
        # compare against central differences
        from gtsam_personal_tpu.testing.numerical import numerical_jacobian
        Jn = numerical_jacobian(lambda x: np.array(f(jnp.array(x))), np.zeros(6))
        np.testing.assert_allclose(np.array(J), Jn, atol=1e-7)


class TestSE2:
    def test_exp_log_roundtrip(self):
        for i in range(20):
            xi = np.array(jax.random.normal(jax.random.PRNGKey(200 + i), (3,)))
            xi[2] = np.clip(xi[2], -3.0, 3.0)
            p = se2.expmap(jnp.array(xi))
            np.testing.assert_allclose(np.array(se2.logmap(p)), xi, atol=1e-10)

    def test_compose_between(self):
        a, b = rand_se2(jax.random.PRNGKey(1)), rand_se2(jax.random.PRNGKey(2))
        ab = se2.compose(a, b)
        d = se2.between(a, ab)
        np.testing.assert_allclose(np.array(se2.logmap(d)), np.array(se2.logmap(b)), atol=1e-10)

    def test_transform(self):
        p = rand_se2(jax.random.PRNGKey(4))
        pt = jnp.array([0.7, -1.3])
        np.testing.assert_allclose(
            np.array(se2.transform_to(p, se2.transform_from(p, pt))), np.array(pt), atol=1e-12)

    def test_zero_rotation_expmap(self):
        xi = jnp.array([1.0, 2.0, 0.0])
        p = se2.expmap(xi)
        np.testing.assert_allclose(np.array(p), [1.0, 2.0, 0.0], atol=1e-12)

    def test_bearing_range(self):
        p = jnp.array([1.0, 1.0, np.pi / 2])
        pt = jnp.array([1.0, 3.0])
        np.testing.assert_allclose(float(se2.bearing(p, pt)), 0.0, atol=1e-12)
        np.testing.assert_allclose(float(se2.range_to(p, pt)), 2.0, atol=1e-12)


class TestManifoldRegistry:
    @pytest.mark.parametrize("name", ["so2", "se2", "so3", "se3", "point3", "r6"])
    def test_retract_local_roundtrip(self, name):
        m = manifolds.get(name)
        x = m.identity(jnp.float64)
        delta = jnp.arange(1, m.dim + 1, dtype=jnp.float64) * 0.1
        y = m.retract(x, delta)
        np.testing.assert_allclose(np.array(m.local(x, y)), np.array(delta), atol=1e-9)

    def test_batched(self):
        m = manifolds.SE3
        xs = jax.vmap(lambda k: rand_se3(k))(jax.random.split(KEY, 5))
        deltas = jax.random.normal(jax.random.PRNGKey(77), (5, 6), dtype=jnp.float64) * 0.1
        ys = manifolds.batched_retract(m, xs, deltas)
        back = manifolds.batched_local(m, xs, ys)
        np.testing.assert_allclose(np.array(back), np.array(deltas), atol=1e-9)


class TestExtraGeometry:
    def test_line3_retract_local(self):
        from gtsam_personal_tpu.geometry import extra
        l = extra.LINE3.identity(jnp.float64)
        xi = jnp.array([0.1, -0.2, 0.5, 0.3])
        l2 = extra.line3_retract(l, xi)
        np.testing.assert_allclose(np.asarray(extra.line3_local(l, l2)),
                                   np.asarray(xi), atol=1e-9)

    def test_spherical_camera(self):
        from gtsam_personal_tpu.geometry import extra, se3 as se3m
        pose = se3m.expmap(jnp.asarray([0.1, 0.2, -0.1, 1.0, 2.0, 3.0]))
        point = jnp.asarray([0.5, -1.0, 4.0])
        bearing = extra.spherical_project(pose, point)
        np.testing.assert_allclose(float(jnp.linalg.norm(bearing)), 1.0, atol=1e-12)
        err = extra.spherical_reprojection_error(pose, point, bearing)
        np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-12)

    def test_unit3_roundtrip(self):
        from gtsam_personal_tpu.geometry import extra
        n = jnp.asarray([0.0, 0.0, 1.0])
        xi = jnp.asarray([0.3, -0.2])
        m = extra.unit3_retract(n, xi)
        np.testing.assert_allclose(np.asarray(extra.unit3_local(n, m)),
                                   np.asarray(xi), atol=1e-9)

    def test_sim3_group(self):
        from gtsam_personal_tpu.geometry import extra
        xi = jnp.asarray([0.1, -0.2, 0.3, 1.0, 2.0, -1.0, 0.2])
        g = extra.sim3_expmap(xi)
        np.testing.assert_allclose(np.asarray(extra.sim3_logmap(g)),
                                   np.asarray(xi), atol=1e-9)
        ginv = extra.sim3_inverse(g)
        ident = extra.sim3_compose(g, ginv)
        np.testing.assert_allclose(np.asarray(extra.sim3_R(ident)), np.eye(3), atol=1e-12)
        np.testing.assert_allclose(float(extra.sim3_s(ident)), 1.0, atol=1e-12)
