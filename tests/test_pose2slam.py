"""End-to-end parity test: the reference's canonical 5-pose Pose2 SLAM example
(examples/Pose2SLAMExample.cpp:66) — prior + odometry + loop closure, exact
measurements, so the global optimum is the exact square with zero error.
Also validates the linear layer: Jacobians vs finite differences, Hessian
matvec vs dense assembly, PCG vs dense solve."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.core.graph import GraphBuilder
from gtsam_personal_tpu.core.values import Layout, Values, tree_vdot
from gtsam_personal_tpu.linear.linearize import linearize
from gtsam_personal_tpu.linear import solvers
from gtsam_personal_tpu.nonlinear import optimizers
from gtsam_personal_tpu.slam import factors
from gtsam_personal_tpu.geometry import se2


def build_example():
    """The reference 5-pose example (Pose2SLAMExample.cpp), 0-based keys."""
    b = GraphBuilder()
    prior_noise = factors.diag_noise([0.3, 0.3, 0.1])
    odo_noise = factors.diag_noise([0.2, 0.2, 0.1])
    factors.add_prior(b, "se2", 0, np.zeros(3), prior_noise)
    factors.add_between(b, "se2", 0, 1, np.array([2.0, 0.0, 0.0]), odo_noise)
    for i in (1, 2, 3):
        factors.add_between(b, "se2", i, i + 1, np.array([2.0, 0.0, np.pi / 2]), odo_noise)
    factors.add_between(b, "se2", 4, 1, np.array([2.0, 0.0, np.pi / 2]), odo_noise)
    graph = b.build()

    initial = Values({"se2": jnp.array([
        [0.5, 0.0, 0.2],
        [2.3, 0.1, -0.2],
        [4.1, 0.1, np.pi / 2],
        [4.0, 2.0, np.pi],
        [2.1, 2.1, -np.pi / 2],
    ])})
    expected = np.array([
        [0.0, 0.0, 0.0],
        [2.0, 0.0, 0.0],
        [4.0, 0.0, np.pi / 2],
        [4.0, 2.0, np.pi],
        [2.0, 2.0, -np.pi / 2],
    ])
    return graph, initial, expected


def assert_poses_close(actual, expected, atol=1e-6):
    actual = np.asarray(actual)
    np.testing.assert_allclose(actual[:, :2], expected[:, :2], atol=atol)
    dtheta = np.arctan2(np.sin(actual[:, 2] - expected[:, 2]),
                        np.cos(actual[:, 2] - expected[:, 2]))
    np.testing.assert_allclose(dtheta, 0.0, atol=atol)


class TestLinearLayer:
    def test_jacobians_vs_fd(self):
        graph, initial, _ = build_example()
        lin = linearize(graph, initial)
        # numerically perturb the full tangent and compare J*delta to residual change
        layout = Layout.of(initial)
        rng = np.random.default_rng(0)
        d = rng.normal(size=layout.total_dim) * 1e-6
        delta = layout.unflatten(jnp.asarray(d))
        r0 = jnp.concatenate([b.r.reshape(-1) for b in lin.batches])
        vals2 = initial.retract(delta)
        lin2 = linearize(graph, vals2)
        r1 = jnp.concatenate([b.r.reshape(-1) for b in lin2.batches])
        Jd = jnp.concatenate([u.reshape(-1) for u in lin.apply_J(delta)])
        np.testing.assert_allclose(np.array(r1 - r0), np.array(Jd), atol=1e-10)

    def test_hvp_matches_dense(self):
        graph, initial, _ = build_example()
        lin = linearize(graph, initial)
        layout = Layout.of(initial)
        H, g = lin.assemble_dense(layout)
        rng = np.random.default_rng(1)
        x = rng.normal(size=layout.total_dim)
        hx = lin.hessian_vector_product(layout.unflatten(jnp.asarray(x)))
        np.testing.assert_allclose(np.array(layout.flatten(hx)), np.array(H) @ x, atol=1e-10)
        # gradient
        gd = lin.gradient_at_zero()
        np.testing.assert_allclose(np.array(layout.flatten(gd)), np.array(g), atol=1e-10)
        # hessian diagonal
        hd = lin.hessian_diagonal()
        np.testing.assert_allclose(np.array(layout.flatten(hd)), np.diag(np.array(H)), atol=1e-10)

    def test_pcg_matches_dense(self):
        graph, initial, _ = build_example()
        lin = linearize(graph, initial)
        layout = Layout.of(initial)
        d_dense = solvers.solve_dense(lin, layout)
        d_pcg = solvers.solve_pcg(lin, maxiter=200, tol=1e-12)
        np.testing.assert_allclose(np.array(layout.flatten(d_pcg)),
                                   np.array(layout.flatten(d_dense)), atol=1e-8)


class TestPose2SLAM:
    def test_gauss_newton(self):
        graph, initial, expected = build_example()
        res = optimizers.optimize_gn(graph, initial)
        assert res.converged
        assert res.error < 1e-10
        assert_poses_close(res.values["se2"], expected)

    def test_levenberg_marquardt(self):
        graph, initial, expected = build_example()
        res = optimizers.optimize_lm(graph, initial)
        assert res.converged
        assert res.error < 1e-10
        assert_poses_close(res.values["se2"], expected)

    def test_lm_pcg(self):
        graph, initial, expected = build_example()
        res = optimizers.optimize_lm(graph, initial,
                                     optimizers.Params(solver="pcg", pcg_tol=1e-12))
        assert res.error < 1e-8
        assert_poses_close(res.values["se2"], expected, atol=1e-4)

    def test_lm_fully_jitted(self):
        graph, initial, expected = build_example()
        values, err, it = optimizers.optimize_lm_jit(graph, initial)
        assert float(err) < 1e-9
        assert_poses_close(values["se2"], expected, atol=1e-5)

    def test_lm_run_scan(self):
        """Single-dispatch LM scan (accept/reject + reject-try linearization
        caching) reaches the same optimum as the host-loop driver."""
        graph, initial, expected = build_example()
        err0 = optimizers.graph_error(graph, initial)
        lam0 = jnp.asarray(1e-5, dtype=err0.dtype)
        v, lam, err = optimizers.lm_run(graph, initial, lam0, err0,
                                        n_iters=12)
        assert float(err) < 1e-9
        assert_poses_close(v["se2"], expected, atol=1e-5)
        # schur solver route through the same scan
        from gtsam_personal_tpu.linear import schur
        plan = schur.make_plan(graph, {"se2": 5}, max_part_size=3)
        v2, _, err2 = optimizers.lm_run(
            graph, initial, lam0, err0, n_iters=12,
            params=optimizers.Params(solver="schur"), plan=plan)
        assert float(err2) < 1e-9
        assert_poses_close(v2["se2"], expected, atol=1e-5)

    def test_lm_carry_checkpoint_resume(self, tmp_path):
        """Kill/resume mid-run: 6 scan iterations + checkpoint + 6 more
        equals one uninterrupted 12-iteration run exactly (the restored
        first iteration relinearizes at the restored values — bitwise the
        cached carry content)."""
        from gtsam_personal_tpu.utils.serialization import (load_lm_carry,
                                                            save_lm_carry)
        graph, initial, expected = build_example()
        err0 = optimizers.graph_error(graph, initial)
        lam0 = jnp.asarray(1e-5, dtype=err0.dtype)
        v_all, lam_all, err_all = optimizers.lm_run(graph, initial, lam0,
                                                    err0, n_iters=12)
        v6, lam6, err6 = optimizers.lm_run(graph, initial, lam0, err0,
                                           n_iters=6)
        ck = str(tmp_path / "carry.npz")
        save_lm_carry(ck, v6, lam6, err6)
        vr, lamr, errr = load_lm_carry(ck)
        v_res, _, err_res = optimizers.lm_run(graph, vr, lamr, errr,
                                              n_iters=6)
        np.testing.assert_allclose(float(err_res), float(err_all),
                                   rtol=1e-12, atol=1e-300)
        np.testing.assert_allclose(np.asarray(v_res["se2"]),
                                   np.asarray(v_all["se2"]), atol=1e-12)

    def test_graph_error_at_truth_zero(self):
        graph, initial, expected = build_example()
        truth = Values({"se2": jnp.asarray(expected)})
        assert float(optimizers.graph_error(graph, truth)) < 1e-20
