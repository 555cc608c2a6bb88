"""Feature-major linear layer (linear/fm.py) == [K, r, d] path, exactly.

The fm layout is a pure re-layout of the same math; every product must match
the reference-path GaussianGraph to fp64 roundoff on real datasets.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.linear import fm
from gtsam_personal_tpu.linear.linearize import linearize
from gtsam_personal_tpu.linear import solvers
from gtsam_personal_tpu.nonlinear import optimizers
from gtsam_personal_tpu.slam import dataset


@pytest.fixture(scope="module")
def w100():
    graph, initial = dataset.load_2d(
        dataset.find_example_data("w100.graph"))
    return graph, initial


def _rand_tangent(counts, dims, seed=0):
    rng = np.random.default_rng(seed)
    return {g: jnp.asarray(rng.standard_normal((n, dims[g])))
            for g, n in counts.items()}


def test_fm_matches_batch_path(w100):
    graph, initial = w100
    lin = linearize(graph, initial)
    linf = fm.linearize_fm(graph, initial)

    # whitened residuals and Jacobian blocks identical
    for b, bf in zip(lin.batches, linf.batches):
        np.testing.assert_allclose(np.asarray(bf.r), np.asarray(b.r).T,
                                   rtol=0, atol=1e-12)
        K = b.r.shape[0]
        for s in range(len(b.groups)):
            rdim, d = b.Js[s].shape[1], b.Js[s].shape[2]
            np.testing.assert_allclose(
                np.asarray(bf.Js[s]),
                np.asarray(b.Js[s]).transpose(1, 2, 0).reshape(rdim * d, K),
                rtol=0, atol=1e-12)

    # gradient, hvp, hessian diagonal, block diagonal
    g_ref = lin.gradient_at_zero()
    g_fm = fm.tangent_from_fm(linf.gradient_at_zero())
    for g in g_ref:
        np.testing.assert_allclose(np.asarray(g_fm[g]), np.asarray(g_ref[g]),
                                   rtol=1e-12, atol=1e-12)

    dims = {g: g_ref[g].shape[1] for g in g_ref}
    x = _rand_tangent(lin.counts, dims)
    hx_ref = lin.hessian_vector_product(x)
    hx_fm = fm.tangent_from_fm(
        linf.hessian_vector_product(fm.tangent_to_fm(x)))
    for g in hx_ref:
        np.testing.assert_allclose(np.asarray(hx_fm[g]), np.asarray(hx_ref[g]),
                                   rtol=1e-10, atol=1e-10)

    hd_ref = lin.hessian_diagonal()
    hd_fm = fm.tangent_from_fm(linf.hessian_diagonal())
    for g in hd_ref:
        np.testing.assert_allclose(np.asarray(hd_fm[g]), np.asarray(hd_ref[g]),
                                   rtol=1e-10, atol=1e-12)

    bd_ref = lin.hessian_block_diagonal()
    bd_fm = linf.hessian_block_diagonal()
    for g in bd_ref:
        N, d, _ = bd_ref[g].shape
        np.testing.assert_allclose(
            np.asarray(bd_fm[g]),
            np.asarray(bd_ref[g]).reshape(N, d * d).T,
            rtol=1e-10, atol=1e-12)


def test_fm_pcg_solve_matches(w100):
    graph, initial = w100
    lin = linearize(graph, initial)
    linf = fm.linearize_fm(graph, initial)
    d_ref = solvers.solve_pcg(lin, lam=1e-3, maxiter=400, tol=1e-12)
    d_fm = fm.solve_pcg_fm(linf, lam=1e-3, maxiter=400, tol=1e-12)
    for g in d_ref:
        np.testing.assert_allclose(np.asarray(d_fm[g]), np.asarray(d_ref[g]),
                                   rtol=1e-6, atol=1e-8)


def test_fm_schur_solve_matches(w100):
    graph, initial = w100
    from gtsam_personal_tpu.linear import schur
    plan = schur.make_plan(graph, initial.counts(), max_part_size=32)
    lin = linearize(graph, initial)
    linf = fm.linearize_fm(graph, initial)
    d_ref = schur.solve_partitioned(lin, plan, lam=1e-3)
    d_fm = schur.solve_partitioned(linf, plan, lam=1e-3)
    for g in d_ref:
        np.testing.assert_allclose(np.asarray(d_fm[g]), np.asarray(d_ref[g]),
                                   rtol=1e-8, atol=1e-10)


def test_fm_lm_reaches_same_fixed_point(w100):
    graph, initial = w100
    p_ref = optimizers.Params(solver="pcg", pcg_maxiter=300, max_iterations=15)
    p_fm = optimizers.Params(solver="pcg", pcg_maxiter=300, max_iterations=15,
                             fm=True)
    r_ref = optimizers.optimize_lm(graph, initial, p_ref)
    r_fm = optimizers.optimize_lm(graph, initial, p_fm)
    assert abs(r_fm.error - r_ref.error) < 1e-4 * max(1.0, r_ref.error)
    # w100 golden fixed point (verify skill): 0.5689
    assert abs(r_fm.error - 0.568927) < 1e-2


def test_fm_se3_with_full_noise():
    """SE(3) batch with full sqrt-info noise + robust loss: fm == batch."""
    graph, initial = dataset.load_3d(
        dataset.find_example_data("pose3example.txt"))
    lin = linearize(graph, initial)
    linf = fm.linearize_fm(graph, initial)
    g_ref = lin.gradient_at_zero()
    g_fm = fm.tangent_from_fm(linf.gradient_at_zero())
    for g in g_ref:
        np.testing.assert_allclose(np.asarray(g_fm[g]), np.asarray(g_ref[g]),
                                   rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(float(linf.error_at_zero()),
                               float(lin.error_at_zero()), rtol=1e-12)
