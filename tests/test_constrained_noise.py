"""Constrained noise models + exact equality-constrained solve.

Mirrors /root/reference/gtsam/linear/tests/testNoiseModel.cpp
(ConstrainedMixed, ConstrainedAll) and the constrained-QR capability
(NoiseModel::Constrained::QR) via the nullspace method.
"""

import numpy as np
import jax.numpy as jnp

from gtsam_personal_tpu.core.graph import GraphBuilder, FactorBatch, FactorGraph
from gtsam_personal_tpu.core.values import Layout, Values
from gtsam_personal_tpu.linear import conditional as C
from gtsam_personal_tpu.linear import noise as nz
from gtsam_personal_tpu.linear import solvers
from gtsam_personal_tpu.linear.linearize import linearize

KSIGMA = 2.0


def test_constrained_mixed_whiten_and_loss():
    """testNoiseModel.cpp TEST(NoiseModel, ConstrainedMixed)."""
    feasible = jnp.asarray([1.0, 0.0, 1.0])
    infeasible = jnp.asarray([1.0, 1.0, 1.0])
    d = nz.constrained_sigmas([KSIGMA, 0.0, KSIGMA])
    # whitening passes constrained rows through raw
    np.testing.assert_allclose(
        np.asarray(nz.whiten_residual(d, infeasible)), [0.5, 1.0, 0.5])
    np.testing.assert_allclose(
        np.asarray(nz.whiten_residual(d, feasible)), [0.5, 0.0, 0.5])
    # error = 0.5 * (mu * c^2 + soft whitened^2)
    np.testing.assert_allclose(
        float(nz.error(d, infeasible[None])), 0.5 * (1000.0 + 0.25 + 0.25),
        rtol=1e-9)
    np.testing.assert_allclose(
        float(nz.error(d, feasible[None])), 0.5 * 0.5, rtol=1e-9)


def test_constrained_all_whiten():
    """testNoiseModel.cpp TEST(NoiseModel, ConstrainedAll)."""
    v = jnp.asarray([1.0, 2.0, 3.0])
    m = nz.constrained_all(3)
    np.testing.assert_allclose(np.asarray(nz.whiten_residual(m, v)),
                               np.asarray(v))
    np.testing.assert_allclose(float(nz.error(m, v[None])),
                               0.5 * 1000.0 * 14.0, rtol=1e-9)


def _toy_constrained_graph():
    """Two r2 variables; soft prior pulls x0 to (1,1) and x1 to (-1,0);
    a between-factor constrains (x1 - x0)[0] == 3 EXACTLY, softly [1] == 0."""
    def prior(xs, meas):
        (x,) = xs
        return x - meas["p"]

    def between(xs, meas):
        a, b = xs
        return (b - a) - meas["m"]

    gb_batches = [
        FactorBatch("prior0", prior, ("r2",), 2,
                    jnp.asarray([[0]], dtype=jnp.int32),
                    {"p": jnp.asarray([[1.0, 1.0]])},
                    nz.NoiseModel("diag", jnp.asarray([2.0, 2.0]))),
        FactorBatch("prior1", prior, ("r2",), 2,
                    jnp.asarray([[1]], dtype=jnp.int32),
                    {"p": jnp.asarray([[-1.0, 0.0]])},
                    nz.NoiseModel("diag", jnp.asarray([2.0, 2.0]))),
        FactorBatch("between01", between, ("r2", "r2"), 2,
                    jnp.asarray([[0, 1]], dtype=jnp.int32),
                    {"m": jnp.asarray([[3.0, 0.0]])},
                    nz.constrained_sigmas([0.0, 0.5])),
    ]
    graph = FactorGraph(gb_batches)
    values = Values({"r2": jnp.zeros((2, 2))})
    return graph, values


def test_exact_equality_constrained_solve():
    graph, values = _toy_constrained_graph()
    layout = Layout.of(values)
    lin, E, e = C.split_constrained(graph, values, layout)
    assert E.shape == (1, 4)
    delta = C.solve_equality_constrained(lin, layout, E, e)
    x = np.asarray(layout.flatten(delta)).reshape(2, 2)
    # constraint satisfied EXACTLY
    np.testing.assert_allclose(x[1, 0] - x[0, 0], 3.0, atol=1e-12)
    # compare with the analytic solution: minimize
    # ||x0-(1,1)||^2/4... equal prior weights -> x0+x1 symmetric around
    # midpoint; x1-x0 fixed at (3, soft). First coordinate: priors want
    # x0=1, x1=-1 (midpoint 0); constraint x1-x0=3 -> x0=-1.5, x1=1.5.
    np.testing.assert_allclose(x[0, 0], -1.5, atol=1e-9)
    np.testing.assert_allclose(x[1, 0], 1.5, atol=1e-9)


def test_penalty_solution_approaches_exact():
    """The generic-solver penalty form converges to the exact constrained
    solution as mu grows (and is already close at the reference mu=1000)."""
    graph, values = _toy_constrained_graph()
    layout = Layout.of(values)
    lin, E, e = C.split_constrained(graph, values, layout)
    exact = np.asarray(layout.flatten(
        C.solve_equality_constrained(lin, layout, E, e)))
    lin_pen = linearize(graph, values)
    pen = np.asarray(layout.flatten(solvers.solve_dense(lin_pen, layout)))
    assert np.max(np.abs(pen - exact)) < 1e-2
    # with a bigger mu the gap shrinks
    g2, v2 = _toy_constrained_graph()
    g2.batches[2].noise.k = jnp.asarray(1e8)
    lin_pen2 = linearize(g2, v2)
    pen2 = np.asarray(layout.flatten(solvers.solve_dense(lin_pen2, layout)))
    assert np.max(np.abs(pen2 - exact)) < 1e-6
