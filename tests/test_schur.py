"""Partitioned Schur elimination vs dense ground truth — the correctness
anchor of the TPU-native sparse direct path (analogue of the reference's
elimination tests, gtsam/linear/tests/testGaussianFactorGraph.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.core.values import Layout
from gtsam_personal_tpu.inference import partition as part_mod
from gtsam_personal_tpu.linear import schur, solvers
from gtsam_personal_tpu.linear.linearize import linearize
from gtsam_personal_tpu.nonlinear import optimizers
from gtsam_personal_tpu.slam import dataset


@pytest.fixture(scope="module")
def w100():
    return dataset.load_2d(dataset.find_example_data("w100.graph"))


def test_partition_covers_all_vars(w100):
    graph, initial = w100
    part = part_mod.partition_graph(graph, initial.counts(), max_part_size=16)
    n = part.vi.num_vars
    seen = np.concatenate([*part.parts, part.separator])
    assert np.array_equal(np.sort(seen), np.arange(n))
    assert part.num_parts >= 2
    # vertex separator property: no factor spans two interiors
    schur.SchurPlan(graph, initial.counts(), part)  # raises if violated


@pytest.mark.parametrize("lam", [0.0, 0.1])
def test_schur_matches_dense(w100, lam):
    graph, initial = w100
    lin = linearize(graph, initial)
    layout = Layout.of(initial)
    plan = schur.make_plan(graph, initial.counts(), max_part_size=16)
    d_dense = solvers.solve_dense(lin, layout, lam=lam)
    d_schur = schur.solve_partitioned(lin, plan, lam=lam)
    np.testing.assert_allclose(np.array(layout.flatten(d_schur)),
                               np.array(layout.flatten(d_dense)), atol=1e-8)


def test_lm_with_schur_solver(w100):
    graph, initial = w100
    plan = schur.make_plan(graph, initial.counts(), max_part_size=16)
    res = optimizers.optimize_lm(graph, initial,
                                 optimizers.Params(solver="schur"), plan=plan)
    res_dense = optimizers.optimize_lm(graph, initial, optimizers.Params(solver="dense"))
    assert res.converged
    np.testing.assert_allclose(res.error, res_dense.error, rtol=1e-6)


def test_single_part_no_separator():
    """Small graph fits in one part: pure batched dense, S_dim == 0."""
    graph, initial = dataset.load_2d(dataset.find_example_data("w100.graph"))
    plan = schur.make_plan(graph, initial.counts(), max_part_size=1000)
    assert plan.S_dim == 0 and plan.p == 1
    lin = linearize(graph, initial)
    layout = Layout.of(initial)
    d_dense = solvers.solve_dense(lin, layout)
    d_schur = schur.solve_partitioned(lin, plan)
    np.testing.assert_allclose(np.array(layout.flatten(d_schur)),
                               np.array(layout.flatten(d_dense)), atol=1e-8)
