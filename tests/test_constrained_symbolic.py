"""Constrained optimization (penalty/augmented Lagrangian), symbolic
elimination, iteration hook, retract_masked, k-best tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.core.graph import FactorBatch, FactorGraph, GraphBuilder
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.geometry import se2
from gtsam_personal_tpu.inference.symbolic import SymbolicFactorGraph
from gtsam_personal_tpu.linear.noise import NoiseModel
from gtsam_personal_tpu.nonlinear import optimizers, constrained
from gtsam_personal_tpu.discrete.discrete import DiscreteFactorGraph
from gtsam_personal_tpu.slam import factors as F


class TestConstrained:
    def _setup(self):
        """min ||x - (2,0,0)||^2 s.t. x_y = 1 (constraint on the se2 y)."""
        b = GraphBuilder()
        F.add_prior(b, "se2", 0, np.array([2.0, 0.0, 0.0]),
                    F.diag_noise([1.0, 1.0, 1.0]))
        graph = b.build()

        def c_res(xs, meas):
            return jnp.atleast_1d(xs[0][1] - 1.0)

        con = FactorBatch("c_y", c_res, ("se2",), 1,
                          jnp.zeros((1, 1), dtype=jnp.int32),
                          {"dummy": jnp.zeros((1, 1))}, NoiseModel("unit"))
        init = Values({"se2": jnp.zeros((1, 3))})
        return graph, con, init

    def test_penalty(self):
        graph, con, init = self._setup()
        vals, res = constrained.optimize_penalty(graph, init, [con])
        x = np.asarray(vals["se2"][0])
        assert abs(x[1] - 1.0) < 1e-4    # feasible
        assert abs(x[0] - 2.0) < 1e-3    # objective optimum in x

    def test_augmented_lagrangian(self):
        graph, con, init = self._setup()
        vals, res = constrained.optimize_augmented_lagrangian(graph, init, [con])
        x = np.asarray(vals["se2"][0])
        assert abs(x[1] - 1.0) < 1e-6    # AL reaches tighter feasibility
        assert abs(x[0] - 2.0) < 1e-3

    def test_nonlinear_equality(self):
        graph, con, init = self._setup()
        eq = constrained.nonlinear_equality("se2", 0, np.array([5.0, 1.0, 0.2]))
        res = optimizers.optimize_lm(FactorGraph(list(graph.batches) + [eq]), init)
        np.testing.assert_allclose(np.asarray(res.values["se2"][0]),
                                   [5.0, 1.0, 0.2], atol=1e-3)


class TestSymbolic:
    def test_chain_elimination_structure(self):
        g = SymbolicFactorGraph([[0, 1], [1, 2], [2, 3]])
        bn, fill = g.eliminate([0, 1, 2, 3])
        assert bn.parents(0) == frozenset({1})
        assert bn.parents(1) == frozenset({2})
        assert bn.parents(3) == frozenset()
        assert fill == 0  # chains are fill-free

    def test_fill_depends_on_ordering(self):
        # star graph: center 0 connected to 1..4; eliminating center first
        # creates a clique of the leaves (fill), leaves-first creates none
        g = SymbolicFactorGraph([[0, 1], [0, 2], [0, 3], [0, 4]])
        _, fill_center_first = g.eliminate([0, 1, 2, 3, 4])
        _, fill_leaves_first = g.eliminate([1, 2, 3, 4, 0])
        assert fill_center_first > fill_leaves_first

    def test_default_ordering_low_fill(self):
        g = SymbolicFactorGraph([[0, 1], [0, 2], [0, 3], [0, 4], [1, 2], [3, 4]])
        order = g.default_ordering()
        assert sorted(order) == [0, 1, 2, 3, 4]
        _, fill = g.eliminate(order)
        _, fill_nat = g.eliminate([0, 1, 2, 3, 4])
        assert fill <= fill_nat


class TestMiscApi:
    def test_iteration_hook(self):
        from tests.test_pose2slam import build_example
        graph, initial, _ = build_example()
        calls = []
        params = optimizers.Params(
            iteration_hook=lambda it, e0, e1: calls.append((it, e0, e1)))
        optimizers.optimize_lm(graph, initial, params)
        assert len(calls) >= 1
        assert calls[0][1] > calls[0][2]  # error decreased

    def test_retract_masked(self):
        vals = Values({"se2": jnp.zeros((3, 3))})
        tangent = {"se2": jnp.ones((3, 3))}
        mask = {"se2": jnp.asarray([True, False, True])}
        out = vals.retract_masked(tangent, mask)
        moved = np.asarray(out["se2"])
        assert np.abs(moved[0]).sum() > 0
        np.testing.assert_allclose(moved[1], 0.0)

    def test_k_best(self):
        g = DiscreteFactorGraph()
        g.add((0,), [0.4, 0.6])
        g.add((0, 1), [[0.9, 0.1], [0.2, 0.8]])
        top2 = g.k_best(2)
        assert len(top2) == 2
        assert top2[0][1] >= top2[1][1]
        assert top2[0][0] == g.optimize()
