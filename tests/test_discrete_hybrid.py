"""Discrete + hybrid inference tests (reference:
gtsam/discrete/tests/testDiscreteFactorGraph.cpp, hybrid tests)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.discrete.discrete import (DiscreteFactorGraph, cpt,
                                                  DiscreteFactor)
from gtsam_personal_tpu.hybrid.hybrid import (HybridFactor, HybridFactorGraph)
from gtsam_personal_tpu.core.graph import FactorBatch, GraphBuilder
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.linear.noise import NoiseModel
from gtsam_personal_tpu.slam import factors as F


class TestDiscrete:
    def test_mpe_simple_chain(self):
        """A -> B chain: check MPE matches brute force."""
        g = DiscreteFactorGraph()
        g.add((0,), [0.4, 0.6])
        g.add((0, 1), [[0.9, 0.1], [0.2, 0.8]])
        mpe = g.optimize()
        # brute force
        best, best_p = None, -1
        for a in range(2):
            for b in range(2):
                p = g.evaluate({0: a, 1: b})
                if p > best_p:
                    best, best_p = {0: a, 1: b}, p
        assert mpe == best

    def test_marginal_matches_brute_force(self):
        g = DiscreteFactorGraph()
        g.add((0,), [0.3, 0.7])
        g.add((0, 1), [[0.9, 0.1], [0.4, 0.6]])
        g.add((1, 2), [[0.5, 0.5], [0.1, 0.9]])
        m = np.asarray(g.marginal(2))
        brute = np.zeros(2)
        for a in range(2):
            for b in range(2):
                for c in range(2):
                    brute[c] += g.evaluate({0: a, 1: b, 2: c})
        brute /= brute.sum()
        np.testing.assert_allclose(m, brute, atol=1e-10)

    def test_sum_elimination_gives_normalized_conditionals(self):
        g = DiscreteFactorGraph()
        g.add((0, 1), [[2.0, 1.0], [1.0, 3.0]])
        bn, rem = g.eliminate([0], mode="sum")
        t = np.asarray(bn.conditionals[0].table)
        np.testing.assert_allclose(t.sum(axis=0), 1.0, atol=1e-12)

    def test_cpt_builder(self):
        c = cpt(1, [0], [[1, 2], [2, 1]], cards=[2])
        # P(B=0 | A=0) = 1/3
        np.testing.assert_allclose(float(c.table[0, 0]), 1.0 / 3, atol=1e-12)

    def test_sampling(self):
        import jax
        g = DiscreteFactorGraph()
        g.add((0,), [0.2, 0.8])
        bn, _ = g.eliminate([0])
        counts = [0, 0]
        key = jax.random.PRNGKey(0)
        for i in range(200):
            key, sub = jax.random.split(key)
            counts[bn.sample(sub)[0]] += 1
        assert counts[1] > counts[0]


class TestHybrid:
    def test_mode_estimation(self):
        """Switching measurement: a pose measured either near 0 (mode 0) or
        near 2 (mode 1); true position 2 => posterior should pick mode 1
        (reference: hybrid mode-estimation examples)."""
        hg = HybridFactorGraph()

        b = GraphBuilder()
        F.add_prior(b, "se2", 0, np.array([2.0, 0.0, 0.0]),
                    F.diag_noise([0.5, 0.5, 0.5]))
        hg.add_continuous(b.build().batches[0])

        prior_modes = np.stack([np.array([0.0, 0.0, 0.0]),
                                np.array([2.0, 0.0, 0.0])])
        batch = FactorBatch(
            "prior_se2_mode", F.make_prior_residual("se2"), ("se2",), 3,
            jnp.zeros((1, 1), dtype=jnp.int32),
            {"prior": jnp.asarray(prior_modes[:, None, :])},
            NoiseModel("diag", jnp.full((1, 3), 10.0)))
        hg.add_hybrid(HybridFactor(batch, mode_var=100, num_modes=2))
        hg.add_discrete_prior(100, [0.5, 0.5])

        initial = Values({"se2": jnp.asarray([[1.0, 0.0, 0.0]])})
        values, best, posterior = hg.solve(initial)
        assert best[100] == 1
        probs = dict(posterior)
        assert probs[((100, 1),)] > 0.99

    def test_pruning(self):
        hg = HybridFactorGraph()
        b = GraphBuilder()
        F.add_prior(b, "se2", 0, np.zeros(3), F.diag_noise([1.0, 1.0, 1.0]))
        hg.add_continuous(b.build().batches[0])
        prior_modes = np.stack([np.zeros(3), np.array([5.0, 0, 0]),
                                np.array([10.0, 0, 0])])
        batch = FactorBatch(
            "prior_se2_mode3", F.make_prior_residual("se2"), ("se2",), 3,
            jnp.zeros((1, 1), dtype=jnp.int32),
            {"prior": jnp.asarray(prior_modes[:, None, :])},
            NoiseModel("diag", jnp.full((1, 3), 5.0)))
        hg.add_hybrid(HybridFactor(batch, mode_var=7, num_modes=3))
        initial = Values({"se2": jnp.zeros((1, 3))})
        _, best, posterior = hg.solve(initial, prune_to=2)
        assert len(posterior) == 2
        assert best[7] == 0
