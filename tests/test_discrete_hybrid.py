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


class TestHybridSmoother:
    def test_incremental_matches_batch(self):
        """Stream an SE(2) chain with two ambiguous loop closures through
        HybridSmoother; the pruned incremental posterior must pick the same
        mode assignment as batch enumerate-and-solve (reference:
        Hybrid_City10000.cpp driving HybridSmoother)."""
        import numpy as np
        import jax.numpy as jnp
        from gtsam_personal_tpu.core.graph import GraphBuilder
        from gtsam_personal_tpu.core.values import Values
        from gtsam_personal_tpu.geometry import se2
        from gtsam_personal_tpu.hybrid.hybrid import (HybridFactor,
                                                      HybridFactorGraph,
                                                      HybridSmoother)
        from gtsam_personal_tpu.slam import factors as F

        n = 5
        truth = [np.zeros(3)]
        step = np.array([1.0, 0.0, 0.0])
        for _ in range(n - 1):
            truth.append(np.asarray(se2.compose(
                jnp.asarray(truth[-1]),
                se2.retract(se2.identity(jnp.float64), jnp.asarray(step)))))
        initial = Values({"se2": jnp.asarray(
            np.stack(truth) + np.random.default_rng(0).normal(0, 0.05, (n, 3)))})

        def between_batch(i, j, meas, sigma):
            b = GraphBuilder()
            F.add_between(b, "se2", i, j, meas, F.diag_noise([sigma] * 3))
            return b.build(dtype=jnp.float64).batches[0]

        def prior_batch():
            b = GraphBuilder()
            F.add_prior(b, "se2", 0, truth[0], F.diag_noise([1e-4] * 3))
            return b.build(dtype=jnp.float64).batches[0]

        def hybrid_closure(i, j, var):
            good = np.asarray(se2.between(jnp.asarray(truth[i]),
                                          jnp.asarray(truth[j])))
            bad = good + np.array([3.0, 1.0, 0.5])
            return HybridFactor.from_modes(
                [between_batch(i, j, good, 0.05),
                 between_batch(i, j, bad, 0.05)], mode_var=var) \
                if hasattr(HybridFactor, "from_modes") else None

        # build mode factors directly: one FactorBatch per mode
        def make_hf(i, j, var):
            good = np.asarray(se2.between(jnp.asarray(truth[i]),
                                          jnp.asarray(truth[j])))
            bad = good + np.array([3.0, 1.0, 0.5])
            meas = np.stack([good, bad])
            b = GraphBuilder()
            F.add_between(b, "se2", i, j, good, F.diag_noise([0.05] * 3))
            base = b.build(dtype=jnp.float64).batches[0]
            from gtsam_personal_tpu.core.graph import FactorBatch
            batch = FactorBatch(base.name, base.residual_fn, base.groups, 3,
                                base.idx,
                                {"measured": jnp.asarray(meas)[:, None]},
                                base.noise)
            # HybridFactor.at_mode selects meas[mode]
            return HybridFactor(batch, mode_var=var, num_modes=2)

        sm = HybridSmoother(max_leaves=3)
        # step 1: odometry chain
        odo = [prior_batch()] + [
            between_batch(i, i + 1, np.asarray(se2.between(
                jnp.asarray(truth[i]), jnp.asarray(truth[i + 1]))), 0.1)
            for i in range(n - 1)]
        sm.update(initial, continuous=odo)
        # step 2: ambiguous closure 0-3 (mode 0 = inlier)
        sm.update(initial, hybrids=[make_hf(0, 3, 100)])
        # step 3: ambiguous closure 1-4
        sm.update(initial, hybrids=[make_hf(1, 4, 101)])
        v, a, post = sm.estimate()
        assert a[100] == 0 and a[101] == 0, a
        np.testing.assert_allclose(np.asarray(v["se2"])[:, :2],
                                   np.stack(truth)[:, :2], atol=0.05)

        # batch reference
        hg = HybridFactorGraph()
        for b in odo:
            hg.add_continuous(b)
        hg.add_hybrid(make_hf(0, 3, 100))
        hg.add_hybrid(make_hf(1, 4, 101))
        vb, ab, _ = hg.solve(initial)
        assert ab == a
        np.testing.assert_allclose(np.asarray(v["se2"]), np.asarray(vb["se2"]),
                                   atol=1e-4)


class TestHybridBeam:
    """solve_beam: per-mode-variable elimination with in-elimination pruning
    (reference: EliminateHybrid + prune, hybrid/HybridGaussianFactorGraph.h:106)."""

    @staticmethod
    def _chain_problem(n, mode_vars, rng_seed=3):
        import jax.numpy as jnp
        from gtsam_personal_tpu.core.graph import GraphBuilder, FactorBatch
        from gtsam_personal_tpu.core.values import Values
        from gtsam_personal_tpu.geometry import se2
        from gtsam_personal_tpu.hybrid.hybrid import (HybridFactor,
                                                      HybridFactorGraph)
        from gtsam_personal_tpu.slam import factors as F

        rng = np.random.default_rng(rng_seed)
        truth = np.arange(n)[:, None] * np.array([1.0, 0.0, 0.0])
        hg = HybridFactorGraph()
        b = GraphBuilder()
        F.add_prior(b, "se2", 0, truth[0], F.diag_noise([1e-3] * 3))
        for i in range(n - 1):
            F.add_between(b, "se2", i, i + 1, np.array([1.0, 0.0, 0.0]),
                          F.diag_noise([0.05] * 3))
        for batch in b.build(dtype=jnp.float64).batches:
            hg.add_continuous(batch)
        # each mode var: an ambiguous unary prior on pose i (mode 0 = inlier)
        true_modes = {}
        for k in range(mode_vars):
            i = 1 + (k % (n - 1))
            good = truth[i] + rng.normal(0, 0.02, 3)
            bad = truth[i] + np.array([4.0, 2.0, 1.0])
            gb = GraphBuilder()
            F.add_prior(gb, "se2", i, good, F.diag_noise([0.1] * 3))
            base = gb.build(dtype=jnp.float64).batches[0]
            meas = np.stack([good, bad]) if k % 2 == 0 else np.stack([bad, good])
            batch = FactorBatch(base.name, base.residual_fn, base.groups, 3,
                                base.idx,
                                {"prior": jnp.asarray(meas)[:, None]},
                                base.noise)
            hg.add_hybrid(HybridFactor(batch, mode_var=200 + k, num_modes=2))
            true_modes[200 + k] = 0 if k % 2 == 0 else 1
        initial = Values({"se2": jnp.asarray(
            truth + rng.normal(0, 0.05, truth.shape))})
        return hg, initial, truth, true_modes

    def test_beam_matches_exact_small(self):
        hg, initial, _, true_modes = self._chain_problem(4, 3)
        v_ex, a_ex, _ = hg.solve(initial)
        v_bm, a_bm, _ = hg.solve_beam(initial, max_leaves=8)
        assert a_ex == a_bm == true_modes
        np.testing.assert_allclose(np.asarray(v_bm["se2"]),
                                   np.asarray(v_ex["se2"]), atol=1e-5)

    def test_beam_many_mode_vars_bounded(self):
        """12 mode variables: 4096 joint assignments, but the beam touches at
        most #vars * leaves * card = 12*4*2 = 96 continuous solves."""
        hg, initial, truth, true_modes = self._chain_problem(6, 12)
        v, a, post = hg.solve_beam(initial, max_leaves=4)
        assert a == true_modes
        np.testing.assert_allclose(np.asarray(v["se2"])[:, :2],
                                   truth[:, :2], atol=0.1)


class TestHybridISAM:
    def test_matches_enumeration_on_ambiguous_loops(self):
        """Bounded-cost HybridISAM (one ISAM2 engine per hypothesis) must
        pick the same mode assignment as exact enumeration and reach the
        same optimum on a chain with ambiguous loop closures (reference
        capability: HybridGaussianISAM / Hybrid_City10000)."""
        import jax.numpy as jnp
        from gtsam_personal_tpu.geometry import se2
        from gtsam_personal_tpu.hybrid.hybrid import (HybridFactor,
                                                      HybridFactorGraph,
                                                      HybridISAM)
        from gtsam_personal_tpu.nonlinear.isam2 import ISAM2Params
        from gtsam_personal_tpu.nonlinear import optimizers

        rng = np.random.default_rng(7)
        n = 8
        truth = np.zeros((n, 3))
        for i in range(1, n):
            truth[i] = np.asarray(se2.compose(
                jnp.asarray(truth[i - 1]), jnp.asarray([1.0, 0.0, 0.15])))

        rb = F.make_between_residual("se2")
        pr = F.make_prior_residual("se2")
        sig = np.array([0.05, 0.05, 0.02])
        w = 1.0 / sig

        def between_meas(i, j):
            return np.asarray(se2.between(jnp.asarray(truth[i]),
                                          jnp.asarray(truth[j]))) + \
                rng.normal(scale=0.005, size=3)

        # one shared measurement stream for both solvers
        odo = [between_meas(i - 1, i) for i in range(1, n)]
        init = [truth[i] + rng.normal(scale=0.05, size=3) for i in range(1, n)]
        amb = [(1, 4), (2, 6), (0, 7)]
        closures = []
        for (i, j) in amb:
            good = between_meas(i, j)
            closures.append((i, j, good, good + np.array([2.0, -1.5, 0.8])))

        # --- bounded-cost hybrid ISAM ---
        hi = HybridISAM(max_leaves=4,
                        params=ISAM2Params(relinearize_threshold=0.0,
                                           cg_maxiter=60, cg_tol=1e-10,
                                           dtype=np.float64))
        hi.add_variable("se2", truth[0])
        hi.add_factor("prior_se2", pr, ["se2"], 3, [0],
                      {"prior": np.zeros(3)},
                      NoiseModel("diag", jnp.asarray(w)))
        hi.update()
        for i in range(1, n):
            hi.add_variable("se2", init[i - 1])
            hi.add_factor("between_se2", rb, ["se2", "se2"], 3, [i - 1, i],
                          {"measured": odo[i - 1]},
                          NoiseModel("diag", jnp.asarray(w)))
            hi.update()
        for k, (i, j, good, bad) in enumerate(closures):
            hi.add_hybrid_factor(
                "between_se2", rb, ["se2", "se2"], 3, [i, j],
                [{"measured": good}, {"measured": bad}],
                NoiseModel("diag", jnp.asarray(w)), mode_var=100 + k)
        for _ in range(6):        # final polish (as the streaming examples do)
            hi.update()
        vals_hi, assign_hi, post = hi.estimate()

        # every ambiguous closure must resolve to the correct mode
        assert all(assign_hi[100 + k] == 0 for k in range(len(amb))), assign_hi
        assert post[tuple(sorted(assign_hi.items()))] > 0.9

        # --- exact enumeration oracle on the SAME measurements ---
        b = GraphBuilder()
        F.add_prior(b, "se2", 0, np.zeros(3), {"kind": "diag", "data": w})
        hg = HybridFactorGraph()
        for i in range(1, n):
            F.add_between(b, "se2", i - 1, i, odo[i - 1],
                          {"kind": "diag", "data": w})
        for bb in b.build(dtype=jnp.float64).batches:
            hg.add_continuous(bb)
        for k, (i, j, good, bad) in enumerate(closures):
            base = GraphBuilder()
            F.add_between(base, "se2", i, j, good, {"kind": "diag", "data": w})
            bb = base.build(dtype=jnp.float64).batches[0]
            meas = jnp.asarray(np.stack([good, bad])[:, None])
            hg.add_hybrid(HybridFactor(
                FactorBatch(bb.name, bb.residual_fn, bb.groups, 3, bb.idx,
                            {"measured": meas}, bb.noise),
                mode_var=100 + k, num_modes=2))
        initial = Values({"se2": jnp.asarray(truth)})
        vals_ex, assign_ex, _ = hg.solve(
            initial, params=optimizers.Params(max_iterations=30))
        assert dict(assign_ex) == dict(assign_hi)

        # same continuous optimum (modes agree -> same graph)
        e_hi = float(hg.graph_at(assign_hi).error(
            Values({"se2": jnp.asarray(np.asarray(vals_hi["se2"]))})))
        e_ex = float(hg.graph_at(assign_ex).error(vals_ex))
        np.testing.assert_allclose(e_hi, e_ex, rtol=1e-4, atol=1e-6)
