"""Marginalization + fixed-lag smoothing tests (reference strategy:
tests/testGaussianISAM2.cpp marginalization cases + fixed-lag smoother tests
in gtsam_unstable)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.core.graph import GraphBuilder, FactorGraph
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.geometry import se2
from gtsam_personal_tpu.linear.marginal import marginalize
from gtsam_personal_tpu.nonlinear import optimizers
from gtsam_personal_tpu.nonlinear.fixed_lag import FixedLagSmoother
from gtsam_personal_tpu.slam import factors as F


def chain_graph(n, loop=True):
    b = GraphBuilder()
    F.add_prior(b, "se2", 0, np.zeros(3), F.diag_noise([0.1, 0.1, 0.05]))
    rng = np.random.default_rng(1)
    for i in range(n - 1):
        meas = np.array([1.0, 0.0, 0.1]) + rng.normal(scale=0.02, size=3)
        F.add_between(b, "se2", i, i + 1, meas, F.diag_noise([0.05, 0.05, 0.02]))
    if loop and n > 3:
        F.add_between(b, "se2", 0, n - 1,
                      np.array([n - 1.0, 0.0, 0.1 * (n - 1)]),
                      F.diag_noise([0.05, 0.05, 0.02]))
    graph = b.build()
    poses = np.zeros((n, 3))
    for i in range(1, n):
        poses[i] = np.asarray(se2.compose(jnp.asarray(poses[i - 1]),
                                          jnp.asarray([1.0, 0.0, 0.1])))
    return graph, Values({"se2": jnp.asarray(poses)})


def test_marginalize_preserves_solution():
    graph, init = chain_graph(5)
    full = optimizers.optimize_lm(graph, init)
    # marginalize pose 0 at the converged point
    remaining, marginal, bound = marginalize(graph, full.values, {"se2": [0]})
    assert marginal is not None
    batches = list(remaining.batches) + [marginal]
    # perturb remaining poses, re-optimize: should return to the same optimum
    pert = np.asarray(full.values["se2"]).copy()
    pert[1:] += np.random.default_rng(2).normal(scale=0.05, size=(4, 3))
    res = optimizers.optimize_lm(FactorGraph(batches),
                                 Values({"se2": jnp.asarray(pert)}),
                                 optimizers.Params(lambda_initial=1e-6))
    got = np.asarray(res.values["se2"])[1:]
    want = np.asarray(full.values["se2"])[1:]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_marginal_factor_info_matches_schur():
    """The marginal factor's Gauss-Newton contribution equals the dense Schur
    complement of the eliminated variable."""
    graph, init = chain_graph(4, loop=False)
    sol = optimizers.optimize_lm(graph, init)
    from gtsam_personal_tpu.linear.linearize import linearize
    from gtsam_personal_tpu.core.values import Layout
    lin_full = linearize(graph, sol.values)
    layout = Layout.of(sol.values)
    H, g = lin_full.assemble_dense(layout)
    H, g = np.asarray(H), np.asarray(g)
    Hmm, Hmb = H[:3, :3], H[:3, 3:]
    Lam_expected = H[3:, 3:] - Hmb.T @ np.linalg.solve(Hmm, Hmb)

    remaining, marginal, bound = marginalize(graph, sol.values, {"se2": [0]})
    lin_m = linearize(FactorGraph([marginal]), sol.values)
    Hm, _ = lin_m.assemble_dense(layout)
    lin_r = linearize(remaining, sol.values)
    Hr, _ = lin_r.assemble_dense(layout)
    # identity: (remaining + marginal) information on kept vars equals the
    # Schur complement of the full system
    np.testing.assert_allclose(np.asarray(Hm)[3:, 3:] + np.asarray(Hr)[3:, 3:],
                               Lam_expected, atol=1e-6)


def test_antifactor_marginalize_cancels():
    """A factor batch + its negated() twin contribute nothing through
    marginalize(): both the involved rows (Schur assembly) and the kept
    remainder rows (_select) must carry the anti sign (reference:
    slam/AntiFactor.h:97)."""
    graph, init = chain_graph(5, loop=False)
    sol = optimizers.optimize_lm(graph, init)
    # extra batch with one row touching the marginalized var (0) and one row
    # touching only kept vars — exercises both the involved path and _select
    b2 = GraphBuilder()
    F.add_between(b2, "se2", 0, 1, np.array([1.0, 0.0, 0.1]),
                  F.diag_noise([0.1, 0.1, 0.1]))
    F.add_between(b2, "se2", 2, 3, np.array([1.0, 0.0, 0.1]),
                  F.diag_noise([0.1, 0.1, 0.1]))
    extra = list(b2.build().batches)
    anti = [eb.negated() for eb in extra]
    aug = FactorGraph(list(graph.batches) + extra + anti)

    from gtsam_personal_tpu.linear.linearize import linearize
    from gtsam_personal_tpu.core.values import Layout
    layout = Layout.of(sol.values)

    def info_on_kept(g):
        remaining, marginal, _ = marginalize(g, sol.values, {"se2": [0]})
        batches = list(remaining.batches)
        if marginal is not None:
            batches.append(marginal)
        H, gv = linearize(FactorGraph(batches), sol.values).assemble_dense(layout)
        return np.asarray(H)[3:, 3:], np.asarray(gv)[3:]

    H_plain, g_plain = info_on_kept(graph)
    H_aug, g_aug = info_on_kept(aug)
    np.testing.assert_allclose(H_aug, H_plain, atol=1e-6)
    np.testing.assert_allclose(g_aug, g_plain, atol=1e-6)


def test_fixed_lag_smoother_tracks_batch():
    """Sliding-window estimates of recent states match full batch."""
    rng = np.random.default_rng(3)
    n = 10
    smoother = FixedLagSmoother(lag=4.0,
                                params=optimizers.Params(max_iterations=8))
    all_b = GraphBuilder()
    poses = np.zeros((n, 3))
    for i in range(1, n):
        poses[i] = np.asarray(se2.compose(jnp.asarray(poses[i - 1]),
                                          jnp.asarray([1.0, 0.0, 0.05])))
    for i in range(n):
        step_b = GraphBuilder()
        ts = {}
        if i == 0:
            F.add_prior(step_b, "se2", 0, np.zeros(3), F.diag_noise([0.1, 0.1, 0.05]))
            F.add_prior(all_b, "se2", 0, np.zeros(3), F.diag_noise([0.1, 0.1, 0.05]))
        else:
            meas = np.asarray(se2.between(jnp.asarray(poses[i - 1]),
                                          jnp.asarray(poses[i]))) + \
                rng.normal(scale=0.01, size=3)
            F.add_between(step_b, "se2", i - 1, i, meas, F.diag_noise([0.05, 0.05, 0.02]))
            F.add_between(all_b, "se2", i - 1, i, meas, F.diag_noise([0.05, 0.05, 0.02]))
        ts[("se2", i)] = float(i)
        init_i = poses[: i + 1] + rng.normal(scale=0.0, size=(i + 1, 3))
        vals = Values({"se2": jnp.asarray(init_i)})
        smoother.update(step_b.build().batches if i > 0 or True else [],
                        vals, ts)
    batch = optimizers.optimize_lm(all_b.build(), Values({"se2": jnp.asarray(poses)}))
    got = np.asarray(smoother.estimate()["se2"])[-3:]
    want = np.asarray(batch.values["se2"])[-3:]
    np.testing.assert_allclose(got, want, atol=1e-3)
