"""Concurrent filter/smoother test (reference:
gtsam_unstable ConcurrentFilteringAndSmoothing tests)."""

import numpy as np
import jax.numpy as jnp

from gtsam_personal_tpu.core.graph import GraphBuilder
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.geometry import se2
from gtsam_personal_tpu.nonlinear import optimizers
from gtsam_personal_tpu.nonlinear.concurrent import ConcurrentFilterSmoother
from gtsam_personal_tpu.slam import factors as F


def test_concurrent_matches_batch():
    rng = np.random.default_rng(0)
    n = 10
    truth = np.zeros((n, 3))
    for i in range(1, n):
        truth[i] = np.asarray(se2.compose(jnp.asarray(truth[i - 1]),
                                          jnp.asarray([1.0, 0.0, 0.1])))
    cfs = ConcurrentFilterSmoother(filter_lag=4.0, smoother_every=5,
                                   filter_params=optimizers.Params(max_iterations=5))
    all_b = GraphBuilder()
    for i in range(n):
        step = GraphBuilder()
        ts = {("se2", i): float(i)}
        if i == 0:
            F.add_prior(step, "se2", 0, np.zeros(3), F.diag_noise([0.1, 0.1, 0.05]))
            F.add_prior(all_b, "se2", 0, np.zeros(3), F.diag_noise([0.1, 0.1, 0.05]))
        else:
            m = np.asarray(se2.between(jnp.asarray(truth[i - 1]),
                                       jnp.asarray(truth[i]))) + \
                rng.normal(scale=0.01, size=3)
            F.add_between(step, "se2", i - 1, i, m, F.diag_noise([0.05, 0.05, 0.02]))
            F.add_between(all_b, "se2", i - 1, i, m, F.diag_noise([0.05, 0.05, 0.02]))
        vals = Values({"se2": jnp.asarray(truth[: i + 1])})
        cfs.update(step.build().batches, vals, ts)

    cfs.run_smoother()
    batch = optimizers.optimize_lm(all_b.build(), Values({"se2": jnp.asarray(truth)}))
    sm = np.asarray(cfs.smoothed_estimate()["se2"])
    want = np.asarray(batch.values["se2"])
    np.testing.assert_allclose(sm, want, atol=1e-5)

    # smoother->filter summarized exchange: after synchronize, the filter's
    # boundary prior is the smoother's joint marginal (not the filter's own
    # stale accumulated prior), and the filter agrees with the batch solution
    # on its live window
    cfs.synchronize()
    marg_batches = [b for b in cfs.filter.batches
                    if b.name.startswith("marginal_")]
    if marg_batches:  # window boundary exists once marginalization kicked in
        res = cfs.filter.update([], None, None)
        live = sorted(i for (g, i) in cfs.filter.timestamps)
        filt = np.asarray(cfs.filter.estimate()["se2"])[live]
        np.testing.assert_allclose(filt, want[live], atol=1e-4)


def test_smoother_summary_is_marginal_information():
    """The exchanged factor's information must equal inv(joint marginal cov)
    of the smoother posterior on the boundary."""
    from gtsam_personal_tpu.nonlinear.concurrent import _smoother_summary
    from gtsam_personal_tpu.nonlinear.marginals import Marginals

    b = GraphBuilder()
    F.add_prior(b, "se2", 0, np.zeros(3), F.diag_noise([0.1, 0.1, 0.05]))
    for i in range(3):
        F.add_between(b, "se2", i, i + 1, np.array([1.0, 0.0, 0.0]),
                      F.diag_noise([0.05, 0.05, 0.02]))
    graph = b.build()
    vals = optimizers.optimize_lm(
        graph, Values({"se2": jnp.asarray(
            np.cumsum(np.tile([1.0, 0, 0], (4, 1)), axis=0) - [1, 0, 0])})).values

    boundary = [("se2", 2), ("se2", 3)]
    summary = _smoother_summary(graph, vals, boundary)
    S = np.asarray(summary.meas["sqrt_info"][0])
    Lam = S.T @ S
    cov = np.asarray(Marginals(graph, vals, damping=1e-9)
                     .joint_marginal_covariance(boundary))
    np.testing.assert_allclose(Lam, np.linalg.inv(cov), rtol=1e-5, atol=1e-6)
