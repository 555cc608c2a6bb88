"""Graduated non-convexity (GNC) robust optimization.

Reference parity: GncOptimizer (nonlinear/GncOptimizer.h:183-247) with TLS and
GM surrogates: alternate (1) weighted least-squares solves (weights scale each
factor's sqrt information) and (2) closed-form weight updates under a
graduated mu schedule (updateMu, GncOptimizer.h:317). The chi-squared inlier
threshold uses scipy.stats (the reference vendors cephes for the same
quantile, nonlinear/internal/ChiSquaredInverse.h:24).
"""

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from gtsam_personal_tpu.core.graph import FactorBatch, FactorGraph
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.linear.noise import NoiseModel, whiten_residual
from gtsam_personal_tpu.nonlinear import optimizers


@dataclass
class GncParams:
    loss_type: str = "tls"            # 'tls' | 'gm'
    max_outer_iterations: int = 20
    mu_step: float = 1.4
    barc_sq: Optional[float] = None   # inlier threshold on squared whitened err
    inlier_prob: float = 0.99         # used to derive barc_sq via chi2 quantile
    weights_tol: float = 1e-4
    inner: optimizers.Params = optimizers.Params(max_iterations=20)


def _chi2_quantile(p, dof):
    from scipy.stats import chi2
    return float(chi2.ppf(p, dof))


def _scale_batch(batch: FactorBatch, w: jnp.ndarray) -> FactorBatch:
    """Scale factor weights (sqrt(w) on the whitened system)."""
    sw = jnp.sqrt(jnp.clip(w, 0.0, 1.0))
    noise = batch.noise
    if noise.kind == "unit":
        data = sw[:, None] * jnp.ones((batch.size, batch.rdim), dtype=sw.dtype)
        nm = NoiseModel("diag", data)
    elif noise.kind == "diag":
        nm = NoiseModel("diag", noise.data * sw[:, None])
    else:
        nm = NoiseModel("full", noise.data * sw[:, None, None])
    return FactorBatch(batch.name, batch.residual_fn, batch.groups, batch.rdim,
                       batch.idx, batch.meas, nm)


def optimize_gnc(graph: FactorGraph, values: Values, robust_batch_index: int,
                 params: GncParams = GncParams()):
    """Run GNC with the factors of `graph.batches[robust_batch_index]` treated
    as outlier-contaminated; all other batches stay as-is.

    Returns (values, weights, result)."""
    rb = graph.batches[robust_batch_index]
    K = rb.size
    dof = rb.rdim
    barc_sq = params.barc_sq or _chi2_quantile(params.inlier_prob, dof)

    def sq_errors(vals):
        r = rb.residuals(vals)
        rw = whiten_residual(rb.noise, r)
        return jnp.sum(rw * rw, axis=-1)

    # initialize mu from max residual (GncOptimizer::initializeMu)
    e2 = np.asarray(jax.jit(sq_errors)(values))
    if params.loss_type == "gm":
        mu = 2.0 * float(e2.max()) / barc_sq if e2.max() > 0 else 1.0
    else:  # tls
        denom = 2.0 * float(e2.max()) / barc_sq - 1.0
        mu = 1.0 / denom if denom > 0 else 1e3  # already all-inlier

    w = np.ones(K)
    result = None
    for outer in range(params.max_outer_iterations):
        # weight update from the CURRENT estimate, then solve weighted
        # (GncOptimizer::calculateWeights; updating before the first solve
        # keeps gross outliers from dragging the initial basin)
        e2 = np.asarray(jax.jit(sq_errors)(values))
        if params.loss_type == "gm":
            w_new = (mu * barc_sq / (e2 + mu * barc_sq)) ** 2
        else:  # tls
            upper = (mu + 1.0) / mu * barc_sq
            lower = mu / (mu + 1.0) * barc_sq
            w_new = np.clip(np.sqrt(barc_sq * mu * (mu + 1.0) / np.maximum(e2, 1e-30))
                            - mu, 0.0, 1.0)
            w_new = np.where(e2 >= upper, 0.0, np.where(e2 <= lower, 1.0, w_new))
        converged = outer > 0 and np.abs(w_new - w).max() < params.weights_tol
        w = w_new

        weighted = FactorGraph([
            _scale_batch(b, jnp.asarray(w)) if i == robust_batch_index else b
            for i, b in enumerate(graph.batches)])
        result = optimizers.optimize_lm(weighted, values, params.inner)
        values = result.values

        # mu schedule (GncOptimizer::updateMu)
        if params.loss_type == "gm":
            mu = max(mu / params.mu_step, 1.0)
            if converged and abs(mu - 1.0) < 1e-9:
                break
        else:
            mu = mu * params.mu_step
            if converged:
                break
    return values, w, result
