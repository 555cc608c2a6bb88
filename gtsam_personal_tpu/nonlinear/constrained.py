"""Constrained optimization: equality/inequality constraints via penalty and
augmented-Lagrangian methods.

Reference parity: gtsam/constrained/ (new in 4.3, SURVEY.md §2.7):
NonlinearEqualityConstraint, NonlinearInequalityConstraint,
InequalityPenaltyFunction — penalty-method scaffolding over the standard
optimizers. Constraints are ordinary residual functions; the outer loop
rescales their weights (penalty) or maintains multiplier estimates
(augmented Lagrangian) and re-solves with the batched LM stack.
"""

from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from gtsam_personal_tpu.core.graph import FactorBatch, FactorGraph
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.linear.noise import NoiseModel
from gtsam_personal_tpu.nonlinear import optimizers


@dataclass
class ConstrainedParams:
    mu_initial: float = 10.0          # penalty weight
    mu_factor: float = 4.0
    max_outer_iterations: int = 12
    constraint_tol: float = 1e-6
    inner: optimizers.Params = field(default_factory=lambda: optimizers.Params(max_iterations=25))


def _weighted(batch: FactorBatch, sqrt_mu: float, shift=None) -> FactorBatch:
    """Scale a constraint batch by sqrt(mu); optionally shift the residual by
    lambda/mu (augmented Lagrangian)."""
    if shift is None:
        fn = batch.residual_fn

        def residual(xs, meas):
            return fn(xs, meas) * meas["__sqrt_mu"][0]
    else:
        fn = batch.residual_fn

        def residual(xs, meas):
            return (fn(xs, meas) + meas["__shift"]) * meas["__sqrt_mu"][0]
    meas = dict(batch.meas)
    meas["__sqrt_mu"] = jnp.full((batch.size, 1), sqrt_mu)
    if shift is not None:
        meas["__shift"] = jnp.asarray(shift)
    return FactorBatch(batch.name + "_penalized", residual, batch.groups,
                       batch.rdim, batch.idx, meas, batch.noise)


def constraint_violation(batches: Sequence[FactorBatch], values: Values) -> float:
    """max-norm of all constraint residuals."""
    worst = 0.0
    for b in batches:
        r = np.asarray(b.residuals(values))
        worst = max(worst, float(np.abs(r).max()) if r.size else 0.0)
    return worst


def optimize_penalty(graph: FactorGraph, values: Values,
                     eq_constraints: Sequence[FactorBatch],
                     params: ConstrainedParams = ConstrainedParams()):
    """Quadratic penalty method: min f(x) + mu/2 ||c(x)||^2, mu increasing
    until feasibility (reference: penalty optimizer in gtsam/constrained/)."""
    mu = params.mu_initial
    res = None
    for _ in range(params.max_outer_iterations):
        batches = list(graph.batches) + [
            _weighted(c, np.sqrt(mu)) for c in eq_constraints]
        res = optimizers.optimize_lm(FactorGraph(batches), values, params.inner)
        values = res.values
        viol = constraint_violation(eq_constraints, values)
        if viol < params.constraint_tol:
            break
        mu *= params.mu_factor
    return values, res


def optimize_augmented_lagrangian(graph: FactorGraph, values: Values,
                                  eq_constraints: Sequence[FactorBatch],
                                  params: ConstrainedParams = ConstrainedParams()):
    """Augmented Lagrangian: maintains multiplier estimates lambda so mu need
    not go to infinity: min f + mu/2 ||c + lambda/mu||^2."""
    mu = params.mu_initial
    lambdas = [np.zeros((c.size, c.rdim)) for c in eq_constraints]
    res = None
    for _ in range(params.max_outer_iterations):
        batches = list(graph.batches) + [
            _weighted(c, np.sqrt(mu), shift=lam / mu)
            for c, lam in zip(eq_constraints, lambdas)]
        res = optimizers.optimize_lm(FactorGraph(batches), values, params.inner)
        values = res.values
        viol = 0.0
        for k, c in enumerate(eq_constraints):
            ck = np.asarray(c.residuals(values))
            lambdas[k] = lambdas[k] + mu * ck
            viol = max(viol, float(np.abs(ck).max()) if ck.size else 0.0)
        if viol < params.constraint_tol:
            break
        mu *= params.mu_factor
    return values, res


def nonlinear_equality(group: str, i: int, value, weight: float = 1e6):
    """NonlinearEquality analogue: pin a variable to a value via a
    large-weight prior (reference: nonlinear/NonlinearEquality.h; the
    reference's Constrained noise + special QR maps to a penalty here,
    SURVEY.md §7)."""
    from gtsam_personal_tpu.slam import factors as F
    from gtsam_personal_tpu.core import manifolds
    d = manifolds.get(group).dim
    return FactorBatch(
        f"equality_{group}", F.make_prior_residual(group), (group,), d,
        jnp.asarray([[i]], dtype=jnp.int32),
        {"prior": jnp.asarray(np.asarray(value)[None])},
        NoiseModel("diag", jnp.full((1, d), np.sqrt(weight))))
