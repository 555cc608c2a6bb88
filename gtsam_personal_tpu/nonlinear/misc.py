"""Misc nonlinear factor capabilities: LinearContainerFactor,
FunctorizedFactor, WhiteNoiseFactor.

Reference parity (SURVEY.md §2.6 misc row):
- nonlinear/LinearContainerFactor.h — wrap an already-linearized Gaussian
  factor into a nonlinear graph, anchored at its linearization point.
- nonlinear/FunctorizedFactor.h — factor from any callable predicting a
  measurement; subsumed by the framework (any Python residual is a factor)
  but provided as a named helper for API parity.
- nonlinear/WhiteNoiseFactor.h — binary factor estimating the (mean,
  precision) of zero-mean Gaussian white noise from scalar data, with the
  log-normalization term of the negative log-likelihood included.
"""

from typing import Callable, Sequence

import numpy as np
import jax.numpy as jnp

from gtsam_personal_tpu.core import manifolds
from gtsam_personal_tpu.core.graph import GraphBuilder


# -- LinearContainerFactor ----------------------------------------------------

def make_linear_container_residual(groups: Sequence[str]):
    """Residual of a wrapped linear (Jacobian) factor: r(x) = sum_s A_s
    local(anchor_s, x_s) - b. At x = anchor the residual is -b; Gauss-Newton
    on this factor reproduces the original linear factor exactly
    (reference: nonlinear/LinearContainerFactor.h)."""
    ms = [manifolds.get(g) for g in groups]

    def residual(xs, meas):
        acc = -meas["b"]
        for s, (m, x) in enumerate(zip(ms, xs)):
            acc = acc + meas[f"A{s}"] @ m.local(meas[f"anchor{s}"], x)
        return acc

    residual.__name__ = "linear_container_" + "_".join(groups)
    return residual


def add_linear_container(builder: GraphBuilder, groups: Sequence[str],
                         idx: Sequence[int], As: Sequence[np.ndarray],
                         b: np.ndarray, anchors: Sequence[np.ndarray],
                         noise: dict = None):
    """Add a wrapped linear factor |sum_s A_s xi_s - b|^2 on the variables
    (groups[s], idx[s]), with xi_s the tangent of x_s around anchors[s]."""
    b = np.asarray(b)
    meas = {"b": jnp.asarray(b)}
    for s, (A, anc) in enumerate(zip(As, anchors)):
        meas[f"A{s}"] = jnp.asarray(np.asarray(A))
        meas[f"anchor{s}"] = jnp.asarray(np.asarray(anc))
    builder.add("linear_container_" + "_".join(groups),
                make_linear_container_residual(tuple(groups)),
                tuple(groups), b.shape[-1], list(idx), meas,
                noise or {"kind": "unit"})


# -- FunctorizedFactor --------------------------------------------------------

def make_functorized_residual(fn: Callable, name: str = "functorized"):
    """FunctorizedFactor<R, T>: r = fn(x) - z for any callable fn
    (reference: nonlinear/FunctorizedFactor.h). fn must be jax-traceable."""

    def residual(xs, meas):
        (x,) = xs
        return jnp.atleast_1d(fn(x) - meas["z"])

    residual.__name__ = name
    return residual


def make_functorized2_residual(fn: Callable, name: str = "functorized2"):
    """FunctorizedFactor2: r = fn(x1, x2) - z (reference:
    nonlinear/FunctorizedFactor.h FunctorizedFactor2)."""

    def residual(xs, meas):
        x1, x2 = xs
        return jnp.atleast_1d(fn(x1, x2) - meas["z"])

    residual.__name__ = name
    return residual


# -- WhiteNoiseFactor ---------------------------------------------------------

def white_noise_residual(xs, meas):
    """Estimate (mean, log-precision) of zero-mean Gaussian white noise from
    a scalar datum z (reference: nonlinear/WhiteNoiseFactor.h, error
    0.5 log(2pi) - 0.5 u + 0.5 e^u (z - mu)^2 with u = log(precision)).

    Rendered as a 2-residual least-squares factor whose summed square equals
    the reference error up to an additive constant on u < u_max:
      r0 = e^{u/2} (z - mu)              (the whitened datum)
      r1 = sqrt(u_max - u)               (0.5 r1^2 = -0.5 u + const)
    u_max (meas["umax"], default log 1e8) caps the representable precision —
    the log-barrier direction of the true likelihood is preserved exactly
    inside the domain. Variables: mean ("r1" scalar group), log-precision
    ("r1" scalar group)."""
    mu, u = xs
    d = meas["z"] - mu[0]
    r0 = jnp.exp(0.5 * u[0]) * d
    r1 = jnp.sqrt(jnp.clip(meas["umax"] - u[0], 1e-6))
    return jnp.stack([r0, r1])


def white_noise_mle(z: np.ndarray):
    """Closed-form ML (mean, precision) of scalar data — the oracle for
    WhiteNoiseFactor tests."""
    z = np.asarray(z, dtype=np.float64)
    mu = z.mean()
    var = np.mean((z - mu) ** 2)
    return float(mu), float(1.0 / max(var, 1e-300))
