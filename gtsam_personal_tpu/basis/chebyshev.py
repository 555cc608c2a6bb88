"""Pseudospectral basis machinery: Chebyshev (second kind points), Fourier,
basis factors, and least-squares function fitting.

Reference parity: gtsam/basis/ (SURVEY.md §2.9): Basis CRTP -> weight/
evaluation vectors, Chebyshev2 (points, weights, differentiation matrix),
FitBasis (fit via the same batched least-squares stack), BasisFactors
(EvaluationFactor as an ordinary factor on the coefficient vector).
"""

import numpy as np
import jax
import jax.numpy as jnp

from gtsam_personal_tpu.core import manifolds
from gtsam_personal_tpu.core.graph import FactorBatch, FactorGraph
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.linear.noise import NoiseModel
from gtsam_personal_tpu.nonlinear import optimizers


# -- Chebyshev2: second-kind points (includes endpoints) ---------------------

def chebyshev2_points(n: int, a: float = -1.0, b: float = 1.0):
    """N points cos(pi k/(n-1)) mapped to [a, b] (reference: Chebyshev2::Points)."""
    k = np.arange(n)
    x = np.cos(np.pi * k / (n - 1))
    return (a + b) / 2 + (b - a) / 2 * x[::-1]


def chebyshev2_weights(x_query, n: int, a: float = -1.0, b: float = 1.0):
    """Barycentric interpolation weights: f(x) = w(x) . f(points)
    (reference: Chebyshev2::CalculateWeights)."""
    pts = chebyshev2_points(n, a, b)
    x = jnp.asarray(x_query)
    c = np.ones(n)
    c[0] = c[-1] = 0.5
    c = c * (-1.0) ** np.arange(n)
    d = x - jnp.asarray(pts)
    exact = jnp.abs(d) < 1e-14
    d_safe = jnp.where(exact, 1.0, d)
    terms = jnp.asarray(c) / d_safe
    w = terms / jnp.sum(terms)
    any_exact = jnp.any(exact)
    w_exact = exact.astype(w.dtype)
    return jnp.where(any_exact, w_exact / jnp.sum(w_exact), w)


def chebyshev2_differentiation_matrix(n: int, a: float = -1.0, b: float = 1.0):
    """Spectral differentiation matrix D with f'(points) = D f(points)
    (reference: Chebyshev2::DifferentiationMatrix)."""
    pts = chebyshev2_points(n, a, b)
    c = np.ones(n)
    c[0] = c[-1] = 2.0
    c = c * (-1.0) ** np.arange(n)
    X = pts[:, None] - pts[None, :]
    D = np.outer(c, 1.0 / c) / (X + np.eye(n))
    D = D - np.diag(D.sum(axis=1))
    return jnp.asarray(D)


# -- Fourier basis ------------------------------------------------------------

def fourier_weights(x_query, n: int):
    """[1, cos x, sin x, cos 2x, sin 2x, ...] (reference: FourierBasis)."""
    x = jnp.asarray(x_query)
    cols = [jnp.ones_like(x)]
    for k in range(1, (n + 1) // 2 + 1):
        if len(cols) < n:
            cols.append(jnp.cos(k * x))
        if len(cols) < n:
            cols.append(jnp.sin(k * x))
    return jnp.stack(cols[:n], axis=-1)


# -- Chebyshev first kind (polynomial basis T_k) ------------------------------

def chebyshev1_weights(x_query, n: int, a: float = -1.0, b: float = 1.0):
    """[T_0(t), ..., T_{n-1}(t)] with t the affine map of x to [-1, 1]
    (reference: basis/Chebyshev.h Chebyshev1Basis)."""
    x = jnp.asarray(x_query)
    t = (2.0 * x - (a + b)) / (b - a)
    cols = [jnp.ones_like(t), t]
    for _ in range(2, n):
        cols.append(2.0 * t * cols[-1] - cols[-2])
    return jnp.stack(cols[:n], axis=-1)


def chebyshev2_derivative_weights(x_query, n: int, a: float = -1.0,
                                  b: float = 1.0):
    """Weights d with f'(x) = d . f(points): barycentric evaluation of the
    spectrally differentiated interpolant (reference:
    Chebyshev2::DerivativeWeights)."""
    w = chebyshev2_weights(x_query, n, a, b)
    D = chebyshev2_differentiation_matrix(n, a, b)
    return w @ D


# -- Basis factors + FitBasis -------------------------------------------------

def evaluation_residual(xs, meas):
    """EvaluationFactor: predicted = w . coeffs (reference: BasisFactors.h)."""
    (coeffs,) = xs
    return jnp.atleast_1d(jnp.dot(meas["w"], coeffs) - meas["z"])


def vector_evaluation_residual(m: int):
    """VectorEvaluationFactor<M>: the unknown is an [M, N] coefficient matrix
    stored flat; predicted vector = C w (reference: BasisFactors.h
    VectorEvaluationFactor)."""

    def residual(xs, meas):
        (coeffs,) = xs
        C = coeffs.reshape(m, -1)
        return C @ meas["w"] - meas["z"]

    residual.__name__ = f"basis_vector_eval_{m}"
    return residual


def derivative_residual(xs, meas):
    """DerivativeFactor: predicted f'(x) = d . coeffs with d the derivative
    weights (reference: BasisFactors.h DerivativeFactor)."""
    (coeffs,) = xs
    return jnp.atleast_1d(jnp.dot(meas["d"], coeffs) - meas["z"])


def vector_derivative_residual(m: int):
    """VectorDerivativeFactor<M> (reference: BasisFactors.h)."""

    def residual(xs, meas):
        (coeffs,) = xs
        C = coeffs.reshape(m, -1)
        return C @ meas["d"] - meas["z"]

    residual.__name__ = f"basis_vector_deriv_{m}"
    return residual


def fit_basis(xs_samples, zs_samples, n: int, basis: str = "chebyshev2",
              a: float = -1.0, b: float = 1.0, sigma: float = 1.0):
    """FitBasis analogue: least-squares fit of basis coefficients to samples.

    Returns the coefficient vector [n] (values at Chebyshev points for the
    interpolating formulation)."""
    xs_samples = np.asarray(xs_samples)
    zs_samples = np.asarray(zs_samples)
    K = len(xs_samples)
    if basis == "chebyshev2":
        W = np.stack([np.asarray(chebyshev2_weights(x, n, a, b)) for x in xs_samples])
    elif basis == "chebyshev1":
        W = np.asarray(chebyshev1_weights(jnp.asarray(xs_samples), n, a, b))
    elif basis == "fourier":
        W = np.asarray(fourier_weights(jnp.asarray(xs_samples), n))
    else:
        raise ValueError(basis)

    group = manifolds.vector_space(f"basis_coeffs_{n}", n)
    batch = FactorBatch(
        "basis_eval", evaluation_residual, (group.name,), 1,
        jnp.zeros((K, 1), dtype=jnp.int32),
        {"w": jnp.asarray(W), "z": jnp.asarray(zs_samples)},
        NoiseModel("diag", jnp.full((K, 1), 1.0 / sigma)))
    graph = FactorGraph([batch])
    init = Values({group.name: jnp.zeros((1, n))})
    res = optimizers.optimize_gn(graph, init,
                                 optimizers.Params(max_iterations=3))
    return np.asarray(res.values[group.name][0]), res
