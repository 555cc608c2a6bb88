"""Noise models + robust m-estimator losses, batched.

Reference parity: gtsam/linear/NoiseModel.h (Gaussian/Diagonal/Isotropic/Unit/
Constrained/Robust, whiten/WhitenSystem) and gtsam/linear/LossFunctions.h
(the m-estimator zoo). A noise model here carries per-factor-batch arrays with
leading dimension K; whitening is one batched einsum instead of per-factor
virtual calls.

Hard constraints (the reference's `Constrained` model with sigma=0 and special
QR, NoiseModel.h:404) are realized as large-weight penalties — see SURVEY.md §7
"Robust/constrained noise" for the rationale.
"""

from typing import Optional

import jax
import jax.numpy as jnp

CONSTRAINED_PENALTY_WEIGHT = 1e6  # squared-info weight substituted for sigma == 0


@jax.tree_util.register_pytree_node_class
class NoiseModel:
    """kind: 'unit' | 'diag' (data = sqrt-info diagonal [K?, r]) | 'full'
    (data = sqrt-information matrix S with S^T S = Sigma^{-1}, [K?, r, r]) |
    'constrained' (data = sigmas [K?, r] where sigma == 0 marks a hard
    constraint; `k` holds the mu penalty weight, reference default 1000 —
    linear/NoiseModel.h:301).

    robust: 'none' or an m-estimator name; k is its tuning constant.
    Semantics for 'constrained' follow the reference: whiten() passes
    constrained rows through RAW; error() weights them by mu; whiten_system()
    scales them by sqrt(mu) so every solver sees the penalty form — the EXACT
    route is conditional.solve_equality_constrained (nullspace method).
    """

    def __init__(self, kind: str, data: Optional[jnp.ndarray] = None,
                 robust: str = "none", k: Optional[jnp.ndarray] = None):
        self.kind = kind
        self.data = data
        self.robust = robust
        self.k = k

    def tree_flatten(self):
        return (self.data, self.k), (self.kind, self.robust)

    @classmethod
    def tree_unflatten(cls, aux, children):
        kind, robust = aux
        data, k = children
        return cls(kind, data, robust, k)

    def with_robust(self, robust: str, k) -> "NoiseModel":
        return NoiseModel(self.kind, self.data, robust, jnp.asarray(k))

    def __repr__(self):
        return f"NoiseModel({self.kind}, robust={self.robust})"


# -- factories (reference: NoiseModel::Sigmas/Variances/Covariance/Isotropic) --

def unit() -> NoiseModel:
    return NoiseModel("unit")


def sigmas(s) -> NoiseModel:
    """Diagonal model from standard deviations; sigma==0 entries become hard
    constraints via a large penalty weight."""
    s = jnp.asarray(s)
    w = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0),
                  jnp.sqrt(CONSTRAINED_PENALTY_WEIGHT))
    return NoiseModel("diag", w)


def precisions(p) -> NoiseModel:
    return NoiseModel("diag", jnp.sqrt(jnp.asarray(p)))


def isotropic(dim: int, sigma: float, dtype=jnp.float64) -> NoiseModel:
    return sigmas(jnp.full((dim,), sigma, dtype=dtype))


def covariance(cov) -> NoiseModel:
    """Full Gaussian model: sqrt information from the covariance matrix.

    S = chol(Sigma^{-1})^T upper-triangular so that S^T S = Sigma^{-1};
    batched over leading dims.
    """
    cov = jnp.asarray(cov)
    info = jnp.linalg.inv(cov)
    info = 0.5 * (info + jnp.swapaxes(info, -1, -2))
    L = jnp.linalg.cholesky(info)
    return NoiseModel("full", jnp.swapaxes(L, -1, -2))


def sqrt_information(S) -> NoiseModel:
    return NoiseModel("full", jnp.asarray(S))


def information(info) -> NoiseModel:
    info = jnp.asarray(info)
    L = jnp.linalg.cholesky(0.5 * (info + jnp.swapaxes(info, -1, -2)))
    return NoiseModel("full", jnp.swapaxes(L, -1, -2))


def robust(base: NoiseModel, kind: str, k) -> NoiseModel:
    return base.with_robust(kind, k)


def constrained_sigmas(s, mu: float = 1000.0) -> NoiseModel:
    """Mixed hard/soft model: sigma == 0 rows are hard constraints
    (reference: Constrained::MixedSigmas, linear/NoiseModel.h:301)."""
    return NoiseModel("constrained", jnp.asarray(s), "none", jnp.asarray(mu))


def constrained_all(dim: int, mu: float = 1000.0) -> NoiseModel:
    """All-rows-constrained model (reference: Constrained::All)."""
    return constrained_sigmas(jnp.zeros(dim), mu)


def _constrained_weights(sigmas):
    """Finite-row whitening weights; constrained rows pass through raw."""
    pos = sigmas > 0
    return jnp.where(pos, 1.0 / jnp.where(pos, sigmas, 1.0), 1.0)


# -- whitening ---------------------------------------------------------------

def _broadcast(data, K):
    """Per-batch noise data may be shared (no leading K) or per-factor."""
    return data


def whiten_residual(noise: NoiseModel, r):
    """r: [K, rdim] -> whitened residual (no robust weighting)."""
    if noise.kind == "unit":
        return r
    if noise.kind == "diag":
        return r * noise.data
    if noise.kind == "constrained":
        # reference Constrained::whiten: constrained rows pass through raw
        return r * _constrained_weights(noise.data)
    # full: S @ r, batched
    return jnp.einsum("...ij,...j->...i", noise.data, r)


def whiten_system(noise: NoiseModel, r, Js):
    """Whiten residual [K, rdim] and Jacobian blocks (tuple of [K, rdim, d_s]),
    then apply sqrt IRLS weights for robust models.

    Reference: NoiseModel::WhitenSystem (linear/NoiseModel.h:88-113) +
    Robust::WhitenSystem."""
    rw = whiten_residual(noise, r)
    if noise.kind == "unit":
        Jw = Js
    elif noise.kind == "diag":
        Jw = tuple(J * noise.data[..., None] for J in Js)
    elif noise.kind == "constrained":
        # penalty form for generic solvers: constrained rows get sqrt(mu);
        # the exact route is conditional.solve_equality_constrained
        w = _constrained_weights(noise.data)
        sm = jnp.where(noise.data > 0, 1.0, jnp.sqrt(noise.k))
        rw = rw * sm
        Jw = tuple(J * (w * sm)[..., None] for J in Js)
    else:
        Jw = tuple(jnp.einsum("...ij,...jk->...ik", noise.data, J) for J in Js)
    if noise.robust != "none":
        e = jnp.linalg.norm(rw, axis=-1)
        sw = jnp.sqrt(robust_weight(noise.robust, e, noise.k))
        rw = rw * sw[..., None]
        Jw = tuple(J * sw[..., None, None] for J in Jw)
    return rw, Jw


def log_det_whitener(noise: NoiseModel) -> float:
    """Host-side log|det W| of the whitening matrix W (r_w = W r), summed
    over the batch if the noise data is per-factor.

    The Gaussian negative log-likelihood is
      0.5 ||W r||^2 - log|det W| + (rdim/2) log 2pi,
    so the -log|det W| term is what distinguishes hypotheses whose noise
    models DIFFER (reference: HybridGaussianFactor's logNormalizers,
    hybrid/HybridGaussianFactor.cpp) — raw least-squares energies are only
    comparable across modes when this constant is included."""
    import numpy as np
    if noise.kind == "unit":
        return 0.0
    data = np.asarray(noise.data)
    if noise.kind == "diag":
        return float(np.sum(np.log(data)))
    if noise.kind == "constrained":
        # penalty form: constrained rows carry weight sqrt(mu)
        mu = float(np.asarray(noise.k)) if noise.k is not None else 1000.0
        w = np.where(data > 0, 1.0 / np.where(data > 0, data, 1.0),
                     np.sqrt(mu))
        return float(np.sum(np.log(w)))
    # full: data = S (sqrt information), possibly batched
    if data.ndim == 2:
        return float(np.linalg.slogdet(data)[1])
    return float(np.sum([np.linalg.slogdet(data[i])[1]
                         for i in range(data.shape[0])]))


def error(noise: NoiseModel, r):
    """Total error contribution: 0.5||r_w||^2, or rho(||r_w||) for robust
    models (reference: NoiseModelFactor::error / Robust loss semantics).
    Constrained rows are weighted by mu (reference: Constrained::distance)."""
    rw = whiten_residual(noise, r)
    if noise.kind == "constrained":
        wmu = jnp.where(noise.data > 0, 1.0, noise.k)
        sq = jnp.sum(wmu * rw * rw, axis=-1)
        return 0.5 * jnp.sum(sq)
    sq = jnp.sum(rw * rw, axis=-1)
    if noise.robust == "none":
        return 0.5 * jnp.sum(sq)
    e = jnp.sqrt(sq + 1e-300)
    return jnp.sum(robust_loss(noise.robust, e, noise.k))


# -- m-estimators (reference: linear/LossFunctions.h:66-555) -----------------

def robust_weight(kind: str, e, k):
    """IRLS weight w(e) with e = whitened residual norm >= 0."""
    ae = jnp.abs(e)
    if kind == "huber":
        return jnp.where(ae <= k, 1.0, k / jnp.maximum(ae, 1e-12))
    if kind == "cauchy":
        return k * k / (k * k + e * e)
    if kind == "geman_mcclure":
        c2 = k * k
        return (c2 / (c2 + e * e)) ** 2
    if kind == "tukey":
        u = jnp.clip(1.0 - (e / k) ** 2, 0.0, None)
        return u * u
    if kind == "welsch":
        return jnp.exp(-(e / k) ** 2)
    if kind == "fair":
        return 1.0 / (1.0 + ae / k)
    if kind == "dcs":
        w = 2.0 * k / (k + e * e)
        return jnp.where(e * e > k, jnp.minimum(w * w, 1.0), 1.0)
    if kind == "l2_with_dead_zone":
        d = jnp.clip(ae - k, 0.0, None)
        return d / jnp.maximum(ae, 1e-12)
    if kind == "asymmetric_tukey":
        u = jnp.clip(1.0 - (e / k) ** 2, 0.0, None)
        return jnp.where(e >= 0, u * u, jnp.ones_like(e))
    if kind == "asymmetric_cauchy":
        return jnp.where(e >= 0, k * k / (k * k + e * e), jnp.ones_like(e))
    raise ValueError(f"unknown robust kind {kind!r}")


def robust_loss(kind: str, e, k):
    """rho(e) such that total factor error = rho(||whitened residual||)."""
    ae = jnp.abs(e)
    if kind == "huber":
        return jnp.where(ae <= k, 0.5 * e * e, k * (ae - 0.5 * k))
    if kind == "cauchy":
        return 0.5 * k * k * jnp.log1p((e / k) ** 2)
    if kind == "geman_mcclure":
        c2 = k * k
        return 0.5 * c2 * e * e / (c2 + e * e)
    if kind == "tukey":
        c2_6 = k * k / 6.0
        inside = c2_6 * (1.0 - jnp.clip(1.0 - (e / k) ** 2, 0.0, None) ** 3)
        return inside
    if kind == "welsch":
        return 0.5 * k * k * (1.0 - jnp.exp(-(e / k) ** 2))
    if kind == "fair":
        return k * k * (ae / k - jnp.log1p(ae / k))
    if kind == "dcs":
        # Dynamic covariance scaling (reference LossFunctions.h DCS::loss)
        w = 2.0 * k / (k + e * e)
        return jnp.where(e * e > k, k * e * e / (k + e * e), 0.5 * e * e)
    if kind == "l2_with_dead_zone":
        d = jnp.clip(ae - k, 0.0, None)
        return 0.5 * d * d
    if kind in ("asymmetric_tukey", "asymmetric_cauchy"):
        base = robust_loss(kind.replace("asymmetric_", ""), e, k)
        return jnp.where(e >= 0, base, 0.5 * e * e)
    raise ValueError(f"unknown robust kind {kind!r}")
