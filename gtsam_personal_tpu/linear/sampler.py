"""Sampling from Gaussian noise models + weighted discrete sampling.

Reference parity: gtsam/linear/Sampler.h (draw noise vectors distributed per
a noise model) and gtsam/base/WeightedSampler.h (weighted sampling without
replacement).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_personal_tpu.linear.noise import NoiseModel


def sample_noise(key, noise: NoiseModel, shape_prefix=()):
    """Draw v ~ N(0, Sigma) for the given noise model.

    With sqrt-information S (S^T S = Sigma^{-1}), v = S^{-1} z, z ~ N(0, I)."""
    if noise.kind == "unit":
        raise ValueError("unit noise model needs an explicit dimension; "
                         "use sample_standard")
    if noise.kind == "diag":
        dim = noise.data.shape[-1]
        z = jax.random.normal(key, tuple(shape_prefix) + (dim,),
                              dtype=noise.data.dtype)
        return z / noise.data
    dim = noise.data.shape[-1]
    z = jax.random.normal(key, tuple(shape_prefix) + (dim,),
                          dtype=noise.data.dtype)
    # solve S v = z (S upper-triangular-ish; use general solve batched)
    return jnp.linalg.solve(
        jnp.broadcast_to(noise.data, tuple(shape_prefix) + noise.data.shape[-2:]),
        z[..., None])[..., 0]


def sample_standard(key, dim, shape_prefix=(), dtype=jnp.float32):
    return jax.random.normal(key, tuple(shape_prefix) + (dim,), dtype=dtype)


def weighted_sample_without_replacement(key, weights, k: int):
    """k indices sampled without replacement with probability proportional to
    weights (Efraimidis-Spirakis keys; reference: base/WeightedSampler.h)."""
    w = jnp.asarray(weights)
    u = jax.random.uniform(key, w.shape, minval=1e-12, maxval=1.0)
    keys = jnp.log(u) / jnp.maximum(w, 1e-30)
    return jnp.argsort(-keys)[:k]
