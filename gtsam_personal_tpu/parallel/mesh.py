"""Multi-device sharded solving over a `jax.sharding.Mesh`.

The reference has no distributed backend (SURVEY.md §2.11 P5/P6: TBB threads
in one address space). This module is the genuinely new TPU-native axis:

- factor-data parallelism ("dp"): every factor batch's leading K axis is
  sharded across devices; linearization (vmap) runs fully parallel and the
  gather/scatter in J / J^T products makes XLA insert the psum/all-gather
  collectives over ICI automatically (GSPMD).
- part-model parallelism ("mp"): the partitioned Schur solver's fronts
  [p, m, m] shard their leading axis; interiors factorize device-local and the
  reduced separator system is an all-reduce (see linear/schur.py).

Values stay replicated (they are small relative to factors); the tangent
solution is replicated after the solve.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gtsam_personal_tpu.core.graph import FactorBatch, FactorGraph
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.linear.noise import NoiseModel


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()[: (n_devices or len(jax.devices()))]
    return Mesh(np.array(devs), (axis,))


def _per_factor_noise(noise: NoiseModel, K: int, rdim: int, dtype) -> NoiseModel:
    """Materialize noise data with a leading K axis so padded rows can be
    zero-weighted."""
    if noise.kind == "unit":
        return NoiseModel("diag", jnp.ones((K, rdim), dtype=dtype),
                          noise.robust, noise.k)
    data = noise.data
    if data.ndim == (1 if noise.kind == "diag" else 2):
        data = jnp.broadcast_to(data, (K,) + data.shape)
    elif data.shape[0] != K:
        data = jnp.broadcast_to(data[0], (K,) + data.shape[1:])
    return NoiseModel(noise.kind, data, noise.robust, noise.k)


def shard_graph(graph: FactorGraph, mesh: Mesh, axis: str = "dp") -> FactorGraph:
    """Place every factor batch's arrays sharded on the leading (K) axis.

    Batches are padded (with zero-information copies of factor 0) to a
    multiple of the mesh size so every device holds an equal shard."""
    n = int(np.prod(mesh.devices.shape))
    sharding = NamedSharding(mesh, P(axis))
    batches = []
    for b in graph.batches:
        K = b.size
        pad = (-K) % n
        noise = _per_factor_noise(b.noise, K, b.rdim, b.r_dtype if hasattr(b, "r_dtype")
                                  else jax.tree.leaves(b.meas)[0].dtype)

        def padk(x):
            return x if pad == 0 else jnp.concatenate(
                [x, jnp.repeat(x[:1], pad, axis=0)], axis=0)

        idx = padk(b.idx)
        meas = jax.tree.map(padk, b.meas)
        data = padk(noise.data)
        if pad:
            data = data.at[K:].set(0.0)  # zero sqrt-info => padded rows inert
        nk = noise.k
        if nk is not None and getattr(nk, "ndim", 0) >= 1 and nk.shape[0] == K:
            nk = padk(nk)

        put = lambda x: jax.device_put(x, sharding)
        batches.append(FactorBatch(
            b.name, b.residual_fn, b.groups, b.rdim,
            put(idx), jax.tree.map(put, meas),
            NoiseModel(noise.kind, put(data), noise.robust, nk)))
    return FactorGraph(batches)


def replicate_values(values: Values, mesh: Mesh) -> Values:
    sharding = NamedSharding(mesh, P())
    return Values({g: jax.device_put(v, sharding) for g, v in values.blocks.items()})
