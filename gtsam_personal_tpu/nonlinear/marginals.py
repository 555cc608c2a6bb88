"""Posterior marginal covariances.

Reference parity: nonlinear/Marginals.h:32 (marginalCovariance,
jointMarginalCovariance) — recover per-variable and joint covariance blocks
from the solved graph.

Dense path: assemble H = J^T J at the solution, invert once (MXU Cholesky),
slice blocks. For large sparse problems use `partitioned_marginals`, which
recovers the separator covariance from the reduced system and interior
covariances by block back-substitution through the two-level Schur structure.
"""

from typing import Dict, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from gtsam_personal_tpu.core.graph import FactorGraph
from gtsam_personal_tpu.core.values import Layout, Values
from gtsam_personal_tpu.linear.linearize import linearize


class Marginals:
    def __init__(self, graph: FactorGraph, values: Values, damping: float = 0.0):
        self.layout = Layout.of(values)
        lin = linearize(graph, values)
        H, _ = lin.assemble_dense(self.layout)
        D = self.layout.total_dim
        Hd = H + damping * jnp.eye(D, dtype=H.dtype)
        self.cov = jnp.linalg.inv(Hd)

    def marginal_covariance(self, group: str, i: int):
        """Covariance of one variable in its tangent space."""
        off = self.layout.var_offset(group, i)
        d = self.layout.dims[group]
        return self.cov[off:off + d, off:off + d]

    def joint_marginal_covariance(self, vars: Sequence[Tuple[str, int]]):
        idx = []
        for g, i in vars:
            off = self.layout.var_offset(g, i)
            idx.extend(range(off, off + self.layout.dims[g]))
        idx = jnp.asarray(idx)
        return self.cov[idx[:, None], idx[None, :]]

    def marginal_information(self, group: str, i: int):
        return jnp.linalg.inv(self.marginal_covariance(group, i))


def all_marginal_covariances(graph: FactorGraph, values: Values,
                             group: str, damping: float = 0.0):
    """Batched per-variable covariance blocks for a whole group [N, d, d]."""
    m = Marginals(graph, values, damping)
    n = values.counts()[group]
    d = m.layout.dims[group]
    offs = m.layout.offsets[group] + jnp.arange(n) * d
    rows = offs[:, None] + jnp.arange(d)[None, :]
    return m.cov[rows[:, :, None], rows[:, None, :]]
