"""Incremental pose-graph smoothing with padded static shapes.

The capability counterpart of ISAM2 / NonlinearISAM (SURVEY.md §3.3, §7
"iSAM2 replacement"): bounded-cost updates as measurements stream in. Instead
of pointer-based Bayes-tree surgery, the TPU-native design keeps fixed-
capacity arrays (poses, between-factors) with activity masks; every
`relinearize_every` additions it runs a few warm-started damped-GN iterations
with a PCG solve. Capacities grow by doubling, so the jitted update function
compiles only O(log N) times over an entire sequence; each update is one
device program over static shapes.

Supports SE(2) and SE(3) pose graphs (City10000-style streams: odometry +
loop closures, including closures to arbitrarily old poses — nothing is
marginalized)."""

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from gtsam_personal_tpu.core import manifolds
from gtsam_personal_tpu.core.graph import FactorBatch, FactorGraph
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.linear.linearize import linearize
from gtsam_personal_tpu.linear import solvers
from gtsam_personal_tpu.slam import factors as F


@partial(jax.jit, static_argnames=("iters", "pcg_maxiter"))
def _update_jit(graph: FactorGraph, values: Values, lam, iters=3,
                pcg_maxiter=60):
    """Fixed number of damped-GN iterations with PCG solves (one program)."""
    def body(carry, _):
        vals, err = carry
        lin = linearize(graph, vals)
        delta = solvers.solve_pcg(lin, lam, maxiter=pcg_maxiter, tol=1e-6)
        new_vals = vals.retract(delta)
        new_err = graph.error(new_vals)
        better = new_err < err
        vals = jax.tree.map(lambda a, b: jnp.where(better, b, a), vals, new_vals)
        return (vals, jnp.minimum(err, new_err)), None

    err0 = graph.error(values)
    (vals, err), _ = jax.lax.scan(body, (values, err0), None, length=iters)
    return vals, err


class IncrementalSmoother:
    def __init__(self, group: str = "se2", relinearize_every: int = 25,
                 iters_per_update: int = 3, pcg_maxiter: int = 60,
                 lam: float = 1e-5, dtype=np.float64):
        self.group = group
        self.dim = manifolds.get(group).dim
        self.param_shape = manifolds.get(group).param_shape
        self.relin_every = relinearize_every
        self.iters = iters_per_update
        self.pcg_maxiter = pcg_maxiter
        self.lam = lam
        self.dtype = dtype

        self.cap_n = 64
        self.cap_f = 128
        self.n = 0          # active poses
        self.f = 0          # active between factors
        # inactive slots hold identity poses/measurements so residuals and
        # Jacobians stay finite (they are zero-weighted by zero sqrt-info)
        self._identity = np.asarray(manifolds.get(group).identity(jnp.float64),
                                    dtype=dtype)
        self._poses = np.broadcast_to(
            self._identity, (self.cap_n,) + self.param_shape).copy()
        rdim = self.dim
        self._ij = np.zeros((self.cap_f, 2), dtype=np.int32)
        self._meas = np.broadcast_to(
            self._identity, (self.cap_f,) + self.param_shape).copy()
        self._sqrt = np.zeros((self.cap_f, rdim, rdim), dtype=dtype)
        self._prior = None  # (pose, sqrt_info)
        self._since_solve = 0
        self._residual_fn = F.make_between_residual(group)
        self._prior_fn = F.make_prior_residual(group)

    # -- growth --------------------------------------------------------------
    def _ensure(self, n, f):
        while n > self.cap_n:
            self.cap_n *= 2
            pad = np.broadcast_to(self._identity, self._poses.shape).copy()
            self._poses = np.concatenate([self._poses, pad])
        while f > self.cap_f:
            self.cap_f *= 2
            self._ij = np.concatenate([self._ij, np.zeros_like(self._ij)])
            pad = np.broadcast_to(self._identity, self._meas.shape).copy()
            self._meas = np.concatenate([self._meas, pad])
            self._sqrt = np.concatenate([self._sqrt, np.zeros_like(self._sqrt)])

    # -- streaming API -------------------------------------------------------
    def set_prior(self, pose0, sigmas):
        self._prior = (np.asarray(pose0, dtype=self.dtype),
                       np.diag(1.0 / np.asarray(sigmas, dtype=self.dtype)))
        self._ensure(1, self.f)
        if self.n == 0:
            self._poses[0] = pose0
            self.n = 1

    def add_pose(self, init):
        self._ensure(self.n + 1, self.f)
        self._poses[self.n] = np.asarray(init, dtype=self.dtype)
        self.n += 1
        return self.n - 1

    def add_between(self, i, j, measured, sqrt_info):
        """sqrt_info: [d, d] upper factor with S^T S = information."""
        self._ensure(self.n, self.f + 1)
        self._ij[self.f] = (i, j)
        self._meas[self.f] = np.asarray(measured, dtype=self.dtype)
        self._sqrt[self.f] = np.asarray(sqrt_info, dtype=self.dtype)
        self.f += 1
        self._since_solve += 1
        if self._since_solve >= self.relin_every:
            self.solve()

    # -- solving -------------------------------------------------------------
    def _graph_values(self):
        from gtsam_personal_tpu.linear.noise import NoiseModel
        g = self.group
        batches = [FactorBatch(
            f"between_{g}", self._residual_fn, (g, g), self.dim,
            jnp.asarray(self._ij), {"measured": jnp.asarray(self._meas)},
            NoiseModel("full", jnp.asarray(self._sqrt)))]
        if self._prior is not None:
            p0, S0 = self._prior
            batches.append(FactorBatch(
                f"prior_{g}", self._prior_fn, (g,), self.dim,
                jnp.zeros((1, 1), dtype=jnp.int32),
                {"prior": jnp.asarray(p0[None])},
                NoiseModel("full", jnp.asarray(S0[None]))))
        return FactorGraph(batches), Values({g: jnp.asarray(self._poses)})

    def solve(self, iters: Optional[int] = None):
        graph, values = self._graph_values()
        vals, err = _update_jit(graph, values, jnp.asarray(self.lam, dtype=self.dtype),
                                iters=iters or self.iters,
                                pcg_maxiter=self.pcg_maxiter)
        self._poses = np.array(vals[self.group])  # np.array: asarray of a jax array is read-only
        self._since_solve = 0
        return float(err)

    def estimate(self):
        return self._poses[: self.n].copy()
