"""Factor graph as structure-of-arrays batches.

The reference's `NonlinearFactorGraph` is a vector of shared_ptr factors
(gtsam/inference/FactorGraph.h:57); linearization walks them with a TBB
parallel_for (nonlinear/NonlinearFactorGraph.cpp:252). The TPU-native design
groups all factors of one *type* into a single `FactorBatch` whose measurement
and index arrays have leading dimension K; residuals and Jacobians for the
whole batch evaluate as one `jax.vmap` over autodiff through the manifold
retractions (SURVEY.md §2.11 P2).
"""

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_personal_tpu.core import manifolds
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.linear.noise import NoiseModel, error as noise_error, whiten_system


@jax.tree_util.register_pytree_node_class
class FactorBatch:
    """K structurally-identical factors.

    residual_fn(xs, meas) -> [rdim]: pure function of one factor's variable
    points (tuple, one per slot) and one measurement slice. Static metadata
    (groups, residual_fn, rdim, name) is pytree aux data so jit retraces only
    when structure changes.
    """

    def __init__(self, name: str, residual_fn: Callable,
                 groups: Tuple[str, ...], rdim: int,
                 idx: jnp.ndarray, meas, noise: NoiseModel,
                 sign: float = 1.0):
        self.name = name
        self.residual_fn = residual_fn
        self.groups = tuple(groups)
        self.rdim = rdim
        self.idx = idx            # i32 [K, nslots]
        self.meas = meas          # pytree, leading K
        self.noise = noise
        # sign = -1.0 turns the batch into an AntiFactor: its linearized
        # Hessian/gradient contribution and error are SUBTRACTED, exactly
        # cancelling an identical +1 batch (reference: slam/AntiFactor.h:97
        # returns the negated GaussianFactor).
        self.sign = float(sign)

    @property
    def size(self):
        return self.idx.shape[0]

    def tree_flatten(self):
        return (self.idx, self.meas, self.noise), (
            self.name, self.residual_fn, self.groups, self.rdim, self.sign)

    @classmethod
    def tree_unflatten(cls, aux, children):
        name, residual_fn, groups, rdim, sign = aux
        idx, meas, noise = children
        return cls(name, residual_fn, groups, rdim, idx, meas, noise, sign)

    # -- evaluation --------------------------------------------------------
    def gather_points(self, values: Values):
        return tuple(values[g][self.idx[:, s]] for s, g in enumerate(self.groups))

    def residuals(self, values: Values):
        pts = self.gather_points(values)
        return jax.vmap(self.residual_fn)(pts, self.meas)

    def error(self, values: Values):
        return self.sign * noise_error(self.noise, self.residuals(values))

    def negated(self) -> "FactorBatch":
        """AntiFactor wrapper (reference: slam/AntiFactor.h) — a batch whose
        error and linearized contribution carry the opposite sign, removing
        the effect of an identical already-added batch from any solve."""
        return FactorBatch(self.name + "_anti", self.residual_fn, self.groups,
                           self.rdim, self.idx, self.meas, self.noise,
                           sign=-self.sign)

    def __repr__(self):
        return f"FactorBatch({self.name}, K={self.idx.shape[0]}, groups={self.groups})"


@jax.tree_util.register_pytree_node_class
class FactorGraph:
    """A list of factor batches (the whole nonlinear factor graph)."""

    def __init__(self, batches: Sequence[FactorBatch]):
        self.batches = list(batches)

    def tree_flatten(self):
        return tuple(self.batches), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(list(children))

    def error(self, values: Values):
        """Total error 0.5 sum ||whitened residual||^2 (+ robust losses).

        Reference: NonlinearFactorGraph::error."""
        total = jnp.zeros((), dtype=jnp.result_type(*[
            v.dtype for v in jax.tree.leaves(values)] or [jnp.float32]))
        for b in self.batches:
            total = total + b.error(values)
        return total

    @property
    def num_factors(self):
        return sum(b.size for b in self.batches)

    def __repr__(self):
        return "FactorGraph(\n  %s\n)" % "\n  ".join(map(repr, self.batches))


class GraphBuilder:
    """Host-side incremental builder: append factors one by one (as the
    reference's `graph.add(...)` API does), then `build()` stacks them into
    batches keyed by (name, rdim, noise-structure)."""

    def __init__(self):
        self._factors: Dict[tuple, dict] = {}

    def add(self, name: str, residual_fn: Callable, groups: Sequence[str],
            rdim: int, idx: Sequence[int], meas, noise_data: dict):
        """noise_data: {'kind','data','robust','k'} with per-factor arrays."""
        key = (name, tuple(groups), rdim, noise_data["kind"], noise_data.get("robust", "none"))
        slot = self._factors.setdefault(key, {
            "residual_fn": residual_fn, "idx": [], "meas": [],
            "noise_data": [], "noise_k": [],
        })
        slot["idx"].append(np.asarray(idx, dtype=np.int32))
        slot["meas"].append(meas)
        slot["noise_data"].append(noise_data.get("data"))
        slot["noise_k"].append(noise_data.get("k"))

    def build(self, dtype=None) -> FactorGraph:
        batches = []
        for (name, groups, rdim, kind, rob), slot in self._factors.items():
            idx = jnp.asarray(np.stack(slot["idx"]))
            meas = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *slot["meas"])
            if dtype is not None:
                meas = jax.tree.map(
                    lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, meas)
            data = None
            if kind != "unit":
                data = jnp.asarray(np.stack(slot["noise_data"]))
                if dtype is not None:
                    data = data.astype(dtype)
            k = None
            if rob != "none":
                k = jnp.asarray(np.stack(slot["noise_k"]))
            nm = NoiseModel(kind, data, rob, k)
            batches.append(FactorBatch(name, slot["residual_fn"], groups, rdim, idx, meas, nm))
        return FactorGraph(batches)
