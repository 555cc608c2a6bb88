"""Fixed-lag smoother: sliding-window optimization with exact marginalization.

Reference parity: BatchFixedLagSmoother (nonlinear/BatchFixedLagSmoother.h) /
IncrementalFixedLagSmoother — and the *capability* of ISAM2's bounded-cost
incremental updates (SURVEY.md §7: the TPU design replaces pointer-based
Bayes-tree surgery with sliding-window re-solves + marginal prior caching).

Variables carry user timestamps; `update()` adds factors/values, re-optimizes,
and marginalizes every variable older than `lag` into a dense Gaussian prior
on its Markov blanket (linear/marginal.py). Factors fully inside the
marginalized set are consumed by the prior; estimates of marginalized
variables are frozen at their last smoothed value.
"""

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from gtsam_personal_tpu.core.graph import FactorBatch, FactorGraph, GraphBuilder
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.nonlinear import optimizers


class FixedLagSmoother:
    def __init__(self, lag: float, params: Optional[optimizers.Params] = None):
        self.lag = lag
        self.params = params or optimizers.Params(max_iterations=10)
        self.batches: List[FactorBatch] = []
        self.values: Optional[Values] = None
        self.timestamps: Dict[Tuple[str, int], float] = {}
        self.frozen: Dict[str, Dict[int, np.ndarray]] = {}

    # -- public API (mirrors BatchFixedLagSmoother::update) -----------------
    def update(self, new_batches: Sequence[FactorBatch],
               new_values: Optional[Values] = None,
               timestamps: Optional[Dict[Tuple[str, int], float]] = None):
        if new_values is not None:
            self.values = _merge_values(self.values, new_values)
        if timestamps:
            self.timestamps.update(timestamps)
        self.batches.extend(new_batches)

        res = optimizers.optimize_lm(FactorGraph(self.batches), self.values,
                                     self.params)
        self.values = res.values

        self._marginalize_old()
        return res

    def estimate(self) -> Values:
        return self.values

    def frozen_estimate(self, group: str, i: int):
        return self.frozen.get(group, {}).get(i)

    # -- internals -----------------------------------------------------------
    def _marginalize_old(self):
        if not self.timestamps:
            return
        horizon = max(self.timestamps.values()) - self.lag
        old = [k for k, t in self.timestamps.items() if t < horizon]
        if not old:
            return
        from gtsam_personal_tpu.linear.marginal import marginalize
        marg: Dict[str, List[int]] = {}
        for g, i in old:
            marg.setdefault(g, []).append(i)
        remaining, marginal, _ = marginalize(
            FactorGraph(self.batches), self.values, marg)
        self.batches = list(remaining.batches)
        if marginal is not None:
            self.batches.append(marginal)
        for g, i in old:
            self.frozen.setdefault(g, {})[i] = np.asarray(self.values[g][i])
            del self.timestamps[(g, i)]
        # note: marginalized variables stay in the Values arrays (dense
        # storage) but no factor references them any more; their tangent
        # columns are inert (zero gradient, unit damped diagonal).


def _merge_values(a: Optional[Values], b: Values) -> Values:
    if a is None:
        return b
    blocks = dict(a.blocks)
    for g, arr in b.blocks.items():
        if g in blocks:
            n_old = blocks[g].shape[0]
            if arr.shape[0] > n_old:
                blocks[g] = jnp.concatenate([blocks[g], arr[n_old:]], axis=0)
        else:
            blocks[g] = arr
    return Values(blocks)
