"""Concurrent filtering and smoothing.

Reference parity: gtsam_unstable/nonlinear/ConcurrentFilteringAndSmoothing.h
(ConcurrentBatchFilter/Smoother pairs, SURVEY.md §2.12): a fast short-lag
filter serves online estimates while a full smoother runs over the whole
history; synchronization exchanges summarized information.

TPU-native rendering: the filter is the fixed-lag smoother (short window,
cheap updates); the smoother is a periodic full batch LM over all accumulated
factors. `synchronize()` pushes smoothed estimates back into the filter's
current window (the filter's marginal priors stay anchored at its own
linearization, keeping updates consistent)."""

from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from gtsam_personal_tpu.core.graph import FactorBatch, FactorGraph
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.nonlinear import optimizers
from gtsam_personal_tpu.nonlinear.fixed_lag import FixedLagSmoother


class ConcurrentFilterSmoother:
    def __init__(self, filter_lag: float = 5.0,
                 smoother_every: int = 20,
                 filter_params: Optional[optimizers.Params] = None,
                 smoother_params: Optional[optimizers.Params] = None):
        self.filter = FixedLagSmoother(
            filter_lag, filter_params or optimizers.Params(max_iterations=5))
        self.smoother_every = smoother_every
        self.smoother_params = smoother_params or optimizers.Params(max_iterations=30)
        self.all_batches: List[FactorBatch] = []
        self.all_values: Optional[Values] = None
        self._updates = 0
        self.smoother_result = None

    def update(self, new_batches, new_values=None, timestamps=None):
        """Fast path: filter update; every `smoother_every` updates the full
        smoother runs and synchronizes."""
        self.all_batches.extend(new_batches)
        if new_values is not None:
            from gtsam_personal_tpu.nonlinear.fixed_lag import _merge_values
            self.all_values = _merge_values(self.all_values, new_values)
        res = self.filter.update(new_batches, new_values, timestamps)
        self._updates += 1
        if self._updates % self.smoother_every == 0:
            self.run_smoother()
            self.synchronize()
        return res

    def run_smoother(self):
        init = self.all_values
        # warm start from the filter's current estimates where available
        blocks = dict(init.blocks)
        for g, arr in self.filter.values.blocks.items():
            if g in blocks and arr.shape[0] >= blocks[g].shape[0]:
                blocks[g] = arr[: blocks[g].shape[0]]
        self.smoother_result = optimizers.optimize_lm(
            FactorGraph(self.all_batches), Values(blocks), self.smoother_params)
        self.all_values = self.smoother_result.values
        return self.smoother_result

    def synchronize(self):
        """Push smoothed estimates into the filter (reference:
        synchronization step exchanging summarized factors)."""
        if self.smoother_result is None:
            return
        sm = self.smoother_result.values
        blocks = dict(self.filter.values.blocks)
        for g, arr in sm.blocks.items():
            if g in blocks:
                n = min(arr.shape[0], blocks[g].shape[0])
                blocks[g] = blocks[g].at[:n].set(arr[:n]) if hasattr(
                    blocks[g], "at") else arr
        self.filter.values = Values(blocks)

    def filtered_estimate(self) -> Values:
        return self.filter.estimate()

    def smoothed_estimate(self) -> Optional[Values]:
        return None if self.smoother_result is None else self.smoother_result.values
