"""Concurrent filtering and smoothing.

Reference parity: gtsam_unstable/nonlinear/ConcurrentFilteringAndSmoothing.h
(ConcurrentBatchFilter/Smoother pairs, SURVEY.md §2.12): a fast short-lag
filter serves online estimates while a full smoother runs over the whole
history; synchronization exchanges summarized information.

TPU-native rendering: the filter is the fixed-lag smoother (short window,
cheap updates); the smoother is a periodic full batch LM over all accumulated
factors (it owns ALL raw factors, so no filter->smoother summarization is
needed — it strictly dominates the reference's exchanged filter summary).
`synchronize()` performs the smoother->filter exchange: the filter's
accumulated boundary marginal prior is REPLACED by the SMOOTHER-BRANCH joint
marginal information on the same boundary variables (full-posterior marginal
minus the filter's retained raw window factors' Schur complement, so nothing
is double-counted), anchored at the smoothed estimates, and smoothed
estimates are pushed into the window — the analogue of
ConcurrentBatchSmoother::getSummarizedFactors feeding
ConcurrentBatchFilter (gtsam_unstable/nonlinear/ConcurrentBatchSmoother.h)."""

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
        """Smoother->filter summarized-factor exchange + estimate push
        (reference: ConcurrentFilteringAndSmoothing synchronization)."""
        if self.smoother_result is None:
            return
        sm = self.smoother_result.values

        # 1. replace the filter's accumulated marginal prior with the
        # smoother posterior's joint marginal on the same boundary slots
        boundary: List[Tuple[str, int]] = []
        kept: List[FactorBatch] = []
        for b in self.filter.batches:
            if b.name.startswith("marginal_"):
                idx = np.asarray(b.idx)
                for k in range(idx.shape[0]):
                    for s, g in enumerate(b.groups):
                        key = (g, int(idx[k, s]))
                        if key not in boundary:
                            boundary.append(key)
            else:
                kept.append(b)
        if boundary:
            # The summary must carry ONLY smoother-branch information: the
            # filter keeps its raw window factors (`kept`), so their boundary
            # information must not also appear inside the summary (it would
            # be double-counted -> overconfident, biased filter; ADVICE r2).
            # Window-interior variables are touched only by window factors
            # and smoother-interior ones only by smoother factors, so the
            # full posterior's boundary marginal decomposes additively:
            #   Lam_full(B) = Lam_smoother_branch(B) + Schur_B(kept window).
            # We subtract the (directly computable) window term.
            summary = _smoother_summary(
                FactorGraph(self.all_batches), sm, boundary,
                exclude=FactorGraph(kept) if kept else None)
            self.filter.batches = kept + [summary]

        # 2. push smoothed estimates into the filter window
        blocks = dict(self.filter.values.blocks)
        for g, arr in sm.blocks.items():
            if g in blocks:
                n = min(arr.shape[0], blocks[g].shape[0])
                blocks[g] = blocks[g].at[:n].set(arr[:n]) if hasattr(
                    blocks[g], "at") else arr
        self.filter.values = Values(blocks)

    def filtered_estimate(self) -> Values:
        return self.filter.estimate()

    def smoother_summary_on(self, boundary: List[Tuple[str, int]],
                            exclude: Optional[FactorGraph] = None):
        """The smoother's summarized factor on arbitrary boundary slots
        (reference: ConcurrentBatchSmoother::getSummarizedFactors). Pass
        `exclude` = the factors the receiver already holds raw, so their
        information is not double-counted."""
        if self.smoother_result is None:
            return None
        return _smoother_summary(FactorGraph(self.all_batches),
                                 self.smoother_result.values, boundary,
                                 exclude=exclude)

    def smoothed_estimate(self) -> Optional[Values]:
        return None if self.smoother_result is None else self.smoother_result.values


def _smoother_summary(graph: FactorGraph, values: Values,
                      boundary: List[Tuple[str, int]],
                      exclude: Optional[FactorGraph] = None) -> FactorBatch:
    """Dense Gaussian factor equal to the smoother-branch joint marginal
    information on `boundary`, anchored at the smoothed estimates.

    Computed as the full posterior's boundary marginal information minus the
    Schur complement of the `exclude` graph (the filter's retained raw window
    factors) onto the same boundary — exact because window-interior and
    smoother-interior variables are disjoint across the two branches. The
    linear term is -g_window(anchor): at the smoothed mode the full marginal
    gradient is zero, so the smoother branch's gradient is the negative of
    the window branch's (reference semantics:
    ConcurrentBatchSmoother::getSummarizedFactors)."""
    from gtsam_personal_tpu.core import manifolds
    from gtsam_personal_tpu.linear.marginal import (graph_info_on,
                                                    make_marginal_residual)
    from gtsam_personal_tpu.linear.noise import NoiseModel
    from gtsam_personal_tpu.nonlinear.marginals import Marginals

    cov = np.asarray(Marginals(graph, values, damping=1e-9)
                     .joint_marginal_covariance(boundary))
    Lam = np.linalg.inv(0.5 * (cov + cov.T))
    g_lin = np.zeros(Lam.shape[0])
    if exclude is not None and exclude.batches:
        Lam_w, g_w = graph_info_on(exclude, values, boundary)
        Lam = Lam - Lam_w
        g_lin = -g_w
    Lam = 0.5 * (Lam + Lam.T)
    w, V = np.linalg.eigh(Lam)
    w = np.clip(w, 1e-12, None)
    S = np.diag(np.sqrt(w)) @ V.T           # S^T S = Lam
    # r0 solves S^T r0 = g_lin; near-null directions of the (subtracted)
    # information are projected out rather than amplified
    good = w > 1e-9 * max(float(w.max()), 1.0)
    r0 = np.where(good, (V.T @ g_lin) / np.sqrt(w), 0.0)
    groups = tuple(g for g, _ in boundary)
    dtype = np.asarray(values[groups[0]]).dtype
    meas = {"sqrt_info": jnp.asarray(S[None], dtype=dtype),
            "r0": jnp.asarray(r0[None], dtype=dtype)}
    for s, (g, i) in enumerate(boundary):
        meas[f"anchor{s}"] = jnp.asarray(
            np.asarray(values[g][i])[None], dtype=dtype)
    return FactorBatch(
        "marginal_" + "_".join(groups), make_marginal_residual(groups),
        groups, S.shape[0],
        jnp.asarray(np.array([[i for _, i in boundary]], dtype=np.int32)),
        meas, NoiseModel("unit"))
