"""Hybrid discrete-continuous inference: Gaussian mixtures over factor graphs.

Reference parity: gtsam/hybrid/ (SURVEY.md §2.10) — HybridGaussianFactor
(a discrete-indexed set of Gaussian factors), HybridNonlinearFactorGraph,
EliminateHybrid (sum-product over mixtures), HybridBayesNet::prune.

TPU-native formulation: hypotheses (discrete assignments) are solved IN ONE
BATCH — the per-hypothesis factor graphs share one structure and differ only
in measurement values, so they stack on a leading axis and `jax.vmap` of the
fully-jitted LM (optimizers.optimize_lm_jit) solves all of them in a single
XLA program (`_solve_batch`). Two drivers sit on top:

- `solve`: exact enumeration of the joint discrete domain — fine for the
  reference's own use cases (a handful of mode variables);
- `solve_beam`: sequential PER-MODE-VARIABLE elimination with pruning DURING
  elimination — the analogue of the reference's EliminateHybrid +
  in-elimination pruning (hybrid/HybridGaussianFactorGraph.h:106): mode
  variables are introduced one at a time, each surviving hypothesis branches
  over the new variable's values, and the beam is pruned back to
  `max_leaves` before the next variable — cost is O(#vars * max_leaves *
  card), never exponential.

The discrete posterior follows from the per-hypothesis optimum energies
(leaf weights of HybridBayesNet); pruning keeps the top-k leaves.

A `HybridFactor` is an ordinary FactorBatch whose measurement pytree carries a
leading MODES axis selected by a discrete variable assignment.
"""

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from gtsam_personal_tpu.core.graph import FactorBatch, FactorGraph
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.nonlinear import optimizers


def _stack_trees(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _solve_batch(graphs, warms, params):
    """Solve H structurally-identical continuous problems in ONE vmapped
    fully-jitted LM call. Returns (list of Values, np energies [H])."""
    if len(graphs) == 1:
        res = optimizers.optimize_lm(graphs[0], warms[0], params)
        return [res.values], np.asarray([res.error])
    gs = _stack_trees(graphs)
    vs = _stack_trees(warms)
    vals, errs, _ = jax.vmap(
        lambda g, v: optimizers.optimize_lm_jit(g, v, params))(gs, vs)
    out = [jax.tree.map(lambda x: x[h], vals) for h in range(len(graphs))]
    return out, np.asarray(errs)


class HybridFactor:
    """A factor whose measurement depends on a discrete mode variable.

    mode_var: discrete variable id; for each mode m the factor behaves like
    `batch` with measurements meas[m] (pytree with leading [modes] axis)."""

    def __init__(self, batch: FactorBatch, mode_var: int, num_modes: int,
                 per_mode_noise: bool = None):
        self.batch = batch          # meas arrays: [modes, K, ...]
        self.mode_var = mode_var
        self.num_modes = num_modes
        # per-mode noise = data carries a leading [modes] axis. Inferred from
        # the shape when unambiguous; when K or rdim coincidentally equals
        # num_modes the shape alone cannot distinguish per-mode from shared
        # data, so the caller must pass per_mode_noise explicitly.
        data = batch.noise.data
        if per_mode_noise is None:
            looks_per_mode = (data is not None and data.ndim >= 1
                              and data.shape[0] == num_modes)
            if looks_per_mode and (batch.idx.shape[0] == num_modes
                                   or batch.rdim == num_modes):
                raise ValueError(
                    "HybridFactor noise shape is ambiguous (leading axis == "
                    f"num_modes == K or rdim = {num_modes}); pass "
                    "per_mode_noise=True/False explicitly")
            per_mode_noise = looks_per_mode
        self.per_mode_noise = bool(per_mode_noise)

    def at_mode(self, m) -> FactorBatch:
        meas = jax.tree.map(lambda x: x[m], self.batch.meas)
        noise = self.batch.noise
        if self.per_mode_noise:
            from gtsam_personal_tpu.linear.noise import NoiseModel
            noise = NoiseModel(noise.kind, noise.data[m], noise.robust,
                               noise.k)
        return FactorBatch(self.batch.name, self.batch.residual_fn,
                           self.batch.groups, self.batch.rdim,
                           self.batch.idx, meas, noise)

    def log_normalizer(self, m: int) -> float:
        """log|det W_m| when the noise is per-mode; 0 for shared noise,
        where the constant cancels across modes. Joins the hypothesis
        energy so modes with different noise are scored by true negative
        log-likelihood (reference: HybridGaussianFactor logNormalizers)."""
        if not self.per_mode_noise:
            return 0.0
        from gtsam_personal_tpu.linear.noise import log_det_whitener
        return log_det_whitener(self.at_mode(m).noise)


class HybridFactorGraph:
    """Continuous factors + hybrid (mode-dependent) factors + discrete priors."""

    def __init__(self):
        self.continuous: List[FactorBatch] = []
        self.hybrid: List[HybridFactor] = []
        self.discrete_priors: Dict[int, np.ndarray] = {}

    def add_continuous(self, batch: FactorBatch):
        self.continuous.append(batch)

    def add_hybrid(self, hf: HybridFactor):
        self.hybrid.append(hf)

    def add_discrete_prior(self, var: int, probs):
        self.discrete_priors[var] = np.asarray(probs, dtype=np.float64)

    def mode_vars(self) -> List[int]:
        seen = []
        for hf in self.hybrid:
            if hf.mode_var not in seen:
                seen.append(hf.mode_var)
        return seen

    def assignments(self) -> List[Dict[int, int]]:
        """Enumerate the joint discrete domain."""
        vars = self.mode_vars()
        cards = {v: max(hf.num_modes for hf in self.hybrid if hf.mode_var == v)
                 for v in vars}
        out = [dict()]
        for v in vars:
            out = [{**a, v: m} for a in out for m in range(cards[v])]
        return out

    def graph_at(self, assignment: Dict[int, int]) -> FactorGraph:
        batches = list(self.continuous)
        for hf in self.hybrid:
            batches.append(hf.at_mode(assignment[hf.mode_var]))
        return FactorGraph(batches)

    def solve(self, initial: Values,
              params: Optional[optimizers.Params] = None,
              prune_to: Optional[int] = None):
        """Optimize the continuous variables under every discrete assignment
        and return (best_values, best_assignment, posterior dict).

        posterior[a] ∝ prior(a) * exp(-E*_a) with E*_a the optimum energy —
        the same leaf weights HybridBayesNet computes; prune_to keeps top-k
        (HybridBayesNet::prune analogue). All assignments are solved in ONE
        vmapped batch."""
        params = params or optimizers.Params(max_iterations=25)
        assignments = self.assignments()
        graphs = [self.graph_at(a) for a in assignments]
        values_list, energies = _solve_batch(
            graphs, [initial] * len(graphs), params)
        energies = np.asarray([self._prior_energy(a, e)
                               for a, e in zip(assignments, energies)])
        order = np.argsort(energies)
        if prune_to is not None:
            order = order[:prune_to]
        w = np.exp(-(energies[order] - energies[order].min()))
        w = w / w.sum()
        posterior = {tuple(sorted(assignments[k].items())): float(wk)
                     for k, wk in zip(order, w)}
        best = int(order[0])
        return values_list[best], assignments[best], posterior

    def _prior_energy(self, assignment, e):
        e = float(e)
        for v, m in assignment.items():
            if v in self.discrete_priors:
                e -= float(np.log(max(self.discrete_priors[v][m], 1e-300)))
        for hf in self.hybrid:
            if hf.mode_var in assignment:
                e -= hf.log_normalizer(assignment[hf.mode_var])
        return e

    def solve_beam(self, initial: Values, max_leaves: int = 8,
                   params: Optional[optimizers.Params] = None):
        """Scalable hybrid inference: sequential per-mode-variable elimination
        with pruning DURING elimination (the in-elimination pruning of the
        reference's EliminateHybrid, hybrid/HybridGaussianFactorGraph.h:106).

        Mode variables are introduced one at a time; each surviving
        hypothesis branches over the new variable's values, the continuous
        problems (restricted to factors whose mode variables are assigned so
        far, plus all continuous factors) are solved in one vmapped batch,
        and the beam is pruned to `max_leaves`. Total work is
        O(#mode_vars * max_leaves * card) continuous solves — bounded, never
        exponential in the number of mode variables.

        Returns (best_values, best_assignment, posterior) like `solve`."""
        params = params or optimizers.Params(max_iterations=25)
        vars_ = self.mode_vars()
        cards = {v: max(hf.num_modes for hf in self.hybrid
                        if hf.mode_var == v) for v in vars_}
        beam = [({}, initial, 0.0)]
        for i, v in enumerate(vars_):
            assigned = set(vars_[: i + 1])
            active = [hf for hf in self.hybrid if hf.mode_var in assigned]
            cands = [({**a, v: m}, vals)
                     for a, vals, _ in beam for m in range(cards[v])]
            graphs = [FactorGraph(list(self.continuous)
                                  + [hf.at_mode(a[hf.mode_var])
                                     for hf in active])
                      for a, _ in cands]
            values_list, errs = _solve_batch(
                graphs, [w for _, w in cands], params)
            scored = sorted(
                [(a, vals, self._prior_energy(a, e))
                 for (a, _), vals, e in zip(cands, values_list, errs)],
                key=lambda t: t[2])
            beam = scored[:max_leaves]
        es = np.asarray([h[2] for h in beam])
        w = np.exp(-(es - es.min()))
        w = w / w.sum()
        posterior = {tuple(sorted(h[0].items())): float(wk)
                     for h, wk in zip(beam, w)}
        return beam[0][1], beam[0][0], posterior


class HybridSmoother:
    """Incremental hybrid inference with mixture pruning (reference:
    hybrid/HybridSmoother.h, HybridGaussianISAM; driven exactly like the
    Hybrid_City10000.cpp example).

    Maintains at most `max_leaves` discrete hypotheses (partial assignments
    over the mode variables seen so far), each with a warm-started continuous
    estimate and its energy. Each `update` extends every surviving hypothesis
    with all values of the NEW mode variables, re-optimizes the continuous
    variables warm-started from the parent hypothesis, and prunes back to the
    top `max_leaves` — the pruned sum-product over mixtures that
    HybridBayesNet::prune(maxNrLeaves) performs on its decision tree."""

    def __init__(self, max_leaves: int = 8,
                 params: Optional[optimizers.Params] = None):
        self.max_leaves = max_leaves
        self.params = params or optimizers.Params(max_iterations=15)
        self.graph = HybridFactorGraph()
        # hypotheses: list of (assignment dict, Values or None, energy)
        self.hypotheses = [({}, None, 0.0)]

    def update(self, initial: Values, continuous=(), hybrids=()):
        """Add factors (continuous FactorBatches / HybridFactors) and refresh
        the pruned hypothesis set. `initial` supplies values for any new
        continuous variables (full-sized Values; existing estimates win)."""
        for b in continuous:
            self.graph.add_continuous(b)
        new_modes = []
        for hf in hybrids:
            self.graph.add_hybrid(hf)
            new_modes.append((hf.mode_var, hf.num_modes))

        mode_combos = [{}]
        for var, n in new_modes:
            mode_combos = [{**c, var: m} for c in mode_combos
                           for m in range(n)]

        assigns, warms = [], []
        for assignment, values, _ in self.hypotheses:
            warm = values if values is not None else initial
            # merge: keep prior estimates, adopt initial for new variables
            if values is not None:
                merged = {}
                for g in initial.groups():
                    if g in values.groups() and values[g].shape == initial[g].shape:
                        merged[g] = values[g]
                    elif g in values.groups():
                        n_old = values[g].shape[0]
                        merged[g] = initial[g].at[:n_old].set(values[g])
                    else:
                        merged[g] = initial[g]
                warm = Values(merged)
            for combo in mode_combos:
                assigns.append({**assignment, **combo})
                warms.append(warm)
        # ALL surviving-hypothesis x new-mode candidates solve in one
        # vmapped batch (identical graph structure, stacked measurements)
        graphs = [self.graph.graph_at(a) for a in assigns]
        values_list, errs = _solve_batch(graphs, warms, self.params)
        cand = sorted(
            [(a, vals, self.graph._prior_energy(a, e))
             for a, vals, e in zip(assigns, values_list, errs)],
            key=lambda t: t[2])
        self.hypotheses = cand[:self.max_leaves]
        return self.hypotheses[0]

    def estimate(self):
        """(best values, best mode assignment, normalized posterior)."""
        a, v, _ = self.hypotheses[0]
        es = np.asarray([h[2] for h in self.hypotheses])
        w = np.exp(-(es - es.min()))
        w = w / w.sum()
        posterior = {tuple(sorted(h[0].items())): float(wk)
                     for h, wk in zip(self.hypotheses, w)}
        return v, a, posterior


class HybridISAM:
    """BOUNDED-COST incremental hybrid inference: one bounded-cost ISAM2
    engine per surviving discrete hypothesis (reference capability:
    HybridGaussianISAM / HybridNonlinearISAM driving Hybrid_City10000).

    Continuous factors stream into every surviving hypothesis's engine
    (ISAM2 update = affected-variables relinearization + preconditioned CG,
    cost independent of history length). A hybrid factor branches every
    hypothesis over the new mode variable's values on CLONED engines (cheap:
    device pytrees are immutable and shared; identical capacity trajectories
    share all jit caches), updates each, reads its energy, and prunes back
    to `max_leaves` — per-update cost is O(max_leaves * modes) bounded
    engine updates, never a full-graph re-solve and never exponential in
    mode variables."""

    def __init__(self, max_leaves: int = 4, params=None):
        from gtsam_personal_tpu.nonlinear.isam2 import ISAM2, ISAM2Params
        self.max_leaves = max_leaves
        self.params = params or ISAM2Params()
        # (assignment dict, engine, energy)
        self.hypotheses = [({}, ISAM2(self.params), 0.0)]

    def add_variable(self, group: str, value) -> int:
        i = None
        for _, e, _ in self.hypotheses:
            i = e.add_variable(group, value)
        return i

    def add_factor(self, name, residual_fn, groups, rdim, idx, meas, noise):
        for _, e, _ in self.hypotheses:
            e.add_factor(name, residual_fn, groups, rdim, idx, meas, noise)

    def update(self):
        for _, e, _ in self.hypotheses:
            e.update()

    def add_hybrid_factor(self, name, residual_fn, groups, rdim, idx,
                          meas_modes: Sequence[dict], noise, mode_var: int,
                          mode_prior: Optional[Sequence[float]] = None):
        """Branch every hypothesis over the new mode variable, update each
        branch's engine, score, prune. `meas_modes[m]` is the measurement
        dict for mode m; `noise` may be a single NoiseModel or one per mode;
        `mode_prior[m]` an optional prior probability."""
        M = len(meas_modes)
        noises = noise if isinstance(noise, (list, tuple)) else [noise] * M
        prior_e = (np.zeros(M) if mode_prior is None
                   else -np.log(np.clip(np.asarray(mode_prior, float),
                                        1e-300, None)))
        # Gaussian log-normalizer: raw least-squares energies are comparable
        # across modes only when per-mode noises are identical; otherwise the
        # -log|det W_m| constant must join the hypothesis energy (reference:
        # HybridGaussianFactor logNormalizers).
        from gtsam_personal_tpu.linear.noise import log_det_whitener
        prior_e = prior_e - np.array([log_det_whitener(nm) for nm in noises])
        cand = []
        for a, e, _ in self.hypotheses:
            for m in range(M):
                e2 = e.clone() if m < M - 1 else e
                e2.add_factor(name, residual_fn, groups, rdim, idx,
                              meas_modes[m], noises[m])
                e2.update()
                cand.append(({**a, mode_var: m}, e2,
                             e2.error() + prior_e[m]))
        cand.sort(key=lambda t: t[2])
        self.hypotheses = cand[:self.max_leaves]
        return self.hypotheses[0]

    def estimate(self):
        """(best engine's Values, best assignment, normalized posterior)."""
        a, e, _ = self.hypotheses[0]
        es = np.asarray([h[2] for h in self.hypotheses])
        w = np.exp(-(es - es.min()))
        w = w / w.sum()
        posterior = {tuple(sorted(h[0].items())): float(wk)
                     for h, wk in zip(self.hypotheses, w)}
        return e.calculate_estimate(), a, posterior

    def best_engine(self):
        return self.hypotheses[0][1]
