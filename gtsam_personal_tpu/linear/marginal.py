"""Variable marginalization -> dense Gaussian marginal prior factors.

The capability behind the reference's fixed-lag smoothing
(nonlinear/BatchFixedLagSmoother marginalize), ISAM2::marginalizeLeaves
(ISAM2.h:199) and Marginals (nonlinear/Marginals.h): eliminate a subset of
variables from the linearized system and keep the induced Gaussian prior on
their Markov blanket, anchored at the linearization point.

The marginal factor is
  r(x) = S xi(x) + r0,   xi(x) = concat_s local(anchor_s, x_s)
with S^T S = Lambda (the marginal information) and S^T r0 = g_marg, so its
Gauss-Newton contribution reproduces the Schur complement exactly.
"""

from typing import Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from gtsam_personal_tpu.core import manifolds
from gtsam_personal_tpu.core.graph import FactorBatch, FactorGraph
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.linear.linearize import linearize_batch
from gtsam_personal_tpu.linear.noise import NoiseModel

# jitted + cached: marginalize() runs per eviction in streaming use
# (ISAM2.marginalize_variables); an eager linearize_batch re-traces the
# vmapped jacfwd EVERY call and dominated the eviction cost (measured
# ~0.7 s/eviction of pure tracing on a toy chain; the jit cache keys on
# batch structure + shapes, which are stable along a stream)
_linearize_batch_jit = jax.jit(linearize_batch)


def make_marginal_residual(groups: Tuple[str, ...]):
    ms = [manifolds.get(g) for g in groups]

    def residual(xs, meas):
        xis = [m.local(meas[f"anchor{s}"], x) for s, (m, x) in enumerate(zip(ms, xs))]
        xi = jnp.concatenate(xis)
        return meas["sqrt_info"] @ xi + meas["r0"]

    residual.__name__ = "marginal_" + "_".join(groups)
    return residual


def marginalize(graph: FactorGraph, values: Values,
                marg: Dict[str, Sequence[int]]):
    """Marginalize the given variables out of `graph` at linearization point
    `values`.

    Returns (remaining_graph, marginal_batch, boundary) where marginal_batch
    is a single dense FactorBatch over the boundary variables (or None if the
    marginalized set is disconnected) and `boundary` lists its (group, index)
    slots. Factor batches touching marginalized variables are removed from
    the remaining graph (their information lives on in the marginal factor).

    Runs the tiny dense Schur complement on host (numpy): marginalized sets
    are small by construction in fixed-lag use."""
    marg_sets = {g: set(map(int, ix)) for g, ix in marg.items()}

    def touches(b: FactorBatch):
        idx = np.asarray(b.idx)
        hit = np.zeros(idx.shape[0], dtype=bool)
        for s, g in enumerate(b.groups):
            if g in marg_sets and marg_sets[g]:
                hit |= np.isin(idx[:, s], list(marg_sets[g]))
        return hit

    keep_batches: List[FactorBatch] = []
    involved: List[Tuple[FactorBatch, np.ndarray]] = []
    for b in graph.batches:
        hit = touches(b)
        if not hit.any():
            keep_batches.append(b)
            continue
        if not hit.all():
            keep_batches.append(_select(b, np.where(~hit)[0]))
        involved.append((b, np.where(hit)[0]))

    if not involved:
        return FactorGraph(keep_batches), None, []

    # collect variables of the involved factors
    slots: Dict[Tuple[str, int], int] = {}
    marg_slots, bound_slots = [], []
    for b, rows in involved:
        idx = np.asarray(b.idx)
        for s, g in enumerate(b.groups):
            for i in np.unique(idx[rows, s]):
                key = (g, int(i))
                if key not in slots:
                    slots[key] = -1
                    (marg_slots if int(i) in marg_sets.get(g, ())
                     else bound_slots).append(key)
    order = marg_slots + bound_slots
    off = 0
    offs = {}
    for key in order:
        offs[key] = off
        off += manifolds.get(key[0]).dim
    D = off
    Dm = sum(manifolds.get(g).dim for g, _ in marg_slots)

    # assemble dense H, g from the involved (sub)factors
    H = np.zeros((D, D))
    gv = np.zeros(D)
    for b, rows in involved:
        sub = _select(b, rows)
        lb = _linearize_batch_jit(sub, values)
        sgn = getattr(lb, "sign", 1.0)  # AntiFactor batches SUBTRACT info
        idx = np.asarray(sub.idx)
        for k in range(idx.shape[0]):
            Js = [np.asarray(lb.Js[s][k]) for s in range(len(b.groups))]
            r = np.asarray(lb.r[k])
            cols = [offs[(g, int(idx[k, s]))] for s, g in enumerate(b.groups)]
            dims = [manifolds.get(g).dim for g in b.groups]
            for s in range(len(b.groups)):
                gv[cols[s]:cols[s] + dims[s]] += sgn * (Js[s].T @ r)
                for t in range(len(b.groups)):
                    H[cols[s]:cols[s] + dims[s], cols[t]:cols[t] + dims[t]] += sgn * (Js[s].T @ Js[t])

    # Schur complement onto the boundary
    Hmm = H[:Dm, :Dm] + 1e-9 * np.eye(Dm)
    Hmb = H[:Dm, Dm:]
    Hbb = H[Dm:, Dm:]
    gm, gb = gv[:Dm], gv[Dm:]
    sol = np.linalg.solve(Hmm, np.concatenate([Hmb, gm[:, None]], axis=1))
    Lam = Hbb - Hmb.T @ sol[:, :-1]
    gmarg = gb - Hmb.T @ sol[:, -1]
    Lam = 0.5 * (Lam + Lam.T)
    w, V = np.linalg.eigh(Lam)
    w = np.clip(w, 1e-12, None)
    S = np.diag(np.sqrt(w)) @ V.T           # S^T S = Lam
    r0 = np.linalg.solve(S.T, gmarg)

    if not bound_slots:
        return FactorGraph(keep_batches), None, []

    groups = tuple(g for g, _ in bound_slots)
    dtype = np.asarray(jax.tree.leaves(values)[0]).dtype
    meas = {"sqrt_info": jnp.asarray(S[None], dtype=dtype),
            "r0": jnp.asarray(r0[None], dtype=dtype)}
    for s, (g, i) in enumerate(bound_slots):
        meas[f"anchor{s}"] = jnp.asarray(np.asarray(values[g][i])[None], dtype=dtype)
    marginal = FactorBatch(
        "marginal_" + "_".join(groups), make_marginal_residual(groups), groups,
        S.shape[0],
        jnp.asarray(np.array([[i for _, i in bound_slots]], dtype=np.int32)),
        meas, NoiseModel("unit"))
    return FactorGraph(keep_batches), marginal, bound_slots


def graph_info_on(graph: FactorGraph, values: Values,
                  boundary: Sequence[Tuple[str, int]]):
    """Dense (Lambda, g) of `graph` Schur-complemented onto the ordered
    `boundary` slots (all other variables of the graph are eliminated).
    Boundary slots the graph never touches get zero rows/cols. Host-side
    numpy; used for summarized-factor exchange (concurrent filter/smoother,
    reference: ConcurrentBatchSmoother::getSummarizedFactors)."""
    bound = [(g, int(i)) for g, i in boundary]
    bset = set(bound)
    offs: Dict[Tuple[str, int], int] = {}
    off = 0
    for key in bound:
        offs[key] = off
        off += manifolds.get(key[0]).dim
    Db = off
    interior: List[Tuple[str, int]] = []
    for b in graph.batches:
        idx = np.asarray(b.idx)
        for s, g in enumerate(b.groups):
            for i in np.unique(idx[:, s]):
                key = (g, int(i))
                if key not in offs:
                    offs[key] = off
                    off += manifolds.get(g).dim
                    interior.append(key)
    D = off

    H = np.zeros((D, D))
    gv = np.zeros(D)
    for b in graph.batches:
        lb = _linearize_batch_jit(b, values)
        sgn = getattr(lb, "sign", 1.0)  # AntiFactor batches SUBTRACT info
        idx = np.asarray(b.idx)
        dims = [manifolds.get(g).dim for g in b.groups]
        for k in range(idx.shape[0]):
            Js = [np.asarray(lb.Js[s][k]) for s in range(len(b.groups))]
            r = np.asarray(lb.r[k])
            cols = [offs[(g, int(idx[k, s]))] for s, g in enumerate(b.groups)]
            for s in range(len(b.groups)):
                gv[cols[s]:cols[s] + dims[s]] += sgn * (Js[s].T @ r)
                for t in range(len(b.groups)):
                    H[cols[s]:cols[s] + dims[s],
                      cols[t]:cols[t] + dims[t]] += sgn * (Js[s].T @ Js[t])

    if D == Db:
        return H, gv
    Hbb = H[:Db, :Db]
    Hbi = H[:Db, Db:]
    Hii = H[Db:, Db:] + 1e-9 * np.eye(D - Db)
    sol = np.linalg.solve(Hii, np.concatenate([Hbi.T, gv[Db:, None]], axis=1))
    Lam = Hbb - Hbi @ sol[:, :-1]
    g_out = gv[:Db] - Hbi @ sol[:, -1]
    return 0.5 * (Lam + Lam.T), g_out


def _select(b: FactorBatch, rows: np.ndarray) -> FactorBatch:
    rows = jnp.asarray(rows, dtype=jnp.int32)
    take = lambda x: x[rows]
    noise = b.noise
    data = noise.data
    if data is not None and data.shape[0] == b.size:
        data = data[rows]
    k = noise.k
    if k is not None and getattr(k, "ndim", 0) >= 1 and k.shape[0] == b.size:
        k = k[rows]
    return FactorBatch(b.name, b.residual_fn, b.groups, b.rdim,
                       take(b.idx), jax.tree.map(take, b.meas),
                       NoiseModel(noise.kind, data, noise.robust, k),
                       sign=b.sign)
