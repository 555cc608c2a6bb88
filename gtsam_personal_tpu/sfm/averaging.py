"""SfM averaging utilities: Karcher mean, translation recovery, MFAS.

Reference parity:
- KarcherMeanFactor / FindKarcherMean (slam/KarcherMeanFactor.h): intrinsic
  mean of rotations by Riemannian gradient descent.
- TranslationRecovery (sfm/TranslationRecovery.h): 1dsfm-style translation
  averaging from unit direction measurements, solved as a linear factor graph
  with the standard batched stack.
- MFAS (sfm/MFAS.h): minimum-feedback-arc-set ordering used for outlier
  rejection of translation directions along a projection axis.
"""

from typing import Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from gtsam_personal_tpu.core import manifolds
from gtsam_personal_tpu.core.graph import FactorBatch, FactorGraph
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.geometry import so3
from gtsam_personal_tpu.linear.noise import NoiseModel
from gtsam_personal_tpu.nonlinear import optimizers


def karcher_mean_so3(rotations, iters: int = 20):
    """Intrinsic (Karcher) mean on SO(3): R_{k+1} = R_k Exp(mean log(R_k^T R_i))."""
    Rs = jnp.asarray(rotations)

    def body(R, _):
        logs = jax.vmap(lambda Ri: so3.logmap(R.T @ Ri))(Rs)
        return R @ so3.expmap(jnp.mean(logs, axis=0)), None

    R, _ = jax.lax.scan(body, Rs[0], None, length=iters)
    return R


def _direction_residual(xs, meas):
    """Translation-recovery factor: the direction from t_i to t_j should match
    the measured unit vector (reference: TranslationFactor). Residual scales
    the chord difference so it is smooth at all separations."""
    ti, tj = xs
    d = tj - ti
    norm = jnp.sqrt(jnp.dot(d, d) + 1e-12)
    return d / norm - meas["w_iZj"]


def translation_recovery(edges_ij: np.ndarray, directions: np.ndarray,
                         scale: float = 1.0, seed: int = 0,
                         params=None) -> np.ndarray:
    """Recover global positions from pairwise unit directions (gauge: t_0 = 0,
    first baseline length = scale)."""
    n = int(edges_ij.max()) + 1
    t3 = manifolds.vector_space("trans_avg", 3)
    batch = FactorBatch(
        "translation_direction", _direction_residual,
        (t3.name, t3.name), 3, jnp.asarray(edges_ij.astype(np.int32)),
        {"w_iZj": jnp.asarray(directions)}, NoiseModel("unit"))

    def anchor0(xs, meas):
        return xs[0] - meas["p"]

    a0 = FactorBatch("anchor0", anchor0, (t3.name,), 3,
                     jnp.zeros((1, 1), dtype=jnp.int32),
                     {"p": jnp.zeros((1, 3))},
                     NoiseModel("diag", jnp.full((1, 3), 1e3)))
    # fix scale: anchor node edges_ij[0,1] at scale * direction
    j0 = int(edges_ij[0, 1])
    a1 = FactorBatch("anchor1", anchor0, (t3.name,), 3,
                     jnp.asarray([[j0]], dtype=jnp.int32),
                     {"p": jnp.asarray(scale * directions[:1])},
                     NoiseModel("diag", jnp.full((1, 3), 1e3)))
    graph = FactorGraph([a0, a1, batch])
    rng = np.random.default_rng(seed)
    init = Values({t3.name: jnp.asarray(rng.normal(scale=1.0, size=(n, 3)))})
    params = params or optimizers.Params(max_iterations=100)
    res = optimizers.optimize_lm(graph, init, params)
    t = np.asarray(res.values[t3.name])
    return t - t[0]


def mfas_order(edges_ij: np.ndarray, directions: np.ndarray,
               axis: np.ndarray) -> List[int]:
    """Minimum-feedback-arc-set ordering of nodes along a projection axis
    (greedy heuristic, reference: MFAS::computeOrdering)."""
    n = int(edges_ij.max()) + 1
    w = directions @ np.asarray(axis)
    out_w = np.zeros(n)
    in_w = np.zeros(n)
    adj: List[List[Tuple[int, float]]] = [[] for _ in range(n)]
    for k, (i, j) in enumerate(edges_ij):
        wk = w[k]
        if wk >= 0:
            out_w[i] += wk; in_w[j] += wk
            adj[i].append((j, wk)); adj[j].append((i, -wk))
        else:
            out_w[j] += -wk; in_w[i] += -wk
            adj[j].append((i, -wk)); adj[i].append((j, wk))
    order = []
    alive = np.ones(n, dtype=bool)
    for _ in range(n):
        score = np.where(alive, (out_w + 1e-9) / (in_w + 1e-9), -np.inf)
        u = int(np.argmax(score))
        order.append(u)
        alive[u] = False
        for v, wv in adj[u]:
            if alive[v]:
                if wv >= 0:
                    in_w[v] -= wv
                else:
                    out_w[v] -= -wv
    return order


def mfas_outlier_weights(edges_ij: np.ndarray, directions: np.ndarray,
                         axes: Sequence[np.ndarray]) -> np.ndarray:
    """Accumulated inconsistency weight per edge over several projection axes
    (reference: MFAS-based outlier rejection in translation averaging)."""
    total = np.zeros(len(edges_ij))
    for axis in axes:
        order = mfas_order(edges_ij, directions, axis)
        pos = np.empty(len(order), dtype=int)
        pos[order] = np.arange(len(order))
        w = directions @ np.asarray(axis)
        for k, (i, j) in enumerate(edges_ij):
            # edge implies i before j when projected weight positive
            if w[k] >= 0 and pos[i] > pos[j]:
                total[k] += w[k]
            elif w[k] < 0 and pos[j] > pos[i]:
                total[k] += -w[k]
    return total
