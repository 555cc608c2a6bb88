"""Pose-graph initialization: chordal relaxation for SE(3) (and LAGO-style
linear init for SE(2) angles).

Reference parity: gtsam/slam/InitializePose3.h:36-91 — relax the rotation
constraints R_j ~= R_i * R_ij into a linear least-squares problem on the 9
entries of each rotation ("chordal relaxation"), project the solutions back to
SO(3) by SVD, then solve positions linearly with rotations fixed.

Both stages are expressed as factor graphs over vector-space groups ("rot9",
"t3") and solved with one Gauss-Newton step (they are linear), reusing the
whole batched linearize + solve stack — no special-purpose solver code.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gtsam_personal_tpu.core import manifolds
from gtsam_personal_tpu.core.graph import FactorBatch, FactorGraph
from gtsam_personal_tpu.core.values import Layout, Values
from gtsam_personal_tpu.linear.linearize import linearize
from gtsam_personal_tpu.linear import solvers
from gtsam_personal_tpu.linear.noise import NoiseModel
from gtsam_personal_tpu.geometry import so3

manifolds.vector_space("rot9", 9)
manifolds.vector_space("t3", 3)
_ROT9 = manifolds.get("rot9")
_T3 = manifolds.get("t3")


def _rot_residual(xs, meas):
    xi, xj = xs
    Rij = meas["Rij"]
    return (xj.reshape(3, 3) - xi.reshape(3, 3) @ Rij).reshape(9)


def _rot_prior_residual(xs, meas):
    (x,) = xs
    return x - meas["prior"]


def _trans_residual(xs, meas):
    ti, tj = xs
    return tj - ti - meas["dt"]


def _trans_prior_residual(xs, meas):
    (x,) = xs
    return x - meas["prior"]


def _solve_linear(graph: FactorGraph, initial: Values, use_pcg: bool):
    lin = linearize(graph, initial)
    if use_pcg:
        delta = solvers.solve_pcg(lin, lam=1e-8, maxiter=500, tol=1e-10)
    else:
        delta = solvers.solve_dense(lin, Layout.of(initial), lam=1e-10)
    return initial.retract(delta)


def chordal_init(graph: FactorGraph, num_poses: int, group: str = "se3",
                 use_pcg: bool = None) -> Values:
    """Initial SE(3) values from between-factor measurements only.

    Extracts `between_se3` batches from `graph`; anchors pose 0 at identity.
    """
    edges = []
    for b in graph.batches:
        if b.name == f"between_{group}" and group == "se3":
            ij = np.asarray(b.idx)
            T = np.asarray(b.meas["measured"])
            edges.append((ij, T))
    if not edges:
        raise ValueError("no between_se3 factors found")
    ij = np.concatenate([e[0] for e in edges], axis=0)
    T = np.concatenate([e[1] for e in edges], axis=0)
    dtype = T.dtype
    n = num_poses
    if use_pcg is None:
        use_pcg = n * 9 > 6000

    # ---- stage 1: rotations by chordal relaxation ----
    rot_between = FactorBatch(
        "chordal_rot", _rot_residual, ("rot9", "rot9"), 9,
        jnp.asarray(ij), {"Rij": jnp.asarray(T[:, :, :3])}, NoiseModel("unit"))
    rot_prior = FactorBatch(
        "chordal_rot_prior", _rot_prior_residual, ("rot9",), 9,
        jnp.zeros((1, 1), dtype=jnp.int32),
        {"prior": jnp.asarray(np.eye(3, dtype=dtype).reshape(1, 9))},
        NoiseModel("diag", jnp.full((1, 9), 1e3, dtype=dtype)))
    rot_graph = FactorGraph([rot_prior, rot_between])
    rot_init = Values({"rot9": jnp.tile(jnp.asarray(np.eye(3, dtype=dtype).reshape(9)), (n, 1))})
    rot_sol = _solve_linear(rot_graph, rot_init, use_pcg)

    # project to SO(3) (reference: Rot3::ClosestTo in InitializePose3)
    R = jax.vmap(so3.normalize)(rot_sol["rot9"].reshape(n, 3, 3))

    # ---- stage 2: translations with rotations fixed ----
    Ri = R[ij[:, 0]]
    dt = jnp.einsum("kij,kj->ki", Ri, jnp.asarray(T[:, :, 3]))
    t_between = FactorBatch(
        "chordal_trans", _trans_residual, ("t3", "t3"), 3,
        jnp.asarray(ij), {"dt": dt}, NoiseModel("unit"))
    t_prior = FactorBatch(
        "chordal_trans_prior", _trans_prior_residual, ("t3",), 3,
        jnp.zeros((1, 1), dtype=jnp.int32),
        {"prior": jnp.zeros((1, 3), dtype=dtype)},
        NoiseModel("diag", jnp.full((1, 3), 1e3, dtype=dtype)))
    t_graph = FactorGraph([t_prior, t_between])
    t_init = Values({"t3": jnp.zeros((n, 3), dtype=dtype)})
    t_sol = _solve_linear(t_graph, t_init, use_pcg)

    poses = jnp.concatenate([R, t_sol["t3"][:, :, None]], axis=2)
    return Values({"se3": poses})


# ---------------------------------------------------------------------------
# LAGO-style linear initialization for 2D pose graphs
# (reference: slam/lago.h:81-89 — linear angle-graph orientation estimate,
# then linear positions; orientations here use the SO(2) chordal relaxation
# on (cos, sin) vectors, the robust variant of the angle graph)
# ---------------------------------------------------------------------------

manifolds.vector_space("rot2c", 2)
manifolds.vector_space("t2", 2)


def _rot2_residual(xs, meas):
    ci, cj = xs
    c, s = meas["c"], meas["s"]
    # c_j - R(theta_ij) c_i, with c = (cos, sin) of the absolute orientation
    return jnp.stack([cj[0] - (c * ci[0] - s * ci[1]),
                      cj[1] - (s * ci[0] + c * ci[1])])


def _rot2_prior(xs, meas):
    return xs[0] - meas["prior"]


def _t2_residual(xs, meas):
    ti, tj = xs
    return tj - ti - meas["dt"]


def lago_init_2d(graph: FactorGraph, num_poses: int) -> Values:
    """Linear 2D pose-graph initialization (orientation chordal + linear
    positions). Extracts `between_se2` batches; anchors pose 0."""
    edges = []
    for b in graph.batches:
        if b.name == "between_se2":
            edges.append((np.asarray(b.idx), np.asarray(b.meas["measured"])))
    if not edges:
        raise ValueError("no between_se2 factors found")
    ij = np.concatenate([e[0] for e in edges], axis=0)
    m = np.concatenate([e[1] for e in edges], axis=0)
    dtype = m.dtype
    n = num_poses

    rot_b = FactorBatch(
        "lago_rot", _rot2_residual, ("rot2c", "rot2c"), 2,
        jnp.asarray(ij), {"c": jnp.asarray(np.cos(m[:, 2])),
                          "s": jnp.asarray(np.sin(m[:, 2]))},
        NoiseModel("unit"))
    rot_p = FactorBatch(
        "lago_rot_prior", _rot2_prior, ("rot2c",), 2,
        jnp.zeros((1, 1), dtype=jnp.int32),
        {"prior": jnp.asarray(np.array([[1.0, 0.0]], dtype=dtype))},
        NoiseModel("diag", jnp.full((1, 2), 1e3, dtype=dtype)))
    rg = FactorGraph([rot_p, rot_b])
    r_init = Values({"rot2c": jnp.tile(jnp.asarray(np.array([1.0, 0.0], dtype=dtype)), (n, 1))})
    use_pcg = n * 2 > 6000
    r_sol = _solve_linear(rg, r_init, use_pcg)
    cs = np.asarray(r_sol["rot2c"])
    theta = np.arctan2(cs[:, 1], cs[:, 0])

    # positions with orientations fixed
    ct, st = np.cos(theta[ij[:, 0]]), np.sin(theta[ij[:, 0]])
    dt = np.stack([ct * m[:, 0] - st * m[:, 1],
                   st * m[:, 0] + ct * m[:, 1]], axis=1).astype(dtype)
    t_b = FactorBatch("lago_t", _t2_residual, ("t2", "t2"), 2,
                      jnp.asarray(ij), {"dt": jnp.asarray(dt)}, NoiseModel("unit"))
    t_p = FactorBatch("lago_t_prior", _rot2_prior, ("t2",), 2,
                      jnp.zeros((1, 1), dtype=jnp.int32),
                      {"prior": jnp.zeros((1, 2), dtype=dtype)},
                      NoiseModel("diag", jnp.full((1, 2), 1e3, dtype=dtype)))
    tg = FactorGraph([t_p, t_b])
    t_sol = _solve_linear(tg, Values({"t2": jnp.zeros((n, 2), dtype=dtype)}), use_pcg)
    t = np.asarray(t_sol["t2"])
    return Values({"se2": jnp.asarray(
        np.concatenate([t, theta[:, None]], axis=1).astype(dtype))})


def chordal_init_f64(graph: FactorGraph, num_poses: int,
                     group: str = "se3") -> Values:
    """Host-side fp64 chordal initialization (scipy sparse normal
    equations), independent of the process compute dtype.

    Measured motivation (PERFORMANCE.md round 3): on sphere2500 the fp32
    chordal point lands the subsequent LM in a worse basin (final error
    2.8% above the fp64 fixed point); initializing the fp32 TPU run from
    the fp64 chordal point cuts the gap to 1.5%. Rotations: R_j ~= R_i R_ij
    relaxed over the 9 entries (row-major vec: the edge block is
    I_3 (x) R_ij^T); translations linear with rotations fixed (reference:
    slam/InitializePose3.h:36-91)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    edges = []
    for b in graph.batches:
        if b.name == f"between_{group}" and group == "se3":
            edges.append((np.asarray(b.idx), np.asarray(b.meas["measured"])))
    if not edges:
        raise ValueError("no between_se3 factors found")
    ij = np.concatenate([e[0] for e in edges], axis=0)
    T = np.concatenate([e[1] for e in edges], axis=0).astype(np.float64)
    n = num_poses
    K = ij.shape[0]

    # ---- rotations: rows [x_j - (I3 (x) Rij^T) x_i] + anchor prior ----
    rows, cols, vals = [], [], []
    base = np.arange(9)
    for k in range(K):
        i, j = int(ij[k, 0]), int(ij[k, 1])
        Rij = T[k, :, :3]
        r0 = 9 * k
        rows.extend(r0 + base)
        cols.extend(9 * j + base)
        vals.extend(np.ones(9))
        for r in range(3):
            for c in range(3):
                for kk in range(3):
                    rows.append(r0 + 3 * r + c)
                    cols.append(9 * i + 3 * r + kk)
                    vals.append(-Rij[kk, c])
    # anchor: x_0 = vec(I)
    r0 = 9 * K
    rows.extend(r0 + base)
    cols.extend(base)
    vals.extend(1e3 * np.ones(9))
    b_vec = np.zeros(9 * K + 9)
    b_vec[r0 + base] = 1e3 * np.eye(3).reshape(9)
    A = sp.csr_matrix((vals, (rows, cols)), shape=(9 * K + 9, 9 * n))
    AtA = (A.T @ A).tocsc() + 1e-10 * sp.eye(9 * n)
    x = spla.spsolve(AtA, A.T @ b_vec)
    Rs = x.reshape(n, 3, 3)
    # project to SO(3) (Rot3::ClosestTo)
    U, _, Vt = np.linalg.svd(Rs)
    det = np.linalg.det(U @ Vt)
    Ufix = U.copy()
    Ufix[:, :, 2] *= np.sign(det)[:, None]
    R = Ufix @ Vt

    # ---- translations with rotations fixed: t_j - t_i = R_i dt_ij ----
    rows, cols, vals = [], [], []
    b3 = np.arange(3)
    rhs = np.zeros(3 * K + 3)
    for k in range(K):
        i, j = int(ij[k, 0]), int(ij[k, 1])
        r0 = 3 * k
        rows.extend(r0 + b3)
        cols.extend(3 * j + b3)
        vals.extend(np.ones(3))
        rows.extend(r0 + b3)
        cols.extend(3 * i + b3)
        vals.extend(-np.ones(3))
        rhs[r0 + b3] = R[i] @ T[k, :, 3]
    rows.extend(3 * K + b3)
    cols.extend(b3)
    vals.extend(1e3 * np.ones(3))
    A = sp.csr_matrix((vals, (rows, cols)), shape=(3 * K + 3, 3 * n))
    AtA = (A.T @ A).tocsc() + 1e-10 * sp.eye(3 * n)
    t = spla.spsolve(AtA, A.T @ rhs).reshape(n, 3)

    poses = np.concatenate([R, t[:, :, None]], axis=2)
    return Values({"se3": jnp.asarray(poses)})
