"""Shonan rotation averaging: certifiably-correct SO(3) synchronization by a
Riemannian staircase on SO(p).

Reference parity: sfm/ShonanAveraging.{h,cpp} (SURVEY.md §3.5):
  run(pMin..pMax)        -> staircase()        (ShonanAveraging.h:404)
  tryOptimizingAt(p)     -> optimize_at()      (:351, LM on SO(p) values)
  computeMinEigenValue   -> min_eigenvalue()   (:253, accelerated power method
                            on the certificate matrix S = L - Lambda;
                            reference uses Spectra / AcceleratedPowerMethod)
  initializeWithDescent  -> lift + descent along the certificate eigenvector

The SO(p) level is an ordinary manifold group ("sop{p}") with a Cayley
retraction, so each staircase level reuses the whole batched LM stack; the
certificate matvec is edge segment-sums (no sparse matrix materialized).
"""

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from gtsam_personal_tpu.core import manifolds
from gtsam_personal_tpu.core.graph import FactorBatch, FactorGraph
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.geometry import so3
from gtsam_personal_tpu.linear.noise import NoiseModel
from gtsam_personal_tpu.nonlinear import optimizers


# ---------------------------------------------------------------------------
# SO(p) manifold with Cayley retraction
# ---------------------------------------------------------------------------

def _skew_from_vec(xi, p):
    W = jnp.zeros((p, p), dtype=xi.dtype)
    iu = jnp.triu_indices(p, 1)
    W = W.at[iu].set(xi)
    return W - W.T


def _vec_from_skew(W, p):
    iu = jnp.triu_indices(p, 1)
    return W[iu]


def make_sop_manifold(p: int):
    name = f"sop{p}"
    try:
        return manifolds.get(name)
    except KeyError:
        pass
    dim = p * (p - 1) // 2
    eye = lambda dtype=jnp.float64: jnp.eye(p, dtype=dtype)

    def retract(R, xi):
        W = _skew_from_vec(0.5 * xi, p)
        I = jnp.eye(p, dtype=R.dtype)
        C = jnp.linalg.solve(I - W, I + W)       # Cayley transform
        return R @ C

    def local(a, b):
        C = a.T @ b
        I = jnp.eye(p, dtype=a.dtype)
        W = 2.0 * jnp.linalg.solve(C + I, C - I)
        return _vec_from_skew(0.5 * (W - W.T), p)

    m = manifolds.Manifold(name, dim, (p, p), retract, local, eye)
    return manifolds.register(m)


# ---------------------------------------------------------------------------
# Shonan factors at level p
# ---------------------------------------------------------------------------

def _shonan_residual(p: int):
    def residual(xs, meas):
        Yi, Yj = xs
        Rt = meas["R_lift"]                      # [p, p] lifted measurement
        return (Yj - Yi @ Rt).reshape(p * p)
    residual.__name__ = f"shonan_p{p}"
    return residual


def build_graph_at(p: int, edges_ij: np.ndarray, R_meas: np.ndarray,
                   kappa: np.ndarray) -> FactorGraph:
    """buildGraphAt analogue: Frobenius factors on SO(p) + gauge prior."""
    make_sop_manifold(p)
    K = edges_ij.shape[0]
    lifted = np.tile(np.eye(p), (K, 1, 1))
    lifted[:, :3, :3] = R_meas
    sqrtk = np.sqrt(kappa)
    noise = NoiseModel("diag", jnp.asarray(
        np.repeat(sqrtk[:, None], p * p, axis=1)))
    batch = FactorBatch(f"shonan_p{p}", _shonan_residual(p),
                        (f"sop{p}", f"sop{p}"), p * p,
                        jnp.asarray(edges_ij.astype(np.int32)),
                        {"R_lift": jnp.asarray(lifted)}, noise)

    def anchor_residual(xs, meas):
        (Y,) = xs
        return (Y - meas["target"]).reshape(p * p)

    anchor = FactorBatch(f"shonan_anchor_p{p}", anchor_residual, (f"sop{p}",),
                         p * p, jnp.zeros((1, 1), dtype=jnp.int32),
                         {"target": jnp.asarray(np.eye(p)[None])},
                         NoiseModel("diag", jnp.full((1, p * p), 10.0)))
    return FactorGraph([anchor, batch])


def optimize_at(p: int, edges_ij, R_meas, kappa, Y_init,
                params: Optional[optimizers.Params] = None):
    """tryOptimizingAt: LM on the SO(p) lifted problem."""
    graph = build_graph_at(p, edges_ij, R_meas, kappa)
    values = Values({f"sop{p}": jnp.asarray(Y_init)})
    params = params or optimizers.Params(solver="pcg", pcg_maxiter=400,
                                         max_iterations=40)
    res = optimizers.optimize_lm(graph, values, params)
    return np.asarray(res.values[f"sop{p}"]), res


# ---------------------------------------------------------------------------
# Optimality certificate
# ---------------------------------------------------------------------------

def _connection_laplacian_matvec(edges_ij, R_meas, kappa, V):
    """V: [n, 3, k] block vector -> (L V) with the connection Laplacian
    L_ii = sum_j kappa I, L_ij = -kappa R_ij (edge i->j measuring R_ij)."""
    i, j = edges_ij[:, 0], edges_ij[:, 1]
    n = V.shape[0]
    out = jnp.zeros_like(V)
    deg = jnp.zeros((n,), dtype=V.dtype).at[i].add(kappa).at[j].add(kappa)
    out = out + deg[:, None, None] * V
    Rv_j = jnp.einsum("kab,kbc->kac", R_meas, V[j])      # R_ij V_j
    Rtv_i = jnp.einsum("kba,kbc->kac", R_meas, V[i])     # R_ij^T V_i
    out = out.at[i].add(-kappa[:, None, None] * Rv_j)
    out = out.at[j].add(-kappa[:, None, None] * Rtv_i)
    return out


def min_eigenvalue(edges_ij, R_meas, kappa, Y, iters: int = 400,
                   seed: int = 0,
                   accelerated: bool = True) -> Tuple[float, np.ndarray]:
    """Minimum eigenvalue of the certificate matrix S = L - Lambda(Y) via a
    shifted power method on A = sigma I - S (reference:
    linear/AcceleratedPowerMethod.h used by ShonanAveraging
    computeMinEigenValue, sfm/ShonanAveraging.h:253).

    With `accelerated` (default), uses the momentum recurrence
    x_{k+1} = A x_k - beta x_{k-1} with beta = (rho/2)^2 estimated from a
    short plain-power burn-in (the reference's estimated-beta scheme) —
    O(sqrt(gap)) convergence instead of O(gap)."""
    edges_ij = jnp.asarray(edges_ij)
    R_meas = jnp.asarray(R_meas)
    kappa = jnp.asarray(kappa)
    Y = jnp.asarray(Y)                                   # [n, p, 3] Stiefel
    n = Y.shape[0]
    Z = jnp.swapaxes(Y, 1, 2)                            # [n, 3, p] row blocks

    # Lambda_i = sym((L Z)_i Z_i^T)
    LZ = _connection_laplacian_matvec(edges_ij, R_meas, kappa, Z)
    Lam = jnp.einsum("nip,njp->nij", LZ, Z)
    Lam = 0.5 * (Lam + jnp.swapaxes(Lam, 1, 2))          # [n, 3, 3]

    def S_matvec(v):                                     # v: [n, 3]
        Lv = _connection_laplacian_matvec(edges_ij, R_meas, kappa, v[:, :, None])[:, :, 0]
        return Lv - jnp.einsum("nab,nb->na", Lam, v)

    # shift: sigma >= lambda_max(S) via Gershgorin-style bound
    deg = jnp.zeros((n,), dtype=Y.dtype).at[edges_ij[:, 0]].add(kappa) \
        .at[edges_ij[:, 1]].add(kappa)
    sigma = 2.0 * float(jnp.max(deg)) + float(jnp.max(jnp.abs(Lam))) * 3 + 1.0

    key = jax.random.PRNGKey(seed)
    v = jax.random.normal(key, (n, 3), dtype=Y.dtype)
    v = v / jnp.linalg.norm(v)

    A = lambda u: sigma * u - S_matvec(u)                # power on sigma I - S

    def body(v, _):
        w = A(v)
        w = w / jnp.maximum(jnp.linalg.norm(w), 1e-30)
        return w, None

    if not accelerated:
        v, _ = jax.lax.scan(body, v, None, length=iters)
    else:
        # burn-in: plain power to estimate the dominant eigenvalue of A
        burn = min(10, iters)
        v, _ = jax.lax.scan(body, v, None, length=burn)
        rho = jnp.vdot(v, A(v))                          # Rayleigh estimate
        beta = (rho / 2.0) ** 2

        def acc_body(carry, _):
            v, v_prev = carry
            w = A(v) - beta * v_prev
            nrm = jnp.maximum(jnp.linalg.norm(w), 1e-30)
            return (w / nrm, v / nrm), None

        (v, _), _ = jax.lax.scan(acc_body, (v, jnp.zeros_like(v)), None,
                                 length=max(iters - burn, 0))
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-30)

    lam_shift = float(jnp.vdot(v, A(v)))
    lam_min = sigma - lam_shift
    return lam_min, np.asarray(v)


# ---------------------------------------------------------------------------
# Staircase driver
# ---------------------------------------------------------------------------

class ShonanResult(NamedTuple):
    rotations: np.ndarray     # [n, 3, 3]
    certified: bool
    p_final: int
    min_eig: float
    cost: float


def shonan_averaging(edges_ij: np.ndarray, R_meas: np.ndarray,
                     kappa: Optional[np.ndarray] = None,
                     p_min: int = 3, p_max: int = 7,
                     optimality_threshold: float = -1e-4,
                     init: Optional[np.ndarray] = None,
                     seed: int = 0) -> ShonanResult:
    """run() analogue: staircase p_min..p_max with certification."""
    n = int(edges_ij.max()) + 1
    K = edges_ij.shape[0]
    kappa = np.ones(K) if kappa is None else np.asarray(kappa)

    if init is None:
        # chordal-style init via the linear rotation graph (slam/initialize.py
        # machinery specialized to rotations only)
        init = _chordal_rotations(edges_ij, R_meas, n)

    Y = init                                             # [n, 3, 3]
    rng = np.random.default_rng(seed)
    res = None
    for p in range(p_min, p_max + 1):
        if Y.shape[1] < p:
            pad = np.zeros((n, p - Y.shape[1], Y.shape[2]))
            Y = np.concatenate([Y, pad], axis=1)         # lift rows
        if Y.shape[2] < p:
            # lift to p x p orthogonal: extend columns via Gram-Schmidt
            Y = _orthonormal_complete(Y, p, rng)
        Yp, res = optimize_at(p, edges_ij, R_meas, kappa, Y)
        lam, v = min_eigenvalue(edges_ij, R_meas, kappa, Yp[:, :, :3])
        if lam >= optimality_threshold:
            R = _project_to_so3(Yp)
            return ShonanResult(R, True, p, lam, res.error)
        # descend along the certificate eigenvector and continue the staircase
        Y = Yp + 1e-2 * rng.standard_normal(Yp.shape)
        Y = np.stack([_nearest_orthogonal(Yk) for Yk in Y])
    R = _project_to_so3(Yp)
    return ShonanResult(R, False, p_max, lam, res.error)


def _chordal_rotations(edges_ij, R_meas, n):
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    rows, cols, vals = [], [], []
    def add(r, c, v):
        rows.append(r); cols.append(c); vals.append(v)
    deg = np.zeros(n)
    for k in range(edges_ij.shape[0]):
        i, j = edges_ij[k]
        deg[i] += 1; deg[j] += 1
        R = R_meas[k]
        for a in range(3):
            for b in range(3):
                add(3 * i + a, 3 * j + b, -R[a, b])
                add(3 * j + b, 3 * i + a, -R[a, b])
    for i in range(n):
        for a in range(3):
            add(3 * i + a, 3 * i + a, deg[i] + (1e-3 if i == 0 else 0.0))
    L = sp.csr_matrix((vals, (rows, cols)), shape=(3 * n, 3 * n))
    # three smallest eigenvectors span the block-rotation solution
    w, V = spla.eigsh(L, k=3, sigma=-1e-3, which="LM")
    blocks = V.reshape(n, 3, 3)
    return np.stack([_nearest_rotation(b) for b in blocks])


def _nearest_rotation(M):
    u, _, vt = np.linalg.svd(M)
    d = np.sign(np.linalg.det(u @ vt))
    return u @ np.diag([1.0, 1.0, d]) @ vt


def _nearest_orthogonal(M):
    u, _, vt = np.linalg.svd(M, full_matrices=False)
    return u @ vt


def _orthonormal_complete(Y, p, rng):
    """Extend [n, p, c] (c < p) blocks to [n, p, p] with orthonormal columns."""
    n, rows, c = Y.shape
    out = np.zeros((n, p, p))
    for k in range(n):
        Q, _ = np.linalg.qr(np.concatenate(
            [Y[k], rng.standard_normal((rows, p - c))], axis=1))
        # keep the original columns' orientation
        for col in range(c):
            if np.dot(Q[:, col], Y[k][:, col]) < 0:
                Q[:, col] *= -1
        out[k] = Q
        if np.linalg.det(Q) < 0:
            out[k][:, -1] *= -1
    return out


def _project_to_so3(Yp):
    """Project [n, p, p] staircase solution to SO(3): take the 3 leading
    columns' p x 3 blocks and align globally (reference: roundSolution)."""
    blocks = Yp[:, :, :3]                                 # [n, p, 3]
    n, p, _ = blocks.shape
    # best rank-3 row space across all blocks
    stacked = blocks.transpose(1, 0, 2).reshape(p, 3 * n)
    u, s, vt = np.linalg.svd(stacked, full_matrices=False)
    A = u[:, :3].T                                        # [3, p]
    R = np.einsum("ap,npb->nab", A, blocks)
    # the projection basis has a sign ambiguity: pick the orientation that
    # makes the blocks proper rotations (det +1), else every block would be
    # reflected inconsistently by the per-block polar projection
    if np.median(np.linalg.det(R)) < 0:
        A[0] *= -1.0
        R = np.einsum("ap,npb->nab", A, blocks)
    Rs = np.stack([_nearest_rotation(Rk) for Rk in R])
    # gauge: left-multiply by Rs[0]^T so that R_0 = I
    return np.stack([Rs[0].T @ Rk for Rk in Rs])
