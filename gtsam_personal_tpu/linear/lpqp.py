"""LP and QP solvers (active-set method).

Reference parity: gtsam_unstable/linear/ (SURVEY.md §2.12): LPSolver, QPSolver
via the active-set method with equality/inequality linear constraints.

  QP:  min 0.5 x^T G x + g^T x   s.t.  A_eq x = b_eq,  A_in x <= b_in
  LP:  min c^T x                 s.t.  same constraints (G = 0 handled by a
                                       tiny regularization for the KKT solve)

Dense active-set iteration on host-sized problems (the reference's QPS test
problems are tiny); each KKT solve is one linear system.
"""

from typing import NamedTuple, Optional

import numpy as np


class QPResult(NamedTuple):
    x: np.ndarray
    active: np.ndarray
    iterations: int
    converged: bool


def solve_qp(G, g, A_eq=None, b_eq=None, A_in=None, b_in=None, x0=None,
             max_iter=100, tol=1e-9) -> QPResult:
    n = len(g)
    G = np.asarray(G, dtype=np.float64)
    g = np.asarray(g, dtype=np.float64)
    A_eq = np.zeros((0, n)) if A_eq is None else np.asarray(A_eq, dtype=np.float64)
    b_eq = np.zeros(0) if b_eq is None else np.asarray(b_eq, dtype=np.float64)
    A_in = np.zeros((0, n)) if A_in is None else np.asarray(A_in, dtype=np.float64)
    b_in = np.zeros(0) if b_in is None else np.asarray(b_in, dtype=np.float64)
    m_in = A_in.shape[0]

    # feasible start: phase-1 via least squares if not provided
    if x0 is None:
        x = _phase1(A_eq, b_eq, A_in, b_in, n)
    else:
        x = np.asarray(x0, dtype=np.float64)

    active = np.zeros(m_in, dtype=bool)
    # start with constraints active where tight
    active |= (A_in @ x >= b_in - 1e-10) if m_in else active

    for it in range(max_iter):
        # solve equality-constrained QP on the working set
        W = np.concatenate([A_eq, A_in[active]], axis=0)
        k = W.shape[0]
        KKT = np.block([[G + 1e-12 * np.eye(n), W.T],
                        [W, np.zeros((k, k))]])
        rhs = np.concatenate([-(G @ x + g), np.zeros(k)])
        try:
            sol = np.linalg.solve(KKT, rhs)
        except np.linalg.LinAlgError:
            sol = np.linalg.lstsq(KKT, rhs, rcond=None)[0]
        p = sol[:n]
        lam = sol[n:]

        if np.linalg.norm(p) < tol:
            # check multipliers of active inequalities
            lam_in = lam[A_eq.shape[0]:]
            if lam_in.size == 0 or lam_in.min() >= -tol:
                return QPResult(x, active, it, True)
            # release the most negative multiplier
            idx_active = np.where(active)[0]
            active[idx_active[np.argmin(lam_in)]] = False
            continue

        # step length to nearest violated inactive constraint
        alpha = 1.0
        blocking = -1
        if m_in:
            for i in np.where(~active)[0]:
                ai_p = A_in[i] @ p
                if ai_p > tol:
                    a_max = (b_in[i] - A_in[i] @ x) / ai_p
                    if a_max < alpha:
                        alpha = a_max
                        blocking = i
        x = x + alpha * p
        if blocking >= 0:
            active[blocking] = True
    return QPResult(x, active, max_iter, False)


def solve_lp(c, A_eq=None, b_eq=None, A_in=None, b_in=None,
             max_iter=200) -> QPResult:
    """LP via the QP machinery with a vanishing quadratic regularizer
    (reference: LPSolver uses the same active-set core)."""
    n = len(c)
    return solve_qp(1e-9 * np.eye(n), np.asarray(c, dtype=np.float64),
                    A_eq, b_eq, A_in, b_in, max_iter=max_iter)


def _phase1(A_eq, b_eq, A_in, b_in, n):
    """Find a feasible point: equality LS solution, then push inside the
    inequalities by scaling back violated directions."""
    if A_eq.shape[0]:
        x = np.linalg.lstsq(A_eq, b_eq, rcond=None)[0]
    else:
        x = np.zeros(n)
    if A_in.shape[0] == 0:
        return x
    viol = A_in @ x - b_in
    if viol.max() <= 0:
        return x
    # simple correction: move along -A_in^T for violated rows (projected onto
    # the equality null space)
    for _ in range(200):
        viol = A_in @ x - b_in
        bad = viol > 1e-12
        if not bad.any():
            break
        d = -A_in[bad].T @ (viol[bad] / (np.linalg.norm(A_in[bad], axis=1) ** 2 + 1e-12))
        if A_eq.shape[0]:
            # project step into null(A_eq)
            Z = A_eq.T @ np.linalg.solve(A_eq @ A_eq.T + 1e-12 * np.eye(A_eq.shape[0]),
                                         A_eq @ d)
            d = d - Z
        if np.linalg.norm(d) < 1e-15:
            break
        x = x + d
    return x
