"""Nonlinear least-squares optimizers: Gauss-Newton and Levenberg-Marquardt.

Semantics mirror the reference's drivers:
- convergence test == NonlinearOptimizer::checkConvergence
  (nonlinear/NonlinearOptimizer.cpp:182): converged when relative AND absolute
  error decrease fall below thresholds, or error <= errorTol.
- LM lambda schedule == LevenbergMarquardtOptimizer with
  useFixedLambdaFactor (nonlinear/LevenbergMarquardtOptimizer.cpp:121-273):
  try solve at lambda; accept (lambda /= factor) if the error decreased,
  else reject (lambda *= factor) and retry until lambdaUpperBound.
- optional diagonal damping (lambda * diag(H)) as in `buildDampedSystem`
  (LevenbergMarquardtOptimizer.cpp:88).

Two execution styles:
- host outer loop (`optimize`) with jitted linearize/solve/error steps —
  flexible, used for correctness and moderate problems;
- fully-jitted `lax.while_loop` LM (`optimize_lm_jit`) — zero host syncs per
  iteration, used for benchmarking and TPU deployment.
"""

from dataclasses import dataclass, replace
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from gtsam_personal_tpu.core.graph import FactorGraph
from gtsam_personal_tpu.core.values import Layout, Values, tree_norm
from gtsam_personal_tpu.linear.linearize import linearize
from gtsam_personal_tpu.linear import solvers


@dataclass(frozen=True)
class Params:
    """Reference analogue: NonlinearOptimizerParams + LevenbergMarquardtParams."""
    max_iterations: int = 100
    relative_error_tol: float = 1e-5
    absolute_error_tol: float = 1e-5
    error_tol: float = 0.0
    solver: str = "dense"          # 'dense' | 'pcg' | 'schur'
    pcg_maxiter: int = 250
    pcg_tol: float = 1e-8
    # feature-major linear layout ([r*d, K] blocks, linear/fm.py) — the TPU
    # hot path for 'pcg' and 'schur' solvers; 'dense' ignores it.
    fm: bool = False
    # LM:
    lambda_initial: float = 1e-5
    lambda_factor: float = 10.0
    lambda_upper_bound: float = 1e5
    lambda_lower_bound: float = 0.0
    diagonal_damping: bool = False
    max_inner_tries: int = 10
    verbose: bool = False
    # on optimizer failure (non-finite error / lambda escalation exhausted),
    # run linear/diagnostics.py and print which factor rows are non-finite /
    # which variables are singular (reference analogue:
    # IndeterminantLinearSystemException naming the key, linearExceptions.h)
    diagnose_on_failure: bool = True
    # reference: NonlinearOptimizerParams::iterationHook(iter, errBefore,
    # errAfter), called after every accepted iteration
    # (NonlinearOptimizer.cpp:99). Callable, excluded from hashing/jit keys.
    iteration_hook: object = None

    def __hash__(self):
        return hash(tuple(getattr(self, f.name) for f in
                          __import__("dataclasses").fields(self)
                          if f.name != "iteration_hook"))

    def __eq__(self, other):
        import dataclasses
        if not isinstance(other, Params):
            return NotImplemented
        return all(getattr(self, f.name) == getattr(other, f.name)
                   for f in dataclasses.fields(self)
                   if f.name != "iteration_hook")


def check_convergence(params: Params, old_err, new_err):
    """Reference: checkConvergence (NonlinearOptimizer.cpp:182)."""
    if new_err <= params.error_tol:
        return True
    abs_dec = old_err - new_err
    rel_dec = abs_dec / old_err if old_err > 0 else 1.0
    return abs_dec <= params.absolute_error_tol or rel_dec <= params.relative_error_tol


def _solve(lin, layout, lam, diag_damping, params: Params, plan=None):
    if params.solver == "pcg":
        if params.fm:
            from gtsam_personal_tpu.linear.fm import solve_pcg_fm
            return solve_pcg_fm(lin, lam, diag_damping,
                                maxiter=params.pcg_maxiter, tol=params.pcg_tol)
        return solvers.solve_pcg(lin, lam, diag_damping,
                                 maxiter=params.pcg_maxiter, tol=params.pcg_tol)
    if params.solver == "schur":
        from gtsam_personal_tpu.linear.mlschur import MLPlan, solve_ml
        from gtsam_personal_tpu.linear.schur import solve_partitioned
        if isinstance(plan, MLPlan):
            return solve_ml(lin, plan, lam)
        return solve_partitioned(lin, plan, lam)
    if params.solver == "qr":
        # dense QR route: never forms J^T J (reference: EliminateQR);
        # identity damping only (diagonal damping needs the normal equations)
        from gtsam_personal_tpu.linear.conditional import solve_qr
        return solve_qr(lin, layout, lam)
    if params.solver == "sequential":
        # sequential elimination -> GaussianBayesNet backsubstitution
        # (reference: eliminateSequential + GaussianBayesNet::optimize)
        from gtsam_personal_tpu.linear.conditional import eliminate_sequential
        return eliminate_sequential(lin, layout, lam=lam).optimize()
    return solvers.solve_dense(lin, layout, lam,
                               layout.flatten(diag_damping) if diag_damping is not None else None)


def _linearize(graph, values, params: Params):
    if params.fm and params.solver in ("pcg", "schur"):
        from gtsam_personal_tpu.linear.fm import linearize_fm
        return linearize_fm(graph, values)
    return linearize(graph, values)


@partial(jax.jit, static_argnames=("params", "plan"))
def _lm_try_step(graph: FactorGraph, values: Values, lam, params: Params, plan=None):
    """One linearize + damped solve + retract + error evaluation, jitted."""
    layout = Layout.of(values)
    lin = _linearize(graph, values, params)
    dd = lin.hessian_diagonal() if params.diagonal_damping else None
    delta = _solve(lin, layout, lam, dd, params, plan)
    new_values = values.retract(delta)
    return new_values, graph.error(new_values), tree_norm(delta)


@jax.jit
def graph_error(graph: FactorGraph, values: Values):
    return graph.error(values)


def _maybe_diagnose(graph, values, params: Params):
    """On failure, name non-finite factor rows / singular variables
    (reference: IndeterminantLinearSystemException, linearExceptions.h)."""
    if not params.diagnose_on_failure:
        return
    try:
        from gtsam_personal_tpu.linear.diagnostics import diagnose
        rep = diagnose(graph, values)
        if not rep.ok:
            print(rep)
    except Exception as e:  # diagnosis must never mask the original failure
        print(f"(diagnosis failed: {e})")


@dataclass
class Result:
    values: Values
    error: float
    iterations: int
    converged: bool
    lambda_final: float = 0.0


def optimize_gn(graph: FactorGraph, values: Values, params: Params = Params(),
                plan=None) -> Result:
    """Gauss-Newton: linearize -> solve -> retract until converged
    (reference: GaussNewtonOptimizer)."""
    err = float(graph_error(graph, values))
    for it in range(params.max_iterations):
        new_values, new_err, _ = _lm_try_step(graph, values, 0.0, params, plan)
        new_err = float(new_err)
        if params.verbose:
            print(f"GN iter {it}: error {err:.6g} -> {new_err:.6g}")
        if not jnp.isfinite(new_err):
            _maybe_diagnose(graph, values, params)
            return Result(values, err, it, False)
        converged = check_convergence(params, err, new_err)
        if new_err <= err:
            values, err = new_values, new_err
        if converged:
            return Result(values, err, it + 1, True)
        if new_err > err:  # diverging and not converged
            return Result(values, err, it, False)
    return Result(values, err, params.max_iterations, False)


def optimize_lm(graph: FactorGraph, values: Values, params: Params = Params(),
                plan=None) -> Result:
    """Levenberg-Marquardt with the reference's fixed-factor lambda schedule."""
    err = float(graph_error(graph, values))
    lam = params.lambda_initial
    for it in range(params.max_iterations):
        accepted = False
        for _ in range(params.max_inner_tries):
            new_values, new_err, _ = _lm_try_step(graph, values, lam, params, plan)
            new_err = float(new_err)
            if jnp.isfinite(new_err) and new_err < err:
                accepted = True
                break
            lam = lam * params.lambda_factor
            if lam > params.lambda_upper_bound:
                _maybe_diagnose(graph, values, params)
                return Result(values, err, it, False, lam)
        if not accepted:
            _maybe_diagnose(graph, values, params)
            return Result(values, err, it, False, lam)
        if params.verbose:
            print(f"LM iter {it}: error {err:.6g} -> {new_err:.6g} (lambda {lam:.2g})")
        values, old_err, err = new_values, err, new_err
        if params.iteration_hook is not None:
            params.iteration_hook(it, old_err, err)
        lam = max(lam / params.lambda_factor, params.lambda_lower_bound, 1e-10)
        if check_convergence(params, old_err, err):
            return Result(values, err, it + 1, True, lam)
    return Result(values, err, params.max_iterations, False, lam)


@partial(jax.jit, static_argnames=("params", "n_iters", "plan"))
def lm_run(graph: FactorGraph, values: Values, lam, err, n_iters: int,
           params: Params = Params(), plan=None):
    """`n_iters` full LM iterations in ONE lax.scan dispatch — the
    pose-graph analogue of sfm/ba_pack.ba_lm_run_pk: every iteration is an
    accept/reject tryLambda step with fixed-factor lambda adaptation
    (LevenbergMarquardtOptimizer.cpp:121), and a REJECTED try reuses the
    cached linearization (the state did not move, so relinearizing is
    bitwise-identical waste; lax.cond executes only the taken branch).

    The carry (values, lambda, error, linearization cache) stays on device
    for the whole dispatch — no host syncs, no per-iteration tunnel
    round-trips. Returns (values, lam, err)."""
    layout = Layout.of(values)

    def lin_of(v):
        lin = _linearize(graph, v, params)
        dd = lin.hessian_diagonal() if params.diagonal_damping else None
        return lin, dd

    lin0, dd0 = lin_of(values)      # first iteration's real linearization

    def body(carry, _):
        v, lam, err, lin, dd, need = carry
        lin, dd = jax.lax.cond(need, lambda _: lin_of(v),
                               lambda _: (lin, dd), None)
        delta = _solve(lin, layout, lam, dd, params, plan)
        nv = v.retract(delta)
        ne = graph.error(nv)
        ok = jnp.logical_and(jnp.isfinite(ne), ne < err)
        v2 = jax.tree.map(lambda a, b: jnp.where(ok, a, b), nv, v)
        err2 = jnp.where(ok, ne, err)
        lam2 = jnp.where(
            ok,
            jnp.maximum(lam / params.lambda_factor,
                        max(params.lambda_lower_bound, 1e-10)),
            jnp.minimum(lam * params.lambda_factor,
                        params.lambda_upper_bound))
        return (v2, lam2, err2, lin, dd, ok), None

    (v, lam, err, _, _, _), _ = jax.lax.scan(
        body, (values, lam, err, lin0, dd0, jnp.asarray(False)), None,
        length=n_iters)
    return v, lam, err


@partial(jax.jit, static_argnames=("params", "max_iterations", "plan"))
def optimize_lm_jit(graph: FactorGraph, values: Values, params: Params = Params(),
                    max_iterations: Optional[int] = None, plan=None):
    """Fully-jitted LM: entire optimization is one XLA program
    (lax.while_loop over iterations, bounded lambda search per iteration).
    Returns (values, final_error, iterations)."""
    max_it = max_iterations or params.max_iterations
    err0 = graph.error(values)

    def try_at(values, lam):
        layout = Layout.of(values)
        lin = _linearize(graph, values, params)
        dd = lin.hessian_diagonal() if params.diagonal_damping else None
        delta = _solve(lin, layout, lam, dd, params, plan)
        nv = values.retract(delta)
        return nv, graph.error(nv)

    def inner(state):
        # bounded lambda search: scan over max_inner_tries, keep first accept
        values, err, lam = state

        def body(carry, _):
            best_v, best_e, lam, accepted = carry
            nv, ne = try_at(values, lam)
            good = jnp.logical_and(jnp.isfinite(ne), ne < err)
            take = jnp.logical_and(good, jnp.logical_not(accepted))
            best_v = jax.tree.map(lambda a, b: jnp.where(take, b, a), best_v, nv)
            best_e = jnp.where(take, ne, best_e)
            new_lam = jnp.where(jnp.logical_or(accepted, take), lam, lam * params.lambda_factor)
            return (best_v, best_e, new_lam, jnp.logical_or(accepted, take)), None

        (bv, be, lam, acc), _ = jax.lax.scan(
            body, (values, err, lam, jnp.array(False)), None,
            length=params.max_inner_tries)
        return bv, be, lam, acc

    def cond(state):
        it, values, err, lam, done = state
        return jnp.logical_and(it < max_it, jnp.logical_not(done))

    def body(state):
        it, values, err, lam, _ = state
        nv, ne, nlam, acc = inner((values, err, lam))
        abs_dec = err - ne
        rel_dec = jnp.where(err > 0, abs_dec / err, 0.0)
        conv = jnp.logical_or(
            ne <= params.error_tol,
            jnp.logical_or(abs_dec <= params.absolute_error_tol,
                           rel_dec <= params.relative_error_tol))
        done = jnp.logical_or(jnp.logical_not(acc), conv)
        nlam = jnp.maximum(nlam / params.lambda_factor, 1e-10)
        return it + 1, nv, ne, nlam, done

    state = (jnp.array(0), values, err0, jnp.asarray(params.lambda_initial, dtype=err0.dtype),
             jnp.array(False))
    it, values, err, lam, _ = jax.lax.while_loop(cond, body, state)
    return values, err, it
