"""Solver comparison harness — batch solvers vs the incremental engine on a
pose-graph dataset, with solution diffing and state snapshot/restore.

Mirrors the reference's examples/SolverComparer.cpp (modes: batch /
incremental / compare / stats; snapshots solver state to disk with
boost::serialization — here utils/serialization). Cross-solver agreement is
the framework's strongest cheap end-to-end check: every batch solver must
reach the same fixed point, and the incremental stream must land within
tolerance of it.

  python examples/solver_comparer.py [file] [--3d] [--n N]
      [--solvers dense,schur,pcg] [--incremental] [--snapshot out.npz]
      [--compare a.npz b.npz]
"""

import argparse
import time

import numpy as np


def main():
    import jax.numpy as jnp
    from gtsam_personal_tpu.core.values import Values
    from gtsam_personal_tpu.linear import schur
    from gtsam_personal_tpu.nonlinear import optimizers
    from gtsam_personal_tpu.slam import dataset, initialize, metrics
    from gtsam_personal_tpu.utils import serialization

    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs="?", default=None)
    ap.add_argument("--3d", dest="three_d", action="store_true")
    ap.add_argument("--n", type=int, default=None, help="pose cap")
    ap.add_argument("--solvers", default="dense,schur,pcg")
    ap.add_argument("--incremental", action="store_true")
    ap.add_argument("--snapshot", default=None,
                    help="save the best batch solution (graph+values)")
    ap.add_argument("--compare", nargs=2, default=None,
                    help="diff two snapshot files and exit")
    args = ap.parse_args()

    if args.compare:
        va = serialization.load_values(args.compare[0])
        vb = serialization.load_values(args.compare[1])
        for g in va.groups():
            d = np.abs(np.asarray(va[g]) - np.asarray(vb[g]))
            print(f"{g}: max |diff| {d.max():.3e}, rms {np.sqrt((d**2).mean()):.3e}")
        return

    if args.path is None:
        args.path = dataset.find_example_data(
            "sphere2500.txt" if args.three_d else "w100.graph")
    group = "se3" if args.three_d else "se2"
    if args.three_d:
        graph, initial = dataset.load_3d(args.path)
    else:
        graph, initial = dataset.load_2d(args.path)
    n = initial[group].shape[0]
    if args.n and args.n < n:
        keep_graph, keep_init = _truncate(graph, initial, group, args.n)
        graph, initial, n = keep_graph, keep_init, args.n
    print(f"{n} poses, {graph.num_factors} factors")
    if args.three_d:
        initial = initialize.chordal_init_f64(graph, n)
    e0 = float(optimizers.graph_error(graph, initial))
    print(f"initial error: {e0:.6g}")

    results = {}
    for solver in args.solvers.split(","):
        solver = solver.strip()
        params = optimizers.Params(solver=solver, max_iterations=50)
        kw = {}
        if solver == "schur":
            kw["plan"] = schur.make_plan(graph, initial.counts(),
                                         max_part_size=128)
        t0 = time.time()
        res = optimizers.optimize_lm(graph, initial, params, **kw)
        wall = time.time() - t0
        results[solver] = res
        print(f"  {solver:8s}: error {float(res.error):.6g} in "
              f"{res.iterations} iters, {wall:.2f}s")

    # cross-solver agreement (the SolverComparer --compare role, in-process)
    names = list(results)
    ref = np.asarray(results[names[0]].values[group])
    for nm in names[1:]:
        d = np.abs(np.asarray(results[nm].values[group]) - ref)
        print(f"  |{names[0]} - {nm}| max param diff: {d.max():.3e}")

    best = min(results.values(), key=lambda r: float(r.error))

    if args.incremental:
        from gtsam_personal_tpu.nonlinear.isam2 import ISAM2, ISAM2Params
        from gtsam_personal_tpu.slam import factors as F
        from gtsam_personal_tpu.linear import noise as nz
        from gtsam_personal_tpu.geometry import se2 as se2m, se3 as se3m

        between = [b for b in graph.batches
                   if b.name == f"between_{group}"][0]
        ij = np.asarray(between.idx)
        meas = np.asarray(between.meas["measured"])
        S = np.asarray(between.noise.data) if between.noise.data is not None \
            else None
        order = np.argsort(ij.max(axis=1), kind="stable")
        gm = se3m if args.three_d else se2m
        dim = 6 if args.three_d else 3
        isam = ISAM2(ISAM2Params(relinearize_threshold=0.01, cg_maxiter=40,
                                 cg_tol=1e-3, dtype=np.float64,
                                 precond=f"chain:{group}",
                                 min_var_cap=n + 1,
                                 min_fac_cap=len(ij) + 8))
        rb = F.make_between_residual(group)
        pr = F.make_prior_residual(group)
        ident = np.asarray(initial[group][0])
        isam.add_variable(group, ident)
        isam.add_factor(f"prior_{group}", pr, [group], dim, [0],
                        {"prior": ident},
                        nz.NoiseModel("diag", jnp.full((dim,), 1e3)))
        isam.update()
        added = 1
        t0 = time.time()
        for k in order:
            i, j = int(ij[k, 0]), int(ij[k, 1])
            while added <= max(i, j):
                prev = isam.estimate_at(group, added - 1)
                init_v = np.asarray(initial[group][added])
                isam.add_variable(group, init_v)
                added += 1
            nm = (nz.NoiseModel("full", jnp.asarray(S[k]))
                  if S is not None else nz.NoiseModel("unit"))
            isam.add_factor(f"between_{group}", rb, [group, group], dim,
                            [i, j], {"measured": meas[k]}, nm)
            isam.update()
        for _ in range(6):
            isam.update()
        wall = time.time() - t0
        err = isam.error()
        print(f"  incremental: error {err:.6g}, {len(ij)/wall:.1f} factors/s"
              f" ({wall:.1f}s)")
        est = isam.estimate_array(group)[:n]
        ref = np.asarray(best.values[group])
        if args.three_d:
            stats = metrics.ate(est[:, :, 3], ref[:, :, 3], align=True)
        else:
            stats = metrics.ate(est[:, :2], ref[:, :2], align=True)
        print(f"  incremental vs batch ATE: {stats['rmse']:.4f}")

    if args.snapshot:
        serialization.save_values(args.snapshot, best.values)
        print("snapshot ->", args.snapshot)


def _truncate(graph, initial, group, n):
    from gtsam_personal_tpu.core.graph import FactorGraph
    from gtsam_personal_tpu.core.values import Values
    import jax.numpy as jnp
    batches = []
    for b in graph.batches:
        idx = np.asarray(b.idx)
        keep = (idx < n).all(axis=1)
        if keep.all():
            batches.append(b)
        elif keep.any():
            from gtsam_personal_tpu.linear.marginal import _select
            batches.append(_select(b, np.where(keep)[0]))
    vals = Values({group: initial[group][:n]})
    return FactorGraph(batches), vals


if __name__ == "__main__":
    main()
