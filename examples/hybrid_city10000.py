"""Hybrid City10000: ambiguous loop closures as discrete-continuous inference.

Mirrors the reference's examples/Hybrid_City10000.cpp (+ City10000.h parser):
the T1_city10000 dataset gives some edges MULTIPLE candidate relative poses
(data-association ambiguity); each becomes a HybridFactor whose discrete mode
selects the measurement. The stream drives `HybridSmoother` (pruned
incremental hypothesis tracking); the final trajectory and chosen modes are
reported.

  python examples/hybrid_city10000.py [path] [--max-lines 150] [--leaves 4]
"""

import argparse
import time

import numpy as np


def parse_city10000_hybrid(path, max_lines):
    """Parse `EDGE2 keyS _ keyT _ numMeas x y rad [x y rad ...]` lines
    (reference: City10000.h parseLine)."""
    edges = []
    with open(path) as f:
        for ln, line in enumerate(f):
            if ln >= max_lines:
                break
            parts = line.split()
            if not parts or parts[0] != "EDGE2":
                continue
            ks, kt = int(parts[1]), int(parts[3])
            nm = int(parts[5])
            poses = [np.array([float(parts[6 + 3 * i]),
                               float(parts[7 + 3 * i]),
                               float(parts[8 + 3 * i])]) for i in range(nm)]
            edges.append((ks, kt, poses))
    return edges


def main():
    import jax.numpy as jnp
    from gtsam_personal_tpu.core.graph import FactorBatch, GraphBuilder
    from gtsam_personal_tpu.core.values import Values
    from gtsam_personal_tpu.geometry import se2
    from gtsam_personal_tpu.hybrid.hybrid import (HybridFactor, HybridISAM,
                                                  HybridSmoother)
    from gtsam_personal_tpu.linear.noise import NoiseModel
    from gtsam_personal_tpu.nonlinear import optimizers
    from gtsam_personal_tpu.nonlinear.isam2 import ISAM2Params
    from gtsam_personal_tpu.slam import dataset, factors as F

    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs="?", default=None)
    ap.add_argument("--max-lines", type=int, default=150)
    ap.add_argument("--leaves", type=int, default=4)
    ap.add_argument("--engine", choices=["isam", "smoother"], default="isam",
                    help="isam: bounded-cost ISAM2 engine per hypothesis; "
                         "smoother: batch-resolve HybridSmoother")
    args = ap.parse_args()
    if args.path is None:
        args.path = dataset.find_example_data("T1_city10000_04.txt")

    edges = parse_city10000_hybrid(args.path, args.max_lines)
    n = max(max(ks, kt) for ks, kt, _ in edges) + 1
    n_amb = sum(1 for _, _, p in edges if len(p) > 1)
    print(f"{len(edges)} edges over {n} poses ({n_amb} ambiguous)")

    if args.engine == "isam":
        run_isam(edges, n, args)
        return
    run_smoother(edges, n, args)


def run_isam(edges, n, args):
    """Bounded-cost stream: one ISAM2 engine per surviving hypothesis
    (reference: Hybrid_City10000.cpp driving the hybrid smoother, here with
    per-update cost independent of history length)."""
    import jax.numpy as jnp
    from gtsam_personal_tpu.geometry import se2
    from gtsam_personal_tpu.hybrid.hybrid import HybridISAM
    from gtsam_personal_tpu.linear.noise import NoiseModel
    from gtsam_personal_tpu.nonlinear.isam2 import ISAM2Params
    from gtsam_personal_tpu.slam import factors as F

    w = 1.0 / np.array([0.05, 0.05, 0.02])
    rb = F.make_between_residual("se2")
    pr = F.make_prior_residual("se2")
    hi = HybridISAM(
        max_leaves=args.leaves,
        params=ISAM2Params(relinearize_threshold=0.01, cg_maxiter=40,
                           cg_tol=1e-3, relin_chunk=256, dtype=np.float64,
                           precond="chain:se2",
                           min_var_cap=n + 1, min_fac_cap=len(edges) + 8))
    hi.add_variable("se2", np.zeros(3))
    hi.add_factor("prior_se2", pr, ["se2"], 3, [0], {"prior": np.zeros(3)},
                  NoiseModel("diag", jnp.asarray([1e3, 1e3, 1e4])))
    hi.update()

    t0 = time.time()
    added = 1
    t_seg, seg_n, seg_hyb = time.time(), 0, 0
    for ks, kt, poses in edges:
        if kt == added:
            best = hi.best_engine()
            init = np.asarray(se2.compose(
                jnp.asarray(best.estimate_at("se2", ks)),
                jnp.asarray(poses[0])))
            hi.add_variable("se2", init)
            added += 1
        if len(poses) == 1:
            hi.add_factor("between_se2", rb, ["se2", "se2"], 3, [ks, kt],
                          {"measured": poses[0]},
                          NoiseModel("diag", jnp.asarray(w)))
            hi.update()
        else:
            hi.add_hybrid_factor(
                "between_se2", rb, ["se2", "se2"], 3, [ks, kt],
                [{"measured": p} for p in poses],
                NoiseModel("diag", jnp.asarray(w)),
                mode_var=1000 + seg_hyb)
            seg_hyb += 1
        seg_n += 1
        if added % 500 == 0 and seg_n > 400:
            print(f"  poses {added:5d}: {(time.time()-t_seg)/seg_n*1e3:7.2f} "
                  f"ms/edge ({seg_hyb} modes so far)", flush=True)
            t_seg, seg_n = time.time(), 0
    for _ in range(6):
        hi.update()
    wall = time.time() - t0
    values, assignment, posterior = hi.estimate()
    err = hi.best_engine().error()
    print(f"\nhybrid-isam: {len(edges)} edges / {seg_hyb} discrete modes / "
          f"{args.leaves} leaves in {wall:.1f}s "
          f"({len(edges)/wall:.1f} edges/s)")
    print(f"final error {err:.4f}")
    print("mode assignment:", assignment)
    top = sorted(posterior.items(), key=lambda kv: -kv[1])[:3]
    for a, wk in top:
        print(f"  P={wk:.3f}  modes={dict(a)}")


def run_smoother(edges, n, args):
    import jax.numpy as jnp
    from gtsam_personal_tpu.core.graph import FactorBatch, GraphBuilder
    from gtsam_personal_tpu.core.values import Values
    from gtsam_personal_tpu.geometry import se2
    from gtsam_personal_tpu.hybrid.hybrid import HybridFactor, HybridSmoother
    from gtsam_personal_tpu.nonlinear import optimizers
    from gtsam_personal_tpu.slam import factors as F

    # odometry-composed initial estimate (reference uses the same)
    init = np.zeros((n, 3))
    for ks, kt, poses in edges:
        if kt == ks + 1:
            init[kt] = np.asarray(se2.compose(jnp.asarray(init[ks]),
                                              jnp.asarray(poses[0])))
    initial = Values({"se2": jnp.asarray(init)})

    def between_batch(i, j, meas, sigma=(0.05, 0.05, 0.02)):
        b = GraphBuilder()
        F.add_between(b, "se2", i, j, np.asarray(meas), F.diag_noise(list(sigma)))
        return b.build(dtype=jnp.float64).batches[0]

    def make_hybrid(i, j, poses, var):
        base = between_batch(i, j, poses[0])
        meas = np.stack([np.asarray(p) for p in poses])[:, None]  # [modes,1,3]
        return HybridFactor(
            FactorBatch(base.name, base.residual_fn, base.groups, 3,
                        base.idx, {"measured": jnp.asarray(meas)}, base.noise),
            mode_var=var, num_modes=len(poses))

    prior = GraphBuilder()
    F.add_prior(prior, "se2", 0, np.zeros(3), F.diag_noise([1e-4] * 3))

    sm = HybridSmoother(max_leaves=args.leaves,
                        params=optimizers.Params(max_iterations=10))
    pending = list(prior.build(dtype=jnp.float64).batches)
    t0 = time.time()
    nmodes = 0
    for ks, kt, poses in edges:
        if len(poses) == 1:
            pending.append(between_batch(ks, kt, poses[0]))
        else:
            sm.update(initial, continuous=pending,
                      hybrids=[make_hybrid(ks, kt, poses, 1000 + nmodes)])
            pending = []
            nmodes += 1
    if pending:
        sm.update(initial, continuous=pending)
    values, assignment, posterior = sm.estimate()
    dt = time.time() - t0
    err = float(sm.graph.graph_at(assignment).error(values))
    print(f"smoother: {nmodes} discrete modes, final error {err:.4f}, "
          f"{dt:.1f}s ({dt / max(nmodes, 1):.2f}s/hybrid update)")
    print("mode assignment:", assignment)
    top = sorted(posterior.items(), key=lambda kv: -kv[1])[:3]
    for a, w in top:
        print(f"  P={w:.3f}  modes={dict(a)}")


if __name__ == "__main__":
    main()
