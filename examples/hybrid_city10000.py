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
    from gtsam_personal_tpu.hybrid.hybrid import HybridFactor, HybridSmoother
    from gtsam_personal_tpu.nonlinear import optimizers
    from gtsam_personal_tpu.slam import dataset, factors as F

    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs="?", default=None)
    ap.add_argument("--max-lines", type=int, default=150)
    ap.add_argument("--leaves", type=int, default=4)
    args = ap.parse_args()
    if args.path is None:
        args.path = dataset.find_example_data("T1_city10000_04.txt")

    edges = parse_city10000_hybrid(args.path, args.max_lines)
    n = max(max(ks, kt) for ks, kt, _ in edges) + 1
    print(f"{len(edges)} edges over {n} poses "
          f"({sum(1 for _, _, p in edges if len(p) > 1)} ambiguous)")

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
