"""Fixed-lag smoothing on a Pose2 stream.

Mirrors the reference's examples/FLS_example.cpp: a platform moving at
constant speed sends odometry every 0.25 s into a BatchFixedLagSmoother
with a 2.0 s lag; states older than the lag are marginalized into a dense
prior on the window boundary (linear/marginal.py), so memory stays bounded
while the recent window remains batch-optimal.

Run (CPU):
  python -c "import jax; jax.config.update('jax_platforms','cpu'); \
             jax.config.update('jax_enable_x64', True); \
             exec(open('examples/fixed_lag_smoother.py').read())"
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--lag", type=float, default=2.0)
    ap.add_argument("--dt", type=float, default=0.25)
    args = ap.parse_args()

    import jax.numpy as jnp
    from gtsam_personal_tpu.geometry import se2
    from gtsam_personal_tpu.core.graph import GraphBuilder
    from gtsam_personal_tpu.core.values import Values
    from gtsam_personal_tpu.nonlinear import optimizers
    from gtsam_personal_tpu.nonlinear.fixed_lag import FixedLagSmoother
    from gtsam_personal_tpu.slam import factors as F

    rng = np.random.default_rng(0)
    n = args.steps
    # ground truth: constant velocity 2 m/s with gentle turning
    truth = np.zeros((n, 3))
    step = np.array([2.0 * args.dt, 0.0, 0.1 * args.dt])
    for i in range(1, n):
        truth[i] = np.asarray(se2.compose(jnp.asarray(truth[i - 1]),
                                          jnp.asarray(step)))

    smoother = FixedLagSmoother(lag=args.lag,
                                params=optimizers.Params(max_iterations=8))
    all_b = GraphBuilder()          # the full batch, for the cross-check
    for i in range(n):
        b = GraphBuilder()
        ts = {("se2", i): i * args.dt}
        if i == 0:
            F.add_prior(b, "se2", 0, truth[0],
                        F.diag_noise([0.1, 0.1, 0.05]))
            F.add_prior(all_b, "se2", 0, truth[0],
                        F.diag_noise([0.1, 0.1, 0.05]))
            init = Values({"se2": jnp.asarray(truth[:1])})
        else:
            meas = step + rng.normal(scale=[0.02, 0.02, 0.01])
            F.add_between(b, "se2", i - 1, i, meas,
                          F.diag_noise([0.05, 0.05, 0.02]))
            F.add_between(all_b, "se2", i - 1, i, meas,
                          F.diag_noise([0.05, 0.05, 0.02]))
            init = Values({"se2": jnp.asarray(truth[: i + 1])})
        smoother.update(b.build(dtype=np.float64).batches, init, ts)
        if i % 8 == 0 and i > 0:
            est = np.asarray(smoother.estimate()["se2"])
            print(f"t={i * args.dt:5.2f}s: newest pose "
                  f"({est[i][0]:6.2f}, {est[i][1]:6.2f}, {est[i][2]:5.2f}), "
                  f"window holds {sum(v >= (i * args.dt) - args.lag for v in smoother.timestamps.values())} states")

    batch = optimizers.optimize_lm(all_b.build(dtype=np.float64),
                                   Values({"se2": jnp.asarray(truth)}),
                                   optimizers.Params(max_iterations=20))
    got = np.asarray(smoother.estimate()["se2"])[-3:]
    want = np.asarray(batch.values["se2"])[-3:]
    diff = np.abs(got - want).max()
    print(f"recent-window estimates vs full batch: max diff {diff:.5f}")
    ok = diff < 1e-2
    print("FIXED-LAG OK" if ok else "FIXED-LAG FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
