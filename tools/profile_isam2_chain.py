"""ISAM2 chain timing (reference: timing/timeiSAM2Chain.cpp — a pure
odometry chain streamed through ISAM2, one update per step, reporting
steady-state per-update cost).

Usage: python tools/profile_isam2_chain.py [--n 1000] [--platform cpu]
       [--evict-lag 0]    # >0: marginalizeLeaves-style eviction window
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--platform", default=None, choices=[None, "cpu"])
    ap.add_argument("--evict-lag", type=int, default=0)
    ap.add_argument("--dtype", choices=["f32", "f64"], default="f64")
    args = ap.parse_args()
    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    from gtsam_personal_tpu.geometry import se2
    from gtsam_personal_tpu.linear import noise as nz
    from gtsam_personal_tpu.nonlinear.isam2 import ISAM2, ISAM2Params
    from gtsam_personal_tpu.slam import factors as F

    dt = np.float32 if args.dtype == "f32" else np.float64
    cap = 256 if args.evict_lag else args.n + 1
    isam = ISAM2(ISAM2Params(relinearize_threshold=0.01, cg_maxiter=30,
                             cg_tol=1e-6, dtype=dt, precond="chain:se2",
                             min_var_cap=cap, min_fac_cap=cap))
    rb = F.make_between_residual("se2")
    pr = F.make_prior_residual("se2")
    prior_noise = nz.NoiseModel("diag", jnp.asarray([1e3, 1e3, 1e4], dtype=dt))
    odo_noise = nz.NoiseModel("diag", jnp.asarray([20.0, 20.0, 100.0],
                                                  dtype=dt))
    rng = np.random.default_rng(0)

    slot = [isam.add_variable("se2", np.zeros(3))]
    isam.add_factor("prior_se2", pr, ["se2"], 3, [slot[0]],
                    {"prior": np.zeros(3)}, prior_noise)
    isam.update()
    est_prev = np.zeros(3)
    stamps = [time.perf_counter()]
    live = [0]
    for k in range(1, args.n):
        m = np.array([1.0, 0.0, 0.01]) + rng.normal(0, [0.05, 0.05, 0.01])
        init = np.asarray(se2.compose(jnp.asarray(est_prev), jnp.asarray(m)))
        slot.append(isam.add_variable("se2", init))
        isam.add_factor("between_se2", rb, ["se2", "se2"], 3,
                        [slot[k - 1], slot[k]], {"measured": m}, odo_noise)
        isam.update()
        est_prev = init
        live.append(k)
        if args.evict_lag and len(live) > args.evict_lag + 1:
            old = live.pop(0)
            isam.marginalize_variables({"se2": [slot[old]]})
            isam.update()
        stamps.append(time.perf_counter())
    d = np.diff(np.asarray(stamps)) * 1e3
    q = np.percentile(d, [50, 90, 99])
    tail = d[len(d) // 2:]
    print(f"isam2 chain n={args.n} evict_lag={args.evict_lag}: per-step "
          f"median {q[0]:.1f} ms, p90 {q[1]:.1f}, p99 {q[2]:.1f}; "
          f"steady-state (2nd half) mean {tail.mean():.1f} ms")
    print(f"final error {isam.error():.3f}")
    print("PROFILE-ISAM2-CHAIN OK")


if __name__ == "__main__":
    main()
