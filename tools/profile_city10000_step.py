"""City10000 batch LM step throughput on TPU: [K,r,d] vs feature-major
linearize, one-level partitioned Schur vs multi-level (mlschur).

Usage: timeout 3000 python tools/profile_city10000_step.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, sync, iters=5, warmup=2):
    for _ in range(warmup):
        sync(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from gtsam_personal_tpu.slam import dataset
    from gtsam_personal_tpu.core.values import Layout
    from gtsam_personal_tpu.linear import schur, mlschur
    from gtsam_personal_tpu.linear.linearize import linearize
    from gtsam_personal_tpu.linear.fm import linearize_fm
    from gtsam_personal_tpu.nonlinear import optimizers

    graph, initial = dataset.load_2d(
        dataset.find_example_data("city10000.g2o"), dtype=np.float32)
    n = initial["se2"].shape[0]
    counts = {"se2": n}
    print(f"city10000: {n} poses", flush=True)

    t0 = time.time()
    plan = schur.make_plan(graph, counts, max_part_size=256)
    print(f"one-level plan built in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    mplan = mlschur.make_ml_plan(graph, counts, max_part_size=256)
    print(f"multi-level plan built in {time.time()-t0:.1f}s", flush=True)

    lam = jnp.float32(1e-3)
    sync = lambda x: float(jax.tree.leaves(x)[0].ravel()[0])

    lin_f = jax.jit(lambda: linearize(graph, initial))
    t_lin = bench(lin_f, sync)
    lin = lin_f()
    print(f"linearize [K,r,d]: {t_lin*1e3:.1f} ms", flush=True)

    linfm_f = jax.jit(lambda: linearize_fm(graph, initial))
    t_linfm = bench(linfm_f, sync)
    print(f"linearize fm:      {t_linfm*1e3:.1f} ms", flush=True)

    s1 = jax.jit(lambda: schur.solve_partitioned(lin, plan, lam))
    t_s1 = bench(s1, sync)
    print(f"solve_partitioned (1-level): {t_s1*1e3:.1f} ms", flush=True)

    s2 = jax.jit(lambda: mlschur.solve_ml(lin, mplan, lam))
    t_s2 = bench(s2, sync)
    print(f"solve_ml (multi-level):      {t_s2*1e3:.1f} ms", flush=True)

    # full try-step (jitted end-to-end) at both configs
    for label, params, plan_used in (
        ("step fm+ml", optimizers.Params(solver="schur", fm=True), mplan),
        ("step krd+1lvl", optimizers.Params(solver="schur"), plan),
    ):
        try:
            f = jax.jit(lambda p=params, pl=plan_used:
                        optimizers._lm_try_step(graph, initial, lam, p, pl))
            t = bench(f, lambda o: float(o[1]))
            print(f"{label}: {t*1e3:.1f} ms ({1/t:.2f} it/s)", flush=True)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
