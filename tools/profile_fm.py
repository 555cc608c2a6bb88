"""Feature-major vs [K,r,d] generic path on the real TPU (city10000).

Usage: timeout 2400 python tools/profile_fm.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, sync, iters=5, warmup=1):
    for _ in range(warmup):
        sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from gtsam_personal_tpu.slam import dataset
    from gtsam_personal_tpu.nonlinear import optimizers
    from gtsam_personal_tpu.linear import schur, fm, linearize as linz

    print("devices:", jax.devices())
    path = dataset.find_example_data("city10000.g2o")
    graph, initial = dataset.load_2d(path)
    plan = schur.make_plan(graph, initial.counts(), max_part_size=128)
    print("plan:", plan.stats())
    lam = jnp.float32(1e-4)

    lin_fn = jax.jit(linz.linearize)
    t = bench(lambda: lin_fn(graph, initial),
              lambda o: float(o.error_at_zero()))
    print(f"linearize [K,r,d]        : {t*1e3:9.1f} ms")

    linf_fn = jax.jit(fm.linearize_fm)
    t = bench(lambda: linf_fn(graph, initial),
              lambda o: float(o.error_at_zero()))
    print(f"linearize fm             : {t*1e3:9.1f} ms")

    lin = lin_fn(graph, initial)
    linf = linf_fn(graph, initial)

    solve_fn = jax.jit(lambda L, l: schur.solve_partitioned(L, plan, l))
    t = bench(lambda: solve_fn(lin, lam), lambda o: float(o["se2"][0, 0]))
    print(f"solve_partitioned [K,r,d]: {t*1e3:9.1f} ms")
    t = bench(lambda: solve_fn(linf, lam), lambda o: float(o["se2"][0, 0]))
    print(f"solve_partitioned fm     : {t*1e3:9.1f} ms")

    for label, p in [
        ("lm_try_step schur       ", optimizers.Params(solver="schur")),
        ("lm_try_step schur fm    ", optimizers.Params(solver="schur", fm=True)),
        ("lm_try_step pcg-50      ", optimizers.Params(solver="pcg", pcg_maxiter=50)),
        ("lm_try_step pcg-50 fm   ", optimizers.Params(solver="pcg", pcg_maxiter=50, fm=True)),
    ]:
        t = bench(lambda p=p: optimizers._lm_try_step(
            graph, initial, lam, p, plan=plan if p.solver == "schur" else None),
            lambda o: float(o[1]))
        print(f"{label} : {t*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
