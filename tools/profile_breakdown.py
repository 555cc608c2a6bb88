"""Component-level timing of the two hot paths on the real TPU.

Usage:  timeout 2400 python tools/profile_breakdown.py [ba|pose|both]

Prints per-component seconds. Sync is via host transfer (float()) because
jax.block_until_ready is unreliable on the axon backend (CLAUDE.md).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, sync, iters=5, warmup=1):
    for _ in range(warmup):
        sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def profile_ba():
    import jax
    import jax.numpy as jnp
    from gtsam_personal_tpu.sfm import ba, synthetic

    prob = synthetic.make_ring_problem(
        num_cameras=1723, num_points=156000, obs_per_point=4, seed=2)
    state, obs = ba.state_from_bal(prob)
    state = ba.BAState(*[x.astype(jnp.float32) for x in state])
    obs = ba.BAObservations(obs.cam, obs.point, obs.uv.astype(jnp.float32))
    layout = ba.make_layout(obs, state.cam_poses.shape[0], state.points.shape[0])
    lam = jnp.float32(1e-4)

    lin = jax.jit(ba.linearize_ba)
    t_lin = bench(lambda: lin(state, obs), lambda o: float(jnp.sum(o[0])))
    print(f"ba.linearize_ba                : {t_lin*1e3:9.1f} ms")

    for ncg in (0, 1, 10, 25):
        t = bench(lambda n=ncg: ba.ba_try_step(state, obs, layout, lam,
                                               cg_maxiter=n),
                  lambda o: float(o[1]))
        print(f"ba.ba_try_step cg={ncg:<3d}         : {t*1e3:9.1f} ms")

    err = jax.jit(ba.ba_error)
    t_err = bench(lambda: err(state, obs), lambda o: float(o))
    print(f"ba.ba_error                    : {t_err*1e3:9.1f} ms")


def profile_pose():
    import jax
    import jax.numpy as jnp
    from gtsam_personal_tpu.slam import dataset
    from gtsam_personal_tpu.nonlinear import optimizers
    from gtsam_personal_tpu.linear import schur, linearize as linz

    path = dataset.find_example_data("city10000.g2o")
    graph, initial = dataset.load_2d(path)
    print("city10000:", initial["se2"].shape[0], "poses,",
          graph.num_factors, "factors")
    t0 = time.time()
    plan = schur.make_plan(graph, initial.counts(), max_part_size=128)
    print("plan:", plan.stats(), f"({time.time()-t0:.1f}s host)")

    lin_fn = jax.jit(linz.linearize)
    t_lin = bench(lambda: lin_fn(graph, initial),
                  lambda o: float(o.error_at_zero()))
    print(f"pose.linearize                 : {t_lin*1e3:9.1f} ms")

    lin = lin_fn(graph, initial)
    lam = jnp.float32(1e-4)

    solve_fn = jax.jit(lambda L, l: schur.solve_partitioned(L, plan, l))
    t_solve = bench(lambda: solve_fn(lin, lam),
                    lambda o: float(o["se2"][0, 0]))
    print(f"pose.solve_partitioned         : {t_solve*1e3:9.1f} ms")

    gvals = initial
    t_step = bench(
        lambda: optimizers._lm_try_step(
            graph, gvals, lam,
            optimizers.Params(solver="schur"), plan=plan),
        lambda o: float(o[1]))
    print(f"pose.lm_try_step (schur)       : {t_step*1e3:9.1f} ms")

    # PCG path for comparison
    p2 = optimizers.Params(solver="pcg", pcg_maxiter=50)
    t_pcg = bench(lambda: optimizers._lm_try_step(graph, gvals, lam, p2),
                  lambda o: float(o[1]))
    print(f"pose.lm_try_step (pcg-50)      : {t_pcg*1e3:9.1f} ms")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    import jax
    print("devices:", jax.devices())
    if which in ("ba", "both"):
        profile_ba()
    if which in ("pose", "both"):
        profile_pose()
