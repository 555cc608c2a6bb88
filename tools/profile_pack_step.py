"""Phase breakdown of the PACKED-tile BA LM step on the real TPU, with the
bucketed path's numbers as the comparison point (same problem, same seed).

Usage: python -m tools.profile_pack_step [iters]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from gtsam_personal_tpu.sfm import ba, ba_pack, synthetic


def timeit(fn, sync, iters=5):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    prob = synthetic.make_skewed_problem(num_cameras=1723, num_points=156000,
                                         mean_track=4.0, max_track=40,
                                         seed=2, cam_zipf=1.2)
    state, obs = ba.state_from_bal(prob)
    state = ba.BAState(*[x.astype(jnp.float32) for x in state])
    obs = ba.BAObservations(obs.cam, obs.point, obs.uv.astype(jnp.float32))
    pl = ba_pack.make_pack_layout(obs, state.cam_poses.shape[0],
                                  state.points.shape[0])
    cw, pw = pl.padding_waste()
    print(f"pack: rowsC={pl.rowsC} PTC={pl.PTC} cam_classes="
          f"{len(pl.cam_classes)} pt_classes={len(pl.pt_classes)} "
          f"cam_waste={cw:.2f}x pt_waste={pw:.2f}x")
    lam = jnp.float32(1e-3)
    err0 = ba_pack.ba_error_pk(state, obs, pl)
    sync_tree = lambda o: float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])

    lin_j = jax.jit(lambda s: ba_pack.linearize_ba_pk(s, obs, pl))
    t_lin = timeit(lambda: lin_j(state), sync_tree, iters)
    print(f"linearize_ba_pk:        {t_lin*1e3:8.2f} ms")

    err_j = jax.jit(lambda s: ba_pack.ba_error_pk(s, obs, pl))
    t_err = timeit(lambda: err_j(state), lambda o: float(o), iters)
    print(f"ba_error_pk:            {t_err*1e3:8.2f} ms")

    for cg in (1, 3, 5):
        sol_j = jax.jit(lambda s, l: ba_pack.solve_ba_step_pk(
            s, obs, pl, l, cg_maxiter=cg))
        t_sol = timeit(lambda: sol_j(state, lam), sync_tree, iters)
        print(f"solve_ba_step_pk cg={cg}: {t_sol*1e3:8.2f} ms")

    # permutation gathers in isolation
    dtype = jnp.float32
    for k in (2, 8):
        src = jnp.ones((k, pl.S + 1), dtype=dtype)
        perm_j = jax.jit(lambda x: x[:, pl.p2c_tp])
        t_c2p = timeit(lambda: perm_j(src), sync_tree, iters)
        srcp = jnp.ones((k, 8 * pl.PTC + 1), dtype=dtype)
        permb_j = jax.jit(lambda x: x[:, pl.c2p_tp])
        t_p2c = timeit(lambda: permb_j(srcp), sync_tree, iters)
        n_el = k * pl.M
        print(f"perm k={k}: cam->pt {t_c2p*1e3:7.2f} ms "
              f"({t_c2p/n_el*1e9:.2f} ns/elem), pt->cam {t_p2c*1e3:7.2f} ms "
              f"({t_p2c/n_el*1e9:.2f} ns/elem)")

    # full LM via the single-dispatch scan (what bench.py times)
    n = max(iters, 5)
    _, _, ew = ba_pack.ba_lm_run_pk(state, obs, pl, lam, err0, n_iters=n,
                                    cg_maxiter=3)
    float(ew)
    t0 = time.perf_counter()
    _, _, ec = ba_pack.ba_lm_run_pk(state, obs, pl, lam, err0, n_iters=n,
                                    cg_maxiter=3)
    float(ec)
    t_lm = (time.perf_counter() - t0) / n
    print(f"ba_lm_run_pk cg=3:      {t_lm*1e3:8.2f} ms  "
          f"({1.0/t_lm:.2f} it/s)  err {float(err0):.1f} -> {float(ec):.1f}")


if __name__ == "__main__":
    main()
