"""Phase breakdown of the bucketed BA LM step on the real TPU.

Times (jitted separately, synced via host transfer):
  - linearize_ba_bl              (autodiff relinearization)
  - ba_error_bl                  (error evaluation)
  - solve_ba_step_bl cg=5        (implicit-Schur PCG + backsub)
  - the cm<->pm permutation gathers in isolation (the measured matvec floor)
  - full ba_lm_iter_bl           (everything + accept/reject)

Usage: python tools/profile_bucket_step.py [iters]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from gtsam_personal_tpu.sfm import ba, ba_bucket, synthetic


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
    bl = ba_bucket.make_bucket_layout(obs, state.cam_poses.shape[0],
                                      state.points.shape[0])
    lam = jnp.float32(1e-3)
    err0 = ba_bucket.ba_error_bl(state, obs, bl)
    sync_tree = lambda o: float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])

    lin_j = jax.jit(lambda s: ba_bucket.linearize_ba_bl(s, obs, bl))
    t_lin = timeit(lambda: lin_j(state), sync_tree, iters)
    print(f"linearize_ba_bl:        {t_lin*1e3:8.2f} ms")

    err_j = jax.jit(lambda s: ba_bucket.ba_error_bl(s, obs, bl))
    t_err = timeit(lambda: err_j(state), lambda o: float(o), iters)
    print(f"ba_error_bl:            {t_err*1e3:8.2f} ms")

    for cg in (1, 5):
        sol_j = jax.jit(lambda s, l: ba_bucket.solve_ba_step_bl(
            s, obs, bl, l, cg_maxiter=cg))
        t_sol = timeit(lambda: sol_j(state, lam), sync_tree, iters)
        print(f"solve_ba_step_bl cg={cg}: {t_sol*1e3:8.2f} ms")

    # permutation gathers in isolation: cam->pt and pt->cam of a k-row
    # payload (k=8: Jp rows 6 + r rows 2 — the per-solve relayout; the
    # per-CG-iteration payload is k=2 each way)
    dtype = jnp.float32
    CQ = bl.CQ_total
    PT = bl.PT_total
    for k in (2, 8):
        src = jnp.ones((k, CQ + 1), dtype=dtype)
        perm_j = jax.jit(lambda x: [x[:, bl.p2c_tp[b]]
                                    for b in range(len(bl.pt_shapes))])
        t_c2p = timeit(lambda: perm_j(src), sync_tree, iters)
        srcp = jnp.ones((k, PT + 1), dtype=dtype)
        permb_j = jax.jit(lambda x: [x[:, bl.c2p_tp[b]]
                                     for b in range(len(bl.cam_shapes))])
        t_p2c = timeit(lambda: permb_j(srcp), sync_tree, iters)
        n_el = k * bl.M
        print(f"perm k={k}: cam->pt {t_c2p*1e3:7.2f} ms "
              f"({t_c2p/n_el*1e9:.2f} ns/elem), pt->cam {t_p2c*1e3:7.2f} ms "
              f"({t_p2c/n_el*1e9:.2f} ns/elem)")

    lm_j = lambda s, l, e: ba_bucket.ba_lm_iter_bl(s, obs, bl, l, e,
                                                   cg_maxiter=5)
    st, l1, e1 = lm_j(state, lam, err0)
    float(e1)
    t0 = time.perf_counter()
    st2, lc, ec = state, lam, err0
    for _ in range(iters):
        st2, lc, ec = lm_j(st2, lc, ec)
    float(ec)
    t_lm = (time.perf_counter() - t0) / iters
    print(f"ba_lm_iter_bl cg=5:     {t_lm*1e3:8.2f} ms  "
          f"({1.0/t_lm:.2f} it/s)")


if __name__ == "__main__":
    main()
