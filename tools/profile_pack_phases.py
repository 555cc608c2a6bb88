"""Phase cost breakdown of the packed BA LM iteration, measured the only
reliable way on the axon tunnel: each phase-subset runs as an n-iteration
jitted lax.scan (ONE dispatch), and phase costs come from DIFFERENCES
between subset timings — no per-dispatch overhead in any number.

Subsets (cumulative):
  lin      linearize only
  prep     + pm relayout + Hpp/HppInv + gc/gp + rhs
  prec     + block-Jacobi preconditioner build (Hcc - Gc + cholesky)
  cg0      + CG solve with 0 iterations (pcg overhead) + backsub
  cgK      + K CG iterations
  full     + retract + error + accept/reject  (== ba_lm_run_pk)

Usage: python -m tools.profile_pack_phases [iters] [cg]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from gtsam_personal_tpu.sfm import ba, ba_pack, synthetic
from gtsam_personal_tpu.sfm import ba_kernels as bk
from gtsam_personal_tpu.sfm.ba import pcg


def scan_time(body, state0, n):
    fn = jax.jit(lambda s: jax.lax.scan(lambda c, _: (body(c), None), s,
                                        None, length=n)[0])
    out = fn(state0)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    out = fn(state0)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cg = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    prob = synthetic.make_skewed_problem(num_cameras=1723, num_points=156000,
                                         mean_track=4.0, max_track=40,
                                         seed=2, cam_zipf=1.2)
    state, obs = ba.state_from_bal(prob)
    state = ba.BAState(*[x.astype(jnp.float32) for x in state])
    obs = ba.BAObservations(obs.cam, obs.point, obs.uv.astype(jnp.float32))
    pl = ba_pack.make_pack_layout(obs, 1723, 156000)
    dtype = jnp.float32
    lam = jnp.float32(1e-3)

    S = pl.S

    def stage(kind):
        def body(st):
            r, Jc, Jp_cm = ba_pack.linearize_ba_pk(st, obs, pl)
            if kind == "lin":
                return ba.BAState(st.cam_poses + 0 * jnp.sum(r) * 0,
                                  st.cam_cals, st.points + jnp.sum(r) * 0)

            def cam_to_point(x):
                k = x.shape[0]
                flat = jnp.concatenate([x, jnp.zeros((k, 1), dtype=dtype)], axis=1)
                return flat[:, pl.p2c_tp]

            def point_to_cam(x):
                k = x.shape[0]
                flat = jnp.concatenate([x.reshape(k, -1),
                                        jnp.zeros((k, 1), dtype=dtype)], axis=1)
                return flat[:, pl.c2p_tp]

            pm = cam_to_point(jnp.concatenate([Jp_cm.reshape(6, S), r], axis=0))
            Jp4 = pm[:6].reshape(2, 3, ba_pack.PT_H, pl.PTC)
            r_pm = pm[6:]

            def cam_apply(x):
                xb = ba_pack._cam_broadcast(pl, x)
                return jnp.stack([sum(Jc[i, j] * xb[j] for j in range(9))
                                  for i in range(2)])

            def cam_reduce(u):
                return ba_pack._cam_reduce(pl, jnp.stack([
                    sum(Jc[i, j] * u[i] for i in range(2)) for j in range(9)]))

            def pt_reduce(ap):
                return ba_pack._pt_reduce(pl, jnp.stack([
                    sum(Jp4[i, k] * ap[i] for i in range(2)) for k in range(3)]))

            def pt_apply(u):
                ub = ba_pack._pt_broadcast(pl, u)
                return jnp.stack([sum(Jp4[i, k] * ub[k] for k in range(3))
                                  for i in range(2)])

            Hpp = ba_pack._pt_reduce(pl, jnp.stack([
                sum(Jp4[i, k] * Jp4[i, l] for i in range(2))
                for k in range(3) for l in range(3)]))
            Hpp = bk.add_scaled_identity_33_T(Hpp, lam + 1e-10)
            HppInv = bk.sym33_inv_T(Hpp)
            gc = cam_reduce(r)
            gp = pt_reduce(r_pm)
            hp = bk.sym33_matvec_T(HppInv, gp)
            b_rhs = -gc + cam_reduce(point_to_cam(pt_apply(hp)))
            if kind == "prep":
                return ba.BAState(st.cam_poses,
                                  st.cam_cals + jnp.sum(b_rhs) * 0, st.points)

            HppInv_pad = jnp.concatenate(
                [HppInv, jnp.zeros((9, 1), dtype=dtype)], axis=1)
            Hcc = ba_pack._cam_reduce(pl, jnp.stack([
                sum(Jc[i, j] * Jc[i, k] for i in range(2))
                for j in range(9) for k in range(9)]))
            Wt = [sum(Jc[i, a] * Jp_cm[i, b] for i in range(2))
                  for a in range(9) for b in range(3)]
            Hi = HppInv_pad[:, pl.pt_srt_cm]
            T1 = [sum(Wt[3 * a + b] * Hi[3 * b + c] for b in range(3))
                  for a in range(9) for c in range(3)]
            Gc = ba_pack._cam_reduce(pl, jnp.stack([
                sum(T1[3 * a + c] * Wt[3 * d + c] for c in range(3))
                for a in range(9) for d in range(9)]))
            blocks = (Hcc - Gc).T.reshape(pl.C_slots, 9, 9)
            Ls = bk.safe_chol_blocks(blocks, lam)
            if kind == "prec":
                return ba.BAState(st.cam_poses + jnp.sum(Ls) * 0,
                                  st.cam_cals, st.points)

            cho_apply = jax.vmap(
                lambda L, x: jax.scipy.linalg.cho_solve((L, True), x))
            precond = lambda x: cho_apply(Ls, x.T).T

            def schur_matvec(x):
                a = cam_apply(x)
                t = pt_reduce(cam_to_point(a))
                u = bk.sym33_matvec_T(HppInv, t)
                bc = point_to_cam(pt_apply(u))
                return cam_reduce(a - bc) + lam * x

            n_cg = {"cg0": 0}.get(kind, cg)
            xc = pcg(schur_matvec, b_rhs, precond, n_cg, 1e-6)
            t = pt_reduce(cam_to_point(cam_apply(xc)))
            xp = bk.sym33_matvec_T(HppInv, -gp - t)
            xc_orig = xc.T[pl.cam_orig2slot]
            xp_orig = xp.T[pl.pt_orig2slot]
            if kind in ("cg0", "cgK"):
                return ba.BAState(st.cam_poses + jnp.sum(xc_orig) * 0,
                                  st.cam_cals, st.points + jnp.sum(xp_orig) * 0)
            trial = ba_pack.retract_ba(st, xc_orig, xp_orig)
            err_t = ba_pack.ba_error_pk(trial, obs, pl)
            return ba.BAState(st.cam_poses + 0 * err_t, st.cam_cals, st.points)
        return body

    last = 0.0
    for kind in ("lin", "prep", "prec", "cg0", "cgK", "full"):
        t = scan_time(stage(kind), state, iters)
        print(f"{kind:5s}: {t*1e3:7.2f} ms/iter  (+{(t-last)*1e3:6.2f})")
        last = t


if __name__ == "__main__":
    main()
