"""BA step experiments: feature-major linearization, loop overhead, matvec.

Usage: timeout 2400 python tools/profile_ba_fm.py
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
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from gtsam_personal_tpu.sfm import ba, synthetic

    print("devices:", jax.devices())
    prob = synthetic.make_ring_problem(
        num_cameras=1723, num_points=156000, obs_per_point=4, seed=2)
    state, obs = ba.state_from_bal(prob)
    state = ba.BAState(*[x.astype(jnp.float32) for x in state])
    obs = ba.BAObservations(obs.cam, obs.point, obs.uv.astype(jnp.float32))
    layout = ba.make_layout(obs, state.cam_poses.shape[0], state.points.shape[0])
    M = obs.uv.shape[0]
    print("M =", M, "Q =", layout.Q, "T =", layout.T)

    # 1) while_loop dispatch overhead: 100 trivial iterations
    x0 = jnp.ones((128, 128), dtype=jnp.float32)

    def loop100(x):
        def body(s):
            k, x = s
            return k + 1, x * 1.000001 + 1e-9
        def cond(s):
            return s[0] < 100
        return jax.lax.while_loop(cond, body, (0, x))[1]

    f = jax.jit(loop100)
    t = bench(lambda: f(x0), lambda o: float(o[0, 0]))
    print(f"while_loop 100 trivial iters   : {t*1e3:9.2f} ms ({t*10:.3f} ms/iter)")

    # 2) current linearize (batch-major out)
    lin = jax.jit(ba.linearize_ba)
    t = bench(lambda: lin(state, obs), lambda o: float(jnp.sum(o[0])))
    print(f"linearize (batch-major)        : {t*1e3:9.1f} ms")

    # 3) feature-major linearize: same math, out_axes=-1 + pre-transposed inputs
    def linearize_fm(state, obs):
        dtype = state.points.dtype
        posesT = state.cam_poses.transpose(1, 2, 0)[:, :, obs.cam]   # [3,4,M]
        calsT = state.cam_cals.T[:, obs.cam]                          # [3,M]
        ptsT = state.points.T[:, obs.point]                           # [3,M]
        uvT = obs.uv.T                                                # [2,M]
        zeros = (jnp.zeros(9, dtype=dtype), jnp.zeros(3, dtype=dtype))

        def one(pose, cal, point, uv):
            r = ba._residual_local(zeros, pose, cal, point, uv)
            Jc, Jp = jax.jacfwd(ba._residual_local, argnums=0)(
                zeros, pose, cal, point, uv)
            return r, Jc.reshape(18), Jp.reshape(6)

        r, Jc, Jp = jax.vmap(one, in_axes=(-1, -1, -1, -1), out_axes=-1)(
            posesT, calsT, ptsT, uvT)
        from gtsam_personal_tpu.geometry import cameras as cam_geo
        depth = jax.vmap(cam_geo.depth_of, in_axes=(-1, -1), out_axes=-1)(
            posesT, ptsT)
        w = (depth > 1e-6).astype(dtype)[None, :]
        return r * w, Jc * w, Jp * w

    lin_fm = jax.jit(linearize_fm)
    t = bench(lambda: lin_fm(state, obs), lambda o: float(jnp.sum(o[0])))
    print(f"linearize feature-major        : {t*1e3:9.1f} ms")

    # check equality
    r0, Jc0, Jp0 = lin(state, obs)
    r1, Jc1, Jp1 = lin_fm(state, obs)
    print("fm == bm:",
          bool(jnp.allclose(r0.T, r1, atol=1e-5)),
          bool(jnp.allclose(Jc0.T, Jc1, atol=1e-4)),
          bool(jnp.allclose(Jp0.T, Jp1, atol=1e-4)))

    # 4) standalone matvec cost (outside the loop): run 10 matvecs chained
    lam = jnp.float32(1e-4)

    def ten_matvecs(state, obs, layout, lam):
        C, P, Q, T = layout.C, layout.P, layout.Q, layout.T
        dtype = state.points.dtype
        r, Jc, Jp = ba.linearize_ba(state, obs)
        zrow = lambda x: jnp.concatenate(
            [x, jnp.zeros((1,) + x.shape[1:], dtype=x.dtype)], axis=0)
        JcT = zrow(Jc).T
        JpT = zrow(Jp).T
        Jc4 = JcT[:, layout.g_cam].reshape(2, 9, C, Q)
        g_pt_tp = layout.g_pt.reshape(P, T).T
        Jp4 = JpT[:, g_pt_tp].reshape(2, 3, T, P)
        from gtsam_personal_tpu.sfm import ba_kernels as bk

        def cam_apply(x):
            return jnp.stack([
                sum(Jc4[i, j] * x[j][:, None] for j in range(9))
                for i in range(2)])

        def cam_reduce(u):
            return jnp.stack([
                sum(jnp.sum(Jc4[i, j] * u[i], axis=-1) for i in range(2))
                for j in range(9)])

        def pt_reduce(ap):
            return jnp.stack([
                sum(jnp.sum(Jp4[i, k] * ap[i], axis=0) for i in range(2))
                for k in range(3)])

        def pt_apply(u):
            return jnp.stack([
                sum(Jp4[i, k] * u[k][None, :] for k in range(3))
                for i in range(2)])

        Hpp = jnp.stack([
            sum(jnp.sum(Jp4[i, k] * Jp4[i, l], axis=0) for i in range(2))
            for k in range(3) for l in range(3)])
        Hpp = bk.add_scaled_identity_33_T(Hpp, lam + 1e-10)
        HppInv = bk.sym33_inv_T(Hpp)

        def cam_to_point(x_cq):
            flat = jnp.concatenate([x_cq.reshape(2, C * Q),
                                    jnp.zeros((2, 1), dtype=dtype)], axis=1)
            return flat[:, layout.p2c_tp]

        def point_to_cam(x_tp):
            flat = jnp.concatenate([x_tp.reshape(2, T * P),
                                    jnp.zeros((2, 1), dtype=dtype)], axis=1)
            return flat[:, layout.c2p_tp].reshape(2, C, Q)

        def mv(x):
            a = cam_apply(x)
            t = pt_reduce(cam_to_point(a))
            u = bk.sym33_matvec_T(HppInv, t)
            bc = point_to_cam(pt_apply(u))
            return cam_reduce(a - bc) + lam * x

        x = jnp.ones((9, C), dtype=dtype)
        for _ in range(10):
            x = mv(x)
        return x

    f4 = jax.jit(ten_matvecs)
    t = bench(lambda: f4(state, obs, layout, lam), lambda o: float(o[0, 0]))
    print(f"linearize+layout+10 unrolled mv: {t*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
