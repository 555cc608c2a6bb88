"""Schur matvec component costs at Ladybug scale.

Usage: timeout 2400 python tools/profile_matvec.py
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
    C, P, Q, T = layout.C, layout.P, layout.Q, layout.T
    dtype = jnp.float32

    lin = jax.jit(lambda s, o: ba.linearize_ba_cm(s, o, layout))
    r_cm, Jc4, Jp_cm = lin(state, obs)
    t = bench(lambda: lin(state, obs), lambda o: float(jnp.sum(o[0])))
    print(f"linearize_ba_cm              : {t*1e3:9.1f} ms")

    def rep10(f):
        def g(x):
            for _ in range(10):
                x = f(x)
            return x
        return jax.jit(g)

    # cam_apply x10: [9,C] -> [2,C,Q] -> back via sum to keep shapes
    def cam_apply_cycle(x):
        a = jnp.stack([
            sum(Jc4[i, j] * x[j][:, None] for j in range(9)) for i in range(2)])
        return jnp.stack([
            sum(jnp.sum(Jc4[i, j] * a[i], axis=-1) for i in range(2))
            for j in range(9)])

    x0 = jnp.ones((9, C), dtype=dtype)
    f1 = rep10(cam_apply_cycle)
    t = bench(lambda: f1(x0), lambda o: float(o[0, 0]))
    print(f"10x (cam_apply+cam_reduce)   : {t*1e3:9.1f} ms")

    # perms x10
    def perm_cycle(a):
        flat = jnp.concatenate([a.reshape(2, C * Q),
                                jnp.zeros((2, 1), dtype=dtype)], axis=1)
        ap = flat[:, layout.p2c_tp]                    # [2, T, P]
        flat2 = jnp.concatenate([ap.reshape(2, T * P),
                                 jnp.zeros((2, 1), dtype=dtype)], axis=1)
        return flat2[:, layout.c2p_tp].reshape(2, C, Q)

    a0 = jnp.ones((2, C, Q), dtype=dtype)
    f2 = rep10(perm_cycle)
    t = bench(lambda: f2(a0), lambda o: float(o[0, 0, 0]))
    print(f"10x (perm cm->pm->cm)        : {t*1e3:9.1f} ms")

    # packed-u64 perm x10: both f32 planes in one gather
    def perm_cycle_packed(a):
        hi = jax.lax.bitcast_convert_type(a[0].reshape(C * Q), jnp.uint32)
        lo = jax.lax.bitcast_convert_type(a[1].reshape(C * Q), jnp.uint32)
        packed = hi.astype(jnp.uint64) << 32 | lo.astype(jnp.uint64)
        packed = jnp.concatenate([packed, jnp.zeros(1, jnp.uint64)])
        pp = packed[layout.p2c_tp].reshape(T * P)
        pp = jnp.concatenate([pp, jnp.zeros(1, jnp.uint64)])
        back = pp[layout.c2p_tp]
        h = jax.lax.bitcast_convert_type((back >> 32).astype(jnp.uint32), dtype)
        l = jax.lax.bitcast_convert_type(back.astype(jnp.uint32), dtype)
        return jnp.stack([h, l]).reshape(2, C, Q)

    f3 = rep10(perm_cycle_packed)
    t = bench(lambda: f3(a0), lambda o: float(o[0, 0, 0]))
    print(f"10x packed-u64 perm          : {t*1e3:9.1f} ms")

    # pt ops x10
    def pt_cycle(u):
        bb = jnp.stack([
            sum(Jp4_[i, k] * u[k][None, :] for k in range(3)) for i in range(2)])
        return jnp.stack([
            sum(jnp.sum(Jp4_[i, k] * bb[i], axis=0) for i in range(2))
            for k in range(3)])

    Jp4_ = jax.jit(lambda j: jnp.concatenate(
        [j.reshape(6, C * Q), jnp.zeros((6, 1), dtype=dtype)], axis=1
    )[:, layout.p2c_tp].reshape(2, 3, T, P))(Jp_cm)
    u0 = jnp.ones((3, P), dtype=dtype)
    f4 = rep10(pt_cycle)
    t = bench(lambda: f4(u0), lambda o: float(o[0, 0]))
    print(f"10x (pt_apply+pt_reduce)     : {t*1e3:9.1f} ms")

    # precond apply x10
    key = jax.random.PRNGKey(0)
    Ls = jnp.eye(9, dtype=dtype)[None].repeat(C, 0) * 2.0

    def pre_cycle(x):
        cho = jax.vmap(lambda L, v: jax.scipy.linalg.cho_solve((L, True), v))
        return cho(Ls, x.T).T

    f5 = rep10(pre_cycle)
    t = bench(lambda: f5(x0), lambda o: float(o[0, 0]))
    print(f"10x precond cho_solve        : {t*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
