"""Permutation-gather optimizations: complex64 packing, sorted indices.

Usage: timeout 2400 python tools/profile_perm.py
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
    obs = ba.BAObservations(obs.cam, obs.point, obs.uv.astype(jnp.float32))
    layout = ba.make_layout(obs, state.cam_poses.shape[0], state.points.shape[0])
    C, P, Q, T = layout.C, layout.P, layout.Q, layout.T
    dtype = jnp.float32
    a0 = jnp.ones((2, C, Q), dtype=dtype)

    def rep10(f):
        def g(x):
            for _ in range(10):
                x = f(x)
            return x
        return jax.jit(g)

    # baseline
    def perm_cycle(a):
        flat = jnp.concatenate([a.reshape(2, C * Q),
                                jnp.zeros((2, 1), dtype=dtype)], axis=1)
        ap = flat[:, layout.p2c_tp]
        flat2 = jnp.concatenate([ap.reshape(2, T * P),
                                 jnp.zeros((2, 1), dtype=dtype)], axis=1)
        return flat2[:, layout.c2p_tp].reshape(2, C, Q)

    f0 = rep10(perm_cycle)
    t = bench(lambda: f0(a0), lambda o: float(o[0, 0, 0]))
    print(f"10x baseline perm cycle        : {t*1e3:9.1f} ms")

    # complex64-packed: both planes, one index per pair
    def perm_cycle_c64(a):
        z = jax.lax.complex(a[0].reshape(C * Q), a[1].reshape(C * Q))
        z = jnp.concatenate([z, jnp.zeros(1, z.dtype)])
        zp = z[layout.p2c_tp].reshape(T * P)
        zp = jnp.concatenate([zp, jnp.zeros(1, z.dtype)])
        zb = zp[layout.c2p_tp]
        return jnp.stack([zb.real, zb.imag]).reshape(2, C, Q)

    f1 = rep10(perm_cycle_c64)
    t = bench(lambda: f1(a0), lambda o: float(o[0, 0, 0]))
    print(f"10x complex64-packed perm      : {t*1e3:9.1f} ms")

    # sorted indices: relabel points by primary camera so p2c_tp is
    # near-monotonic (host-side preprocessing; exact same semantics)
    pm_first_cam = np.full(P, 10**9, dtype=np.int64)
    oc = np.asarray(obs.cam)
    op = np.asarray(obs.point)
    for k in range(oc.shape[0]):
        if oc[k] < pm_first_cam[op[k]]:
            pm_first_cam[op[k]] = oc[k]
    order = np.argsort(pm_first_cam, kind="stable")
    relabel = np.empty(P, dtype=np.int64)
    relabel[order] = np.arange(P)
    obs2 = ba.BAObservations(obs.cam, jnp.asarray(relabel[op]), obs.uv)
    layout2 = ba.make_layout(obs2, C, P)

    def perm_cycle2(a):
        flat = jnp.concatenate([a.reshape(2, C * Q),
                                jnp.zeros((2, 1), dtype=dtype)], axis=1)
        ap = flat[:, layout2.p2c_tp]
        flat2 = jnp.concatenate([ap.reshape(2, layout2.T * P),
                                 jnp.zeros((2, 1), dtype=dtype)], axis=1)
        return flat2[:, layout2.c2p_tp].reshape(2, C, Q)

    f2 = rep10(perm_cycle2)
    t = bench(lambda: f2(a0), lambda o: float(o[0, 0, 0]))
    print(f"10x sorted-relabel perm        : {t*1e3:9.1f} ms")

    # both
    def perm_cycle2_c64(a):
        z = jax.lax.complex(a[0].reshape(C * Q), a[1].reshape(C * Q))
        z = jnp.concatenate([z, jnp.zeros(1, z.dtype)])
        zp = z[layout2.p2c_tp].reshape(layout2.T * P)
        zp = jnp.concatenate([zp, jnp.zeros(1, z.dtype)])
        zb = zp[layout2.c2p_tp]
        return jnp.stack([zb.real, zb.imag]).reshape(2, C, Q)

    f3 = rep10(perm_cycle2_c64)
    t = bench(lambda: f3(a0), lambda o: float(o[0, 0, 0]))
    print(f"10x sorted + complex64 perm    : {t*1e3:9.1f} ms")

    # gather axis choice: index FIRST axis of [N, 2] instead of lanes
    tbl = jnp.ones((C * Q + 1, 8), dtype=dtype)  # 8 lanes to dodge 2-pad

    def perm_rows(_):
        return tbl[layout.p2c_tp.reshape(-1)]

    f4 = rep10(perm_rows)
    t = bench(lambda: f4(a0), lambda o: float(o[0, 0]))
    print(f"10x row-gather [TP, 8] table   : {t*1e3:9.1f} ms")


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def main2():
    import jax
    import jax.numpy as jnp
    from gtsam_personal_tpu.sfm import ba, synthetic

    print("devices:", jax.devices())
    prob = synthetic.make_ring_problem(
        num_cameras=1723, num_points=156000, obs_per_point=4, seed=2)
    state, obs = ba.state_from_bal(prob)
    obs = ba.BAObservations(obs.cam, obs.point, obs.uv.astype(jnp.float32))
    layout = ba.make_layout(obs, state.cam_poses.shape[0], state.points.shape[0])
    C, P, Q, T = layout.C, layout.P, layout.Q, layout.T
    dtype = jnp.float32
    a0 = jnp.ones((2, C, Q), dtype=dtype)
    p2c_rows = layout.p2c_tp.reshape(-1)
    c2p_rows = layout.c2p_tp

    def rep10(f):
        def g(x):
            for _ in range(10):
                x = f(x)
            return x
        return jax.jit(g)

    def cycle_rowgather(a):
        k = a.shape[0]
        rows = jnp.concatenate([a.reshape(k, C * Q).T,
                                jnp.zeros((1, k), dtype=dtype)])
        ap = rows[p2c_rows]                       # [T*P, k]
        rows2 = jnp.concatenate([ap, jnp.zeros((1, k), dtype=dtype)])
        back = rows2[c2p_rows]                    # [C*Q, k]
        return back.T.reshape(k, C, Q)

    f = rep10(cycle_rowgather)
    t = bench(lambda: f(a0), lambda o: float(o[0, 0, 0]))
    print(f"10x row-gather perm cycle k=2  : {t*1e3:9.1f} ms")

    a8 = jnp.ones((8, C, Q), dtype=dtype)
    f8 = rep10(cycle_rowgather)
    t = bench(lambda: f8(a8), lambda o: float(o[0, 0, 0]))
    print(f"10x row-gather perm cycle k=8  : {t*1e3:9.1f} ms")

    # transpose-only cost
    def cycle_transpose_only(a):
        k = a.shape[0]
        rows = a.reshape(k, C * Q).T
        return (rows.T + 1.0).reshape(k, C, Q)

    ft = rep10(cycle_transpose_only)
    t = bench(lambda: ft(a0), lambda o: float(o[0, 0, 0]))
    print(f"10x transpose roundtrip k=2    : {t*1e3:9.1f} ms")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "2":
    main2()


def main3():
    import jax
    import jax.numpy as jnp
    from gtsam_personal_tpu.sfm import ba, synthetic

    print("devices:", jax.devices())
    prob = synthetic.make_ring_problem(
        num_cameras=1723, num_points=156000, obs_per_point=4, seed=2)
    state, obs = ba.state_from_bal(prob)
    obs = ba.BAObservations(obs.cam, obs.point, obs.uv.astype(jnp.float32))
    layout = ba.make_layout(obs, state.cam_poses.shape[0], state.points.shape[0])
    C, P, Q, T = layout.C, layout.P, layout.Q, layout.T
    dtype = jnp.float32
    a0 = jnp.ones((2, C, Q), dtype=dtype)
    p2c_rows = layout.p2c_tp.reshape(-1)
    c2p_rows = layout.c2p_tp

    def rep10(f):
        def g(x):
            for _ in range(10):
                x = f(x)
            return x
        return jax.jit(g)

    def cycle_barrier(a):
        k = a.shape[0]
        rows = jnp.concatenate([a.reshape(k, C * Q).T,
                                jnp.zeros((1, k), dtype=dtype)])
        rows = jax.lax.optimization_barrier(rows)
        ap = rows[p2c_rows]
        ap = jax.lax.optimization_barrier(ap)
        rows2 = jnp.concatenate([ap, jnp.zeros((1, k), dtype=dtype)])
        rows2 = jax.lax.optimization_barrier(rows2)
        back = rows2[c2p_rows]
        return back.T.reshape(k, C, Q)

    f = rep10(cycle_barrier)
    t = bench(lambda: f(a0), lambda o: float(o[0, 0, 0]))
    print(f"10x row-gather w/ opt-barrier  : {t*1e3:9.1f} ms")

    # materialized-table gather only (no transposes in the chain):
    tblA = jnp.ones((C * Q + 1, 2), dtype=dtype)
    tblB = jnp.ones((T * P + 1, 2), dtype=dtype)

    def pure_gathers(x):
        g1 = tblA[p2c_rows] + x[0, 0, 0]
        g2 = tblB[c2p_rows]
        return g1[:5, :].sum() + g2[:5, :].sum() + x

    fp = rep10(pure_gathers)
    t = bench(lambda: fp(a0), lambda o: float(o[0, 0, 0]))
    print(f"10x pure row-gathers k=2       : {t*1e3:9.1f} ms")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "3":
    main3()


def main4():
    import jax
    import jax.numpy as jnp
    from gtsam_personal_tpu.sfm import ba, synthetic

    print("devices:", jax.devices())
    prob = synthetic.make_ring_problem(
        num_cameras=1723, num_points=156000, obs_per_point=4, seed=2)
    state, obs = ba.state_from_bal(prob)
    obs = ba.BAObservations(obs.cam, obs.point, obs.uv.astype(jnp.float32))
    layout = ba.make_layout(obs, state.cam_poses.shape[0], state.points.shape[0])
    C, P, Q, T = layout.C, layout.P, layout.Q, layout.T
    dtype = jnp.float32
    p2c_rows = layout.p2c_tp.reshape(-1)
    c2p_rows = layout.c2p_tp
    CQ, TP = C * Q, T * P

    def rep10(f):
        def g(x):
            for _ in range(10):
                x = f(x)
            return x
        return jax.jit(g)

    # in-graph [CQ, 2] produced by ELEMENTWISE ops (no transpose), then
    # row-gathered both directions
    J2 = jnp.ones((CQ, 2), dtype=dtype)

    def cycle_rows_natural(x):
        a = J2 * x[0, 0] + x[:CQ]                  # [CQ, 2] elementwise
        a = jnp.concatenate([a, jnp.zeros((1, 2), dtype=dtype)])
        ap = a[p2c_rows]                           # [TP, 2]
        bb = ap * 1.0001                           # elementwise in pm
        bb = jnp.concatenate([bb, jnp.zeros((1, 2), dtype=dtype)])
        return bb[c2p_rows]                        # [CQ, 2]

    x0 = jnp.ones((CQ, 2), dtype=dtype)
    f = rep10(cycle_rows_natural)
    t = bench(lambda: f(x0), lambda o: float(o[0, 0]))
    print(f"10x natural-rows perm cycle k=2: {t*1e3:9.1f} ms")

    # wider rows: k=8
    J8 = jnp.ones((CQ, 8), dtype=dtype)

    def cycle_rows_k8(x):
        a = J8 * x[0, 0] + x[:CQ]
        a = jnp.concatenate([a, jnp.zeros((1, 8), dtype=dtype)])
        ap = a[p2c_rows]
        bb = ap * 1.0001
        bb = jnp.concatenate([bb, jnp.zeros((1, 8), dtype=dtype)])
        return bb[c2p_rows]

    x8 = jnp.ones((CQ, 8), dtype=dtype)
    f8 = rep10(cycle_rows_k8)
    t = bench(lambda: f8(x8), lambda o: float(o[0, 0]))
    print(f"10x natural-rows perm cycle k=8: {t*1e3:9.1f} ms")

    # elementwise bandwidth check on [CQ, 18] lane-padded rows
    J18 = jnp.ones((CQ, 18), dtype=dtype)

    def ew18(x):
        return x * 1.0001 + J18

    f18 = rep10(ew18)
    t = bench(lambda: f18(J18 * 1.0), lambda o: float(o[0, 0]))
    print(f"10x elementwise [CQ,18] rows   : {t*1e3:9.1f} ms")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "4":
    main4()


def main5():
    import jax
    import jax.numpy as jnp
    from gtsam_personal_tpu.sfm import ba, synthetic

    print("devices:", jax.devices())
    prob = synthetic.make_ring_problem(
        num_cameras=1723, num_points=156000, obs_per_point=4, seed=2)
    state, obs = ba.state_from_bal(prob)
    obs = ba.BAObservations(obs.cam, obs.point, obs.uv.astype(jnp.float32))
    layout = ba.make_layout(obs, state.cam_poses.shape[0], state.points.shape[0])
    C, P, Q, T = layout.C, layout.P, layout.Q, layout.T
    dtype = jnp.float32
    a0 = jnp.ones((2, C, Q), dtype=dtype)

    def rep10(f):
        def g(x):
            for _ in range(10):
                x = f(x)
            return x
        return jax.jit(g)

    def perm_cycle_bf16(a):
        ab = a.astype(jnp.bfloat16)
        flat = jnp.concatenate([ab.reshape(2, C * Q),
                                jnp.zeros((2, 1), dtype=jnp.bfloat16)], axis=1)
        ap = flat[:, layout.p2c_tp]
        flat2 = jnp.concatenate([ap.reshape(2, T * P),
                                 jnp.zeros((2, 1), dtype=jnp.bfloat16)], axis=1)
        return flat2[:, layout.c2p_tp].reshape(2, C, Q).astype(dtype)

    f = rep10(perm_cycle_bf16)
    t = bench(lambda: f(a0), lambda o: float(o[0, 0, 0]))
    print(f"10x bf16 perm cycle            : {t*1e3:9.1f} ms")

    # int8? (just to map the cost curve)
    def perm_cycle_i8(a):
        ab = (a * 0 + 1).astype(jnp.int8)
        flat = jnp.concatenate([ab.reshape(2, C * Q),
                                jnp.zeros((2, 1), dtype=jnp.int8)], axis=1)
        ap = flat[:, layout.p2c_tp]
        flat2 = jnp.concatenate([ap.reshape(2, T * P),
                                 jnp.zeros((2, 1), dtype=jnp.int8)], axis=1)
        return flat2[:, layout.c2p_tp].reshape(2, C, Q).astype(dtype) + a * 0
    f2 = rep10(perm_cycle_i8)
    t = bench(lambda: f2(a0), lambda o: float(o[0, 0, 0]))
    print(f"10x int8 perm cycle            : {t*1e3:9.1f} ms")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "5":
    main5()
