"""Isolate the extend-add scatter cost in solve_partitioned on city10000.

Usage: timeout 1800 python tools/profile_extendadd.py
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


def main():
    import jax
    import jax.numpy as jnp
    from gtsam_personal_tpu.slam import dataset
    from gtsam_personal_tpu.linear import schur, linearize as linz

    print("devices:", jax.devices())
    path = dataset.find_example_data("city10000.g2o")
    graph, initial = dataset.load_2d(path)
    plan = schur.make_plan(graph, initial.counts(), max_part_size=128)
    p, sdm, S = plan.p, plan.sd_max, plan.S_dim
    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    Schur = jax.random.normal(key, (p, sdm, sdm), dtype=dtype)
    rhs_s = jax.random.normal(key, (p, sdm), dtype=dtype)
    l2g = plan.l2g

    # 1) the 2-D block scatter as written today
    def scatter2d(Schur, rhs_s):
        Ssys = jnp.zeros((S + 1, S + 1), dtype=dtype)
        srhs = jnp.zeros((S + 1,), dtype=dtype)
        Ssys = Ssys.at[l2g[:, :, None], l2g[:, None, :]].add(Schur)
        srhs = srhs.at[l2g].add(rhs_s)
        return Ssys, srhs

    f1 = jax.jit(scatter2d)
    t = bench(lambda: f1(Schur, rhs_s), lambda o: float(o[0][0, 0]))
    print(f"2d block scatter [p,sd,sd]->[S,S] : {t*1e3:9.1f} ms")
    Ssys, srhs = f1(Schur, rhs_s)

    # 2) flat 1-D scatter of the same elements
    flat_idx = (np.asarray(l2g)[:, :, None] * (S + 1)
                + np.asarray(l2g)[:, None, :]).reshape(-1)
    flat_idx_j = jnp.asarray(flat_idx)

    def scatter1d(Schur):
        out = jnp.zeros(((S + 1) * (S + 1),), dtype=dtype)
        return out.at[flat_idx_j].add(Schur.reshape(-1))

    f2 = jax.jit(scatter1d)
    t = bench(lambda: f2(Schur), lambda o: float(o[0]))
    print(f"flat 1d scatter (same elements)   : {t*1e3:9.1f} ms")

    # 3) sorted segment-sum variant
    order = np.argsort(flat_idx, kind="stable")
    order_j = jnp.asarray(order)
    sorted_idx_j = jnp.asarray(flat_idx[order])

    def segsum(Schur):
        vals = Schur.reshape(-1)[order_j]
        return jax.ops.segment_sum(vals, sorted_idx_j,
                                   num_segments=(S + 1) * (S + 1),
                                   indices_are_sorted=True)

    f3 = jax.jit(segsum)
    t = bench(lambda: f3(Schur), lambda o: float(o[0]))
    print(f"sorted segment_sum                : {t*1e3:9.1f} ms")

    # 4) slice + eye + cho_factor on the real assembled matrix
    lam = jnp.float32(1e-4)

    def solve_only(Ssys, srhs):
        Sred = Ssys[:S, :S] + lam * jnp.eye(S, dtype=dtype)
        dsep = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(Sred, lower=True), srhs[:S])
        return dsep

    f4 = jax.jit(solve_only)
    t = bench(lambda: f4(Ssys, srhs), lambda o: float(o[0]))
    print(f"slice+eye+chol+solve              : {t*1e3:9.1f} ms")

    # 5) padded solve without slicing (damp pad row to identity)
    def solve_pad(Ssys, srhs):
        diag = jnp.concatenate([jnp.full((S,), lam, dtype=dtype),
                                jnp.ones((1,), dtype=dtype)])
        Spad = Ssys + jnp.diag(diag)
        dsep = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(Spad, lower=True), srhs)
        return dsep

    f5 = jax.jit(solve_pad)
    t = bench(lambda: f5(Ssys, srhs), lambda o: float(o[0]))
    print(f"padded chol+solve (no slice)      : {t*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
