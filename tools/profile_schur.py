"""Split solve_partitioned cost on city10000 into assembly / interior-elim /
separator-solve / backsub, plus a standalone dense Cholesky at S_dim.

Usage: timeout 2400 python tools/profile_schur.py
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
    print("plan:", plan.stats())
    lin = jax.jit(linz.linearize)(graph, initial)
    lam = jnp.float32(1e-4)
    dtype = lin.batches[0].r.dtype
    p, m, Dm, sdm, S = plan.p, plan.m, plan.D_max, plan.sd_max, plan.S_dim

    # --- stage 1: assembly only ---
    def assemble(lin_):
        fronts = jnp.zeros((p, m, m), dtype=dtype)
        rhs = jnp.zeros((p, m), dtype=dtype)
        Ssys = jnp.zeros((S + 1, S + 1), dtype=dtype)
        srhs = jnp.zeros((S + 1,), dtype=dtype)
        es = lambda spec, *ops: jnp.einsum(spec, *ops,
                                           precision=jax.lax.Precision.HIGHEST)
        for b, bp in zip(lin_.batches, plan.batch_plans):
            nslots = len(b.groups)
            dims = [J.shape[-1] for J in b.Js]
            if bp["front_sel"].shape[0]:
                sel = bp["front_sel"]; fid = bp["front_id"]
                Jsel = [b.Js[s][sel] for s in range(nslots)]
                rsel = b.r[sel]
                for s in range(nslots):
                    rows = bp["front_col"][:, s, None] + jnp.arange(dims[s])[None, :]
                    rhs = rhs.at[fid[:, None], rows].add(
                        -es("kij,ki->kj", Jsel[s], rsel))
                    for t in range(nslots):
                        cols = bp["front_col"][:, t, None] + jnp.arange(dims[t])[None, :]
                        blk = es("kij,kil->kjl", Jsel[s], Jsel[t])
                        fronts = fronts.at[fid[:, None, None],
                                           rows[:, :, None], cols[:, None, :]].add(blk)
            if bp["sep_sel"].shape[0]:
                sel = bp["sep_sel"]
                Jsel = [b.Js[s][sel] for s in range(nslots)]
                rsel = b.r[sel]
                for s in range(nslots):
                    rows = bp["sep_col"][:, s, None] + jnp.arange(dims[s])[None, :]
                    srhs = srhs.at[rows].add(-es("kij,ki->kj", Jsel[s], rsel))
                    for t in range(nslots):
                        cols = bp["sep_col"][:, t, None] + jnp.arange(dims[t])[None, :]
                        blk = es("kij,kil->kjl", Jsel[s], Jsel[t])
                        Ssys = Ssys.at[rows[:, :, None], cols[:, None, :]].add(blk)
        return fronts, rhs, Ssys, srhs

    asm = jax.jit(assemble)
    t_asm = bench(lambda: asm(lin), lambda o: float(o[0][0, 0, 0]))
    print(f"assembly (fronts+Ssys scatter) : {t_asm*1e3:9.1f} ms")

    fronts, rhs, Ssys, srhs = asm(lin)

    # --- stage 2: interior elimination (batched chol + W + Schur blocks) ---
    es = lambda spec, *ops: jnp.einsum(spec, *ops,
                                       precision=jax.lax.Precision.HIGHEST)

    def interior(fronts, rhs, lam):
        A = fronts[:, :Dm, :Dm]
        row_ids = jnp.arange(Dm)
        pad_mask = row_ids[None, :] >= jnp.asarray(plan.D)[:, None]
        diag_add = jnp.where(pad_mask, 1.0, lam)
        A = A + jax.vmap(jnp.diag)(diag_add.astype(dtype))
        B = fronts[:, :Dm, Dm:]
        C = fronts[:, Dm:, Dm:]
        chol = jax.vmap(jnp.linalg.cholesky)(A)
        solve_A = jax.vmap(lambda L, X: jax.scipy.linalg.cho_solve((L, True), X))
        W = solve_A(chol, B)
        y = solve_A(chol, rhs[:, :Dm, None])[..., 0]
        Schur = C - es("pij,pik->pjk", B, W)
        rhs_s = rhs[:, Dm:] - es("pij,pi->pj", B, y)
        return W, y, Schur, rhs_s

    intr = jax.jit(interior)
    t_int = bench(lambda: intr(fronts, rhs, lam), lambda o: float(o[0][0, 0, 0]))
    print(f"interior chol+W+Schur          : {t_int*1e3:9.1f} ms")

    W, y, Schur, rhs_s = intr(fronts, rhs, lam)

    # --- stage 3: extend-add + dense separator solve ---
    def sep_solve(Ssys, srhs, Schur, rhs_s, lam):
        l2g = plan.l2g
        Ssys = Ssys.at[l2g[:, :, None], l2g[:, None, :]].add(Schur)
        srhs = srhs.at[l2g].add(rhs_s)
        Sred = Ssys[:S, :S] + lam * jnp.eye(S, dtype=dtype)
        dsep = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(Sred, lower=True), srhs[:S])
        return dsep

    sep = jax.jit(sep_solve)
    t_sep = bench(lambda: sep(Ssys, srhs, Schur, rhs_s, lam),
                  lambda o: float(o[0]))
    print(f"extend-add + dense sep solve   : {t_sep*1e3:9.1f} ms")

    # standalone: how much is the pure dense cholesky?
    key = jax.random.PRNGKey(0)
    Arand = jax.random.normal(key, (S, 64), dtype=dtype)
    M = Arand @ Arand.T + S * jnp.eye(S, dtype=dtype)

    def chol_only(M):
        return jax.scipy.linalg.cho_factor(M, lower=True)[0]

    co = jax.jit(chol_only)
    t_chol = bench(lambda: co(M), lambda o: float(o[0, 0]))
    print(f"dense cholesky {S}x{S}      : {t_chol*1e3:9.1f} ms")

    def tri_solve(M, b):
        L = jax.scipy.linalg.cho_factor(M, lower=True)
        return jax.scipy.linalg.cho_solve(L, b)

    ts = jax.jit(tri_solve)
    t_ts = bench(lambda: ts(M, srhs[:S]), lambda o: float(o[0]))
    print(f"chol+2 trisolves {S}        : {t_ts*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
