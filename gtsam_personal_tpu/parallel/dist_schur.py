"""Distributed partitioned-Schur solve with EXPLICIT collectives.

This is the sparse-direct analogue of the distributed-BA recipe (the north
star of SURVEY.md §2.11 P5/P6): the nested-dissection partitions are divided
across the device mesh, each device assembles and Cholesky-factorizes ONLY
its own dense fronts (device-local interior elimination — the analogue of
the reference's per-thread frontal factorization in
inference/ClusterTree-inst.h:286), and the reduced separator system is
assembled with an explicit `lax.psum` over the mesh axis: every device
scatters its partitions' Schur complements into a local [S+1, S+1] buffer
and the all-reduce produces the replicated reduced system. The dense
separator solve is replicated (it is tiny relative to the fronts), the
back-substitution is again device-local, and the tangent solution is
re-assembled with a final masked psum.

Unlike `parallel/mesh.py` (GSPMD auto-propagation from shardings), everything
here is `shard_map` + explicit `psum` — the collective schedule is in the
program text, which is what makes the compute/collective split measurable
(`collective_overhead`, used by the driver dryrun as the scaling-efficiency
proxy).

All per-device index plans are built host-side in `DistSchurPlan` and stacked
on a leading mesh axis; padding rows gather a trailing zero value and scatter
into dead slots, so every device runs the identical static program.
"""

from functools import partial
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gtsam_personal_tpu.linear import schur as _schur
from gtsam_personal_tpu.linear.schur import SchurPlan, _einsum_hp


class DistSchurPlan:
    """Per-device split of a SchurPlan for an n-device mesh axis.

    Partitions are dealt to devices in contiguous blocks of `pp = ceil(p/n)`;
    separator-separator factor contributions are chunked evenly. Every stacked
    array has leading dim n and identical per-device shape (pad entries
    gather value 0 / scatter to a dead slot)."""

    def __init__(self, plan: SchurPlan, n: int):
        self.plan = plan
        self.n = n
        p, m, S = plan.p, plan.m, plan.S_dim
        Sfw = S + 1
        pp = max(-(-p // n), 1)
        self.pp = pp

        fr = np.asarray(plan.asm["fronts"], dtype=np.int64)
        rh = np.asarray(plan.asm["rhs"], dtype=np.int64)
        ss = np.asarray(plan.asm["ssys"], dtype=np.int64)
        sr = np.asarray(plan.asm["srhs"], dtype=np.int64)

        def split_owned(tgt, block):
            """Deal entries to the device owning tgt//block//pp."""
            owner = (tgt // block) // pp
            idxs = [np.where(owner == d)[0] for d in range(n)]
            L = max([len(ix) for ix in idxs] + [1])
            g = np.full((n, L), tgt.size, dtype=np.int64)   # pad: gathers 0
            s = np.full((n, L), pp * block, dtype=np.int64)  # pad: dead slot
            for d, ix in enumerate(idxs):
                g[d, : len(ix)] = ix
                s[d, : len(ix)] = tgt[ix] - d * pp * block
            return g.astype(np.int32), s.astype(np.int32)

        def split_even(tgt, dead):
            """Chunk entries evenly across devices (sep-sep contributions)."""
            L = max(-(-tgt.size // n), 1)
            g = np.full((n, L), tgt.size, dtype=np.int64)
            s = np.full((n, L), dead, dtype=np.int64)
            for d in range(n):
                seg = tgt[d * L:(d + 1) * L]
                g[d, : seg.size] = np.arange(d * L, d * L + seg.size)
                s[d, : seg.size] = seg
            return g.astype(np.int32), s.astype(np.int32)

        self.fg, self.fs = split_owned(fr, m * m)
        self.rg, self.rs = split_owned(rh, m)
        # Ssys row/col S and srhs slot S are padding trash by construction
        self.sg, self.ss = split_even(ss, S * Sfw + S)
        self.srg, self.srs = split_even(sr, S)

        # per-device interior dims + local->global separator maps
        D = np.zeros((n, pp), dtype=np.int64)
        sdm = plan.sd_max
        l2g = np.full((n, pp, max(sdm, 1)), S, dtype=np.int64)
        l2g_host = np.asarray(plan.l2g, dtype=np.int64)
        for d in range(n):
            ids = np.arange(d * pp, min((d + 1) * pp, p))
            D[d, : ids.size] = plan.D[ids]
            if sdm > 0 and ids.size:
                l2g[d, : ids.size] = l2g_host[ids]
        self.D = D
        self.l2g = l2g.astype(np.int32)
        # extend-add scatter targets: [n, pp*sdm*sdm] into the [Sfw*Sfw] local
        # separator buffer (dead entries land on the trash cell; their values
        # are exact zeros anyway)
        if sdm > 0:
            ea = (l2g[:, :, :, None] * Sfw + l2g[:, :, None, :]).reshape(n, -1)
            self.ea = ea.astype(np.int32)
            self.ea_rhs = l2g.reshape(n, -1).astype(np.int32)
        else:
            self.ea = np.zeros((n, 1), dtype=np.int32)
            self.ea_rhs = np.zeros((n, 1), dtype=np.int32)

        # solution maps: per group, which variables each device owns
        # (every array stacked to leading n so one P(axis) spec covers all)
        self.sol = {}
        self.sol_dims = {}
        for g, smap in plan.sol_maps.items():
            part = np.asarray(smap["part"], dtype=np.int64)
            in_sep = np.asarray(smap["in_sep"])
            owner = part // pp
            owned = np.stack([(owner == d) & ~in_sep for d in range(n)])
            lpart = np.stack([np.clip(part - d * pp, 0, pp - 1)
                              for d in range(n)])
            tile = lambda x: np.broadcast_to(x, (n,) + x.shape).copy()
            self.sol[g] = {
                "owned": owned,
                "lpart": lpart.astype(np.int32),
                "row": tile(np.asarray(smap["row"], dtype=np.int32)),
                "in_sep": tile(in_sep),
                "sep_pos": tile(np.asarray(smap["sep_pos"], dtype=np.int32)),
            }
            self.sol_dims[g] = smap["dim"]


def _device_body(dplan: DistSchurPlan, axis: str, skip_collectives: bool,
                 fcat, rcat, scat_, srcat, lam,
                 fg, fs, rg, rs, sg, ss, srg, srs, ea, ea_rhs, D, l2g, sol):
    """Per-device program (runs inside shard_map; stacked args are the local
    [1, ...] blocks)."""
    plan = dplan.plan
    pp, m, Dm, sdm, S = dplan.pp, plan.m, plan.D_max, plan.sd_max, plan.S_dim
    Sfw = S + 1
    dtype = fcat.dtype
    sq = lambda x: x.reshape(x.shape[1:])
    fg, fs, rg, rs = sq(fg), sq(fs), sq(rg), sq(rs)
    sg, ss, srg, srs = sq(sg), sq(ss), sq(srg), sq(srs)
    ea, ea_rhs, D, l2g = sq(ea), sq(ea_rhs), sq(D), sq(l2g)
    sol = jax.tree.map(sq, sol)
    psum = ((lambda x: x) if skip_collectives
            else (lambda x: lax.psum(x, axis)))

    pad1 = lambda v: jnp.concatenate([v, jnp.zeros((1,), dtype=dtype)])
    # ---- device-local front assembly (one flat scatter each) ----
    fronts = jnp.zeros((pp * m * m + 1,), dtype=dtype).at[fs].add(
        pad1(fcat)[fg])[:-1].reshape(pp, m, m)
    rhs = jnp.zeros((pp * m + 1,), dtype=dtype).at[rs].add(
        pad1(rcat)[rg])[:-1].reshape(pp, m)
    Ssys_flat = jnp.zeros((Sfw * Sfw,), dtype=dtype).at[ss].add(pad1(scat_)[sg])
    srhs = jnp.zeros((Sfw,), dtype=dtype).at[srs].add(pad1(srcat)[srg])

    # ---- device-local batched interior elimination ----
    A = fronts[:, :Dm, :Dm]
    row_ids = jnp.arange(Dm)
    pad_mask = row_ids[None, :] >= D[:, None]
    A = A + jax.vmap(jnp.diag)(jnp.where(pad_mask, 1.0, lam).astype(dtype))
    B = fronts[:, :Dm, Dm:]
    C = fronts[:, Dm:, Dm:]
    g_int = rhs[:, :Dm]
    g_sep = rhs[:, Dm:]
    chol = jax.vmap(jnp.linalg.cholesky)(A)
    solve_A = jax.vmap(lambda L, X: jax.scipy.linalg.cho_solve((L, True), X))
    y = solve_A(chol, g_int[..., None])[..., 0]
    if sdm > 0:
        W = solve_A(chol, B)
        Schur = C - _einsum_hp("pij,pik->pjk", B, W)
        rhs_s = g_sep - _einsum_hp("pij,pi->pj", B, y)
        Ssys_flat = Ssys_flat.at[ea].add(Schur.reshape(-1))
        srhs = srhs.at[ea_rhs].add(rhs_s.reshape(-1))

    # ---- reduced separator system: EXPLICIT all-reduce over the mesh ----
    Ssys_flat = psum(Ssys_flat)
    srhs = psum(srhs)

    if S > 0:
        Sred = (Ssys_flat.reshape(Sfw, Sfw)[:S, :S]
                + lam * jnp.eye(S, dtype=dtype))
        dsep = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(Sred, lower=True), srhs[:S])
        dsep_pad = jnp.concatenate([dsep, jnp.zeros((1,), dtype=dtype)])
    else:
        dsep_pad = jnp.zeros((1,), dtype=dtype)

    # ---- device-local back-substitution ----
    if sdm > 0 and S > 0:
        d_int = y - _einsum_hp("pij,pj->pi", W, dsep_pad[l2g])
    else:
        d_int = y

    # ---- tangent assembly: masked contributions, one final psum ----
    am_first = lax.axis_index(axis) == 0 if not skip_collectives else True
    delta = {}
    for gname, smap in sol.items():
        d = dplan.sol_dims[gname]
        offs = jnp.arange(d)
        from_front = d_int[smap["lpart"][:, None], smap["row"][:, None] + offs]
        from_sep = dsep_pad[jnp.minimum(smap["sep_pos"][:, None] + offs, S)]
        mine = jnp.where(smap["owned"][:, None], from_front, 0.0)
        sep_part = jnp.where(smap["in_sep"][:, None], from_sep, 0.0)
        contrib = mine + jnp.where(am_first, sep_part, 0.0)
        delta[gname] = psum(contrib)
    return delta


def solve_partitioned_sharded(lin, dplan: DistSchurPlan, mesh: Mesh,
                              lam=0.0, axis: str = "dp",
                              skip_collectives: bool = False):
    """Exact damped normal-equations solve, fronts sharded over `mesh`.

    Matches `schur.solve_partitioned` bit-for-bit up to summation order.
    `skip_collectives=True` replaces every psum with identity (WRONG result)
    — used only to measure collective overhead (see `collective_overhead`)."""
    plan = dplan.plan
    fcat, rcat, scat_, srcat = _schur.schur_values(lin, plan)
    lam = jnp.asarray(lam, dtype=fcat.dtype)

    stacked = (dplan.fg, dplan.fs, dplan.rg, dplan.rs, dplan.sg, dplan.ss,
               dplan.srg, dplan.srs, dplan.ea, dplan.ea_rhs, dplan.D,
               dplan.l2g, dplan.sol)
    body = partial(_device_body, dplan, axis, skip_collectives)
    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()) + (P(axis),) * len(stacked),
        out_specs=P(),
        check_vma=False)
    return mapped(fcat, rcat, scat_, srcat, lam, *stacked)


def collective_overhead(lin, dplan: DistSchurPlan, mesh: Mesh, lam=1e-4,
                        iters: int = 5):
    """Measure the compute/collective split of the sharded solve: time the
    real solve vs the psum-free variant (same FLOPs, no communication).
    Returns (t_full, t_local, overhead_fraction) — the scaling-efficiency
    proxy the driver dryrun reports."""
    import time

    def run(skip):
        f = jax.jit(lambda: solve_partitioned_sharded(
            lin, dplan, mesh, lam, skip_collectives=skip))
        out = f()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    t_full = run(False)
    t_local = run(True)
    frac = max(0.0, 1.0 - t_local / t_full) if t_full > 0 else 0.0
    return t_full, t_local, frac
