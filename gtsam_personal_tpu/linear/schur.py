"""Two-level partitioned Schur elimination — the TPU-native sparse direct solve.

This replaces the reference's TBB task-parallel multifrontal elimination
(inference/ClusterTree-inst.h:286-301 over treeTraversal-inst.h:156) with a
two-level nested-dissection structure computed host-side
(inference/partition.py) and executed as batched dense linear algebra:

  1. assemble per-part dense frontal matrices F_k = [[A_k, B_k],[B_k^T, C_k]]
     over interior ⊕ local-separator columns with one scatter-add per factor
     batch (the analogue of HessianFactor gather/assemble,
     linear/HessianFactor.cpp:458);
  2. batched Cholesky of all interiors at once (choleskyPartial analogue,
     base/cholesky.h:62) on the MXU;
  3. extend-add the Schur complements C_k - B_k^T A_k^{-1} B_k into the global
     reduced separator system (the same algebra CameraSet::SchurComplement
     uses per smart factor, geometry/CameraSet.h:175 — lifted to whole blocks);
  4. dense solve of the reduced system, then batched back-substitution.

The identical structure shards across devices: each part's front lives on a
device, the reduced system is a psum (see parallel/).

All index plumbing is precomputed on the host per graph *structure* (static);
the jitted numeric path sees only fixed-shape gathers/scatters.
"""

from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax as _lax


def _einsum_hp(spec, *ops):
    """einsum pinned to full-f32 accumulation: TPU default matmul
    precision is bf16, which destroys normal-equations conditioning."""
    return jnp.einsum(spec, *ops, precision=_lax.Precision.HIGHEST)


from gtsam_personal_tpu.core import manifolds
from gtsam_personal_tpu.inference.partition import Partition, partition_graph
from gtsam_personal_tpu.linear.linearize import GaussianGraph


class SchurPlan:
    """Static elimination plan for one graph structure + partition."""

    def __init__(self, graph, counts: Dict[str, int], partition: Partition):
        vi = partition.vi
        part_of = partition.part_of
        p = partition.num_parts
        self.p = p
        self.counts = dict(counts)

        # ---- interior layout: per part, local dim offsets ----
        int_off = np.full(vi.num_vars, -1, dtype=np.int64)   # start col in its front
        D = np.zeros(p, dtype=np.int64)
        for k, part in enumerate(partition.parts):
            off = 0
            for v in part:
                int_off[v] = off
                off += vi.dims[v]
            D[k] = off
        self.D_max = int(D.max()) if p else 0
        self.D = D

        # ---- global separator layout ----
        sep = partition.separator
        sep_off = np.full(vi.num_vars, -1, dtype=np.int64)
        off = 0
        for v in sep:
            sep_off[v] = off
            off += vi.dims[v]
        self.S_dim = int(off)
        self.sep = sep

        # ---- per-factor classification & local separator sets ----
        # first pass: find each part's local separator variable set
        local_sep_sets: List[Dict[int, int]] = [dict() for _ in range(p)]
        batch_meta = []
        for b in graph.batches:
            idx = np.asarray(b.idx)
            vids = np.stack([np.asarray(vi.vid(g, idx[:, s]))
                             for s, g in enumerate(b.groups)], axis=1)  # [K, S]
            parts_s = part_of[vids]  # [K, S]; -1 = separator
            # native classification; raises if a factor spans two interiors
            from gtsam_personal_tpu import native
            fpart = native.classify_factors(vids, part_of)
            batch_meta.append((vids, parts_s, fpart))
            for krow in range(vids.shape[0]):
                kp = fpart[krow]
                if kp < 0:
                    continue
                for s in range(vids.shape[1]):
                    if parts_s[krow, s] < 0:
                        local_sep_sets[kp].setdefault(int(vids[krow, s]))

        # local separator layout per part
        lsep_off = [dict() for _ in range(p)]  # vid -> local col offset (after D_max)
        sd = np.zeros(p, dtype=np.int64)
        for k in range(p):
            off = 0
            for v in sorted(local_sep_sets[k]):
                lsep_off[k][v] = off
                off += vi.dims[v]
            sd[k] = off
        self.sd_max = int(sd.max()) if p else 0
        self.m = self.D_max + self.sd_max

        # local->global separator flat map [p, sd_max], padding -> S_dim
        l2g = np.full((p, self.sd_max), self.S_dim, dtype=np.int64)
        for k in range(p):
            for v, lo in lsep_off[k].items():
                d = vi.dims[v]
                l2g[k, lo:lo + d] = sep_off[v] + np.arange(d)
        self.l2g = jnp.asarray(l2g)

        # ---- per-batch device index arrays ----
        # For each batch: front subset (sel indices, front id, per-slot col start)
        # and separator subset (sel indices, per-slot global flat col start).
        self.batch_plans = []
        for b, (vids, parts_s, fpart) in zip(graph.batches, batch_meta):
            K, S = vids.shape
            front_rows = np.where(fpart >= 0)[0]
            sep_rows = np.where(fpart < 0)[0]
            col = np.zeros((K, S), dtype=np.int64)
            for krow in range(K):
                kp = fpart[krow]
                for s in range(S):
                    v = vids[krow, s]
                    if kp >= 0:
                        if parts_s[krow, s] >= 0:
                            col[krow, s] = int_off[v]
                        else:
                            col[krow, s] = self.D_max + lsep_off[kp][v]
                    else:
                        col[krow, s] = sep_off[v]
            self.batch_plans.append({
                "front_sel": jnp.asarray(front_rows, dtype=jnp.int32),
                "front_id": jnp.asarray(fpart[front_rows], dtype=jnp.int32),
                "front_col": jnp.asarray(col[front_rows], dtype=jnp.int32),
                "sep_sel": jnp.asarray(sep_rows, dtype=jnp.int32),
                "sep_col": jnp.asarray(col[sep_rows], dtype=jnp.int32),
            })

        # ---- solution scatter maps: tangent dict <- (front rows | sep rows) ----
        # For each group g, for each variable: either (part, row) or sep flat pos.
        self.sol_maps = {}
        for g in sorted(counts):
            n = counts[g]
            d = manifolds.get(g).dim
            src_part = np.zeros(n, dtype=np.int64)
            src_row = np.zeros(n, dtype=np.int64)
            in_sep = np.zeros(n, dtype=bool)
            sep_pos = np.zeros(n, dtype=np.int64)
            vids_g = vi.vid(g, np.arange(n))
            for i, v in enumerate(vids_g):
                if part_of[v] >= 0:
                    src_part[i] = part_of[v]
                    src_row[i] = int_off[v]
                else:
                    in_sep[i] = True
                    sep_pos[i] = sep_off[v]
            self.sol_maps[g] = {
                "part": jnp.asarray(src_part), "row": jnp.asarray(src_row),
                "in_sep": jnp.asarray(in_sep), "sep_pos": jnp.asarray(sep_pos),
                "dim": d,
            }

    def stats(self):
        return {"p": self.p, "D_max": self.D_max, "sd_max": self.sd_max,
                "S_dim": self.S_dim, "front_size": self.m}


def make_plan(graph, counts, max_part_size=256) -> SchurPlan:
    part = partition_graph(graph, counts, max_part_size)
    return SchurPlan(graph, counts, part)


def solve_partitioned(lin: GaussianGraph, plan: SchurPlan, lam=0.0):
    """Exact (damped) normal-equations solve via two-level Schur elimination.

    Damping is lam * I added on every tangent coordinate (identity damping,
    matching LM's non-diagonal mode)."""
    dtype = lin.batches[0].r.dtype
    p, m, Dm, sdm, S = plan.p, plan.m, plan.D_max, plan.sd_max, plan.S_dim

    fronts = jnp.zeros((p, m, m), dtype=dtype)
    rhs = jnp.zeros((p, m), dtype=dtype)
    Ssys = jnp.zeros((S + 1, S + 1), dtype=dtype)
    srhs = jnp.zeros((S + 1,), dtype=dtype)

    for b, bp in zip(lin.batches, plan.batch_plans):
        nslots = len(b.groups)
        dims = [J.shape[-1] for J in b.Js]
        # front subset
        if bp["front_sel"].shape[0]:
            sel = bp["front_sel"]
            fid = bp["front_id"]
            Jsel = [b.Js[s][sel] for s in range(nslots)]
            rsel = b.r[sel]
            for s in range(nslots):
                rows = bp["front_col"][:, s, None] + jnp.arange(dims[s])[None, :]
                rhs = rhs.at[fid[:, None], rows].add(
                    -_einsum_hp("kij,ki->kj", Jsel[s], rsel))
                for t in range(nslots):
                    cols = bp["front_col"][:, t, None] + jnp.arange(dims[t])[None, :]
                    blk = _einsum_hp("kij,kil->kjl", Jsel[s], Jsel[t])
                    fronts = fronts.at[fid[:, None, None],
                                       rows[:, :, None], cols[:, None, :]].add(blk)
        # separator-only subset
        if bp["sep_sel"].shape[0]:
            sel = bp["sep_sel"]
            Jsel = [b.Js[s][sel] for s in range(nslots)]
            rsel = b.r[sel]
            for s in range(nslots):
                rows = bp["sep_col"][:, s, None] + jnp.arange(dims[s])[None, :]
                srhs = srhs.at[rows].add(-_einsum_hp("kij,ki->kj", Jsel[s], rsel))
                for t in range(nslots):
                    cols = bp["sep_col"][:, t, None] + jnp.arange(dims[t])[None, :]
                    blk = _einsum_hp("kij,kil->kjl", Jsel[s], Jsel[t])
                    Ssys = Ssys.at[rows[:, :, None], cols[:, None, :]].add(blk)

    # ---- batched interior elimination ----
    A = fronts[:, :Dm, :Dm]
    # pad unused interior rows with identity; add damping on interior diag
    row_ids = jnp.arange(Dm)
    pad_mask = row_ids[None, :] >= jnp.asarray(plan.D)[:, None]
    diag_add = jnp.where(pad_mask, 1.0, lam)
    A = A + jax.vmap(jnp.diag)(diag_add.astype(dtype))
    B = fronts[:, :Dm, Dm:]
    C = fronts[:, Dm:, Dm:]
    g_int = rhs[:, :Dm]
    g_sep = rhs[:, Dm:]

    chol = jax.vmap(jnp.linalg.cholesky)(A)
    solve_A = jax.vmap(lambda L, X: jax.scipy.linalg.cho_solve((L, True), X))
    if sdm > 0:
        W = solve_A(chol, B)                       # A^{-1} B  [p, Dm, sdm]
        y = solve_A(chol, g_int[..., None])[..., 0]  # A^{-1} g
        Schur = C - _einsum_hp("pij,pik->pjk", B, W)
        rhs_s = g_sep - _einsum_hp("pij,pi->pj", B, y)
        # extend-add into global separator system
        l2g = plan.l2g
        Ssys = Ssys.at[l2g[:, :, None], l2g[:, None, :]].add(Schur)
        srhs = srhs.at[l2g].add(rhs_s)
    else:
        y = solve_A(chol, g_int[..., None])[..., 0]

    # ---- reduced separator solve ----
    if S > 0:
        Sred = Ssys[:S, :S] + lam * jnp.eye(S, dtype=dtype)
        dsep = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(Sred, lower=True), srhs[:S])
        dsep_pad = jnp.concatenate([dsep, jnp.zeros((1,), dtype=dtype)])
    else:
        dsep_pad = jnp.zeros((1,), dtype=dtype)

    # ---- back-substitution ----
    if sdm > 0 and S > 0:
        d_ls = dsep_pad[plan.l2g]                   # [p, sdm]
        d_int = y - _einsum_hp("pij,pj->pi", W, d_ls)
    else:
        d_int = y

    # ---- scatter into tangent dict ----
    delta = {}
    for g, smap in plan.sol_maps.items():
        d = smap["dim"]
        offs = jnp.arange(d)
        from_front = d_int[smap["part"][:, None], smap["row"][:, None] + offs[None, :]]
        from_sep = dsep_pad[jnp.minimum(smap["sep_pos"][:, None] + offs[None, :],
                                        S)]
        delta[g] = jnp.where(smap["in_sep"][:, None], from_sep, from_front)
    return delta
