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


def _pack_to_device(leaves):
    """Transfer many host arrays to the device as ONE buffer per dtype.

    The axon TPU tunnel has multi-second per-transfer latency; shipping a
    plan's ~30 index arrays individually cost minutes (measured 270s on
    city10000). One packed transfer + eager device-side slices is ~100x
    faster end-to-end."""
    from collections import defaultdict
    out = [None] * len(leaves)
    groups = defaultdict(list)
    for i, a in enumerate(leaves):
        groups[np.dtype(a.dtype).str].append(i)
    for ds, idxs in groups.items():
        flats = [np.ravel(leaves[i]) for i in idxs]
        buf = jnp.asarray(np.concatenate(flats) if flats
                          else np.zeros(0, dtype=ds))
        off = 0
        for i, f in zip(idxs, flats):
            out[i] = buf[off:off + f.size].reshape(leaves[i].shape)
            off += f.size
    return out


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
        self.l2g = l2g  # packed to device at the end of __init__

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
                "front_sel": np.asarray(front_rows, dtype=np.int32),
                "front_id": np.asarray(fpart[front_rows], dtype=np.int32),
                "front_col": np.asarray(col[front_rows], dtype=np.int32),
                "sep_sel": np.asarray(sep_rows, dtype=np.int32),
                "sep_col": np.asarray(col[sep_rows], dtype=np.int32),
            })

        # ---- single-flat-scatter assembly plan ----
        # TPU scatters cost ~12ns/element with large per-CALL overhead
        # (PERFORMANCE.md "scatter economics"); assembling the whole graph
        # with ONE flat element scatter per destination array beats the
        # 4*S^2-call structure above by ~3x. Host precomputes, for the fixed
        # device-side iteration order (batches -> slot pairs -> k,i,j), the
        # flat target of every Hessian-block / rhs element.
        m = self.m
        Sfw = self.S_dim + 1  # separator frame width (row/col S = padding trash)
        fronts_idx, rhs_idx, ssys_idx, srhs_idx = [], [], [], []
        for (vids, parts_s, fpart), bmeta in zip(batch_meta, graph.batches):
            K, nslots = vids.shape
            dims = [manifolds.get(g).dim for g in bmeta.groups]
            front_rows = np.where(fpart >= 0)[0]
            sep_rows = np.where(fpart < 0)[0]
            col = np.zeros((K, nslots), dtype=np.int64)
            for krow in range(K):
                kp = fpart[krow]
                for s in range(nslots):
                    v = vids[krow, s]
                    if kp >= 0:
                        col[krow, s] = (int_off[v] if parts_s[krow, s] >= 0
                                        else self.D_max + lsep_off[kp][v])
                    else:
                        col[krow, s] = sep_off[v]
            for s in range(nslots):
                rows_f = col[front_rows, s, None] + np.arange(dims[s])[None, :]
                rhs_idx.append((fpart[front_rows, None] * m + rows_f).ravel())
                rows_s = col[sep_rows, s, None] + np.arange(dims[s])[None, :]
                srhs_idx.append(rows_s.ravel())
                for t in range(nslots):
                    cols_f = col[front_rows, t, None] + np.arange(dims[t])[None, :]
                    blk_f = (fpart[front_rows, None, None] * (m * m)
                             + rows_f[:, :, None] * m + cols_f[:, None, :])
                    fronts_idx.append(blk_f.ravel())
                    cols_s = col[sep_rows, t, None] + np.arange(dims[t])[None, :]
                    ssys_idx.append((rows_s[:, :, None] * Sfw
                                     + cols_s[:, None, :]).ravel())
        def cat(xs):
            out = np.concatenate(xs) if xs else np.zeros(0, np.int64)
            # flat indices address p*m*m / (S+1)^2 element spaces; int32
            # overflow would wrap silently and corrupt the assembled Hessian
            assert out.size == 0 or out.max() < 2**31, (
                "SchurPlan flat index exceeds int32 range "
                f"(max {out.max()}); problem too large for int32 scatter plan")
            return out.astype(np.int32)
        self.asm = {"fronts": cat(fronts_idx), "rhs": cat(rhs_idx),
                    "ssys": cat(ssys_idx), "srhs": cat(srhs_idx)}

        # ---- live-size-bucketed extend-add plan ----
        # Padded [p, sd_max^2] extend-add scatters 9.9M elements on city10000
        # where only ~1.8M are live; bucket parts by live local-separator size
        # (8 quantile buckets) and scatter only each bucket's [pb, sdb, sdb]
        # slab. Dead in-bucket entries carry zero values and target the padding
        # row/col S (harmless adds of 0).
        order = np.argsort(-sd)
        nbuckets = min(8, p) if p else 0
        self.ea_buckets = []
        if p:
            bounds = np.linspace(0, p, nbuckets + 1).astype(int)
            for bi in range(nbuckets):
                ids = order[bounds[bi]:bounds[bi + 1]]
                if ids.size == 0:
                    continue
                sdb = int(max(int(sd[ids].max()), 1))
                l2g_b = l2g[ids][:, :sdb]  # [pb, sdb], dead -> S_dim
                tgt = (l2g_b[:, :, None] * Sfw + l2g_b[:, None, :]).ravel()
                assert tgt.size == 0 or tgt.max() < 2**31, (
                    "extend-add flat index exceeds int32 range")
                self.ea_buckets.append({
                    "ids": np.asarray(ids, dtype=np.int32),
                    "sdb": sdb,
                    "tgt": np.asarray(tgt, dtype=np.int32),
                    "tgt_rhs": np.asarray(l2g_b.ravel(), dtype=np.int32),
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
                "part": src_part, "row": src_row,
                "in_sep": in_sep, "sep_pos": sep_pos,
                "dim": d,
            }

        # ---- one packed host->device transfer for every index array ----
        self._to_device()

    def _to_device(self):
        leaves, setters = [], []

        def reg(container, key):
            leaves.append(np.asarray(container[key]))
            setters.append((container, key))

        d = self.__dict__
        reg(d, "l2g")
        for bp in self.batch_plans:
            for k in ("front_sel", "front_id", "front_col", "sep_sel", "sep_col"):
                reg(bp, k)
        for k in ("fronts", "rhs", "ssys", "srhs"):
            reg(self.asm, k)
        for eb in self.ea_buckets:
            for k in ("ids", "tgt", "tgt_rhs"):
                reg(eb, k)
        for smap in self.sol_maps.values():
            for k in ("part", "row", "in_sep", "sep_pos"):
                reg(smap, k)
        packed = _pack_to_device(leaves)
        for (container, key), arr in zip(setters, packed):
            container[key] = arr

    def stats(self):
        return {"p": self.p, "D_max": self.D_max, "sd_max": self.sd_max,
                "S_dim": self.S_dim, "front_size": self.m}


def make_plan(graph, counts, max_part_size=256) -> SchurPlan:
    part = partition_graph(graph, counts, max_part_size)
    return SchurPlan(graph, counts, part)


def schur_values(lin, plan: SchurPlan):
    """Assembly VALUES (fcat, rcat, scat, srcat) for the plan's flat-scatter
    targets, in the fixed iteration order (batches -> slot pairs -> k-major).

    One flat element scatter per destination array is the TPU-economic
    assembly (per-call scatter overhead dominates many small scatters; see
    SchurPlan "single-flat-scatter assembly plan"). Shared by the local
    solver below and the sharded solver (parallel/dist_schur.py)."""
    dtype = lin.batches[0].r.dtype
    from gtsam_personal_tpu.linear import fm as _fm
    if isinstance(lin, _fm.FMGraph):
        return _fm.schur_values_fm(lin, plan)
    fvals, rvals, svals, srvals = [], [], [], []
    for b, bp in zip(lin.batches, plan.batch_plans):
        nslots = len(b.groups)
        fsel, ssel = bp["front_sel"], bp["sep_sel"]
        Jf = [b.Js[s][fsel] for s in range(nslots)]
        Js_ = [b.Js[s][ssel] for s in range(nslots)]
        rf, rs = b.r[fsel], b.r[ssel]
        for s in range(nslots):
            rvals.append(-_einsum_hp("kij,ki->kj", Jf[s], rf).ravel())
            srvals.append(-_einsum_hp("kij,ki->kj", Js_[s], rs).ravel())
            for t in range(nslots):
                fvals.append(_einsum_hp("kij,kil->kjl", Jf[s], Jf[t]).ravel())
                svals.append(_einsum_hp("kij,kil->kjl", Js_[s], Js_[t]).ravel())
    cat = lambda xs: (jnp.concatenate(xs) if xs
                      else jnp.zeros((0,), dtype=dtype))
    return cat(fvals), cat(rvals), cat(svals), cat(srvals)


def solve_partitioned(lin, plan: SchurPlan, lam=0.0):
    """Exact (damped) normal-equations solve via two-level Schur elimination.

    `lin` is a GaussianGraph ([K, r, d] blocks) or an fm.FMGraph
    (feature-major [r*d, K] blocks — the TPU hot path). Damping is lam * I
    added on every tangent coordinate (identity damping, matching LM's
    non-diagonal mode)."""
    dtype = lin.batches[0].r.dtype
    p, m, Dm, sdm, S = plan.p, plan.m, plan.D_max, plan.sd_max, plan.S_dim

    fcat, rcat, scat_, srcat = schur_values(lin, plan)
    Sfw = S + 1
    fronts = jnp.zeros((p * m * m,), dtype=dtype).at[plan.asm["fronts"]].add(
        fcat).reshape(p, m, m)
    rhs = jnp.zeros((p * m,), dtype=dtype).at[plan.asm["rhs"]].add(
        rcat).reshape(p, m)
    Ssys_flat = jnp.zeros((Sfw * Sfw,), dtype=dtype).at[plan.asm["ssys"]].add(
        scat_)
    srhs = jnp.zeros((Sfw,), dtype=dtype).at[plan.asm["srhs"]].add(srcat)

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
        # extend-add: live-size-bucketed flat scatters (dead entries are
        # exact zeros and land on the padding row/col S)
        for eb in plan.ea_buckets:
            sdb = eb["sdb"]
            Sb = Schur[eb["ids"]][:, :sdb, :sdb]
            Ssys_flat = Ssys_flat.at[eb["tgt"]].add(Sb.ravel())
            srhs = srhs.at[eb["tgt_rhs"]].add(rhs_s[eb["ids"]][:, :sdb].ravel())
    else:
        y = solve_A(chol, g_int[..., None])[..., 0]

    # ---- reduced separator solve ----
    if S > 0:
        Ssys = Ssys_flat.reshape(Sfw, Sfw)
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
