"""Multi-level (recursive) partitioned Schur elimination.

The two-level solver (linear/schur.py) eliminates all interior parts in one
batched pass but solves the WHOLE separator as one dense system — on
city10000 that is a ~5k-dim Cholesky dominating the solve. This module
recurses: the separator is itself bisected into interior parts + a smaller
separator, level after level, until the top ("root") system is small. That is
the TPU-native counterpart of the reference's recursive junction tree
(inference/ClusterTree-inst.h:286, JunctionTree.h:49): each level is one
batched front elimination on the MXU; the tree depth is the only sequential
axis.

Two structural facts make the index plumbing tractable:
  * with a VERTEX separator, no factor (or clique) can span two interiors —
    a hyperedge whose vars are pairwise adjacent would need an interior-to-
    interior edge;
  * a part's local-separator variable set is one clique/hyperedge, so at the
    next level it is assigned to exactly ONE part (or the root): every entry
    of a part's Schur-complement slab routes to the same destination front.

All routing is precomputed host-side per graph structure; the device program
is: per-level (assemble + batched Cholesky + slab scatter), a small dense
root solve, then a downward gather/backsubstitution sweep.
"""

from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax as _lax


def _einsum_hp(spec, *ops):
    return jnp.einsum(spec, *ops, precision=_lax.Precision.HIGHEST)


from gtsam_personal_tpu.core import manifolds
from gtsam_personal_tpu.inference.partition import (VarIndex, bisect,
                                                    build_adjacency)
from gtsam_personal_tpu.linear.schur import _pack_to_device


def _partition_nodes(A, nodes, max_part_size):
    """Recursive bisection of `nodes` (host): parts + one separator set."""
    parts, seps = [], []
    stack = [np.asarray(nodes, dtype=np.int64)]
    while stack:
        nd = stack.pop()
        if nd.size == 0:
            continue
        if nd.size <= max_part_size:
            parts.append(np.sort(nd))
            continue
        a, b, s = bisect(A, nd)
        if s.size == 0 and (a.size == 0 or b.size == 0):
            parts.append(np.sort(nd))
            continue
        seps.append(s)
        stack.append(a)
        stack.append(b)
    sep = (np.sort(np.concatenate(seps)) if seps
           else np.array([], dtype=np.int64))
    return parts, sep


class MLPlan:
    """Static L-level elimination plan for one graph structure.

    Host-side construction; all device index arrays upload in ONE packed
    transfer (schur._pack_to_device)."""

    def __init__(self, graph, counts: Dict[str, int], max_part_size=128,
                 root_max_dim=768, max_levels=4):
        vi, A = build_adjacency(graph, counts)
        self.vi = vi
        nvars = vi.num_vars
        dims = vi.dims

        # ---- per-batch var ids ----
        batch_vids = []
        for b in graph.batches:
            idx = np.asarray(b.idx)
            batch_vids.append(np.stack(
                [np.asarray(vi.vid(g, idx[:, s]))
                 for s, g in enumerate(b.groups)], axis=1))  # [K, S]

        # ---- build the level hierarchy (host) ----
        # hyperedges at level 0 = the factors; at level l+1 = per-part local
        # separator cliques + hyperedges living entirely in the separator
        self.levels: List[dict] = []
        cur_nodes = np.arange(nvars)
        # hyperedges as (list of var arrays, origin tag); origins:
        #   ("factor", batch_i, row) for factors — tracked implicitly via
        #   classification arrays instead of materialized tuples.
        level_of = np.full(nvars, -1, dtype=np.int64)   # interior level
        part_of_lvl = np.full(nvars, -1, dtype=np.int64)
        int_off = np.full(nvars, -1, dtype=np.int64)    # col inside its front
        # factor assignment: (level, part) with -1 meaning "not yet placed"
        fac_level = [np.full(v.shape[0], -1, dtype=np.int64)
                     for v in batch_vids]
        fac_part = [np.full(v.shape[0], -1, dtype=np.int64)
                    for v in batch_vids]
        # slab hyperedges carried between levels: list of (level, part) ids +
        # their var sets; assignment of slab (l, k) -> (next level, part)
        pending_slabs: List[dict] = []   # vars, src=(level, part)

        lvl = 0
        from gtsam_personal_tpu import native
        import scipy.sparse as sp
        while True:
            # the bisection adjacency must include slab-clique couplings:
            # without them a slab could span two interiors and the vertex-
            # separator guarantee breaks
            if pending_slabs:
                rr, cc = [], []
                for slab in pending_slabs:
                    if slab.get("dst") is not None:
                        continue
                    sv = slab["vars"]
                    if sv.size < 2:
                        continue
                    gi, gj = np.meshgrid(sv, sv)
                    rr.append(gi.ravel())
                    cc.append(gj.ravel())
                if rr:
                    r = np.concatenate(rr)
                    c = np.concatenate(cc)
                    Aextra = sp.coo_matrix(
                        (np.ones(len(r), dtype=np.int8), (r, c)),
                        shape=A.shape).tocsr()
                    Acur = ((A + Aextra) > 0).astype(np.int8).tocsr()
                else:
                    Acur = A
            else:
                Acur = A
            parts, sep = _partition_nodes(Acur, cur_nodes, max_part_size)
            sep_dim = int(dims[sep].sum()) if sep.size else 0
            is_last = (sep_dim <= root_max_dim or lvl + 1 >= max_levels
                       or sep.size == 0)
            if is_last:
                # everything left is the root: parts become... no — fold all
                # current nodes into the root dense system
                break
            part_of = np.full(nvars, -2, dtype=np.int64)
            for k, p in enumerate(parts):
                part_of[p] = k
            part_of[sep] = -1

            # classify factors not yet placed
            lsep_sets = [dict() for _ in parts]
            for bi, vids in enumerate(batch_vids):
                unplaced = fac_level[bi] < 0
                if not unplaced.any():
                    continue
                rows = np.where(unplaced)[0]
                fp = native.classify_factors(vids[rows], part_of)
                placed = fp >= 0
                fac_level[bi][rows[placed]] = lvl
                fac_part[bi][rows[placed]] = fp[placed]
                for rr, kp in zip(rows[placed], fp[placed]):
                    for v in vids[rr]:
                        if part_of[v] == -1:
                            lsep_sets[kp].setdefault(int(v))
            # classify pending slabs from the previous level
            for slab in pending_slabs:
                if slab.get("dst") is not None:
                    continue
                sv = slab["vars"]
                pp = part_of[sv]
                ik = pp[pp >= 0]
                if ik.size:
                    k = int(ik[0])
                    assert (pp[pp >= 0] == k).all(), "slab spans interiors"
                    slab["dst"] = (lvl, k)
                    for v in sv:
                        if part_of[v] == -1:
                            lsep_sets[k].setdefault(int(v))
                # else: stays pending for the next level

            # interior layouts
            D = np.zeros(len(parts), dtype=np.int64)
            for k, p in enumerate(parts):
                off = 0
                for v in p:
                    level_of[v] = lvl
                    part_of_lvl[v] = k
                    int_off[v] = off
                    off += dims[v]
                D[k] = off
            # local separator layouts
            lsep_off = [dict() for _ in parts]
            sd = np.zeros(len(parts), dtype=np.int64)
            for k in range(len(parts)):
                off = 0
                for v in sorted(lsep_sets[k]):
                    lsep_off[k][v] = off
                    off += dims[v]
                sd[k] = off
            self.levels.append({
                "parts": parts, "D": D, "sd": sd,
                "Dmax": int(D.max()) if len(parts) else 0,
                "sdmax": int(sd.max()) if len(parts) else 1,
                "lsep_off": lsep_off, "part_of": part_of,
            })
            # register this level's slabs as pending hyperedges
            for k in range(len(parts)):
                svars = np.array(sorted(lsep_sets[k]), dtype=np.int64)
                pending_slabs.append({"vars": svars, "src": (lvl, k),
                                      "dst": None})
            cur_nodes = sep
            lvl += 1

        # ---- root layout ----
        root_vars = np.sort(np.asarray(cur_nodes, dtype=np.int64))
        root_off = np.full(nvars, -1, dtype=np.int64)
        off = 0
        for v in root_vars:
            level_of[v] = 10 ** 6       # sentinel: root
            root_off[v] = off
            off += dims[v]
        self.R_dim = int(off)
        self.L = len(self.levels)

        # ---- flat solution-vector layout: level segments then root ----
        sol_base = []
        off = 0
        for L in self.levels:
            sol_base.append(off)
            off += len(L["parts"]) * L["Dmax"]
        self.sol_root_base = off
        off += self.R_dim
        self.sol_pad = off                       # one zero pad slot
        self.sol_total = off + 1
        self.sol_base = sol_base

        def sol_index(v):
            """Global solution index of var v's first tangent coordinate."""
            lv = level_of[v]
            if lv == 10 ** 6:
                return self.sol_root_base + root_off[v]
            k = part_of_lvl[v]
            return (sol_base[lv] + k * self.levels[lv]["Dmax"] + int_off[v])

        # ---- per-level front column of a var (for assembly/routing) ----
        def front_col(lv, v):
            """Column of var v inside level-lv fronts: interior or local sep."""
            L = self.levels[lv]
            if level_of[v] == lv:
                return int(int_off[v])
            # must be in some part's local separator — caller knows the part
            raise RuntimeError  # unused; see col_for below

        # ---- factor assembly plans, per level + root ----
        # value order is global: batches -> slot pairs -> k-major ravel over
        # the rows SELECTED for that level.
        self.batch_asm = []      # per batch: {level: {sel, col [n,S]}}
        Rfw = self.R_dim + 1
        for bi, (b, vids) in enumerate(zip(graph.batches, batch_vids)):
            per_level = {}
            K, S = vids.shape
            for lv in list(range(self.L)) + ["root"]:
                if lv == "root":
                    rows = np.where(fac_level[bi] < 0)[0]
                else:
                    rows = np.where(fac_level[bi] == lv)[0]
                if rows.size == 0:
                    continue
                col = np.zeros((rows.size, S), dtype=np.int64)
                for t, rr in enumerate(rows):
                    for s in range(S):
                        v = vids[rr, s]
                        if lv == "root":
                            col[t, s] = root_off[v]
                        else:
                            L = self.levels[lv]
                            k = fac_part[bi][rr]
                            if level_of[v] == lv and part_of_lvl[v] == k:
                                col[t, s] = int_off[v]
                            else:
                                col[t, s] = L["Dmax"] + L["lsep_off"][k][v]
                per_level[lv] = {
                    "sel": rows.astype(np.int32),
                    "part": (fac_part[bi][rows].astype(np.int32)
                             if lv != "root" else None),
                    "col": col,
                }
            self.batch_asm.append(per_level)

        # ---- flat scatter target arrays per level/root ----
        # iterate the SAME order the device-side value computation uses
        self.asm_tgt = {lv: {"blk": [], "rhs": []}
                        for lv in list(range(self.L)) + ["root"]}
        for bi, b in enumerate(graph.batches):
            dims_b = [manifolds.get(g).dim for g in b.groups]
            for lv, ap in self.batch_asm[bi].items():
                m = (self.levels[lv]["Dmax"] + self.levels[lv]["sdmax"]
                     if lv != "root" else Rfw)
                col = ap["col"]
                part = ap["part"]
                blk_t, rhs_t = [], []
                for s in range(len(b.groups)):
                    rows_s = col[:, s, None] + np.arange(dims_b[s])[None, :]
                    if lv == "root":
                        base = 0 * col[:, 0]
                    else:
                        base = part.astype(np.int64)
                    rhs_t.append((base[:, None] * m + rows_s).ravel()
                                 if lv != "root" else rows_s.ravel())
                    for t in range(len(b.groups)):
                        cols_t = (col[:, t, None]
                                  + np.arange(dims_b[t])[None, :])
                        blk = (base[:, None, None] * (m * m)
                               + rows_s[:, :, None] * m
                               + cols_t[:, None, :]) if lv != "root" else (
                            rows_s[:, :, None] * Rfw + cols_t[:, None, :])
                        blk_t.append(blk.ravel())
                self.asm_tgt[lv]["blk"].append(np.concatenate(blk_t)
                                               if blk_t else
                                               np.zeros(0, np.int64))
                self.asm_tgt[lv]["rhs"].append(np.concatenate(rhs_t)
                                               if rhs_t else
                                               np.zeros(0, np.int64))
        for lv in list(self.asm_tgt):
            blk = self.asm_tgt[lv]["blk"]
            rhs = self.asm_tgt[lv]["rhs"]
            self.asm_tgt[lv] = {
                "blk": (np.concatenate(blk) if blk else np.zeros(0, np.int64)
                        ).astype(np.int64),
                "rhs": (np.concatenate(rhs) if rhs else np.zeros(0, np.int64)
                        ).astype(np.int64),
            }

        # ---- extend-add routing: level-l slabs -> level dst fronts / root ----
        # per level l: for each part k, its slab vars map to columns in the
        # destination front (or root). Bucketed by live slab size like
        # schur.py.
        self.ea = []
        for lv, L in enumerate(self.levels):
            p = len(L["parts"])
            sd = L["sd"]
            sdmax = L["sdmax"]
            # per part: destination address of each local-sep column
            colmap = np.full((p, max(sdmax, 1)), -1, dtype=np.int64)
            dst_level = np.full(p, -9, dtype=np.int64)  # -9 empty, -1 root
            dst_part = np.zeros(p, dtype=np.int64)
            for slab in pending_slabs:
                if slab["src"][0] != lv:
                    continue
                k = slab["src"][1]
                sv = slab["vars"]
                if sv.size == 0:
                    continue
                if slab.get("dst") is None:
                    dst_level[k] = -1              # root
                    for v in sv:
                        colmap[k, L["lsep_off"][k][v]:
                               L["lsep_off"][k][v] + dims[v]] = (
                            root_off[v] + np.arange(dims[v]))
                else:
                    dl, dk = slab["dst"]
                    dst_level[k] = dl
                    dst_part[k] = dk
                    DL = self.levels[dl]
                    for v in sv:
                        if level_of[v] == dl and part_of_lvl[v] == dk:
                            c = int_off[v]
                        else:
                            c = DL["Dmax"] + DL["lsep_off"][dk][v]
                        colmap[k, L["lsep_off"][k][v]:
                               L["lsep_off"][k][v] + dims[v]] = (
                            c + np.arange(dims[v]))
            # bucket parts by live slab size; build flat targets into each
            # destination level's front buffer and into root
            order = np.argsort(-sd)
            nb = min(8, p) if p else 0
            buckets = []
            bounds = np.linspace(0, p, nb + 1).astype(int) if p else []
            for biq in range(nb):
                ids = order[bounds[biq]:bounds[biq + 1]]
                ids = ids[sd[ids] > 0]
                if ids.size == 0:
                    continue
                sdb = int(sd[ids].max())
                tgt_by_dst = {}
                for dl in set(dst_level[ids].tolist()):
                    if dl == -9:
                        continue
                    if dl == -1:
                        m2, sz = Rfw, Rfw * Rfw
                    else:
                        m2 = self.levels[dl]["Dmax"] + self.levels[dl]["sdmax"]
                        sz = len(self.levels[dl]["parts"]) * m2 * m2
                    tgt = np.full((ids.size, sdb, sdb), sz, dtype=np.int64)
                    tgt_r = np.full((ids.size, sdb), sz, dtype=np.int64)
                    for t, k in enumerate(ids):
                        if dst_level[k] != dl:
                            continue
                        cm = colmap[k, :sdb].copy()
                        live = cm >= 0
                        cm[~live] = 0
                        if dl == -1:
                            addr = cm[:, None] * Rfw + cm[None, :]
                            addr_r = cm
                        else:
                            base = dst_part[k] * (m2 * m2)
                            addr = base + cm[:, None] * m2 + cm[None, :]
                            addr_r = dst_part[k] * m2 + cm
                        mask2 = live[:, None] & live[None, :]
                        tgt[t][mask2] = addr[mask2]
                        tgt_r[t][live] = addr_r[live]
                    tgt_by_dst[dl] = {"tgt": tgt.ravel(),
                                      "tgt_rhs": tgt_r.ravel()}
                buckets.append({"ids": ids.astype(np.int32), "sdb": sdb,
                                "dst": tgt_by_dst})
            self.ea.append(buckets)

        # ---- backsub gathers ----
        # per level: local sep col -> global solution index (pad -> sol_pad)
        self.l2sol = []
        for lv, L in enumerate(self.levels):
            p = len(L["parts"])
            m = np.full((p, max(L["sdmax"], 1)), self.sol_pad, dtype=np.int64)
            for k in range(p):
                for v, lo in L["lsep_off"][k].items():
                    m[k, lo:lo + dims[v]] = [sol_index(v) + j
                                             for j in range(dims[v])]
            self.l2sol.append(m)

        # ---- final per-group delta gathers ----
        self.delta_gather = {}
        for g in sorted(counts):
            n = counts[g]
            d = manifolds.get(g).dim
            gi = np.zeros((n, d), dtype=np.int64)
            vids_g = vi.vid(g, np.arange(n))
            for i, v in enumerate(vids_g):
                gi[i] = sol_index(v) + np.arange(d)
            self.delta_gather[g] = gi

        self.Rfw = Rfw
        # pad masks for interior Cholesky per level
        self.counts = dict(counts)

        # ---- single packed device upload ----
        self._to_device()

    def _to_device(self):
        leaves, setters = [], []

        def reg(container, key, cast=None):
            arr = np.asarray(container[key])
            if cast is not None:
                assert arr.size == 0 or arr.max() < 2 ** 31
                arr = arr.astype(cast)
            leaves.append(arr)
            setters.append((container, key))

        for lv in list(range(self.L)) + ["root"]:
            reg(self.asm_tgt[lv], "blk", np.int32)
            reg(self.asm_tgt[lv], "rhs", np.int32)
        for bi, per_level in enumerate(self.batch_asm):
            for lv, ap in per_level.items():
                reg(ap, "sel")
                if ap["part"] is not None:
                    reg(ap, "part")
        for lv in range(self.L):
            for bucket in self.ea[lv]:
                reg(bucket, "ids")
                for dl, tt in bucket["dst"].items():
                    reg(tt, "tgt", np.int32)
                    reg(tt, "tgt_rhs", np.int32)
        for lv in range(self.L):
            self_d = {"x": self.l2sol[lv]}
            reg(self_d, "x", np.int32)
            self.l2sol[lv] = self_d  # re-point; read back below
        dg = {}
        for g in self.delta_gather:
            dgi = {"x": self.delta_gather[g]}
            reg(dgi, "x", np.int32)
            dg[g] = dgi
        self.delta_gather = dg
        packed = _pack_to_device(leaves)
        for (container, key), arr in zip(setters, packed):
            container[key] = arr
        self.l2sol = [d["x"] for d in self.l2sol]
        self.delta_gather = {g: d["x"] for g, d in self.delta_gather.items()}

    def stats(self):
        return {
            "levels": self.L,
            "parts": [len(L["parts"]) for L in self.levels],
            "Dmax": [L["Dmax"] for L in self.levels],
            "sdmax": [L["sdmax"] for L in self.levels],
            "root_dim": self.R_dim,
        }


def make_ml_plan(graph, counts, max_part_size=128, root_max_dim=768,
                 max_levels=4) -> MLPlan:
    return MLPlan(graph, counts, max_part_size, root_max_dim, max_levels)


def _batch_values(b, sel, nslots, fm_mode):
    """(blocks, rhs) scatter values for the selected rows of one batch, in
    the plan's fixed order (slot-pairs, k-major ravel)."""
    from gtsam_personal_tpu.linear import fm as _fm
    blk, rhs = [], []
    if fm_mode:
        rdim = b.rdim
        Js = [b.Js[s][:, sel] for s in range(nslots)]
        r = b.r[:, sel]
        from gtsam_personal_tpu.core import manifolds as _m
        dims = [_m.get(g).dim for g in b.groups]
        for s in range(nslots):
            rhs.append(-_fm.fm_matvec_T(Js[s], r, rdim, dims[s]).T.ravel())
            for t in range(nslots):
                blk.append(_fm.fm_atb(Js[s], Js[t], rdim, dims[s],
                                      dims[t]).T.ravel())
    else:
        Js = [b.Js[s][sel] for s in range(nslots)]
        r = b.r[sel]
        for s in range(nslots):
            rhs.append(-_einsum_hp("kij,ki->kj", Js[s], r).ravel())
            for t in range(nslots):
                blk.append(_einsum_hp("kij,kil->kjl", Js[s], Js[t]).ravel())
    return blk, rhs


def solve_ml(lin, plan: MLPlan, lam=0.0):
    """Exact (damped) normal-equations solve via L-level recursive Schur
    elimination. `lin` is a GaussianGraph or fm.FMGraph."""
    from gtsam_personal_tpu.linear import fm as _fm
    fm_mode = isinstance(lin, _fm.FMGraph)
    dtype = lin.batches[0].r.dtype
    Rfw = plan.Rfw

    # ---- factor assembly per level + root ----
    blk_vals = {lv: [] for lv in list(range(plan.L)) + ["root"]}
    rhs_vals = {lv: [] for lv in list(range(plan.L)) + ["root"]}
    for bi, b in enumerate(lin.batches):
        nslots = len(b.groups)
        for lv, ap in plan.batch_asm[bi].items():
            blk, rhs = _batch_values(b, ap["sel"], nslots, fm_mode)
            blk_vals[lv].extend(blk)
            rhs_vals[lv].extend(rhs)

    cat = lambda xs: (jnp.concatenate(xs) if xs
                      else jnp.zeros((0,), dtype=dtype))
    fronts, rhs = [], []
    for lv in range(plan.L):
        L = plan.levels[lv]
        p = len(L["parts"])
        m = L["Dmax"] + L["sdmax"]
        f = jnp.zeros((p * m * m + 1,), dtype=dtype).at[
            plan.asm_tgt[lv]["blk"]].add(cat(blk_vals[lv]))
        g = jnp.zeros((p * m + 1,), dtype=dtype).at[
            plan.asm_tgt[lv]["rhs"]].add(cat(rhs_vals[lv]))
        fronts.append(f)
        rhs.append(g)
    root_sys = jnp.zeros((Rfw * Rfw + 1,), dtype=dtype).at[
        plan.asm_tgt["root"]["blk"]].add(cat(blk_vals["root"]))
    root_rhs = jnp.zeros((Rfw + 1,), dtype=dtype).at[
        plan.asm_tgt["root"]["rhs"]].add(cat(rhs_vals["root"]))

    # ---- upward sweep: eliminate level by level ----
    Ws, ys = [], []
    for lv in range(plan.L):
        L = plan.levels[lv]
        p = len(L["parts"])
        Dm, sdm = L["Dmax"], L["sdmax"]
        m = Dm + sdm
        F = fronts[lv][:-1].reshape(p, m, m)
        G = rhs[lv][:-1].reshape(p, m)
        A = F[:, :Dm, :Dm]
        row_ids = jnp.arange(Dm)
        pad_mask = row_ids[None, :] >= jnp.asarray(L["D"])[:, None]
        diag_add = jnp.where(pad_mask, 1.0, lam)
        A = A + jax.vmap(jnp.diag)(diag_add.astype(dtype))
        B = F[:, :Dm, Dm:]
        C = F[:, Dm:, Dm:]
        g_int = G[:, :Dm]
        g_sep = G[:, Dm:]
        chol = jax.vmap(jnp.linalg.cholesky)(A)
        solve_A = jax.vmap(lambda Lc, X: jax.scipy.linalg.cho_solve(
            (Lc, True), X))
        y = solve_A(chol, g_int[..., None])[..., 0]
        if sdm > 0:
            W = solve_A(chol, B)
            Schur = C - _einsum_hp("pij,pik->pjk", B, W)
            rhs_s = g_sep - _einsum_hp("pij,pi->pj", B, y)
            # route slabs to destination fronts / root
            for bucket in plan.ea[lv]:
                sdb = bucket["sdb"]
                Sb = Schur[bucket["ids"]][:, :sdb, :sdb].ravel()
                Rb = rhs_s[bucket["ids"]][:, :sdb].ravel()
                for dl, tt in bucket["dst"].items():
                    if dl == -1:
                        root_sys = root_sys.at[tt["tgt"]].add(Sb, mode="drop")
                        root_rhs = root_rhs.at[tt["tgt_rhs"]].add(
                            Rb, mode="drop")
                    else:
                        fronts[dl] = fronts[dl].at[tt["tgt"]].add(
                            Sb, mode="drop")
                        rhs[dl] = rhs[dl].at[tt["tgt_rhs"]].add(
                            Rb, mode="drop")
        else:
            W = jnp.zeros((p, Dm, 0), dtype=dtype)
        Ws.append(W)
        ys.append(y)

    # ---- root dense solve ----
    sol = jnp.zeros((plan.sol_total,), dtype=dtype)
    if plan.R_dim > 0:
        R = plan.R_dim
        Rsys = root_sys[:-1].reshape(Rfw, Rfw)[:R, :R]
        Rsys = Rsys + lam * jnp.eye(R, dtype=dtype)
        droot = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(Rsys, lower=True),
            root_rhs[:R])
        sol = jax.lax.dynamic_update_slice(sol, droot,
                                           (plan.sol_root_base,))

    # ---- downward sweep: backsubstitute levels top-down ----
    for lv in reversed(range(plan.L)):
        L = plan.levels[lv]
        d_ls = sol[plan.l2sol[lv]]                # [p, sdmax]
        if L["sdmax"] > 0:
            d_int = ys[lv] - _einsum_hp("pij,pj->pi", Ws[lv], d_ls)
        else:
            d_int = ys[lv]
        sol = jax.lax.dynamic_update_slice(sol, d_int.ravel(),
                                           (plan.sol_base[lv],))

    # ---- extract per-group delta ----
    return {g: sol[plan.delta_gather[g]] for g in plan.delta_gather}
