"""Distributed packed-tile bundle adjustment (shard_map + psum).

Round-4's flagship single-chip engine (sfm/ba_pack.py: stack/wrap packed
tiles, ~1.2x physical padding on BAL-realistic skew) could not run under
shard_map because each shard's class ladder was problem-specific — a
different (rowsC, PTC, classes) geometry per device is a different program.

This module computes the class geometry on the GLOBAL problem so every
device shares ONE (rowsC, PTC, C_slots, P_slots, classes) shape:

- cameras are dealt to devices contiguously (dev = cam_id // Cl, all of a
  camera's observations live on its device — observation deal never splits
  a camera);
- the camera capacity ladder is built from GLOBAL per-camera counts; for
  each class the per-device block count is the MAX over devices (rounded to
  the stacking multiple), so per-shard padding rises only by shard skew;
- the point side is packed per device over the points VISIBLE from that
  device's cameras (a track can split across devices); the ladder spans the
  max per-device track segment and per-class column counts are again
  max-over-devices;
- points visible from >1 device ("boundary", small under covisibility
  locality) get a canonical global order: per CG iteration their partial
  landmark reductions are gathered to that order, psum'd once ([3, Ps]),
  and scattered back to each device's local slots (two permutation
  gathers — the same op class that already bounds the single-chip matvec).

Everything else is the ba_pack algebra verbatim (the broadcast/reduce
class-geometry helpers are imported from sfm/ba_pack.py), with lax.psum at
the landmark aggregates and the CG dot products — the reference's
single-address-space Schur elimination (slam/RegularImplicitSchurFactor.h)
distributed with explicit collectives over the camera axis (SURVEY §2.11
P5/P6). Exact-match tested against the single-device packed solver in
tests/test_dist_ba_pack.py.
"""

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P_
from jax import shard_map

from gtsam_personal_tpu.geometry import se3
from gtsam_personal_tpu.sfm import ba, ba_kernels as bk
from gtsam_personal_tpu.sfm.ba_bucket import _analytic_rJ
from gtsam_personal_tpu.sfm.ba_pack import (
    CAM_W, PT_H, _ladder, _cam_broadcast, _cam_reduce, _pt_broadcast,
    _pt_reduce)


class _Geo(NamedTuple):
    """Duck-typed stand-in for PackLayout: the ba_pack broadcast/reduce
    helpers read only .cam_classes / .pt_classes."""
    cam_classes: tuple
    pt_classes: tuple


class DistPackLayout(NamedTuple):
    """Per-device packed-tile layouts stacked on a leading mesh axis, all
    sharing ONE class geometry (dims). Dead-slot sentinels: cam slots ->
    Cl, point slots -> P_slots, flat cam -> S, flat pt -> 8*PTC, boundary
    -> Ps, point ids -> P.

    Cameras are dealt to devices ROUND-ROBIN by descending observation
    count (balanced=True): per-class populations then differ by at most 1
    across shards, so the shared (max-over-shards) geometry pads barely
    more than the single-device layout even under Zipf camera skew —
    contiguous dealing concentrates the big cameras on one shard and
    re-pays multiples of the padding the pack layout eliminated.
    cam_new2orig / cam_orig2new carry the device permutation; the solve
    applies it to the replicated camera tables at entry and inverts it on
    the returned xc."""
    uv_cm: jnp.ndarray         # [n, 2, S]
    cam_mask: jnp.ndarray      # [n, S]
    pt_srt_cm: jnp.ndarray     # [n, S]   local point slot per cam slot
    c2p_tp: jnp.ndarray        # [n, S]   flat pt-rect index per cam slot
    p2c_tp: jnp.ndarray        # [n, 8, PTC] flat cam index per pt pos
    cam_slot2loc: jnp.ndarray  # [n, C_slots] local cam id (dead = Cl)
    cam_loc2slot: jnp.ndarray  # [n, Cl]  slot per local cam (dead = C_slots)
    pt_slot2orig: jnp.ndarray  # [n, P_slots] global point id (dead = P)
    b2l: jnp.ndarray           # [n, Ps]  boundary idx -> local pt slot
    l2b: jnp.ndarray           # [n, P_slots] local pt slot -> boundary idx
    own_gather: jnp.ndarray    # [n, P]   global pt id -> local slot if owned
    cam_new2orig: jnp.ndarray  # [n*Cl] device-order slot -> padded-state row
    cam_orig2new: jnp.ndarray  # [n*Cl] padded-state row -> device-order slot
    dims: tuple  # (n, Cl, rowsC, PTC, C_slots, P_slots, Ps, P,
                 #  cam_classes, pt_classes) — classes in ba_pack format


def _shared_classes(cap_of, dev, n, unit):
    """Shared class geometry: for each cap present anywhere, the per-device
    entity count is padded to the max over devices. cap_of: per-entity cap
    (already restricted to live entities); dev: owning device per entity.
    Returns (classes ba_pack-format, per-entity (class_idx, block_idx),
    n_units, n_slots). Entities within a (device, class) get block indices
    by descending original order position (stable)."""
    caps = sorted(set(int(c) for c in cap_of), reverse=True)
    cap_idx = {c: k for k, c in enumerate(caps)}
    k_of = np.asarray([cap_idx[int(c)] for c in cap_of], dtype=np.int64)
    # per (device, class) counts
    counts = np.zeros((n, len(caps)), dtype=np.int64)
    np.add.at(counts, (dev, k_of), 1)
    classes = []
    unit0, slot0 = 0, 0
    for k, cap in enumerate(caps):
        mx = int(counts[:, k].max())
        if cap < unit:                       # stacked: s entities per unit
            s = unit // cap
            m = 1
            units = -(-mx // s)
            n_blocks = units * s
        else:                                # wrapped: m units per entity
            s = 1
            m = cap // unit
            units = mx * m
            n_blocks = mx
        classes.append((s, m, mx, n_blocks, unit0, slot0))
        unit0 += units
        slot0 += n_blocks
    # block index within each (device, class) run — the caller passes
    # entities sorted by (device, count desc), so caps are monotone within
    # a device and each (device, class) group is CONTIGUOUS
    key = np.asarray(dev, dtype=np.int64) * len(caps) + k_of
    if len(key):
        change = np.r_[True, key[1:] != key[:-1]]
        run_id = np.cumsum(change) - 1
        run_start = np.flatnonzero(change)
        blk = np.arange(len(key)) - run_start[run_id]
    else:
        blk = np.zeros(0, dtype=np.int64)
    return tuple(classes), k_of, blk, unit0, slot0


def _pos_within(ids, n_entities):
    """Per-observation position within its entity (stable order)."""
    ids = np.asarray(ids, dtype=np.int64)
    M = ids.shape[0]
    o = np.argsort(ids, kind="stable")
    ofs = np.zeros(n_entities + 1, dtype=np.int64)
    ofs[1:] = np.cumsum(np.bincount(ids, minlength=n_entities))
    pos = np.empty(M, dtype=np.int64)
    pos[o] = np.arange(M) - ofs[ids[o]]
    return pos


def build_dist_pack_layout(obs: ba.BAObservations, C: int, P: int, n: int,
                           dtype=np.float32,
                           balanced: bool = True) -> DistPackLayout:
    """Host-side: shared-geometry packed-tile layout per device."""
    cam = np.asarray(obs.cam, dtype=np.int64)
    pt = np.asarray(obs.point, dtype=np.int64)
    uv = np.asarray(obs.uv)
    M = cam.shape[0]
    Cl = -(-C // n)
    cnt_c = np.bincount(cam, minlength=C)
    if balanced:
        # round-robin by descending count: per-class shard populations
        # differ by <= 1, so the max-over-shards geometry stays tight
        order_by_cnt = np.argsort(-cnt_c, kind="stable")
        dev_of_cam = np.empty(C, dtype=np.int64)
        loc_of_cam = np.empty(C, dtype=np.int64)
        dev_of_cam[order_by_cnt] = np.arange(C) % n
        loc_of_cam[order_by_cnt] = np.arange(C) // n
    else:
        dev_of_cam = np.minimum(np.arange(C) // Cl, n - 1)
        loc_of_cam = np.arange(C) - dev_of_cam * Cl
    cam_new2orig = np.full(n * Cl, -1, dtype=np.int64)
    cam_new2orig[dev_of_cam * Cl + loc_of_cam] = np.arange(C)
    virt = np.where(cam_new2orig < 0)[0]
    cam_new2orig[virt] = C + np.arange(len(virt))   # padded identity rows
    cam_orig2new = np.empty(n * Cl, dtype=np.int64)
    cam_orig2new[cam_new2orig] = np.arange(n * Cl)
    dev = dev_of_cam[cam]                      # per-obs device

    # ---- camera side: global counts (never split across devices) ----
    caps_c = np.asarray(_ladder(max(int(cnt_c.max()), 1),
                                (CAM_W // 4, CAM_W // 2), CAM_W))
    cap_cam = caps_c[np.searchsorted(caps_c, np.maximum(cnt_c, 1))]
    # sort cameras per device by count desc for ladder-friendly block order
    order_c = np.lexsort((-cnt_c, dev_of_cam))
    cam_classes, kc_srt, blk_srt, rowsC, C_slots = _shared_classes(
        cap_cam[order_c], dev_of_cam[order_c], n, CAM_W)
    kc = np.empty(C, dtype=np.int64)
    blk_c = np.empty(C, dtype=np.int64)
    kc[order_c] = kc_srt
    blk_c[order_c] = blk_srt
    S = rowsC * CAM_W

    cls_s = np.asarray([c[0] for c in cam_classes])
    cls_m = np.asarray([c[1] for c in cam_classes])
    cls_u0 = np.asarray([c[4] for c in cam_classes])
    cls_s0 = np.asarray([c[5] for c in cam_classes])

    # per-camera slot + per-obs flat position
    cam_slot = cls_s0[kc] + blk_c                       # [C]
    cpos = _pos_within(cam, C)
    s_, m_, u0_ = cls_s[kc[cam]], cls_m[kc[cam]], cls_u0[kc[cam]]
    b_ = blk_c[cam]
    j_ = cpos
    row = np.where(s_ > 1, u0_ + b_ // np.maximum(s_, 1),
                   u0_ + b_ * m_ + j_ // CAM_W)
    lane = np.where(s_ > 1,
                    (b_ % np.maximum(s_, 1)) * (CAM_W // np.maximum(s_, 1)) + j_,
                    j_ % CAM_W)
    flat_cam = row * CAM_W + lane

    # ---- point side: per-(device, point) track segments ----
    # live (d, p) pairs and their counts
    dp = dev * np.int64(P) + pt
    dp_u, dp_inv, dp_cnt = np.unique(dp, return_inverse=True,
                                     return_counts=True)
    d_u = dp_u // P
    p_u = dp_u % P
    caps_p = np.asarray(_ladder(max(int(dp_cnt.max()), 1), (1, 2, 4), PT_H))
    cap_dp = caps_p[np.searchsorted(caps_p, np.maximum(dp_cnt, 1))]
    order_p = np.lexsort((-dp_cnt, d_u))
    pt_classes, kp_srt, blk_srt_p, PTC, P_slots = _shared_classes(
        cap_dp[order_p], d_u[order_p], n, PT_H)
    kp = np.empty(len(dp_u), dtype=np.int64)
    blk_p = np.empty(len(dp_u), dtype=np.int64)
    kp[order_p] = kp_srt
    blk_p[order_p] = blk_srt_p

    pcls_s = np.asarray([c[0] for c in pt_classes])
    pcls_m = np.asarray([c[1] for c in pt_classes])
    pcls_u0 = np.asarray([c[4] for c in pt_classes])
    pcls_s0 = np.asarray([c[5] for c in pt_classes])
    # columns per class (units for stacked = n_blocks//s; wrapped = blocks*m)
    pcls_cols = np.asarray([(c[3] // c[0]) if c[0] > 1 else c[3] * c[1]
                            for c in pt_classes])

    pt_slot_u = pcls_s0[kp] + blk_p                     # [n_live] local slot
    ppos = _pos_within(dp_inv, len(dp_u))               # per-obs pos in segment
    ks = kp[dp_inv]
    ps_, pm_, pu0_, pcols_ = pcls_s[ks], pcls_m[ks], pcls_u0[ks], pcls_cols[ks]
    pb_ = blk_p[dp_inv]
    pj_ = ppos
    w_ = PT_H // np.maximum(ps_, 1)
    q_ = pb_ // np.maximum(pcols_, 1)
    colL_ = pb_ % np.maximum(pcols_, 1)
    prow = np.where(ps_ > 1, q_ * w_ + pj_, pj_ % PT_H)
    pcol = np.where(ps_ > 1, pu0_ + colL_, pu0_ + pb_ * pm_ + pj_ // PT_H)
    flat_pt = prow * PTC + pcol
    pt_slot_obs = pt_slot_u[dp_inv]

    # ---- boundary (multi-device) points, canonical global order ----
    ndev_of_p = np.bincount(p_u, minlength=P)
    boundary_ids = np.where(ndev_of_p > 1)[0]           # ascending = canonical
    Ps = len(boundary_ids)
    bidx_of_p = np.full(P, Ps, dtype=np.int64)
    bidx_of_p[boundary_ids] = np.arange(Ps)
    # owner: min device observing the point (dead for unobserved)
    owner = np.full(P, n, dtype=np.int64)
    np.minimum.at(owner, p_u, d_u)

    # ---- emit per-device arrays ----
    uv_cm = np.zeros((n, 2, S), dtype=dtype)
    cam_mask = np.zeros((n, S), dtype=dtype)
    pt_srt_cm = np.full((n, S), P_slots, dtype=np.int64)
    c2p_tp = np.full((n, S), PT_H * PTC, dtype=np.int64)
    p2c_tp = np.full((n, PT_H * PTC), S, dtype=np.int64)
    cam_slot2loc = np.full((n, C_slots), Cl, dtype=np.int64)
    cam_loc2slot = np.full((n, Cl), C_slots, dtype=np.int64)
    pt_slot2orig = np.full((n, P_slots), P, dtype=np.int64)
    b2l = np.full((n, max(Ps, 1)), P_slots, dtype=np.int64)
    l2b = np.full((n, P_slots), Ps, dtype=np.int64)
    own_gather = np.full((n, P), P_slots, dtype=np.int64)

    uv_cm[dev, :, flat_cam] = uv               # note: fancy-index puts axis first
    # numpy advanced indexing: uv_cm[dev, :, flat_cam] has shape [M, 2]
    cam_mask[dev, flat_cam] = 1.0
    pt_srt_cm[dev, flat_cam] = pt_slot_obs
    c2p_tp[dev, flat_cam] = flat_pt
    p2c_tp[dev, flat_pt] = flat_cam

    cam_slot2loc[dev_of_cam, cam_slot] = loc_of_cam
    cam_loc2slot[dev_of_cam, loc_of_cam] = cam_slot

    pt_slot2orig[d_u, pt_slot_u] = p_u
    is_b = bidx_of_p[p_u] < Ps
    b2l[d_u[is_b], bidx_of_p[p_u[is_b]]] = pt_slot_u[is_b]
    l2b[d_u[is_b], pt_slot_u[is_b]] = bidx_of_p[p_u[is_b]]
    owned = owner[p_u] == d_u
    own_gather[d_u[owned], p_u[owned]] = pt_slot_u[owned]

    j = jnp.asarray
    return DistPackLayout(
        j(uv_cm), j(cam_mask), j(pt_srt_cm), j(c2p_tp),
        j(p2c_tp.reshape(n, PT_H, PTC)), j(cam_slot2loc), j(cam_loc2slot),
        j(pt_slot2orig), j(b2l), j(l2b), j(own_gather),
        j(cam_new2orig), j(cam_orig2new),
        (n, Cl, rowsC, PTC, C_slots, P_slots, Ps, P,
         tuple(cam_classes), tuple(pt_classes)))


def padding_waste(dpl: DistPackLayout, M: int):
    """(cam, point) physical padded volume over live observations, summed
    over all devices and including (8, 128) tile rounding — comparable to
    PackLayout.padding_waste() on the single-device layout."""
    n, Cl, rowsC, PTC, C_slots, P_slots, Ps, P, _, _ = dpl.dims
    r = lambda v, t: -(-v // t) * t
    cam = n * r(rowsC, 8) * CAM_W
    pt = n * PT_H * r(PTC, 128)
    return cam / M, pt / M


# ---------------------------------------------------------------------------
# per-device solve body
# ---------------------------------------------------------------------------

def _device_kernels(dims, axis, skip_collectives, arrays):
    """Per-device closures over one shard's layout arrays (leading device
    axis already present; this runs INSIDE shard_map). Shared by the
    one-shot solve body and the full LM scan body."""
    n, Cl, rowsC, PTC, C_slots, P_slots, Ps, P, cam_classes, pt_classes = dims
    sq = lambda x: x.reshape(x.shape[1:])
    (uv_cm, cam_mask, pt_srt_cm, c2p_tp, p2c_tp, cam_slot2loc, cam_loc2slot,
     pt_slot2orig, b2l, l2b, own_gather) = [sq(x) for x in arrays]
    S = rowsC * CAM_W
    geo = _Geo(cam_classes, pt_classes)
    dtype = uv_cm.dtype
    psum = ((lambda x: x) if skip_collectives
            else (lambda x: lax.psum(x, axis)))

    def psum_bnd(t):
        """Boundary-aligned landmark all-reduce of a [k, P_slots] local
        array: gather boundary slots to the canonical order, ONE psum
        [k, Ps], scatter back. Exclusive points' partials are already
        complete. The gathers stay in the skip_collectives variant (they
        are layout work, not communication)."""
        if Ps == 0:
            return t
        k = t.shape[0]
        t_pad = jnp.concatenate([t, jnp.zeros((k, 1), dtype=t.dtype)], axis=1)
        tb = t_pad[:, b2l]                               # [k, Ps]
        if not skip_collectives:
            tb = lax.psum(tb, axis)
        tb_pad = jnp.concatenate([tb, jnp.zeros((k, 1), dtype=t.dtype)],
                                 axis=1)
        return jnp.where(l2b[None, :] < Ps, tb_pad[:, l2b], t)

    d = lax.axis_index(axis)

    def tables(poses, cals, points):
        """Replicated global state -> this device's broadcast tables."""
        poses_l = lax.dynamic_slice_in_dim(poses, d * Cl, Cl)
        cals_l = lax.dynamic_slice_in_dim(cals, d * Cl, Cl)
        ident = jnp.concatenate([jnp.eye(3, dtype=dtype),
                                 jnp.zeros((3, 1), dtype=dtype)],
                                axis=1)[None]
        poses_pad = jnp.concatenate([poses_l, ident])
        cals_pad = jnp.concatenate(
            [cals_l, jnp.array([[1.0, 0.0, 0.0]], dtype=dtype)])
        poses_s = poses_pad[cam_slot2loc]                # [C_slots, 3, 4]
        cals_s = cals_pad[cam_slot2loc]
        posesT = _cam_broadcast(geo, poses_s.transpose(1, 2, 0))   # [3,4,S]
        calsT = _cam_broadcast(geo, cals_s.T)                      # [3, S]
        pts_pad = jnp.concatenate([points.astype(dtype).T,
                                   jnp.zeros((3, 1), dtype=dtype)], axis=1)
        pts_slot = pts_pad[:, pt_slot2orig]              # [3, P_slots]
        pts_slot1 = jnp.concatenate(
            [pts_slot, jnp.zeros((3, 1), dtype=dtype)], axis=1)
        pts_cm = pts_slot1[:, pt_srt_cm]                 # [3, S]
        return posesT, calsT, pts_cm

    def linearize(poses, cals, points):
        posesT, calsT, pts_cm = tables(poses, cals, points)
        r, Jc, Jp, depth = _analytic_rJ(posesT, calsT, pts_cm,
                                        uv_cm.astype(dtype), dtype)
        w = (depth > 1e-6).astype(dtype) * cam_mask.astype(dtype)
        return r * w, Jc * w, Jp * w

    def cam_to_point(x):                                 # [k, S] -> [k,8,PTC]
        k = x.shape[0]
        flat = jnp.concatenate([x, jnp.zeros((k, 1), dtype=dtype)], axis=1)
        return flat[:, p2c_tp]

    def point_to_cam(x):                                 # [k,8,PTC] -> [k,S]
        k = x.shape[0]
        flat = jnp.concatenate([x.reshape(k, -1),
                                jnp.zeros((k, 1), dtype=dtype)], axis=1)
        return flat[:, c2p_tp]

    def relayout(lin):
        r, Jc, Jp_cm = lin
        pm = cam_to_point(jnp.concatenate([Jp_cm.reshape(6, S), r], axis=0))
        return pm[:6].reshape(2, 3, PT_H, PTC), pm[6:]

    def reduce_cache(lin, pm):
        """Lambda-independent reductions (cached across rejected lambda
        tries, like ba_pack._reduce_cache — including the boundary psum of
        the landmark blocks/gradient, so rejects skip that collective):
        hpgp [12, P_slots] (undamped Hpp blocks + gp, post-psum),
        gc [9, C_slots] local, Hcc [81, C_slots] local."""
        r, Jc, Jp_cm = lin
        Jp4, r_pm = pm
        Hpp_raw = _pt_reduce(geo, jnp.stack([
            sum(Jp4[i, k] * Jp4[i, l] for i in range(2))
            for k in range(3) for l in range(3)]))
        gp_loc = _pt_reduce(geo, jnp.stack([
            sum(Jp4[i, k] * r_pm[i] for i in range(2)) for k in range(3)]))
        hpgp = psum_bnd(jnp.concatenate([Hpp_raw, gp_loc], axis=0))
        gc = _cam_reduce(geo, jnp.stack([
            sum(Jc[i, j] * r[i] for i in range(2)) for j in range(9)]))
        Hcc = _cam_reduce(geo, jnp.stack([
            sum(Jc[i, j] * Jc[i, k] for i in range(2))
            for j in range(9) for k in range(9)]))
        return hpgp, gc, Hcc

    def solve_from_lin(lin, pm, red, lam, cg_maxiter, cg_tol):
        """Distributed implicit-Schur PCG from a (possibly cached)
        linearization. Returns (xc [9, C_slots], xp_loc [3, P_slots])."""
        r, Jc, Jp_cm = lin
        Jp4, r_pm = pm
        hpgp, gc, Hcc = red
        Hpp = bk.add_scaled_identity_33_T(hpgp[:9], lam + 1e-10)
        gp = hpgp[9:]
        HppInv = bk.sym33_inv_T(Hpp)

        def cam_apply(x):                                # [9, Cs] -> [2, S]
            xb = _cam_broadcast(geo, x)
            return jnp.stack([sum(Jc[i, j] * xb[j] for j in range(9))
                              for i in range(2)])

        def cam_reduce(u):                               # [2, S] -> [9, Cs]
            return _cam_reduce(geo, jnp.stack([
                sum(Jc[i, j] * u[i] for i in range(2)) for j in range(9)]))

        def pt_reduce(ap):                               # [2,8,PTC]->[3,Ps_l]
            return _pt_reduce(geo, jnp.stack([
                sum(Jp4[i, k] * ap[i] for i in range(2))
                for k in range(3)]))

        def pt_apply(u):                                 # [3,Ps_l]->[2,8,PTC]
            ub = _pt_broadcast(geo, u)
            return jnp.stack([sum(Jp4[i, k] * ub[k] for k in range(3))
                              for i in range(2)])

        hp = bk.sym33_matvec_T(HppInv, gp)
        b_rhs = -gc + cam_reduce(point_to_cam(pt_apply(hp)))

        def schur_matvec_t(x):
            """(S x + lam x, E^T F x) — the second output feeds the fused
            back-substitution accumulator (ba_pack._solve_from_lin)."""
            a = cam_apply(x)
            t = psum_bnd(pt_reduce(cam_to_point(a)))
            u = bk.sym33_matvec_T(HppInv, t)
            bc = point_to_cam(pt_apply(u))
            return cam_reduce(a - bc) + lam * x, t

        # per-camera block-Jacobi preconditioner (device-local blocks,
        # global HppInv) — identical math to the single-device packed path
        HppInv_pad = jnp.concatenate(
            [HppInv, jnp.zeros((9, 1), dtype=dtype)], axis=1)
        Wt = [sum(Jc[i, a] * Jp_cm[i, b] for i in range(2))
              for a in range(9) for b in range(3)]
        Hi = HppInv_pad[:, pt_srt_cm]
        T1 = [sum(Wt[3 * a + b] * Hi[3 * b + c] for b in range(3))
              for a in range(9) for c in range(3)]
        Gc = _cam_reduce(geo, jnp.stack([
            sum(T1[3 * a + c] * Wt[3 * dd + c] for c in range(3))
            for a in range(9) for dd in range(9)]))
        blocks = (Hcc - Gc).T.reshape(C_slots, 9, 9)
        Ls = bk.safe_chol_blocks(blocks, lam)
        cho_apply = jax.vmap(
            lambda L, x: jax.scipy.linalg.cho_solve((L, True), x))
        precond = lambda x: cho_apply(Ls, x.T).T

        # PCG with psum'd dot products + fused E^T F x accumulator
        pdot = lambda a, bv: psum(jnp.vdot(a, bv))
        x0 = jnp.zeros_like(b_rhs)
        z0 = precond(b_rhs)
        rz0 = pdot(b_rhs, z0)
        bb = pdot(b_rhs, b_rhs)
        thr = (cg_tol ** 2) * bb
        tacc0 = jnp.zeros_like(gp)

        def cond(s):
            k, x, rr, z, pp, rz, rr2, tacc = s
            return jnp.logical_and(k < cg_maxiter, rr2 > thr)

        def body(s):
            k, x, rr, z, pp, rz, _, tacc = s
            Ap, tp = schur_matvec_t(pp)
            pAp = pdot(pp, Ap)
            alpha = jnp.where(pAp > 0,
                              rz / jnp.where(pAp != 0, pAp, 1.0), 0.0)
            x = x + alpha * pp
            tacc = tacc + alpha * tp
            rr = rr - alpha * Ap
            z = precond(rr)
            rz_new = pdot(rr, z)
            beta = rz_new / jnp.where(rz != 0, rz, 1.0)
            return (k + 1, x, rr, z, z + beta * pp, rz_new,
                    pdot(rr, rr), tacc)

        _, xc, _, _, _, _, _, tacc = lax.while_loop(
            cond, body, (0, x0, b_rhs, z0, z0, rz0, bb, tacc0))
        xp_loc = bk.sym33_matvec_T(HppInv, -gp - tacc)   # [3, P_slots]
        return xc, xp_loc

    def assemble_xp(xp_loc):
        """Ownership-masked psum -> [3, P] in original point order."""
        xp_pad = jnp.concatenate(
            [xp_loc, jnp.zeros((3, 1), dtype=dtype)], axis=1)
        return psum(xp_pad[:, own_gather])

    def xc_local(xc):
        """[9, C_slots] -> this device's [Cl, 9] camera tangents."""
        xc_pad = jnp.concatenate(
            [xc, jnp.zeros((9, 1), dtype=dtype)], axis=1)
        return xc_pad[:, cam_loc2slot].T

    def error(poses, cals, points):
        """Global masked reprojection error: local sum + ONE scalar psum
        (the vmapped matmul chain of ba_pack.ba_error_pk on this shard)."""
        from gtsam_personal_tpu.geometry import cameras as cam_geo
        posesT, calsT, pts_cm = tables(poses, cals, points)

        def one(pose, cal, point, uv):
            return (ba._residual_one(pose, cal, point, uv),
                    cam_geo.depth_of(pose, point))

        r, depth = jax.vmap(one, in_axes=(-1, -1, -1, -1),
                            out_axes=(-1, -1))(
            posesT.reshape(3, 4, -1), calsT, pts_cm, uv_cm.astype(dtype))
        w = (depth > 1e-6).astype(dtype) * cam_mask.astype(dtype)
        r = r * w
        return psum(0.5 * jnp.sum(r * r))

    def retract_global(poses, cals, points, xc, xp_loc):
        """Each device retracts its OWN cameras; the replicated global
        state is rebuilt with one psum of disjoint slices; landmarks via
        the ownership-masked psum."""
        xc_loc = xc_local(xc)                            # [Cl, 9]
        poses_l = lax.dynamic_slice_in_dim(poses, d * Cl, Cl)
        cals_l = lax.dynamic_slice_in_dim(cals, d * Cl, Cl)
        new_poses_l = jax.vmap(se3.retract)(poses_l, xc_loc[:, :6])
        new_cals_l = cals_l + xc_loc[:, 6:9]
        new_poses = psum(lax.dynamic_update_slice_in_dim(
            jnp.zeros_like(poses), new_poses_l, d * Cl, axis=0))
        new_cals = psum(lax.dynamic_update_slice_in_dim(
            jnp.zeros_like(cals), new_cals_l, d * Cl, axis=0))
        new_points = points + assemble_xp(xp_loc).T
        return new_poses, new_cals, new_points

    class K:
        pass

    K.S, K.PTC, K.C_slots, K.P_slots = S, PTC, C_slots, P_slots
    K.dtype = dtype
    K.linearize = staticmethod(linearize)
    K.relayout = staticmethod(relayout)
    K.reduce_cache = staticmethod(reduce_cache)
    K.solve_from_lin = staticmethod(solve_from_lin)
    K.assemble_xp = staticmethod(assemble_xp)
    K.xc_local = staticmethod(xc_local)
    K.error = staticmethod(error)
    K.retract_global = staticmethod(retract_global)
    return K


def _solve_body(dims, axis, cg_maxiter, cg_tol, skip_collectives,
                poses, cals, points, lam, *arrays):
    K = _device_kernels(dims, axis, skip_collectives, arrays)
    lin = K.linearize(poses, cals, points)
    pm = K.relayout(lin)
    red = K.reduce_cache(lin, pm)
    xc, xp_loc = K.solve_from_lin(lin, pm, red, lam, cg_maxiter, cg_tol)
    return K.xc_local(xc), K.assemble_xp(xp_loc).T       # [Cl, 9], [P, 3]


def _error_body(dims, axis, poses, cals, points, *arrays):
    K = _device_kernels(dims, axis, False, arrays)
    return K.error(poses, cals, points)


def _lm_run_body(dims, axis, n_iters, cg_maxiter, cg_tol, lam_lo, lam_hi,
                 poses, cals, points, lam, err, *arrays):
    """The FULL flagship LM loop distributed: n_iters accept/reject
    iterations with lambda adaptation and reject-try linearization caching
    (ba_pack.ba_lm_run_pk semantics) as ONE lax.scan inside shard_map —
    rejected tries skip the linearize, the relayout, and the cached
    boundary psum of the landmark system."""
    K = _device_kernels(dims, axis, False, arrays)
    dtype = K.dtype
    S, PTC, C_slots, P_slots = K.S, K.PTC, K.C_slots, K.P_slots
    lin0 = (jnp.zeros((2, S), dtype), jnp.zeros((2, 9, S), dtype),
            jnp.zeros((2, 3, S), dtype))
    pm0 = (jnp.zeros((2, 3, PT_H, PTC), dtype),
           jnp.zeros((2, PT_H, PTC), dtype))
    red0 = (jnp.zeros((12, P_slots), dtype),
            jnp.zeros((9, C_slots), dtype),
            jnp.zeros((81, C_slots), dtype))

    def fresh(args):
        poses, cals, points = args
        lin = K.linearize(poses, cals, points)
        pm = K.relayout(lin)
        return lin, pm, K.reduce_cache(lin, pm)

    def body(carry, _):
        poses, cals, points, lam, err, lin, pm, red, need = carry
        lin, pm, red = jax.lax.cond(need, fresh,
                                    lambda _: (lin, pm, red),
                                    (poses, cals, points))
        xc, xp_loc = K.solve_from_lin(lin, pm, red, lam, cg_maxiter, cg_tol)
        tp_p, tp_c, tp_x = K.retract_global(poses, cals, points, xc, xp_loc)
        err_t = K.error(tp_p, tp_c, tp_x)
        ok = jnp.isfinite(err_t) & (err_t < err)
        poses = jnp.where(ok, tp_p, poses)
        cals = jnp.where(ok, tp_c, cals)
        points = jnp.where(ok, tp_x, points)
        err = jnp.where(ok, err_t, err)
        lam = jnp.where(ok, jnp.maximum(lam * 0.5, lam_lo),
                        jnp.minimum(lam * 4.0, lam_hi))
        return (poses, cals, points, lam, err, lin, pm, red, ok), None

    (poses, cals, points, lam, err, _, _, _, _), _ = jax.lax.scan(
        body, (poses, cals, points, lam, err, lin0, pm0, red0,
               jnp.asarray(True)), None, length=n_iters)
    return poses, cals, points, lam, err


def dist_pack_solve_step(state_pad: ba.BAState, dpl: DistPackLayout, lam,
                         mesh: Mesh, cg_maxiter=25, cg_tol=1e-6,
                         axis: str = "dp", skip_collectives: bool = False):
    """Camera-sharded packed-tile implicit-Schur solve. Returns
    (xc [Cpad, 9] laid out over the mesh, xp [P, 3] replicated)."""
    body = partial(_solve_body, dpl.dims, axis, cg_maxiter, cg_tol,
                   skip_collectives)
    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P_(), P_(), P_(), P_()) + (P_(axis),) * 11,
        out_specs=(P_(axis), P_()),
        check_vma=False)
    lam = jnp.asarray(lam, dtype=state_pad.points.dtype)
    # replicated camera tables permuted to device order; xc un-permuted back
    poses_n = state_pad.cam_poses[dpl.cam_new2orig]
    cals_n = state_pad.cam_cals[dpl.cam_new2orig]
    xc_new, xp = mapped(poses_n, cals_n, state_pad.points,
                        lam, dpl.uv_cm, dpl.cam_mask, dpl.pt_srt_cm,
                        dpl.c2p_tp, dpl.p2c_tp, dpl.cam_slot2loc,
                        dpl.cam_loc2slot, dpl.pt_slot2orig, dpl.b2l,
                        dpl.l2b, dpl.own_gather)
    return xc_new[dpl.cam_orig2new], xp


def dist_pack_error(state_pad: ba.BAState, dpl: DistPackLayout, mesh: Mesh,
                    axis: str = "dp"):
    """Global BA error through the distributed kernels (one scalar psum)."""
    body = partial(_error_body, dpl.dims, axis)
    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P_(), P_(), P_()) + (P_(axis),) * 11,
        out_specs=P_(), check_vma=False)
    poses_n = state_pad.cam_poses[dpl.cam_new2orig]
    cals_n = state_pad.cam_cals[dpl.cam_new2orig]
    return mapped(poses_n, cals_n, state_pad.points,
                  dpl.uv_cm, dpl.cam_mask, dpl.pt_srt_cm, dpl.c2p_tp,
                  dpl.p2c_tp, dpl.cam_slot2loc, dpl.cam_loc2slot,
                  dpl.pt_slot2orig, dpl.b2l, dpl.l2b, dpl.own_gather)


def dist_pack_lm_run(state_pad: ba.BAState, dpl: DistPackLayout, lam, err,
                     n_iters: int, mesh: Mesh, cg_maxiter=10, cg_tol=1e-6,
                     lam_lo=1e-6, lam_hi=1e3, axis: str = "dp"):
    """`n_iters` FULL LM iterations of the flagship packed engine,
    DISTRIBUTED: one shard_map dispatch containing the whole lax.scan —
    accept/reject + lambda adaptation + reject-try caching, with psums at
    the landmark aggregates, CG dots, error, and state rebuild. The
    multi-chip twin of ba_pack.ba_lm_run_pk. `err` must come from
    dist_pack_error (the same masked reduction). Returns
    (BAState in the ORIGINAL camera order, lam, err)."""
    body = partial(_lm_run_body, dpl.dims, axis, n_iters, cg_maxiter,
                   cg_tol, lam_lo, lam_hi)
    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P_(), P_(), P_(), P_(), P_()) + (P_(axis),) * 11,
        out_specs=(P_(), P_(), P_(), P_(), P_()),
        check_vma=False)
    dtype = state_pad.points.dtype
    lam = jnp.asarray(lam, dtype=dtype)
    err = jnp.asarray(err, dtype=dtype)
    poses_n = state_pad.cam_poses[dpl.cam_new2orig]
    cals_n = state_pad.cam_cals[dpl.cam_new2orig]
    poses, cals, points, lam, err = mapped(
        poses_n, cals_n, state_pad.points, lam, err,
        dpl.uv_cm, dpl.cam_mask, dpl.pt_srt_cm, dpl.c2p_tp, dpl.p2c_tp,
        dpl.cam_slot2loc, dpl.cam_loc2slot, dpl.pt_slot2orig, dpl.b2l,
        dpl.l2b, dpl.own_gather)
    state = ba.BAState(poses[dpl.cam_orig2new], cals[dpl.cam_orig2new],
                       points)
    return state, lam, err


def dist_pack_try_step(state_pad: ba.BAState, obs: ba.BAObservations,
                       dpl: DistPackLayout, lam, mesh: Mesh, cg_maxiter=25):
    """One LM try step on the distributed packed engine."""
    xc, xp = dist_pack_solve_step(state_pad, dpl, lam, mesh,
                                  cg_maxiter=cg_maxiter)
    new_state = ba.retract_ba(state_pad, xc, xp)
    return new_state, ba.ba_error(new_state, obs)


def collective_overhead(state_pad, dpl, mesh, lam=1e-4, cg_maxiter=10,
                        iters=3):
    """Compute/collective split proxy: real sharded solve vs the psum-free
    variant (identical FLOPs and gathers, zero communication)."""
    import time

    def run(skip):
        f = jax.jit(lambda s: dist_pack_solve_step(
            s, dpl, lam, mesh, cg_maxiter=cg_maxiter, skip_collectives=skip))
        out = f(state_pad)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(state_pad)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    t_full = run(False)
    t_local = run(True)
    return t_full, t_local, max(0.0, 1.0 - t_local / t_full)
