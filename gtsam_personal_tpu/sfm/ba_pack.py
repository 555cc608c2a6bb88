"""Packed-tile bundle adjustment layout: per-entity stack/wrap geometry.

The bucketed layout (sfm/ba_bucket.py) pads every camera to its BUCKET's max
observation count and every point to its bucket's max track length; with 8
camera classes the physical padding is still 1.68x (cameras) and 2.60x
(points) on Ladybug-1723-scale skew, and the hot paths are BOUND by padded
volume: linearize by the [3, CQ] point-position gather, the CG matvec by the
cam<->point permutation gathers (PERFORMANCE.md random-access table).

This module removes most of that padding by packing entities into the TPU's
native (8 sublane, 128 lane) tile geometry directly:

- CAMERA side: ONE physical rectangle [rowsC, 128]. A camera with n
  observations WRAPS over ceil(n/128) full 128-lane rows (so a 35k-obs
  camera no longer forces 35k-wide padding on its classmates); cameras with
  n <= 64 STACK 2-or-4 to a row in 64/32-lane groups. Cameras are grouped
  into capacity classes (geometric ladder); within a class every camera has
  the same (stack s, wrap m) geometry, so every per-camera reduction is a
  slice + reshape + sum — never a segment_sum, never a one-hot matmul over
  data (both measured slow / bf16-unsafe, see CLAUDE.md).
- POINT side: ONE physical rectangle [8, PTC] (feature-major: tracks on the
  8-row sublane axis). Tracks <= 4 STACK 2/4/8 points per 8-row column;
  tracks > 8 WRAP over ceil(t/8) columns. Same class machinery.

The big per-slot kernels (analytic linearize, elementwise J-products,
permutation gathers) all run over the SINGLE flat slot spaces — fewer, larger
kernels than the 8+6 bucket rectangles — and the per-class reduction tails
operate on tiny [k, rows]/[k, cols] arrays where even 30 classes cost
nothing. Measured waste on Ladybug-1723 skew: cam 1.21x / point 1.16x
physical (vs 1.68x / 2.60x bucketed); bench 13.0 -> 23.4 LM it/s together
with the cg=2 budget and reject-try linearization caching.

Entity order inside the solver is class-major ("slot" order) with a few dead
slots (stacking pads to multiples of s); the global vectors are [9, C_slots]
/ [3, P_slots] and the only order conversions are one permutation gather at
entry and exit, as in ba_bucket.

Same math as sfm/ba.py:solve_ba_step_cm (reference algebra:
slam/RegularImplicitSchurFactor.h — y += F'(I - E P E') F x, lifted
whole-problem); exact-match tested in tests/test_ba_pack.py.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from gtsam_personal_tpu.geometry import se3
from gtsam_personal_tpu.sfm import ba_kernels as bk
from gtsam_personal_tpu.sfm.ba import (BAState, BAObservations,
                                       _residual_one, pcg)
from gtsam_personal_tpu.sfm.ba_bucket import _analytic_rJ

CAM_W = 128   # camera rectangle lane width
PT_H = 8      # point rectangle sublane height


def _ladder(max_cap: int, base_caps, unit: int, ratio: float = 1.25):
    """Capacity ladder: `base_caps` (stacked classes), then unit*m for
    m = 1..8 and a geometric tail until max_cap is covered."""
    caps = list(base_caps)
    ms, m = [], 1
    while unit * (ms[-1] if ms else 0) < max_cap or not ms:
        if m not in ms:
            ms.append(m)
        m = m + 1 if m < 8 else max(m + 1, int(np.ceil(m * ratio)))
        if unit * ms[-1] >= max_cap:
            break
    caps += [unit * mm for mm in ms]
    return sorted(set(caps))


class _Side:
    """Host-side packing of one entity side (cameras or points).

    classes: list of dicts with keys
      cap, s (entities per tile-group), m (tile-groups per entity),
      start/end (sorted-entity range), n_blocks (logical slots incl. dead
      stacking pad), unit0 (first physical unit = row or column),
      slot0 (first logical slot).
    """

    def __init__(self, ids, n_entities, unit_cap, base_caps):
        cnt = np.bincount(np.asarray(ids, dtype=np.int64),
                          minlength=n_entities)
        order = np.argsort(-cnt, kind="stable")          # slotclass order
        caps = _ladder(max(int(cnt.max()), 1), base_caps, unit_cap)
        caps_arr = np.asarray(caps)
        # smallest cap >= count (count 0 -> smallest cap)
        cap_of = caps_arr[np.searchsorted(caps_arr,
                                          np.maximum(cnt[order], 1))]
        # contiguous runs of equal cap (counts sorted desc -> caps monotone)
        bounds = [0] + list(np.nonzero(np.diff(cap_of))[0] + 1) + [len(order)]
        self.classes = []
        unit0, slot0 = 0, 0
        for i in range(len(bounds) - 1):
            s_, e_ = bounds[i], bounds[i + 1]
            cap = int(cap_of[s_])
            if cap < unit_cap:                  # stacked: s entities / unit
                s = unit_cap // cap
                m = 1
                units = -(-(e_ - s_) // s)
                n_blocks = units * s
            else:                               # wrapped: m units / entity
                s = 1
                m = cap // unit_cap
                units = (e_ - s_) * m
                n_blocks = e_ - s_
            self.classes.append(dict(cap=cap, s=s, m=m, start=s_, end=e_,
                                     n_blocks=n_blocks, units=units,
                                     unit0=unit0, slot0=slot0))
            unit0 += units
            slot0 += n_blocks
        self.n_units = unit0                    # physical rows (cam) / cols (pt)
        self.n_slots = slot0                    # logical entity slots
        self.order = order                      # sorted pos -> orig id
        self.cnt = cnt

        # per-entity: class idx, block index within class, logical slot
        n = n_entities
        clsidx = np.zeros(n, dtype=np.int64)
        for k, c in enumerate(self.classes):
            clsidx[c["start"]:c["end"]] = k
        sortpos_of = np.empty(n, dtype=np.int64)
        sortpos_of[order] = np.arange(n)
        self.sortpos_of = sortpos_of
        starts = np.asarray([c["start"] for c in self.classes])
        slot0s = np.asarray([c["slot0"] for c in self.classes])
        self.clsidx = clsidx                    # per sorted pos
        blk = np.arange(n) - starts[clsidx]     # block index per sorted pos
        self.blk = blk
        self.slot_of_sorted = slot0s[clsidx] + blk
        # orig id -> logical slot, and slot -> orig id (dead -> n)
        self.orig2slot = np.empty(n, dtype=np.int64)
        self.orig2slot[order] = self.slot_of_sorted
        self.slot2orig = np.full(self.n_slots, n, dtype=np.int64)
        self.slot2orig[self.slot_of_sorted] = order

    def obs_place(self, ids, pos_in_entity):
        """Per-obs (unit index, offset-in-unit-group, logical slot).
        For cams: unit=row, offset=lane. For pts: unit=col... the caller
        assembles flat indices from (unit, off) per its own geometry."""
        sp = self.sortpos_of[np.asarray(ids, dtype=np.int64)]
        k = self.clsidx[sp]
        b = self.blk[sp]
        j = np.asarray(pos_in_entity, dtype=np.int64)
        ss = np.asarray([c["s"] for c in self.classes])[k]
        mm = np.asarray([c["m"] for c in self.classes])[k]
        u0 = np.asarray([c["unit0"] for c in self.classes])[k]
        slot = np.asarray([c["slot0"] for c in self.classes])[k] + b
        return k, b, j, ss, mm, u0, slot


@jax.tree_util.register_pytree_node_class
class PackLayout:
    """Static packed-tile index plan (see module docstring).

    Flat arrays (device):
      g_cam     [S]      obs index per cam slot (M = dead)
      cam_mask  [S]      1.0 live
      pt_srt_cm [S]      logical POINT slot per cam slot (P_slots = dead)
      c2p_tp    [S]      physical point-rect flat index (8*PTC = dead)
      p2c_tp    [8, PTC] physical cam-rect flat index (S = dead)
      uv_cm     [2, S]   measurement pixels pre-gathered (state-independent)
      cam_slot2orig [C_slots] (dead = C), cam_orig2slot [C]
      pt_slot2orig  [P_slots] (dead = P), pt_orig2slot  [P]
    Static: cam_classes / pt_classes tuples of
      (s, m, n_entities, n_blocks, unit0, slot0), rowsC, PTC, C_slots,
      P_slots, C, P, M.
    """

    def __init__(self, C, P, M, rowsC, PTC, C_slots, P_slots,
                 cam_classes, pt_classes, g_cam, cam_mask, pt_srt_cm,
                 c2p_tp, p2c_tp, uv_cm, cam_slot2orig, cam_orig2slot,
                 pt_slot2orig, pt_orig2slot):
        self.C, self.P, self.M = C, P, M
        self.rowsC, self.PTC = rowsC, PTC
        self.C_slots, self.P_slots = C_slots, P_slots
        self.cam_classes = tuple(cam_classes)
        self.pt_classes = tuple(pt_classes)
        self.g_cam = g_cam
        self.cam_mask = cam_mask
        self.pt_srt_cm = pt_srt_cm
        self.c2p_tp = c2p_tp
        self.p2c_tp = p2c_tp
        self.uv_cm = uv_cm
        self.cam_slot2orig = cam_slot2orig
        self.cam_orig2slot = cam_orig2slot
        self.pt_slot2orig = pt_slot2orig
        self.pt_orig2slot = pt_orig2slot

    @property
    def S(self):
        return self.rowsC * CAM_W

    def padding_waste(self):
        """(cam_slots/M, point_slots/M) physical, incl. (8,128) tile
        rounding — the honesty metric, comparable to BucketLayout's."""
        r = lambda v, t: -(-v // t) * t
        cam = r(self.rowsC, 8) * CAM_W
        pt = PT_H * r(self.PTC, 128)
        return cam / self.M, pt / self.M

    def tree_flatten(self):
        arrs = (self.g_cam, self.cam_mask, self.pt_srt_cm, self.c2p_tp,
                self.p2c_tp, self.uv_cm, self.cam_slot2orig,
                self.cam_orig2slot, self.pt_slot2orig, self.pt_orig2slot)
        aux = (self.C, self.P, self.M, self.rowsC, self.PTC, self.C_slots,
               self.P_slots, self.cam_classes, self.pt_classes)
        return arrs, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)

    @staticmethod
    def build(obs_cam, obs_point, C, P, dtype=np.float32, uv=None):
        cam = np.asarray(obs_cam, dtype=np.int64)
        pt = np.asarray(obs_point, dtype=np.int64)
        M = cam.shape[0]

        def pos_within(ids, n):
            """Per-obs position within its entity (stable order)."""
            o = np.argsort(ids, kind="stable")
            cnt = np.bincount(ids, minlength=n)
            ofs = np.zeros(n + 1, dtype=np.int64)
            ofs[1:] = np.cumsum(cnt)
            pos = np.empty(M, dtype=np.int64)
            pos[o] = np.arange(M) - ofs[ids[o]]
            return pos

        cside = _Side(cam, C, CAM_W, base_caps=(CAM_W // 4, CAM_W // 2))
        pside = _Side(pt, P, PT_H, base_caps=(1, 2, 4))

        cpos = pos_within(cam, C)
        ppos = pos_within(pt, P)

        # --- cam-side physical placement -------------------------------
        _, cb, cj, cs, cm_, cu0, cam_slot = cside.obs_place(cam, cpos)
        # stacked (s>1): row = u0 + b//s, lane = (b%s)*(W/s) + j
        # wrapped: row = u0 + b*m + j//W, lane = j%W
        row = np.where(cs > 1, cu0 + cb // np.maximum(cs, 1),
                       cu0 + cb * cm_ + cj // CAM_W)
        lane = np.where(cs > 1, (cb % np.maximum(cs, 1)) * (CAM_W // np.maximum(cs, 1)) + cj,
                        cj % CAM_W)
        flat_cam = row * CAM_W + lane
        rowsC = cside.n_units
        S = rowsC * CAM_W

        # --- point-side physical placement -----------------------------
        _, pb, pj, ps, pm_, pc0, pt_slot = pside.obs_place(pt, ppos)
        # stacked: need cols per class to split b -> (q, col)
        cols_of = np.asarray([c["units"] for c in pside.classes])
        pk = pside.clsidx[pside.sortpos_of[pt]]
        pcols = cols_of[pk]
        w = PT_H // np.maximum(ps, 1)
        q = pb // pcols
        colL = pb % pcols
        prow = np.where(ps > 1, q * w + pj, pj % PT_H)
        pcol = np.where(ps > 1, pc0 + colL, pc0 + pb * pm_ + pj // PT_H)
        PTC = pside.n_units
        flat_pt = prow * PTC + pcol
        # logical point slot for stacked classes is q*cols + colL (matches
        # the reshape-sum flatten), NOT b -- recompute
        slot0s = np.asarray([c["slot0"] for c in pside.classes])
        pt_slot = np.where(ps > 1, slot0s[pk] + q * pcols + colL, pt_slot)
        P_slots = pside.n_slots

        # point entity -> logical slot maps must match the same (q,col)
        # order; rebuild from per-point values
        pt_orig2slot = np.empty(P, dtype=np.int64)
        pt_slot2orig = np.full(P_slots, P, dtype=np.int64)
        spos = pside.sortpos_of[np.arange(P)]
        k_e = pside.clsidx[spos]
        b_e = pside.blk[spos]
        s_e = np.asarray([c["s"] for c in pside.classes])[k_e]
        cols_e = cols_of[k_e]
        slot_e = np.where(
            s_e > 1,
            slot0s[k_e] + (b_e // cols_e) * cols_e + (b_e % cols_e),
            slot0s[k_e] + b_e)
        # NOTE (q, col) = (b // cols, b % cols) -> slot = b; identity, but
        # keep the explicit form in case the assignment changes
        pt_orig2slot[:] = slot_e
        pt_slot2orig[slot_e] = np.arange(P)

        j = jnp.asarray
        g_cam = np.full(S, M, dtype=np.int64)
        g_cam[flat_cam] = np.arange(M)
        mask = np.zeros(S, dtype=dtype)
        mask[flat_cam] = 1.0
        psc = np.full(S, P_slots, dtype=np.int64)
        psc[flat_cam] = pt_slot
        c2p = np.full(S, PT_H * PTC, dtype=np.int64)
        c2p[flat_cam] = flat_pt
        p2c = np.full(PT_H * PTC, S, dtype=np.int64)
        p2c[flat_pt] = flat_cam
        uv_cm = None
        if uv is not None:
            uvf = np.zeros((2, S), dtype=dtype)
            uvf[:, flat_cam] = np.asarray(uv).T
            uv_cm = j(uvf)

        cam_classes = tuple(
            tuple(int(v) for v in
                  (c["s"], c["m"], c["end"] - c["start"], c["n_blocks"],
                   c["unit0"], c["slot0"])) for c in cside.classes)
        pt_classes = tuple(
            tuple(int(v) for v in
                  (c["s"], c["m"], c["end"] - c["start"], c["n_blocks"],
                   c["unit0"], c["slot0"])) for c in pside.classes)

        return PackLayout(
            C, P, M, rowsC, PTC, cside.n_slots, P_slots,
            cam_classes, pt_classes,
            j(g_cam), j(mask), j(psc), j(c2p), j(p2c.reshape(PT_H, PTC)),
            uv_cm,
            j(np.minimum(cside.slot2orig, C).astype(np.int32)),
            j(cside.orig2slot.astype(np.int32)),
            j(np.minimum(pt_slot2orig, P).astype(np.int32)),
            j(pt_orig2slot.astype(np.int32)))


def make_pack_layout(obs: BAObservations, C: int, P: int, **kw):
    kw.setdefault("uv", np.asarray(obs.uv))
    return PackLayout.build(np.asarray(obs.cam), np.asarray(obs.point),
                            C, P, **kw)


# ---------------------------------------------------------------------------
# broadcast / reduce over the class geometry
# ---------------------------------------------------------------------------

def _cam_broadcast(pl: PackLayout, data):
    """data [..., C_slots] -> per-slot [..., S] following the class
    geometry (each camera's value repeated over its slots)."""
    lead = data.shape[:-1]
    outs = []
    for s, m, n_ent, n_blocks, unit0, slot0 in pl.cam_classes:
        d = data[..., slot0:slot0 + n_blocks]
        if s > 1:                         # [., rows, s] -> repeat W/s lanes
            rows = n_blocks // s
            d = d.reshape(*lead, rows, s, 1)
            d = jnp.broadcast_to(d, (*lead, rows, s, CAM_W // s))
            outs.append(d.reshape(*lead, rows * CAM_W))
        else:                             # [., C_k] -> repeat m*W slots
            d = d.reshape(*lead, n_blocks, 1)
            d = jnp.broadcast_to(d, (*lead, n_blocks, m * CAM_W))
            outs.append(d.reshape(*lead, n_blocks * m * CAM_W))
    return jnp.concatenate(outs, axis=-1)


def _cam_reduce(pl: PackLayout, prod):
    """prod [..., S] -> per-camera sums [..., C_slots]."""
    lead = prod.shape[:-1]
    outs = []
    for s, m, n_ent, n_blocks, unit0, slot0 in pl.cam_classes:
        f0 = unit0 * CAM_W
        if s > 1:
            rows = n_blocks // s
            x = prod[..., f0:f0 + rows * CAM_W]
            x = x.reshape(*lead, rows, s, CAM_W // s).sum(-1)
            outs.append(x.reshape(*lead, n_blocks))
        else:
            x = prod[..., f0:f0 + n_blocks * m * CAM_W]
            outs.append(x.reshape(*lead, n_blocks, m * CAM_W).sum(-1))
    return jnp.concatenate(outs, axis=-1)


def _pt_broadcast(pl: PackLayout, u):
    """u [..., P_slots] -> point-rect [..., 8, PTC]."""
    lead = u.shape[:-1]
    outs = []
    for s, m, n_ent, n_blocks, unit0, slot0 in pl.pt_classes:
        w = PT_H // s
        if s > 1:
            cols = n_blocks // s
            d = u[..., slot0:slot0 + n_blocks].reshape(*lead, s, 1, cols)
            d = jnp.broadcast_to(d, (*lead, s, w, cols))
            outs.append(d.reshape(*lead, PT_H, cols))
        else:
            pk = n_blocks
            d = u[..., slot0:slot0 + pk].reshape(*lead, 1, pk, 1)
            d = jnp.broadcast_to(d, (*lead, PT_H, pk, m))
            outs.append(d.reshape(*lead, PT_H, pk * m))
    return jnp.concatenate(outs, axis=-1)


def _pt_reduce(pl: PackLayout, prod):
    """prod [..., 8, PTC] -> per-point sums [..., P_slots]."""
    lead = prod.shape[:-2]
    outs = []
    for s, m, n_ent, n_blocks, unit0, slot0 in pl.pt_classes:
        w = PT_H // s
        if s > 1:
            cols = n_blocks // s
            x = prod[..., :, unit0:unit0 + cols]
            x = x.reshape(*lead, s, w, cols).sum(-2)
            outs.append(x.reshape(*lead, n_blocks))
        else:
            pk = n_blocks
            x = prod[..., :, unit0:unit0 + pk * m]
            outs.append(x.reshape(*lead, PT_H, pk, m).sum((-3, -1)))
    return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# linearize / error / solve (math == ba_bucket, on the packed layout)
# ---------------------------------------------------------------------------

def _cam_tables(state: BAState, pl: PackLayout, dtype):
    """Camera pose/cal in SLOT order, dead slots -> identity camera."""
    ident = jnp.concatenate([jnp.eye(3, dtype=dtype),
                             jnp.zeros((3, 1), dtype=dtype)], axis=1)[None]
    poses = jnp.concatenate([state.cam_poses.astype(dtype), ident])
    cal0 = jnp.array([[1.0, 0.0, 0.0]], dtype=dtype)
    cals = jnp.concatenate([state.cam_cals.astype(dtype), cal0])
    poses_s = poses[pl.cam_slot2orig]          # [C_slots, 3, 4]
    cals_s = cals[pl.cam_slot2orig]            # [C_slots, 3]
    return poses_s, cals_s


def _pt_table(state: BAState, pl: PackLayout, dtype):
    """[3, P_slots + 1] point positions in slot order (pad col last)."""
    pts_pad = jnp.concatenate([state.points.astype(dtype).T,
                               jnp.zeros((3, 1), dtype=dtype)], axis=1)
    pts_slot = pts_pad[:, pl.pt_slot2orig]     # [3, P_slots]
    return jnp.concatenate([pts_slot, jnp.zeros((3, 1), dtype=dtype)],
                           axis=1)


def linearize_ba_pk(state: BAState, obs: BAObservations, pl: PackLayout,
                    robust: str = "none", robust_k=1.0):
    """Analytic cam-major linearization over the single packed rect.
    Returns r [2, S], Jc [2, 9, S], Jp [2, 3, S] (masked).

    robust != 'none' applies the IRLS sqrt-weight of the named m-estimator
    to each observation's residual/Jacobian rows (the reference's
    Robust::WhitenSystem semantics, linear/LossFunctions.h — same
    fixed-weight approximation, no Triggs correction)."""
    dtype = state.points.dtype
    poses_s, cals_s = _cam_tables(state, pl, dtype)
    posesT = _cam_broadcast(pl, poses_s.transpose(1, 2, 0))   # [3, 4, S]
    calsT = _cam_broadcast(pl, cals_s.T)                      # [3, S]
    pts_cm = _pt_table(state, pl, dtype)[:, pl.pt_srt_cm]     # [3, S]
    uv_cm = pl.uv_cm.astype(dtype)
    r, Jc, Jp, depth = _analytic_rJ(posesT, calsT, pts_cm, uv_cm, dtype)
    w = (depth > 1e-6).astype(dtype) * pl.cam_mask.astype(dtype)
    if robust != "none":
        from gtsam_personal_tpu.linear.noise import robust_weight
        e = jnp.sqrt(r[0] * r[0] + r[1] * r[1] + 1e-30)
        w = w * jnp.sqrt(robust_weight(robust, e, jnp.asarray(
            robust_k, dtype=dtype)))
    return r * w, Jc * w, Jp * w


def ba_error_pk(state: BAState, obs: BAObservations, pl: PackLayout,
                robust: str = "none", robust_k=1.0):
    dtype = state.points.dtype
    poses_s, cals_s = _cam_tables(state, pl, dtype)
    posesT = _cam_broadcast(pl, poses_s.transpose(1, 2, 0))
    calsT = _cam_broadcast(pl, cals_s.T)
    pts_cm = _pt_table(state, pl, dtype)[:, pl.pt_srt_cm]
    uv_cm = pl.uv_cm.astype(dtype)

    # vmapped matmul chain: measured 2.5x faster than unrolled elementwise
    # for the error path (MXU lowering; see ba_bucket.ba_error_bl note)
    from gtsam_personal_tpu.geometry import cameras as cam_geo

    def one(pose, cal, point, uv):
        return (_residual_one(pose, cal, point, uv),
                cam_geo.depth_of(pose, point))

    r, depth = jax.vmap(one, in_axes=(-1, -1, -1, -1), out_axes=(-1, -1))(
        posesT.reshape(3, 4, -1), calsT, pts_cm, uv_cm)
    w = (depth > 1e-6).astype(dtype) * pl.cam_mask.astype(dtype)
    r = r * w
    if robust != "none":
        from gtsam_personal_tpu.linear.noise import robust_loss
        e = jnp.sqrt(r[0] * r[0] + r[1] * r[1] + 1e-30)
        return jnp.sum(w * robust_loss(robust, e, jnp.asarray(
            robust_k, dtype=dtype)))
    return 0.5 * jnp.sum(r * r)


def _cam_to_point(pl, x):
    """[k, S] -> [k, 8, PTC] via the fixed flat permutation."""
    k = x.shape[0]
    flat = jnp.concatenate([x, jnp.zeros((k, 1), dtype=x.dtype)], axis=1)
    return flat[:, pl.p2c_tp]


def _point_to_cam(pl, x):
    k = x.shape[0]
    flat = jnp.concatenate([x.reshape(k, -1),
                            jnp.zeros((k, 1), dtype=x.dtype)], axis=1)
    return flat[:, pl.c2p_tp]


def _relayout_pm(pl, r, Jp_cm):
    """Point-major copies (one 8-row permutation: Jp 6 rows + r 2 rows)."""
    S = pl.S
    pm = _cam_to_point(pl, jnp.concatenate([Jp_cm.reshape(6, S), r], axis=0))
    return pm[:6].reshape(2, 3, PT_H, pl.PTC), pm[6:]


def solve_ba_step_pk(state: BAState, obs: BAObservations, pl: PackLayout,
                     lam, cg_maxiter=100, cg_tol=1e-6,
                     robust: str = "none", robust_k=1.0):
    """Implicit-Schur PCG step over the packed layout. Returns
    (delta_cam [C, 9], delta_point [P, 3]) in ORIGINAL order."""
    lin = linearize_ba_pk(state, obs, pl, robust, robust_k)
    pm = _relayout_pm(pl, lin[0], lin[2])
    red = _reduce_cache(pl, lin, pm)
    return _solve_from_lin(pl, lin, pm, red, lam, cg_maxiter, cg_tol)


def _reduce_cache(pl: PackLayout, lin, pm):
    """Lambda-INDEPENDENT reductions of a linearization, cached alongside
    it in the LM carry (rejected lambda tries skip them all):
      Hpp_raw [9, P_slots]  undamped landmark blocks
      gc      [9, C_slots]  camera gradient
      gp      [3, P_slots]  landmark gradient
      Hcc     [81, C_slots] camera diagonal blocks (preconditioner)"""
    r, Jc, Jp_cm = lin
    Jp4, r_pm = pm
    Hpp_raw = _pt_reduce(pl, jnp.stack([
        sum(Jp4[i, k] * Jp4[i, l] for i in range(2))
        for k in range(3) for l in range(3)]))
    gc = _cam_reduce(pl, jnp.stack([
        sum(Jc[i, j] * r[i] for i in range(2)) for j in range(9)]))
    gp = _pt_reduce(pl, jnp.stack([
        sum(Jp4[i, k] * r_pm[i] for i in range(2)) for k in range(3)]))
    Hcc = _cam_reduce(pl, jnp.stack([
        sum(Jc[i, j] * Jc[i, k] for i in range(2))
        for j in range(9) for k in range(9)]))
    return Hpp_raw, gc, gp, Hcc


def _solve_from_lin(pl: PackLayout, lin, pm, red, lam, cg_maxiter=100,
                    cg_tol=1e-6):
    """The lambda-dependent part of the step: consumes a (possibly cached)
    linearization — the reference's tryLambda reuses ONE linearization
    across rejected lambda tries (LevenbergMarquardtOptimizer.cpp:121), and
    so does ba_lm_run_pk via this split.

    The landmark back-substitution's E^T F xc chain is ACCUMULATED inside
    the CG loop (tacc += alpha * E^T F p — exact by linearity of the
    chain), saving a whole extra cam_apply + permutation gather + point
    reduction after CG exits (the permutation gathers are 85% of the
    matvec cost, PERFORMANCE.md matvec-isolation probe)."""
    r, Jc, Jp_cm = lin
    Jp4, r_pm = pm
    Hpp_raw, gc, gp, Hcc = red
    dtype = r.dtype
    S = pl.S

    def cam_to_point(x):
        return _cam_to_point(pl, x)

    def point_to_cam(x):
        return _point_to_cam(pl, x)

    def cam_apply(x):                                       # [9, Cs] -> [2, S]
        xb = _cam_broadcast(pl, x)                          # [9, S]
        return jnp.stack([sum(Jc[i, j] * xb[j] for j in range(9))
                          for i in range(2)])

    def cam_reduce(u):                                      # [2, S] -> [9, Cs]
        return _cam_reduce(pl, jnp.stack([
            sum(Jc[i, j] * u[i] for i in range(2)) for j in range(9)]))

    def pt_reduce(ap):                                      # [2,8,PTC] -> [3,Ps]
        return _pt_reduce(pl, jnp.stack([
            sum(Jp4[i, k] * ap[i] for i in range(2)) for k in range(3)]))

    def pt_apply(u):                                        # [3,Ps] -> [2,8,PTC]
        ub = _pt_broadcast(pl, u)                           # [3, 8, PTC]
        return jnp.stack([sum(Jp4[i, k] * ub[k] for k in range(3))
                          for i in range(2)])

    Hpp = bk.add_scaled_identity_33_T(Hpp_raw, lam + 1e-10)
    HppInv = bk.sym33_inv_T(Hpp)

    hp = bk.sym33_matvec_T(HppInv, gp)
    b_rhs = -gc + cam_reduce(point_to_cam(pt_apply(hp)))

    def schur_matvec_t(x):
        """Returns (S x + lam x, E^T F x) — the second output feeds the
        fused back-substitution accumulator."""
        a = cam_apply(x)
        t = pt_reduce(cam_to_point(a))
        u = bk.sym33_matvec_T(HppInv, t)
        bc = point_to_cam(pt_apply(u))
        y = cam_reduce(a - bc)
        return y + lam * x, t

    # block-Jacobi preconditioner of S per camera (Hcc cached; the
    # Hpp^{-1}-coupled correction Gc is lambda-dependent)
    HppInv_pad = jnp.concatenate([HppInv, jnp.zeros((9, 1), dtype=dtype)],
                                 axis=1)
    Wt = [sum(Jc[i, a] * Jp_cm[i, b] for i in range(2))
          for a in range(9) for b in range(3)]              # 27 x [S]
    Hi = HppInv_pad[:, pl.pt_srt_cm]                        # [9, S]
    T1 = [sum(Wt[3 * a + b] * Hi[3 * b + c] for b in range(3))
          for a in range(9) for c in range(3)]
    Gc = _cam_reduce(pl, jnp.stack([
        sum(T1[3 * a + c] * Wt[3 * d + c] for c in range(3))
        for a in range(9) for d in range(9)]))              # [81, C_slots]
    blocks = (Hcc - Gc).T.reshape(pl.C_slots, 9, 9)
    Ls = bk.safe_chol_blocks(blocks, lam)
    cho_apply = jax.vmap(lambda L, x: jax.scipy.linalg.cho_solve((L, True), x))
    precond = lambda x: cho_apply(Ls, x.T).T                # x [9, C_slots]

    # PCG with the fused E^T F x accumulator (ba.pcg formulas + tacc carry)
    x0 = jnp.zeros_like(b_rhs)
    z0 = precond(b_rhs)
    rz0 = jnp.vdot(b_rhs, z0)
    thr = (cg_tol ** 2) * jnp.vdot(b_rhs, b_rhs)
    tacc0 = jnp.zeros_like(gp)

    def cond(s):
        k, x, rr, z, p, rz, tacc = s
        return jnp.logical_and(k < cg_maxiter, jnp.vdot(rr, rr) > thr)

    def body(s):
        k, x, rr, z, p, rz, tacc = s
        Ap, tp = schur_matvec_t(p)
        pAp = jnp.vdot(p, Ap)
        alpha = jnp.where(pAp > 0, rz / jnp.where(pAp != 0, pAp, 1.0), 0.0)
        x = x + alpha * p
        tacc = tacc + alpha * tp
        rr = rr - alpha * Ap
        z = precond(rr)
        rz_new = jnp.vdot(rr, z)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        return k + 1, x, rr, z, z + beta * p, rz_new, tacc

    _, xc, _, _, _, _, tacc = jax.lax.while_loop(
        cond, body, (0, x0, b_rhs, z0, z0, rz0, tacc0))

    xp = bk.sym33_matvec_T(HppInv, -gp - tacc)              # [3, P_slots]
    xc_orig = xc.T[pl.cam_orig2slot]                        # [C, 9]
    xp_orig = xp.T[pl.pt_orig2slot]                         # [P, 3]
    return xc_orig, xp_orig


def retract_ba(state: BAState, xc, xp) -> BAState:
    new_poses = jax.vmap(se3.retract)(state.cam_poses, xc[:, :6])
    return BAState(new_poses, state.cam_cals + xc[:, 6:9], state.points + xp)


def _lm_iter_body(state, obs, pl, lam, err, cg_maxiter, lam_lo, lam_hi,
                  robust="none", robust_k=1.0):
    xc, xp = solve_ba_step_pk(state, obs, pl, lam, cg_maxiter=cg_maxiter,
                              robust=robust, robust_k=robust_k)
    trial = retract_ba(state, xc, xp)
    err_t = ba_error_pk(trial, obs, pl, robust, robust_k)
    ok = jnp.isfinite(err_t) & (err_t < err)
    new_state = jax.tree.map(lambda a, b: jnp.where(ok, a, b), trial, state)
    new_err = jnp.where(ok, err_t, err)
    new_lam = jnp.where(ok, jnp.maximum(lam * 0.5, lam_lo),
                        jnp.minimum(lam * 4.0, lam_hi))
    return new_state, new_lam, new_err


def _lm_iter_cached(state, obs, pl, lam, err, lin, pm, red, need_relin,
                    cg_maxiter, lam_lo, lam_hi, robust, robust_k):
    """LM iteration that RELINEARIZES ONLY AFTER AN ACCEPT: on a rejected
    try the state is unchanged, so the cached linearization is bitwise
    identical to recomputing it — the reference's tryLambda semantics
    (one linearize per outer iteration). lax.cond executes only the taken
    branch on TPU, so rejected iterations skip the whole linearize +
    relayout + lambda-independent-reduction cost."""
    def fresh(_):
        l = linearize_ba_pk(state, obs, pl, robust, robust_k)
        p = _relayout_pm(pl, l[0], l[2])
        return l, p, _reduce_cache(pl, l, p)

    lin, pm, red = jax.lax.cond(need_relin, fresh,
                                lambda _: (lin, pm, red), None)
    xc, xp = _solve_from_lin(pl, lin, pm, red, lam, cg_maxiter)
    trial = retract_ba(state, xc, xp)
    err_t = ba_error_pk(trial, obs, pl, robust, robust_k)
    ok = jnp.isfinite(err_t) & (err_t < err)
    new_state = jax.tree.map(lambda a, b: jnp.where(ok, a, b), trial, state)
    new_err = jnp.where(ok, err_t, err)
    new_lam = jnp.where(ok, jnp.maximum(lam * 0.5, lam_lo),
                        jnp.minimum(lam * 4.0, lam_hi))
    return new_state, new_lam, new_err, lin, pm, red, ok


@partial(jax.jit, static_argnames=("cg_maxiter", "robust"))
def ba_lm_iter_pk(state: BAState, obs: BAObservations, pl: PackLayout,
                  lam, err, cg_maxiter=100, lam_lo=1e-6, lam_hi=1e3,
                  robust: str = "none", robust_k=1.0):
    """One full on-device LM iteration (tryLambda semantics — see
    ba_bucket.ba_lm_iter_bl). robust: optional m-estimator (IRLS)."""
    return _lm_iter_body(state, obs, pl, lam, err, cg_maxiter, lam_lo,
                         lam_hi, robust, robust_k)


@partial(jax.jit, static_argnames=("n_iters", "cg_maxiter", "robust"))
def ba_lm_run_pk(state: BAState, obs: BAObservations, pl: PackLayout,
                 lam, err, n_iters, cg_maxiter=100,
                 lam_lo=1e-6, lam_hi=1e3, robust: str = "none",
                 robust_k=1.0):
    """`n_iters` LM iterations in ONE dispatch (see ba_bucket.ba_lm_run_bl
    on why bench times this, not a dispatch-per-iteration loop)."""
    # seed the linearization cache with zeros and need_relin=True: the
    # first iteration always relinearizes
    S = pl.S
    dtype = state.points.dtype
    lin0 = (jnp.zeros((2, S), dtype), jnp.zeros((2, 9, S), dtype),
            jnp.zeros((2, 3, S), dtype))
    pm0 = (jnp.zeros((2, 3, PT_H, pl.PTC), dtype),
           jnp.zeros((2, PT_H, pl.PTC), dtype))
    red0 = (jnp.zeros((9, pl.P_slots), dtype),
            jnp.zeros((9, pl.C_slots), dtype),
            jnp.zeros((3, pl.P_slots), dtype),
            jnp.zeros((81, pl.C_slots), dtype))

    def body(carry, _):
        st, lm, er, lin, pm, red, need = carry
        st, lm, er, lin, pm, red, ok = _lm_iter_cached(
            st, obs, pl, lm, er, lin, pm, red, need, cg_maxiter, lam_lo,
            lam_hi, robust, robust_k)
        return (st, lm, er, lin, pm, red, ok), None

    (st, lm, er, _, _, _, _), _ = jax.lax.scan(
        body, (state, lam, err, lin0, pm0, red0, jnp.asarray(True)), None,
        length=n_iters)
    return st, lm, er


def optimize_ba_pk(state: BAState, obs: BAObservations, pl=None,
                   max_iterations=50, chunk=5, cg_maxiter=10,
                   lambda_initial=1e-3, rel_tol=1e-6,
                   robust: str = "none", robust_k=1.0, verbose=False):
    """LM outer driver on the packed engine: runs `chunk` full on-device LM
    iterations per dispatch (ba_lm_run_pk) and checks convergence on host
    between chunks — the dispatch count is max_iterations/chunk, not
    max_iterations (the axon tunnel charges tens of ms per dispatch).

    Returns (state, error, iterations_run). Reference schedule semantics:
    every inner iteration is an accept/reject tryLambda step, so rejected
    tries count as iterations, like LevenbergMarquardtOptimizer."""
    if pl is None:
        pl = make_pack_layout(obs, state.cam_poses.shape[0],
                              state.points.shape[0])
    dtype = state.points.dtype
    err = ba_error_pk(state, obs, pl, robust, robust_k)
    lam = jnp.asarray(lambda_initial, dtype=dtype)
    err_h = float(err)
    it = 0
    while it < max_iterations:
        n = min(chunk, max_iterations - it)
        state, lam, err = ba_lm_run_pk(state, obs, pl, lam, err, n_iters=n,
                                       cg_maxiter=cg_maxiter, robust=robust,
                                       robust_k=robust_k)
        it += n
        new_err = float(err)
        if verbose:
            print(f"BA iters {it}: error {new_err:.6g} (lambda "
                  f"{float(lam):.2g})")
        if err_h - new_err < rel_tol * max(err_h, 1e-30):
            err_h = new_err
            break
        err_h = new_err
    return state, err_h, it
