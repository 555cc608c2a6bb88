"""Bucketed dual-layout bundle adjustment: skew-robust cam/point rectangles.

The single-rectangle cam-major layout (sfm/ba_layout.py) pads every camera to
the GLOBAL max per-camera observation count Q. Real BAL problems are heavily
skewed (power-law track lengths, Zipf-ish camera popularity — reference data:
gtsam/sfm/SfmData.h:61 loaders); measured on a Ladybug-1723-scale synthetic
with realistic skew (sfm/synthetic.py:make_skewed_problem) the global-max
padding wastes 116x on the camera side and 11.8x on the point side.

The fix stays inside the measured TPU playbook (PERFORMANCE.md: no scatters,
no per-observation gathers of camera data): group cameras by live observation
count into a handful of width classes and give each class its own dense
rectangle [C_b, Q_b] padded only to the class max. Every camera lives in
exactly ONE bucket row, so all per-camera reductions stay dense sums over the
bucket's Q_b axis — no cross-bucket aggregation, no segment_sum. Points get
the identical treatment with [T_b, P_b] feature-major rectangles.

Inside the solver, cameras and points are kept in *sorted* (bucket-
concatenated) order so each bucket is a contiguous slice of the global
[9, C] / [3, P] vectors; the only order conversions are one [C]-row and one
[P]-row gather at entry (camera/point parameter tables) and exit (delta
vectors) — permutation-gather class, ~2.5 ns/element.

The cam<->point relayout inside the CG matvec remains ONE fixed permutation
over the concatenated flat slot spaces, exactly as in the uniform layout.

Buckets are chosen by binning live counts into power-of-two classes, setting
each rectangle's width to the class MAX (not the power of two), and greedily
merging the cheapest adjacent classes until at most `max_buckets` remain
(cost model includes the (8,128) tile rounding of tiny C_b).

Same math as sfm/ba.py:solve_ba_step_cm (reference algebra:
slam/RegularImplicitSchurFactor.h — y += F'(I - E P E') F x, lifted whole-
problem); exact-match tested against it in tests/test_ba_bucket.py.
"""

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from gtsam_personal_tpu.geometry import se3, cameras as cam_geo
from gtsam_personal_tpu.sfm import ba_kernels as bk
from gtsam_personal_tpu.sfm.ba import (BAState, BAObservations,
                                       _residual_local, _residual_one, pcg)


def _plan_buckets(counts_sorted_desc: np.ndarray, max_buckets: int,
                  entity_tile: int = 8, width_tile: int = 1):
    """Split the descending count vector into <= max_buckets contiguous
    groups; returns list of (start, end, width). Width = group max count.
    Greedy merge of adjacent power-of-two classes minimizing padded slots.

    The cost model rounds to the rectangle's actual tile quanta: camera
    buckets are [C_b, Q_b] (entities on the 8-row sublane axis ->
    entity_tile=8); point buckets are [T_b, P_b] (entities on the 128-lane
    axis -> entity_tile=128, width on rows -> width_tile=8)."""
    n = len(counts_sorted_desc)
    if n == 0:
        return []
    # initial classes: power-of-two bins of the count
    bounds = [0]
    cur = 1 << max(int(np.ceil(np.log2(max(counts_sorted_desc[0], 1)))), 0)
    for i in range(1, n):
        c = max(int(counts_sorted_desc[i]), 1)
        while cur > 1 and c <= cur // 2:
            cur //= 2
            bounds.append(i)
    bounds.append(n)
    bounds = sorted(set(bounds))

    def cost(s, e):
        cb = -(-(e - s) // entity_tile) * entity_tile
        w = int(max(counts_sorted_desc[s], 1))
        return cb * (-(-w // width_tile) * width_tile)

    while len(bounds) > 2:
        best, besti = None, None
        for i in range(1, len(bounds) - 1):
            merged = cost(bounds[i - 1], bounds[i + 1])
            sep = cost(bounds[i - 1], bounds[i]) + cost(bounds[i], bounds[i + 1])
            d = merged - sep
            if best is None or d < best:
                best, besti = d, i
        # merge while over the cap, and keep taking free/profitable merges
        # (tile rounding makes many narrow classes strictly worse than one)
        if len(bounds) - 1 > max_buckets or best <= 0:
            bounds.pop(besti)
        else:
            break
    return [(bounds[i], bounds[i + 1],
             int(max(counts_sorted_desc[bounds[i]], 1)))
            for i in range(len(bounds) - 1)]


@jax.tree_util.register_pytree_node_class
class BucketLayout:
    """Static bucketed index plan. All list fields have one entry per bucket.

    Camera side (buckets over sorted-desc per-camera counts):
      cam_ids[b]   [C_b]      original camera id per sorted row
      g_cam[b]     [C_b*Q_b]  obs index per slot (M = dead)
      cam_mask[b]  [C_b*Q_b]  1.0 for live slots
      pt_srt_cm[b] [C_b*Q_b]  SORTED point position per slot (P = dead)
    Point side:
      pt_ids[b]    [P_b]      original point id per sorted position
      p2c_tp[b]    [T_b, P_b] flat cam slot position (CQ_total = dead)
      c2p_tp[b]    [C_b*Q_b]  flat point slot position (PT_total = dead)
    Order conversion:
      cam_sorted2orig [C], cam_orig2sorted [C], pt_sorted2orig [P],
      pt_orig2sorted [P].
    """

    def __init__(self, C, P, M, cam_shapes, pt_shapes, cam_ids, g_cam,
                 cam_mask, pt_srt_cm, pt_ids, p2c_tp, c2p_tp,
                 cam_sorted2orig, cam_orig2sorted, pt_sorted2orig,
                 pt_orig2sorted, uv_cm=None):
        self.C, self.P, self.M = C, P, M
        self.cam_shapes = tuple(cam_shapes)   # ((C_b, Q_b), ...)
        self.pt_shapes = tuple(pt_shapes)     # ((P_b, T_b), ...)
        self.cam_ids = cam_ids
        self.g_cam = g_cam
        self.cam_mask = cam_mask
        self.pt_srt_cm = pt_srt_cm
        self.pt_ids = pt_ids
        self.p2c_tp = p2c_tp
        self.c2p_tp = c2p_tp
        self.cam_sorted2orig = cam_sorted2orig
        self.cam_orig2sorted = cam_orig2sorted
        self.pt_sorted2orig = pt_sorted2orig
        self.pt_orig2sorted = pt_orig2sorted
        # measurement pixels pre-gathered into each cam rectangle (state-
        # independent — hoisted out of the per-iteration linearize/error)
        self.uv_cm = uv_cm

    @property
    def CQ_total(self):
        return sum(cb * qb for cb, qb in self.cam_shapes)

    @property
    def PT_total(self):
        return sum(pb * tb for pb, tb in self.pt_shapes)

    def padding_waste(self, tiled: bool = True):
        """(cam_slots/M, point_slots/M) — the honesty metric. With
        tiled=True (default) it counts PHYSICAL tile-rounded slots (camera
        rectangles [C_b, Q_b] round to (8, 128); point rectangles [T_b, P_b]
        to (8, 128)) — what the TPU actually allocates and streams;
        tiled=False counts logical layout slots only."""
        if not tiled:
            return self.CQ_total / self.M, self.PT_total / self.M
        r = lambda v, t: -(-v // t) * t
        cam = sum(r(cb, 8) * r(qb, 128) for cb, qb in self.cam_shapes)
        pt = sum(r(tb, 8) * r(pb, 128) for pb, tb in self.pt_shapes)
        return cam / self.M, pt / self.M

    def tree_flatten(self):
        arrs = (self.cam_ids, self.g_cam, self.cam_mask, self.pt_srt_cm,
                self.pt_ids, self.p2c_tp, self.c2p_tp, self.cam_sorted2orig,
                self.cam_orig2sorted, self.pt_sorted2orig, self.pt_orig2sorted,
                self.uv_cm)
        return arrs, (self.C, self.P, self.M, self.cam_shapes, self.pt_shapes)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)

    @staticmethod
    def build(obs_cam, obs_point, C, P, max_cam_buckets=8, max_pt_buckets=6,
              dtype=np.float32, uv=None):
        cam = np.asarray(obs_cam, dtype=np.int64)
        pt = np.asarray(obs_point, dtype=np.int64)
        uv = None if uv is None else np.asarray(uv)
        M = cam.shape[0]

        def side(ids, n, max_b, entity_tile=8, width_tile=1):
            cnt = np.bincount(ids, minlength=n)
            order = np.argsort(-cnt, kind="stable")   # sorted2orig
            inv = np.empty(n, dtype=np.int64)
            inv[order] = np.arange(n)                 # orig2sorted
            plan = _plan_buckets(cnt[order], max_b, entity_tile, width_tile)
            # per-obs slot within its entity (stable, order of appearance)
            srt = inv[ids]
            o = np.argsort(srt, kind="stable")
            ofs = np.zeros(n + 1, dtype=np.int64)
            ofs[1:] = np.cumsum(cnt[order])
            pos = np.empty(M, dtype=np.int64)
            pos[o] = np.arange(M) - ofs[srt[o]]
            return cnt, order, inv, plan, srt, pos

        ccnt, corder, cinv, cplan, csrt, cpos = side(cam, C, max_cam_buckets,
                                                     entity_tile=8,
                                                     width_tile=128)
        # point rectangles are [T_b, P_b]: entities on the 128-lane axis,
        # width (track length) on the 8-row sublane axis (ADVICE r2)
        pcnt, porder, pinv, pplan, psrt, ppos = side(pt, P, max_pt_buckets,
                                                     entity_tile=128,
                                                     width_tile=8)

        cam_shapes = [(e - s, w) for s, e, w in cplan]
        pt_shapes = [(e - s, w) for s, e, w in pplan]

        # flat slot position of each obs in the concatenated cam space
        cofs = np.cumsum([0] + [cb * qb for cb, qb in cam_shapes])
        CQ_total = int(cofs[-1])
        cbin = np.zeros(C, dtype=np.int64)   # bucket of each sorted cam pos
        cstart = np.zeros(C, dtype=np.int64)
        for b, (s, e, w) in enumerate(cplan):
            cbin[s:e] = b
            cstart[s:e] = s
        ob_b = cbin[csrt]
        cam_flat = (cofs[ob_b] + (csrt - cstart[csrt])
                    * np.array([w for _, _, w in cplan])[ob_b] + cpos)

        pofs = np.cumsum([0] + [pb * tb for pb, tb in pt_shapes])
        PT_total = int(pofs[-1])
        pbin = np.zeros(P, dtype=np.int64)
        pstart = np.zeros(P, dtype=np.int64)
        for b, (s, e, w) in enumerate(pplan):
            pbin[s:e] = b
            pstart[s:e] = s
        ob_pb = pbin[psrt]
        # point rectangles are [T_b, P_b] (feature-major): slot (t, p_local)
        # -> pofs + t * P_b + p_local
        Pb_of = np.array([pb for pb, _ in pt_shapes])[ob_pb]
        pt_flat = pofs[ob_pb] + ppos * Pb_of + (psrt - pstart[psrt])

        j = jnp.asarray
        cam_ids, g_cam, cam_mask, pt_srt_cm, c2p_tp = [], [], [], [], []
        uv_cm = []
        for b, (s, e, w) in enumerate(cplan):
            cb = e - s
            sel = ob_b == b
            slot_local = ((csrt[sel] - s) * w + cpos[sel])
            g = np.full(cb * w, M, dtype=np.int64)
            g[slot_local] = np.nonzero(sel)[0]
            mask = np.zeros(cb * w, dtype=dtype)
            mask[slot_local] = 1.0
            psc = np.full(cb * w, P, dtype=np.int64)
            psc[slot_local] = psrt[sel]
            cp = np.full(cb * w, PT_total, dtype=np.int64)
            cp[slot_local] = pt_flat[sel]
            cam_ids.append(j(corder[s:e].astype(np.int32)))
            g_cam.append(j(g))
            cam_mask.append(j(mask))
            pt_srt_cm.append(j(psc))
            c2p_tp.append(j(cp))
            if uv is not None:
                uvb = np.zeros((2, cb * w), dtype=dtype)
                uvb[:, slot_local] = uv[sel].T
                uv_cm.append(j(uvb))

        pt_ids, p2c_tp = [], []
        for b, (s, e, w) in enumerate(pplan):
            pb = e - s
            sel = ob_pb == b
            slot_local = ppos[sel] * pb + (psrt[sel] - s)
            pc = np.full(w * pb, CQ_total, dtype=np.int64)
            pc[slot_local] = cam_flat[sel]
            pt_ids.append(j(porder[s:e].astype(np.int32)))
            p2c_tp.append(j(pc.reshape(w, pb)))

        return BucketLayout(
            C, P, M, cam_shapes, pt_shapes, tuple(cam_ids), tuple(g_cam),
            tuple(cam_mask), tuple(pt_srt_cm), tuple(pt_ids), tuple(p2c_tp),
            tuple(c2p_tp), j(corder.astype(np.int32)),
            j(cinv.astype(np.int32)), j(porder.astype(np.int32)),
            j(pinv.astype(np.int32)),
            tuple(uv_cm) if uv is not None else None)


# ---------------------------------------------------------------------------
# solver over the bucketed layout (math == sfm/ba.py:solve_ba_step_cm)
# ---------------------------------------------------------------------------

def _analytic_rJ(posesT, calsT, pts_cm, uv_cm, dtype, eps=1e-8):
    """Closed-form reprojection residual + Jacobians on the flat slot axis,
    fully unrolled into elementwise ops (no einsum/matmul — the measured TPU
    precision/tile rules, PERFORMANCE.md). Exactly the jacfwd-through-
    retraction values (oracle-tested), ~4x cheaper: one projection pass
    instead of 12 tangent-seed chain evaluations.

    Chain (right retraction pose*Exp(xi), xi=(omega, v), Pose3.h:147):
      pc = R^T (p - t);  d pc/d omega = [pc]x,  d pc/d v = -I,  d pc/dp = R^T
      pn = (x/z, y/z);   d pn/d pc = 1/z [[1,0,-pn_x],[0,1,-pn_y]]
      uv = f g(r2) pn,   g = 1 + k1 r2 + k2 r2^2  (Cal3Bundler::uncalibrate)
    Returns r [2, S], Jc [2, 9, S], Jp [2, 3, S], depth [S]."""
    R = posesT[:, :3]                         # [3, 3, S] (rows i, cols j)
    t = posesT[:, 3]                          # [3, S]
    f, k1, k2 = calsT[0], calsT[1], calsT[2]
    d = [pts_cm[j] - t[j] for j in range(3)]
    pc = [sum(R[j][i] * d[j] for j in range(3)) for i in range(3)]  # R^T d
    x, y, z = pc
    z_safe = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    iz = 1.0 / z_safe
    nx, ny = x * iz, y * iz
    r2 = nx * nx + ny * ny
    g = 1.0 + r2 * (k1 + k2 * r2)
    G = f * g
    h = 2.0 * f * (k1 + 2.0 * k2 * r2)        # d(f g)/d r2 * 2
    # A = d uv / d pn  [2x2]
    A00 = G + h * nx * nx
    A01 = h * nx * ny
    A11 = G + h * ny * ny
    # B = A @ (d pn / d pc)  [2x3]
    B = [[A00 * iz, A01 * iz, -(A00 * nx + A01 * ny) * iz],
         [A01 * iz, A11 * iz, -(A01 * nx + A11 * ny) * iz]]
    r = jnp.stack([G * nx - uv_cm[0], G * ny - uv_cm[1]])
    Jc_rows = []
    for i in range(2):
        Bi0, Bi1, Bi2 = B[i]
        Jc_rows.append(jnp.stack([
            Bi1 * z - Bi2 * y,                # d/d omega_x  (B @ [pc]x)
            -Bi0 * z + Bi2 * x,               # d/d omega_y
            Bi0 * y - Bi1 * x,                # d/d omega_z
            -Bi0, -Bi1, -Bi2,                 # d/d v
            g * (nx if i == 0 else ny),       # d/d f
            f * r2 * (nx if i == 0 else ny),  # d/d k1
            f * r2 * r2 * (nx if i == 0 else ny),  # d/d k2
        ]))
    Jc = jnp.stack(Jc_rows)                   # [2, 9, S]
    Jp = jnp.stack([jnp.stack([
        sum(B[i][j] * R[k][j] for j in range(3)) for k in range(3)])
        for i in range(2)])                   # [2, 3, S]  (B @ R^T)
    return r, Jc, Jp, z


def linearize_ba_bl(state: BAState, obs: BAObservations, bl: BucketLayout,
                    analytic: bool = True):
    """Per-bucket cam-major linearization. Returns lists (per cam bucket) of
    r [2, C_b, Q_b], Jc [2, 9, C_b, Q_b], Jp [2, 3, C_b, Q_b]. Camera data is
    broadcast-tiled per bucket and everything runs FLAT over C_b*Q_b — see
    the TPU nested-vmap corruption note in sfm/ba.py:linearize_ba_cm.
    `analytic=True` (default) uses the closed-form Jacobians (_analytic_rJ);
    analytic=False keeps the jacfwd oracle path."""
    dtype = state.points.dtype
    pts_sorted = state.points[bl.pt_sorted2orig]         # [P, 3] sorted order
    pts_pad = jnp.concatenate([pts_sorted.T,
                               jnp.zeros((3, 1), dtype=dtype)], axis=1)
    uv_pad = jnp.concatenate([obs.uv.T, jnp.zeros((2, 1), dtype=dtype)], axis=1)
    zeros = (jnp.zeros(9, dtype=dtype), jnp.zeros(3, dtype=dtype))

    def one(pose, cal, point, uv):
        r = _residual_local(zeros, pose, cal, point, uv)
        Jc, Jp = jax.jacfwd(_residual_local, argnums=0)(zeros, pose, cal,
                                                        point, uv)
        depth = cam_geo.depth_of(pose, point)
        return r, Jc, Jp, depth

    outs = []
    for b, (cb, qb) in enumerate(bl.cam_shapes):
        cq = cb * qb
        posesT = jnp.broadcast_to(
            state.cam_poses.transpose(1, 2, 0)[:, :, bl.cam_ids[b]][:, :, :, None],
            (3, 4, cb, qb)).reshape(3, 4, cq)
        calsT = jnp.broadcast_to(
            state.cam_cals.T[:, bl.cam_ids[b]][:, :, None],
            (3, cb, qb)).reshape(3, cq)
        pts_cm = pts_pad[:, bl.pt_srt_cm[b]]
        uv_cm = (bl.uv_cm[b].astype(dtype) if bl.uv_cm is not None
                 else uv_pad[:, bl.g_cam[b]])
        if analytic:
            r, Jc, Jp, depth = _analytic_rJ(posesT, calsT, pts_cm, uv_cm,
                                            dtype)
        else:
            r, Jc, Jp, depth = jax.vmap(one, in_axes=(-1, -1, -1, -1),
                                        out_axes=(-1, -1, -1, -1))(
                posesT, calsT, pts_cm, uv_cm)
        w = (depth > 1e-6).astype(dtype) * bl.cam_mask[b]
        outs.append(((r * w).reshape(2, cb, qb),
                     (Jc * w).reshape(2, 9, cb, qb),
                     (Jp * w).reshape(2, 3, cb, qb)))
    return outs


def ba_error_bl(state: BAState, obs: BAObservations, bl: BucketLayout):
    dtype = state.points.dtype
    pts_sorted = state.points[bl.pt_sorted2orig]
    pts_pad = jnp.concatenate([pts_sorted.T,
                               jnp.zeros((3, 1), dtype=dtype)], axis=1)
    uv_pad = jnp.concatenate([obs.uv.T, jnp.zeros((2, 1), dtype=dtype)], axis=1)

    # NOTE: the vmapped matmul chain measured 2.5x FASTER than the unrolled
    # elementwise residual here (10.8 vs 27.7 ms at Ladybug scale): the
    # R^T d contraction lowers onto the MXU under vmap, and the error path
    # has no Jacobian seeds to amortize. Keep vmap for error, analytic for
    # linearize (PERFORMANCE.md round 3).
    def one(pose, cal, point, uv):
        return _residual_one(pose, cal, point, uv), cam_geo.depth_of(pose, point)

    total = jnp.zeros((), dtype=dtype)
    for b, (cb, qb) in enumerate(bl.cam_shapes):
        cq = cb * qb
        posesT = jnp.broadcast_to(
            state.cam_poses.transpose(1, 2, 0)[:, :, bl.cam_ids[b]][:, :, :, None],
            (3, 4, cb, qb)).reshape(3, 4, cq)
        calsT = jnp.broadcast_to(
            state.cam_cals.T[:, bl.cam_ids[b]][:, :, None],
            (3, cb, qb)).reshape(3, cq)
        uv_b = (bl.uv_cm[b].astype(dtype) if bl.uv_cm is not None
                else uv_pad[:, bl.g_cam[b]])
        r, depth = jax.vmap(one, in_axes=(-1, -1, -1, -1), out_axes=(-1, -1))(
            posesT, calsT, pts_pad[:, bl.pt_srt_cm[b]], uv_b)
        w = (depth > 1e-6).astype(dtype) * bl.cam_mask[b]
        r = r * w
        total = total + 0.5 * jnp.sum(r * r)
    return total


def solve_ba_step_bl(state: BAState, obs: BAObservations, bl: BucketLayout,
                     lam, cg_maxiter=100, cg_tol=1e-6):
    """Implicit-Schur PCG step over the bucketed layout. Global vectors are
    SORTED order internally; returns (delta_cam [C, 9], delta_point [P, 3])
    in ORIGINAL order."""
    C, P = bl.C, bl.P
    dtype = state.points.dtype
    lin = linearize_ba_bl(state, obs, bl)
    Jc_b = [t[1] for t in lin]                            # [2,9,C_b,Q_b]
    r_b = [t[0] for t in lin]                             # [2,C_b,Q_b]
    Jp_cm_b = [t[2] for t in lin]                         # [2,3,C_b,Q_b]
    coffs = np.cumsum([0] + [cb for cb, _ in bl.cam_shapes])
    poffs = np.cumsum([0] + [pb for pb, _ in bl.pt_shapes])

    def cam_to_point(xs):
        """list per cam bucket of [k, C_b, Q_b] -> list per point bucket of
        [k, T_b, P_b] via the fixed flat permutation."""
        k = xs[0].shape[0]
        flat = jnp.concatenate(
            [x.reshape(k, -1) for x in xs] + [jnp.zeros((k, 1), dtype=dtype)],
            axis=1)
        return [flat[:, bl.p2c_tp[b]] for b in range(len(bl.pt_shapes))]

    def point_to_cam(xs):
        k = xs[0].shape[0]
        flat = jnp.concatenate(
            [x.reshape(k, -1) for x in xs] + [jnp.zeros((k, 1), dtype=dtype)],
            axis=1)
        return [flat[:, bl.c2p_tp[b]].reshape(k, cb, qb)
                for b, (cb, qb) in enumerate(bl.cam_shapes)]

    # point-major copies of the point-side quantities (one permutation)
    pm = cam_to_point([jnp.concatenate([Jp.reshape(6, cb, qb), r], axis=0)
                       for Jp, r, (cb, qb)
                       in zip(Jp_cm_b, r_b, bl.cam_shapes)])
    Jp4_b = [x[:6].reshape(2, 3, *x.shape[1:]) for x in pm]  # [2,3,T_b,P_b]
    r_pm_b = [x[6:] for x in pm]                             # [2,T_b,P_b]

    def cam_apply(x):                                     # [9, C] -> buckets
        return [jnp.stack([
            sum(Jc[i, j] * x[j, coffs[b]:coffs[b + 1]][:, None]
                for j in range(9)) for i in range(2)])
            for b, Jc in enumerate(Jc_b)]

    def cam_reduce(us):                                   # buckets -> [9, C]
        return jnp.concatenate([jnp.stack([
            sum(jnp.sum(Jc[i, j] * u[i], axis=-1) for i in range(2))
            for j in range(9)]) for Jc, u in zip(Jc_b, us)], axis=1)

    def pt_reduce(aps):                                   # buckets -> [3, P]
        return jnp.concatenate([jnp.stack([
            sum(jnp.sum(Jp[i, k] * ap[i], axis=0) for i in range(2))
            for k in range(3)]) for Jp, ap in zip(Jp4_b, aps)], axis=1)

    def pt_apply(u):                                      # [3, P] -> buckets
        return [jnp.stack([
            sum(Jp[i, k] * u[k, poffs[b]:poffs[b + 1]][None, :]
                for k in range(3)) for i in range(2)])
            for b, Jp in enumerate(Jp4_b)]

    Hpp = jnp.concatenate([jnp.stack([
        sum(jnp.sum(Jp[i, k] * Jp[i, l], axis=0) for i in range(2))
        for k in range(3) for l in range(3)]) for Jp in Jp4_b], axis=1)
    Hpp = bk.add_scaled_identity_33_T(Hpp, lam + 1e-10)
    HppInv = bk.sym33_inv_T(Hpp)                          # [9, P] sorted

    gc = cam_reduce(r_b)                                  # [9, C] sorted
    gp = pt_reduce(r_pm_b)                                # [3, P] sorted

    hp = bk.sym33_matvec_T(HppInv, gp)
    b_rhs = -gc + cam_reduce(point_to_cam(pt_apply(hp)))

    def schur_matvec(x):
        a = cam_apply(x)
        t = pt_reduce(cam_to_point(a))
        u = bk.sym33_matvec_T(HppInv, t)
        bc = point_to_cam(pt_apply(u))
        y = cam_reduce([ab - bcb for ab, bcb in zip(a, bc)])
        return y + lam * x

    # block-Jacobi preconditioner of S per camera (dense over each Q_b)
    HppInv_pad = jnp.concatenate([HppInv,
                                  jnp.zeros((9, 1), dtype=dtype)], axis=1)
    Hcc_parts, Gc_parts = [], []
    for bidx, ((cb, qb), Jc, Jp_cm) in enumerate(
            zip(bl.cam_shapes, Jc_b, Jp_cm_b)):
        Hcc_parts.append(jnp.stack([
            sum(jnp.sum(Jc[i, j] * Jc[i, k], axis=-1) for i in range(2))
            for j in range(9) for k in range(9)]).T.reshape(cb, 9, 9))
        Wt = [sum(Jc[i, a] * Jp_cm[i, bb] for i in range(2))
              for a in range(9) for bb in range(3)]       # 27 x [C_b, Q_b]
        Hi = HppInv_pad[:, bl.pt_srt_cm[bidx]].reshape(9, cb, qb)
        T1 = [sum(Wt[3 * a + bb] * Hi[3 * bb + c] for bb in range(3))
              for a in range(9) for c in range(3)]
        Gc_parts.append(jnp.stack([
            sum(jnp.sum(T1[3 * a + c] * Wt[3 * d + c], axis=-1)
                for c in range(3))
            for a in range(9) for d in range(9)]).T.reshape(cb, 9, 9))
    Hcc = jnp.concatenate(Hcc_parts)
    Gc = jnp.concatenate(Gc_parts)
    eye9 = jnp.eye(9, dtype=dtype)
    Ls = bk.safe_chol_blocks(Hcc - Gc, lam)
    cho_apply = jax.vmap(lambda L, x: jax.scipy.linalg.cho_solve((L, True), x))
    precond = lambda x: cho_apply(Ls, x.T).T              # x [9, C]

    xc = pcg(schur_matvec, b_rhs, precond, cg_maxiter, cg_tol)

    t = pt_reduce(cam_to_point(cam_apply(xc)))
    xp = bk.sym33_matvec_T(HppInv, -gp - t)               # [3, P] sorted
    # back to original order (permutation gathers)
    xc_orig = xc.T[bl.cam_orig2sorted]                    # [C, 9]
    xp_orig = xp.T[bl.pt_orig2sorted]                     # [P, 3]
    return xc_orig, xp_orig


def retract_ba(state: BAState, xc, xp) -> BAState:
    new_poses = jax.vmap(se3.retract)(state.cam_poses, xc[:, :6])
    return BAState(new_poses, state.cam_cals + xc[:, 6:9], state.points + xp)


@partial(jax.jit, static_argnames=("cg_maxiter",))
def ba_try_step_bl(state: BAState, obs: BAObservations, bl: BucketLayout,
                   lam, cg_maxiter=100):
    xc, xp = solve_ba_step_bl(state, obs, bl, lam, cg_maxiter=cg_maxiter)
    new_state = retract_ba(state, xc, xp)
    return new_state, ba_error_bl(new_state, obs, bl)


def _lm_iter_body(state: BAState, obs: BAObservations, bl: BucketLayout,
                  lam, err, cg_maxiter, lam_lo, lam_hi):
    xc, xp = solve_ba_step_bl(state, obs, bl, lam, cg_maxiter=cg_maxiter)
    trial = retract_ba(state, xc, xp)
    err_t = ba_error_bl(trial, obs, bl)
    ok = jnp.isfinite(err_t) & (err_t < err)
    new_state = jax.tree.map(
        lambda a, b: jnp.where(ok, a, b), trial, state)
    new_err = jnp.where(ok, err_t, err)
    new_lam = jnp.where(ok, jnp.maximum(lam * 0.5, lam_lo),
                        jnp.minimum(lam * 4.0, lam_hi))
    return new_state, new_lam, new_err


@partial(jax.jit, static_argnames=("cg_maxiter",))
def ba_lm_iter_bl(state: BAState, obs: BAObservations, bl: BucketLayout,
                  lam, err, cg_maxiter=100,
                  lam_lo=1e-6, lam_hi=1e3):
    """One FULL Levenberg-Marquardt iteration entirely on device: damped
    solve + retract trial + error + accept/reject + lambda update (the
    reference's tryLambda semantics, LevenbergMarquardtOptimizer.cpp:121 —
    reject restores the old state and raises lambda). Carry (state, lam,
    err) through repeated calls with NO host synchronization; unlike a
    fixed-lambda try-step sequence this cannot diverge, so it is the honest
    thing to time (bench.py)."""
    return _lm_iter_body(state, obs, bl, lam, err, cg_maxiter, lam_lo, lam_hi)


@partial(jax.jit, static_argnames=("n_iters", "cg_maxiter"))
def ba_lm_run_bl(state: BAState, obs: BAObservations, bl: BucketLayout,
                 lam, err, n_iters, cg_maxiter=100,
                 lam_lo=1e-6, lam_hi=1e3):
    """`n_iters` full LM iterations in ONE dispatch: lax.scan over the
    ba_lm_iter_bl body. On the axon tunnel each dispatch pays tens of ms of
    host round-trip latency; a per-iteration dispatch loop therefore times
    tunnel jitter, not the chip (BENCH_r03 recorded 110 ms/iter for work the
    device does in ~77 ms). One scan amortizes that latency across all
    iterations — and is how a real user runs the optimizer anyway
    (optimize_lm_jit)."""
    def body(carry, _):
        st, lm, er = carry
        return _lm_iter_body(st, obs, bl, lm, er,
                             cg_maxiter, lam_lo, lam_hi), None
    (st, lm, er), _ = jax.lax.scan(body, (state, lam, err), None,
                                   length=n_iters)
    return st, lm, er


def make_bucket_layout(obs: BAObservations, C: int, P: int, **kw):
    kw.setdefault("uv", np.asarray(obs.uv))
    return BucketLayout.build(np.asarray(obs.cam), np.asarray(obs.point),
                              C, P, **kw)
