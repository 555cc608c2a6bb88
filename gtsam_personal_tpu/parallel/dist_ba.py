"""Distributed bundle adjustment with EXPLICIT collectives (shard_map + psum).

The north-star distribution recipe (BASELINE.md, SURVEY §2.11 P5/P6) made
explicit: cameras (and their observations) are sharded across the device
mesh; landmarks are replicated. Each device

  - linearizes ONLY its cameras' observations (cam-major layout, the
    broadcast-tiled vmap of sfm/ba.py:linearize_ba_cm, so no per-obs camera
    gathers),
  - computes its PARTIAL landmark-side reductions (Hpp blocks, gp, and the
    E^T a products inside the implicit-Schur matvec), which are all-reduced
    with `lax.psum` over the mesh axis — the "reduced camera system assembled
    via psum" step,
  - eliminates landmarks locally against the replicated psum'd Hpp^{-1}
    (per-block camera-landmark elimination is device-local),
  - runs PCG on its local camera block of the Schur system, with the CG dot
    products psum'd so every device agrees on step sizes.

The camera solution comes back sharded ([Cpad, 9] with leading axis laid out
over the mesh); the landmark back-substitution is ownership-partitioned.
Landmarks are reordered so the Ps points covisible from >1 device's camera
block (the "boundary", small under real covisibility locality) form a
prefix; per CG iteration the collective is ONE [3, Ps] psum + 2 scalar
psums, and exclusive landmarks never travel — SURVEY §7's "landmarks are
block-local by construction from track partitioning" made literal. One
ownership-masked [3, P] psum at the end assembles the global landmark
update.

Reference analogue: the same Schur algebra as RegularImplicitSchurFactor
(slam/RegularImplicitSchurFactor.h) — there single-address-space, here
explicitly distributed. `parallel/ba_sharded.py` keeps the GSPMD
auto-propagated variant; this module is the explicit-schedule one whose
compute/collective split is measurable (collective_overhead).
Note on layouts: each device's shard keeps the UNIFORM dual cam/point
rectangles (common Q, T across devices) rather than the packed-tile layout
of sfm/ba_pack.py — shard_map requires ONE program across all devices, and
the packed layout's class structure is problem-shard-specific (different
rowsC/PTC/classes per shard would be different programs). The padding cost
is bounded by per-shard skew; the single-chip flagship path uses the packed
engine.
"""

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P_
from jax import shard_map

from gtsam_personal_tpu.sfm import ba, ba_kernels as bk
from gtsam_personal_tpu.geometry import se3, cameras as cam_geo


class DistBALayout(NamedTuple):
    """Per-device cam-major/point-major dual layouts, stacked on a leading
    mesh axis. Static dims in `dims` = (n, Cl, Q, T, P, Ps, pt_offs).

    Points are reordered by OWNERSHIP (SURVEY §7: landmarks are block-local
    by construction from track partitioning): the Ps points observed from
    cameras of more than one device ("boundary" landmarks) come first, then
    each device's exclusive points contiguously (pt_offs[d]..pt_offs[d+1]).
    Only the boundary prefix needs the per-CG-iteration psum; exclusive
    points' aggregates are complete device-locally."""
    uv_cm: jnp.ndarray      # [n, 2, Cl*Q]
    pt_of_cm: jnp.ndarray   # [n, Cl*Q] DIST point id per local cam slot (P = dead)
    cam_mask: jnp.ndarray   # [n, Cl*Q]
    p2c_tp: jnp.ndarray     # [n, T, P] local cam flat pos per (t,p) (dead = Cl*Q)
    c2p_tp: jnp.ndarray     # [n, Cl*Q] (t,p) flat pos per cam slot (dead = T*P)
    pt_perm: jnp.ndarray    # [P] dist order -> original point id
    pt_inv: jnp.ndarray     # [P] original point id -> dist order
    dims: tuple             # static (n, Cl, Q, T, P, Ps, pt_offs[n+1])


def pad_cameras(state: ba.BAState, n: int) -> ba.BAState:
    """Pad camera count to a multiple of n with identity cameras (no
    observations reference them; damping keeps them fixed)."""
    C = state.cam_poses.shape[0]
    Cl = -(-C // n)
    pad = n * Cl - C
    if pad == 0:
        return state
    dtype = state.cam_poses.dtype
    eye = jnp.broadcast_to(jnp.eye(3, 4, dtype=dtype), (pad, 3, 4))
    cal = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], dtype=dtype), (pad, 3))
    return ba.BAState(jnp.concatenate([state.cam_poses, eye]),
                      jnp.concatenate([state.cam_cals, cal]), state.points)


def build_dist_layout(obs: ba.BAObservations, C: int, P: int, n: int,
                      dtype=np.float32,
                      partition_points: bool = True) -> DistBALayout:
    """Host-side: deal observations to the device owning their camera and
    build one cam-major/point-major dual layout per device, padded to common
    (Q, T) widths so every device runs the identical program.

    With `partition_points` (default), points are reordered so multi-device
    ("boundary") points form a prefix of size Ps and each device's exclusive
    points are contiguous — the per-CG-iteration landmark psum then covers
    only the boundary prefix. partition_points=False keeps the old
    all-points-shared behavior (Ps = P)."""
    cam = np.asarray(obs.cam, dtype=np.int64)
    pt_orig = np.asarray(obs.point, dtype=np.int64)
    uv = np.asarray(obs.uv)
    Cl = -(-C // n)
    dev = cam // Cl

    # --- point ownership reorder: [boundary | dev0-exclusive | ...] ---
    if partition_points:
        dmin = np.full(P, n, dtype=np.int64)
        dmax = np.full(P, -1, dtype=np.int64)
        np.minimum.at(dmin, pt_orig, dev)
        np.maximum.at(dmax, pt_orig, dev)
        observed = dmax >= 0
        shared = observed & (dmin != dmax)
        # unobserved points carry no information and need no collective:
        # park them in device 0's exclusive range, NOT the boundary prefix
        # (boundary points are psum'd EVERY CG iteration — dead/padded slots
        # there silently inflate the per-iter collective payload)
        owner = np.where(shared, -1, np.where(observed, dmin, 0))
        order = []
        boundary_ids = np.where(owner < 0)[0]
        order.append(boundary_ids)
        pt_offs = [len(boundary_ids)]
        for d in range(n):
            ids = np.where(owner == d)[0]
            order.append(ids)
            pt_offs.append(pt_offs[-1] + len(ids))
        pt_perm = np.concatenate(order)                 # dist -> orig
        Ps = int(pt_offs[0])
        pt_offs = tuple([0] + pt_offs)                  # [0, Ps, ..., P]
    else:
        pt_perm = np.arange(P, dtype=np.int64)
        Ps = P
        pt_offs = tuple([0, P] + [P] * n)
    pt_inv = np.empty(P, dtype=np.int64)
    pt_inv[pt_perm] = np.arange(P)
    pt = pt_inv[pt_orig]                                # DIST point ids

    sels = [np.where(dev == d)[0] for d in range(n)]
    Q = max(1, max((np.bincount(cam[s] - d * Cl, minlength=Cl).max() if s.size
                    else 0) for d, s in enumerate(sels)))
    T = max(1, max((np.bincount(pt[s], minlength=P).max() if s.size else 0)
                   for s in sels))

    uv_cm = np.zeros((n, 2, Cl * Q), dtype=dtype)
    pt_of = np.full((n, Cl * Q), P, dtype=np.int64)
    mask = np.zeros((n, Cl * Q), dtype=dtype)
    p2c_tp = np.full((n, T, P), Cl * Q, dtype=np.int64)
    c2p_tp = np.full((n, Cl * Q), T * P, dtype=np.int64)

    for d, s in enumerate(sels):
        if not s.size:
            continue
        cam_l, pt_l, uv_l = cam[s] - d * Cl, pt[s], uv[s]
        Ml = s.size

        def slots(ids, width, count):
            order = np.argsort(ids, kind="stable")
            ofs = np.zeros(count + 1, dtype=np.int64)
            ofs[1:] = np.cumsum(np.bincount(ids, minlength=count))
            pos = np.empty(Ml, dtype=np.int64)
            pos[order] = np.arange(Ml) - ofs[ids[order]]
            return ids * width + pos

        slot_c = slots(cam_l, Q, Cl)
        slot_p = slots(pt_l, T, P)
        uv_cm[d][:, slot_c] = uv_l.T
        pt_of[d][slot_c] = pt_l
        mask[d][slot_c] = 1.0
        p2c = np.full(P * T, Cl * Q, dtype=np.int64)
        p2c[slot_p] = slot_c
        p2c_tp[d] = p2c.reshape(P, T).T
        c2p_tp[d][slot_c] = (slot_p % T) * P + slot_p // T

    j = jnp.asarray
    return DistBALayout(j(uv_cm), j(pt_of), j(mask), j(p2c_tp), j(c2p_tp),
                        j(pt_perm), j(pt_inv),
                        (n, Cl, Q, T, P, Ps, pt_offs))


def _solve_body(dims, axis, cg_maxiter, cg_tol, skip_collectives,
                poses, cals, points, lam,
                uv_cm, pt_of_cm, cam_mask, p2c_tp, c2p_tp, pt_perm, pt_inv):
    """Per-device distributed Schur-PCG camera solve + landmark backsub.
    Mirrors sfm/ba.py:solve_ba_step_cm with psum at the landmark aggregates.
    Landmark arrays live in DIST (ownership) order: only the boundary prefix
    [.., :Ps] is all-reduced; exclusive points' partial sums are already
    complete on their owner device."""
    n, Cl, Q, T, P, Ps, pt_offs = dims
    CQ = Cl * Q
    dtype = points.dtype
    sq = lambda x: x.reshape(x.shape[1:])
    uv_cm, pt_of_cm, cam_mask = sq(uv_cm), sq(pt_of_cm), sq(cam_mask)
    p2c_tp, c2p_tp = sq(p2c_tp), sq(c2p_tp)
    psum = ((lambda x: x) if skip_collectives
            else (lambda x: lax.psum(x, axis)))

    def psum_pts(x):
        """All-reduce ONLY the boundary-landmark prefix of a [k, P] dist-
        order array (the per-iteration collective payload)."""
        if skip_collectives or Ps == 0:
            return x
        if Ps == P:
            return lax.psum(x, axis)
        return jnp.concatenate(
            [lax.psum(x[:, :Ps], axis), x[:, Ps:]], axis=1)

    d = lax.axis_index(axis)
    points = points[pt_perm]                                  # dist order
    poses_l = lax.dynamic_slice_in_dim(poses, d * Cl, Cl)     # [Cl, 3, 4]
    cals_l = lax.dynamic_slice_in_dim(cals, d * Cl, Cl)       # [Cl, 3]

    # ---- local cam-major linearization (broadcast-tiled flat vmap; the
    # in_axes=None nested-vmap TPU corruption rule applies — see
    # linearize_ba_cm) ----
    posesT = jnp.broadcast_to(poses_l.transpose(1, 2, 0)[:, :, :, None],
                              (3, 4, Cl, Q)).reshape(3, 4, CQ)
    calsT = jnp.broadcast_to(cals_l.T[:, :, None], (3, Cl, Q)).reshape(3, CQ)
    pts_pad = jnp.concatenate([points.T, jnp.zeros((3, 1), dtype=dtype)], axis=1)
    pts_cm = pts_pad[:, pt_of_cm]                             # [3, CQ]
    zeros = (jnp.zeros(9, dtype=dtype), jnp.zeros(3, dtype=dtype))

    def one(pose, cal, point, uv):
        r = ba._residual_local(zeros, pose, cal, point, uv)
        Jc, Jp = jax.jacfwd(ba._residual_local, argnums=0)(
            zeros, pose, cal, point, uv)
        return r, Jc, Jp, cam_geo.depth_of(pose, point)

    r, Jc, Jp, depth = jax.vmap(one, in_axes=(-1, -1, -1, -1),
                                out_axes=(-1, -1, -1, -1))(
        posesT, calsT, pts_cm, uv_cm)
    w = (depth > 1e-6).astype(dtype) * cam_mask
    r_cm = (r * w).reshape(2, Cl, Q)
    Jc4 = (Jc * w).reshape(2, 9, Cl, Q)
    Jp_cm = (Jp * w).reshape(2, 3, Cl, Q)

    def cam_to_point(x_cq):                                   # [k,Cl,Q]->[k,T,P]
        k = x_cq.shape[0]
        flat = jnp.concatenate([x_cq.reshape(k, CQ),
                                jnp.zeros((k, 1), dtype=dtype)], axis=1)
        return flat[:, p2c_tp]

    def point_to_cam(x_tp):                                   # [k,T,P]->[k,Cl,Q]
        k = x_tp.shape[0]
        flat = jnp.concatenate([x_tp.reshape(k, T * P),
                                jnp.zeros((k, 1), dtype=dtype)], axis=1)
        return flat[:, c2p_tp].reshape(k, Cl, Q)

    pm = cam_to_point(jnp.concatenate([Jp_cm.reshape(6, Cl, Q), r_cm], axis=0))
    Jp4 = pm[:6].reshape(2, 3, T, P)                          # local pm Jacobians
    r_pm = pm[6:]

    def cam_apply(x):                                         # [9,Cl]->[2,Cl,Q]
        return jnp.stack([
            sum(Jc4[i, j] * x[j][:, None] for j in range(9)) for i in range(2)])

    def cam_reduce(u):                                        # [2,Cl,Q]->[9,Cl]
        return jnp.stack([
            sum(jnp.sum(Jc4[i, j] * u[i], axis=-1) for i in range(2))
            for j in range(9)])

    def pt_reduce_local(ap):                                  # [2,T,P]->[3,P]
        return jnp.stack([
            sum(jnp.sum(Jp4[i, k] * ap[i], axis=0) for i in range(2))
            for k in range(3)])

    def pt_apply(u):                                          # [3,P]->[2,T,P]
        return jnp.stack([
            sum(Jp4[i, k] * u[k][None, :] for k in range(3)) for i in range(2)])

    # ---- landmark system: partial sums -> boundary psum -> inverse ----
    # (valid for visible points on each device: exclusive points' sums are
    # locally complete, boundary points are all-reduced)
    Hpp = psum_pts(jnp.stack([
        sum(jnp.sum(Jp4[i, k] * Jp4[i, l], axis=0) for i in range(2))
        for k in range(3) for l in range(3)]))                # [9, P]
    Hpp = bk.add_scaled_identity_33_T(Hpp, lam + 1e-10)
    HppInv = bk.sym33_inv_T(Hpp)

    gc = cam_reduce(r_cm)                                     # [9, Cl] local
    gp = psum_pts(pt_reduce_local(r_pm))                      # [3, P]

    hp = bk.sym33_matvec_T(HppInv, gp)
    b = -gc + cam_reduce(point_to_cam(pt_apply(hp)))          # [9, Cl] local

    def schur_matvec(x):                                      # x [9, Cl] local
        a = cam_apply(x)
        t = psum_pts(pt_reduce_local(cam_to_point(a)))        # boundary-only
        u = bk.sym33_matvec_T(HppInv, t)
        bc = point_to_cam(pt_apply(u))
        return cam_reduce(a - bc) + lam * x

    # ---- exact per-camera block-Jacobi preconditioner (device-local) ----
    Hcc = jnp.stack([
        sum(jnp.sum(Jc4[i, j] * Jc4[i, k], axis=-1) for i in range(2))
        for j in range(9) for k in range(9)]).T.reshape(Cl, 9, 9)
    Wt = [sum(Jc4[i, a] * Jp_cm[i, bb] for i in range(2))
          for a in range(9) for bb in range(3)]
    HppInv_pad = jnp.concatenate([HppInv, jnp.zeros((9, 1), dtype=dtype)],
                                 axis=1)
    Hi = HppInv_pad[:, pt_of_cm].reshape(9, Cl, Q)
    T1 = [sum(Wt[3 * a + bb] * Hi[3 * bb + c] for bb in range(3))
          for a in range(9) for c in range(3)]
    Gc = jnp.stack([
        sum(jnp.sum(T1[3 * a + c] * Wt[3 * dd + c], axis=-1) for c in range(3))
        for a in range(9) for dd in range(9)]).T.reshape(Cl, 9, 9)
    Ls = bk.safe_chol_blocks(Hcc - Gc, lam)
    cho_apply = jax.vmap(lambda L, x: jax.scipy.linalg.cho_solve((L, True), x))
    precond = lambda x: cho_apply(Ls, x.T).T

    # ---- PCG with psum'd dot products ----
    # (collectives stay in the loop BODY; the condition reads a carried
    # replicated scalar — no psum inside `cond`)
    pdot = lambda a, bv: psum(jnp.vdot(a, bv))
    x0 = jnp.zeros_like(b)
    z0 = precond(b)
    rz0 = pdot(b, z0)
    bb = pdot(b, b)
    thr = (cg_tol ** 2) * bb

    def cond(s):
        k, x, rr, z, pp, rz, rr2 = s
        return jnp.logical_and(k < cg_maxiter, rr2 > thr)

    def body(s):
        k, x, rr, z, pp, rz, _ = s
        Ap = schur_matvec(pp)
        pAp = pdot(pp, Ap)
        alpha = jnp.where(pAp > 0, rz / jnp.where(pAp != 0, pAp, 1.0), 0.0)
        x = x + alpha * pp
        rr = rr - alpha * Ap
        z = precond(rr)
        rz_new = pdot(rr, z)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        return k + 1, x, rr, z, z + beta * pp, rz_new, pdot(rr, rr)

    _, xc, *_ = lax.while_loop(cond, body, (0, x0, b, z0, z0, rz0, bb))

    # ---- landmark back-substitution: each device solves its visible
    # points; ONE ownership-masked psum assembles the global solution
    # (boundary points identical on every device -> credited to device 0) ----
    t = psum_pts(pt_reduce_local(cam_to_point(cam_apply(xc))))
    xp = bk.sym33_matvec_T(HppInv, -gp - t)                   # [3, P] dist
    offs_arr = jnp.asarray(pt_offs, dtype=jnp.int32)
    p = jnp.arange(P, dtype=jnp.int32)
    lo = offs_arr[d + 1]
    hi = offs_arr[d + 2]
    owned = ((p >= lo) & (p < hi)) | ((p < Ps) & (d == 0))
    xp = psum(jnp.where(owned[None, :], xp, 0.0))
    xp = xp[:, pt_inv]                                        # back to orig order
    return xc.T, xp.T                                         # [Cl,9], [P,3]


def dist_solve_ba_step(state_pad: ba.BAState, dl: DistBALayout, lam,
                       mesh: Mesh, cg_maxiter=25, cg_tol=1e-6,
                       axis: str = "dp", skip_collectives: bool = False):
    """Camera-sharded implicit-Schur solve. Returns (xc [Cpad, 9] laid out
    over the mesh, xp [P, 3] replicated)."""
    body = partial(_solve_body, dl.dims, axis, cg_maxiter, cg_tol,
                   skip_collectives)
    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P_(), P_(), P_(), P_()) + (P_(axis),) * 5 + (P_(), P_()),
        out_specs=(P_(axis), P_()),
        check_vma=False)
    lam = jnp.asarray(lam, dtype=state_pad.points.dtype)
    return mapped(state_pad.cam_poses, state_pad.cam_cals, state_pad.points,
                  lam, dl.uv_cm, dl.pt_of_cm, dl.cam_mask, dl.p2c_tp,
                  dl.c2p_tp, dl.pt_perm, dl.pt_inv)


def dist_ba_try_step(state_pad: ba.BAState, obs: ba.BAObservations,
                     dl: DistBALayout, lam, mesh: Mesh, cg_maxiter=25):
    """One LM try step: distributed solve + retract + error."""
    xc, xp = dist_solve_ba_step(state_pad, dl, lam, mesh,
                                cg_maxiter=cg_maxiter)
    new_state = ba.retract_ba(state_pad, xc, xp)
    return new_state, ba.ba_error(new_state, obs)


def collective_overhead(state_pad, dl, mesh, lam=1e-4, cg_maxiter=10,
                        iters=3):
    """Compute/collective split proxy: time the real sharded solve vs the
    psum-free variant (identical FLOPs, zero communication)."""
    import time

    def run(skip):
        f = jax.jit(lambda s: dist_solve_ba_step(
            s, dl, lam, mesh, cg_maxiter=cg_maxiter, skip_collectives=skip))
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
