"""Dual dense observation layouts for bundle adjustment.

TPU gathers from small tables and scatter-adds (segment_sum) are slow; dense
broadcasts and reductions are fast. So observations are materialized twice:

- cam-major  [C, Q, ...]: all observations of camera c in row c (padded to the
  max per-camera count Q). Camera-side products become broadcasts over Q and
  dense reductions — no gather/scatter by camera id at all.
- point-major [P, T, ...]: likewise for landmarks (T = max track length).

A fixed permutation (computed host-side, once per problem) moves the small
[*, 2] intermediates between the two layouts inside the CG matvec.

This is the TPU answer to the reference's per-track CameraSet blocks
(geometry/CameraSet.h): same blocking, laid out for the vector units.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class BALayout:
    """Static dual-layout index plan for one observation structure."""

    def __init__(self, C, P, M, Q, T, g_cam, g_pt, p2c, c2p, pt_of_cm,
                 cam_mask, pt_mask, p2c_tp=None, c2p_tp=None):
        self.C, self.P, self.M, self.Q, self.T = C, P, M, Q, T
        self.g_cam = g_cam        # [C*Q] obs index per cam-major slot (M = dead)
        self.g_pt = g_pt          # [P*T] obs index per point-major slot
        self.p2c = p2c            # [P*T] cam-major flat pos per point-major slot (C*Q = dead)
        self.c2p = c2p            # [C*Q] point-major flat pos per cam-major slot
        self.pt_of_cm = pt_of_cm  # [C*Q] point id per cam-major slot (P = dead)
        self.cam_mask = cam_mask  # [C*Q] 1.0 for live slots
        self.pt_mask = pt_mask    # [P*T]
        self.p2c_tp = p2c_tp      # [T, P] cam-major flat pos per (t, p) slot
        self.c2p_tp = c2p_tp      # [C*Q] (t,p)-flat pos per cam-major slot

    def tree_flatten(self):
        arrs = (self.g_cam, self.g_pt, self.p2c, self.c2p, self.pt_of_cm,
                self.cam_mask, self.pt_mask, self.p2c_tp, self.c2p_tp)
        return arrs, (self.C, self.P, self.M, self.Q, self.T)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)

    @staticmethod
    def build(obs_cam: np.ndarray, obs_point: np.ndarray, C: int, P: int,
              dtype=np.float32) -> "BALayout":
        cam = np.asarray(obs_cam, dtype=np.int64)
        pt = np.asarray(obs_point, dtype=np.int64)
        M = cam.shape[0]

        def slots(ids, n):
            order = np.argsort(ids, kind="stable")
            cnt = np.bincount(ids, minlength=n)
            width = int(max(cnt.max(), 1))
            ofs = np.zeros(n + 1, dtype=np.int64)
            ofs[1:] = np.cumsum(cnt)
            pos = np.empty(M, dtype=np.int64)
            pos[order] = np.arange(M) - ofs[ids[order]]
            slot = ids * width + pos          # flat dense position per obs
            g = np.full(n * width, M, dtype=np.int64)
            g[slot] = np.arange(M)
            return width, slot, g

        Q, slot_c, g_cam = slots(cam, C)
        T, slot_p, g_pt = slots(pt, P)

        p2c = np.full(P * T, C * Q, dtype=np.int64)
        p2c[slot_p] = slot_c
        c2p = np.full(C * Q, P * T, dtype=np.int64)
        c2p[slot_c] = slot_p
        pt_of_cm = np.full(C * Q, P, dtype=np.int64)
        pt_of_cm[slot_c] = pt

        cam_mask = np.zeros(C * Q, dtype=dtype)
        cam_mask[slot_c] = 1.0
        pt_mask = np.zeros(P * T, dtype=dtype)
        pt_mask[slot_p] = 1.0

        j = jnp.asarray
        # feature-major variants: gather targets arranged so outputs tile as
        # (small, BIG): [T, P] for the point side, [C, Q] for the camera side.
        # cam->point perm producing [*, T, P]: source cam-major flat position
        # for output slot (t, p)
        p2c_tp = p2c.reshape(P, T).T.copy()              # [T, P]
        # point->cam perm producing [*, C, Q]: source must index the
        # (t, p)-ordered point flat layout
        slot_p_t = (slot_p % T) * P + (slot_p // T)      # obs -> (t,p) flat
        c2p_tp = np.full(C * Q, P * T, dtype=np.int64)
        c2p_tp[slot_c] = slot_p_t
        return BALayout(C, P, M, Q, T, j(g_cam), j(g_pt), j(p2c), j(c2p),
                        j(pt_of_cm), j(cam_mask), j(pt_mask),
                        j(p2c_tp), j(c2p_tp))

    # ---- device-side layout operations ----
    def to_cam_major(self, x_obs, fill=0.0):
        """[M, k] obs-order -> [C, Q, k] dense (dead slots = fill)."""
        pad = jnp.full((1,) + x_obs.shape[1:], fill, dtype=x_obs.dtype)
        xp = jnp.concatenate([x_obs, pad], axis=0)
        return xp[self.g_cam].reshape(self.C, self.Q, *x_obs.shape[1:])

    def to_point_major(self, x_obs, fill=0.0):
        pad = jnp.full((1,) + x_obs.shape[1:], fill, dtype=x_obs.dtype)
        xp = jnp.concatenate([x_obs, pad], axis=0)
        return xp[self.g_pt].reshape(self.P, self.T, *x_obs.shape[1:])

    def perm_point_to_cam(self, x_pm):
        """[P, T, k] -> [C, Q, k] via the fixed permutation."""
        k = x_pm.shape[-1]
        flat = x_pm.reshape(self.P * self.T, k)
        flat = jnp.concatenate([flat, jnp.zeros((1, k), dtype=x_pm.dtype)])
        return flat[self.c2p].reshape(self.C, self.Q, k)

    def perm_cam_to_point(self, x_cm):
        k = x_cm.shape[-1]
        flat = x_cm.reshape(self.C * self.Q, k)
        flat = jnp.concatenate([flat, jnp.zeros((1, k), dtype=x_cm.dtype)])
        return flat[self.p2c].reshape(self.P, self.T, k)

    def gather_points_cm(self, x_pt):
        """[P, k] per-point values -> [C, Q, k] (dead slots zero)."""
        xp = jnp.concatenate([x_pt, jnp.zeros((1, x_pt.shape[1]), dtype=x_pt.dtype)])
        return xp[self.pt_of_cm].reshape(self.C, self.Q, x_pt.shape[1])
