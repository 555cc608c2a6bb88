"""ISAM2 — bounded-cost incremental smoothing, TPU-native.

The reference's ISAM2 (nonlinear/ISAM2.h:151, ISAM2.cpp:419) keeps a Bayes
tree and, per update, (a) relinearizes only variables whose delta exceeded
`relinearizeThreshold` plus factors touching them
(`gatherRelinearizeKeys`/`relinearizeAffectedFactors`, ISAM2.cpp:64,465),
(b) re-eliminates only affected cliques, reusing cached products from
unaffected subtrees (`GetCachedBoundaryFactors`, ISAM2.cpp:290), and
(c) updates the delta by wildfire partial backsubstitution that stops where
the change falls below a threshold (ISAM2Clique.h:90).

The TPU-native equivalent replaces tree surgery with *cached linear factors +
warm-started PCG*, keeping the same bounded-work contract:

  (a) fluid relinearization: per update, variables with |Δ_i| > β are
      retracted into the linearization point θ and every factor row touching
      them is re-linearized — in fixed-size chunks inside a lax.while_loop,
      so per-update autodiff work is O(#stale rows), never O(N);
  (b) all other rows keep their cached whitened (J, r) blocks — the analogue
      of the Bayes tree's cached subtree products;
  (c) the delta solve is PCG on the cached system, warm-started from the
      previous Δ with an early-exit tolerance — the analogue of wildfire:
      iterations run only while the solution is actually changing.

Everything lives on device in feature-major layout (linear/fm.py); new
factors/variables are *injected* into the resident device arrays (small
padded scatters — no re-upload), and capacities grow by doubling so one
streamed sequence rebuilds the device state only O(log N) times. Multi-group
from the start (poses + landmarks + velocities + IMU biases share the
machinery).
"""

from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from gtsam_personal_tpu.core import manifolds
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.linear import fm
from gtsam_personal_tpu.linear.noise import NoiseModel


def _bucket(n: int, lo: int = 8) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


# ---------------------------------------------------------------------------
# device-side state (one pytree threaded through jitted updates)
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class _BatchState:
    """One factor type's capacity arrays. Static: name/groups/rdim/fn/kinds."""

    def __init__(self, name, residual_fn, groups, rdim, noise_kind, robust,
                 idx, meas, noise_data, noise_k, J, r, nfac, needs_lin):
        self.name = name
        self.residual_fn = residual_fn
        self.groups = tuple(groups)
        self.rdim = rdim
        self.noise_kind = noise_kind
        self.robust = robust
        self.idx = idx              # [S, cap] i32
        self.meas = meas            # dict of [cap, ...]
        self.noise_data = noise_data  # [cap, ...] or None (unit)
        self.noise_k = noise_k      # [cap] or None
        self.J = J                  # tuple of [rdim*d_s, cap]
        self.r = r                  # [rdim, cap]
        self.nfac = nfac            # i32 scalar: active rows
        self.needs_lin = needs_lin  # bool [cap]

    def tree_flatten(self):
        return ((self.idx, self.meas, self.noise_data, self.noise_k,
                 self.J, self.r, self.nfac, self.needs_lin),
                (self.name, self.residual_fn, self.groups, self.rdim,
                 self.noise_kind, self.robust))

    @classmethod
    def tree_unflatten(cls, aux, children):
        name, fn, groups, rdim, nk, rob = aux
        idx, meas, nd, k, J, r, nfac, nl = children
        return cls(name, fn, groups, rdim, nk, rob, idx, meas, nd, k, J, r,
                   nfac, nl)

    @property
    def cap(self):
        return self.r.shape[-1]

    def active(self):
        return jnp.arange(self.cap) < self.nfac


@jax.tree_util.register_pytree_node_class
class _State:
    """theta: {g: [cap_n, *ps]}, delta: {g: [d, cap_n]} (feature-major),
    nvar: {g: i32 scalar}, batches: list of _BatchState."""

    def __init__(self, theta, delta, nvar, batches):
        self.theta = theta
        self.delta = delta
        self.nvar = nvar
        self.batches = batches

    def tree_flatten(self):
        return ((self.theta, self.delta, self.nvar, tuple(self.batches)), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        theta, delta, nvar, batches = children
        return cls(theta, delta, nvar, list(batches))


@dataclass(frozen=True)
class ISAM2Params:
    """Reference analogue: ISAM2Params (relinearizeThreshold; the CG
    tolerance plays wildfireThreshold's role)."""
    relinearize_threshold: float = 0.01
    lam: float = 1e-6               # constant GN damping (ISAM2GaussNewtonParams)
    # trust region: per-variable tangent-norm cap on the delta returned by
    # the solve (0 = off). The GN step of a stiff nonlinear chain (e.g.
    # preintegrated IMU) can overshoot and snowball; this is the bounded-cost
    # analogue of switching the reference's ISAM2 to ISAM2DoglegParams.
    max_delta: float = 0.0
    cg_maxiter: int = 25            # iteration cap per update
    cg_tol: float = 1e-4            # exit when ||r|| < tol * ||r at entry||
    cg_tol_abs: float = 1e-10       # absolute residual floor (converged system)
    precond: str = "jacobi"         # 'jacobi' | 'chain:<group>' (SPCG chain)
    precond_refresh: int = 10       # rebuild the preconditioner every K updates
    relin_chunk: int = 256          # rows re-linearized per while_loop step
    # initial capacity floors: pre-size device arrays to avoid capacity-
    # doubling recompiles when the stream length is known in advance
    min_var_cap: int = 64
    min_fac_cap: int = 64
    dtype: type = np.float64


@dataclass
class ISAM2Result:
    """Per-update stats (reference: ISAM2Result)."""
    factors_total: int = 0
    variables_total: int = 0
    relinearized_rows: int = 0
    cg_iterations: int = 0


# ---------------------------------------------------------------------------
# the engine
# ---------------------------------------------------------------------------

class ISAM2:
    def __init__(self, params: ISAM2Params = ISAM2Params()):
        self.params = params
        self._pcache = None           # preconditioner cache (device pytree)
        self._updates_since_refresh = 0
        self._theta_host: Dict[str, np.ndarray] = {}
        self._nvar: Dict[str, int] = {}
        self._cap_n: Dict[str, int] = {}
        self._pending_vars: Dict[str, List[int]] = {}
        self._batch_keys: List[tuple] = []
        self._hosts: Dict[tuple, dict] = {}
        self._state: Optional[_State] = None
        self._rebuild = True     # capacity layout changed -> full rebuild
        # bounded-memory eviction (marginalizeLeaves analogue): freed
        # variable slots are RECYCLED by add_variable, and device nvar is
        # mirrored on host so injection counts stay correct under reuse
        self._free_vars: Dict[str, List[int]] = {}
        self._nvar_dev: Dict[str, int] = {}

    # -- staging (host) ------------------------------------------------------
    def add_variable(self, group: str, value) -> int:
        m = manifolds.get(group)
        dt = self.params.dtype
        if group not in self._theta_host:
            cap = _bucket(self.params.min_var_cap, 64)
            ident = np.asarray(m.identity(jnp.float64), dtype=dt)
            self._theta_host[group] = np.broadcast_to(
                ident, (cap,) + m.param_shape).copy()
            self._nvar[group] = 0
            self._cap_n[group] = cap
            self._pending_vars[group] = []
            self._rebuild = True
        free = self._free_vars.get(group)
        if free:                      # recycle an evicted slot (bounded cap)
            i = free.pop()
            self._theta_host[group][i] = np.asarray(value, dtype=dt)
            self._pending_vars[group].append(i)
            return i
        if self._nvar[group] + 1 > self._cap_n[group]:
            self._cap_n[group] *= 2
            ident = np.asarray(m.identity(jnp.float64), dtype=dt)
            pad = np.broadcast_to(
                ident, (self._theta_host[group].shape[0],) + m.param_shape)
            self._theta_host[group] = np.concatenate(
                [self._theta_host[group], pad.copy()])
            self._rebuild = True
        i = self._nvar[group]
        self._theta_host[group][i] = np.asarray(value, dtype=dt)
        self._pending_vars[group].append(i)
        self._nvar[group] = i + 1
        return i

    def add_factor(self, name: str, residual_fn: Callable,
                   groups: Sequence[str], rdim: int, idx: Sequence[int],
                   meas: dict, noise: NoiseModel):
        """Append one factor (reference: ISAM2::update newFactors). `noise`
        carries a SINGLE factor's data (no K axis)."""
        key = (name, tuple(groups), rdim, noise.kind, noise.robust)
        if key not in self._hosts:
            self._batch_keys.append(key)
            self._hosts[key] = {"residual_fn": residual_fn, "cap": 0, "k": 0,
                                "idx": None, "meas": None, "noise_data": None,
                                "noise_k": None, "pending": []}
            self._rebuild = True
        h = self._hosts[key]
        if h["k"] + 1 > h["cap"]:
            self._grow_batch(key, h, max(_bucket(self.params.min_fac_cap, 64),
                                         h["cap"] * 2), meas, noise)
            self._rebuild = True
        k = h["k"]
        h["idx"][:, k] = np.asarray(idx, dtype=np.int32)
        for mk, mv in meas.items():
            h["meas"][mk][k] = np.asarray(mv, dtype=self.params.dtype)
        if noise.data is not None:
            h["noise_data"][k] = np.asarray(noise.data, dtype=self.params.dtype)
        if noise.k is not None:
            h["noise_k"][k] = np.asarray(noise.k, dtype=self.params.dtype)
        h["pending"].append(k)
        h["k"] = k + 1

    def _grow_batch(self, key, h, newcap, meas_proto, noise_proto):
        nslots = len(key[1])
        dt = self.params.dtype
        grown_idx = np.zeros((nslots, newcap), dtype=np.int32)
        if h["idx"] is not None:
            grown_idx[:, : h["idx"].shape[1]] = h["idx"]
        h["idx"] = grown_idx
        new_meas = {}
        for mk, mv in meas_proto.items():
            arr = np.zeros((newcap,) + np.asarray(mv).shape, dtype=dt)
            if h["meas"] is not None:
                arr[: h["meas"][mk].shape[0]] = h["meas"][mk]
            new_meas[mk] = arr
        h["meas"] = new_meas
        if noise_proto.data is not None:
            nd = np.zeros((newcap,) + np.asarray(noise_proto.data).shape,
                          dtype=dt)
            if h["noise_data"] is not None:
                nd[: h["noise_data"].shape[0]] = h["noise_data"]
            h["noise_data"] = nd
        if noise_proto.k is not None:
            nk = np.zeros((newcap,), dtype=dt)
            if h["noise_k"] is not None:
                nk[: h["noise_k"].shape[0]] = h["noise_k"]
            h["noise_k"] = nk
        h["cap"] = newcap

    # -- device state construction / injection --------------------------------
    def _build_device_state(self):
        """Full (re)build: upload host mirrors, preserving resident device
        θ/Δ and (J, r) caches for previously existing rows. Happens O(log N)
        times per sequence (capacity doubling)."""
        dt = self.params.dtype
        old = self._state
        theta, delta, nvar = {}, {}, {}
        for g in self._theta_host:
            d = manifolds.get(g).dim
            cap = self._cap_n[g]
            th = jnp.asarray(self._theta_host[g])
            dl = jnp.zeros((d, cap), dtype=dt)
            if old is not None and g in old.theta:
                oc = old.theta[g].shape[0]
                # device θ is the source of truth for pre-existing rows
                th = th.at[:oc].set(old.theta[g])
                dl = dl.at[:, :oc].set(old.delta[g])
                # re-apply pending var inits (may overlap [0, oc))
                pend = self._pending_vars[g]
                if pend:
                    ids = np.asarray(pend, dtype=np.int32)
                    th = th.at[ids].set(jnp.asarray(
                        self._theta_host[g][ids]))
                    dl = dl.at[:, ids].set(0.0)
            self._pending_vars[g] = []
            theta[g], delta[g] = th, dl
            nvar[g] = jnp.asarray(self._nvar[g], dtype=jnp.int32)

        old_batches = {}
        if old is not None:
            for b in old.batches:
                old_batches[(b.name, b.groups, b.rdim, b.noise_kind,
                             b.robust)] = b
        batches = []
        for key in self._batch_keys:
            name, groups, rdim, nkind, rob = key
            h = self._hosts[key]
            cap = h["cap"]
            dims = [manifolds.get(g).dim for g in groups]
            idx = jnp.asarray(h["idx"])
            meas = {mk: jnp.asarray(mv) for mk, mv in h["meas"].items()}
            nd = None if h["noise_data"] is None else jnp.asarray(h["noise_data"])
            nk = None if h["noise_k"] is None else jnp.asarray(h["noise_k"])
            J = tuple(jnp.zeros((rdim * d, cap), dtype=dt) for d in dims)
            r = jnp.zeros((rdim, cap), dtype=dt)
            needs = jnp.zeros((cap,), dtype=bool)
            ob = old_batches.get(key)
            if ob is not None:
                oc = ob.cap
                J = tuple(Jn.at[:, :oc].set(Jo) for Jn, Jo in zip(J, ob.J))
                r = r.at[:, :oc].set(ob.r)
                needs = needs.at[:oc].set(ob.needs_lin)
            if h["pending"]:
                needs = needs.at[np.asarray(h["pending"], np.int32)].set(True)
            h["pending"] = []
            batches.append(_BatchState(name, h["residual_fn"], groups, rdim,
                                       nkind, rob, idx, meas, nd, nk, J, r,
                                       jnp.asarray(h["k"], jnp.int32), needs))
        self._state = _State(theta, delta, nvar, batches)
        self._nvar_dev = dict(self._nvar)
        self._rebuild = False

    def _inject_pending(self):
        """Scatter newly staged variables/rows into the resident device
        arrays (padded to small power-of-two buckets; no re-upload)."""
        st = self._state
        theta, delta, nvar = dict(st.theta), dict(st.delta), dict(st.nvar)
        for g, pend in self._pending_vars.items():
            if not pend:
                continue
            P = _bucket(len(pend))
            cap = self._cap_n[g]
            ids = np.full(P, cap, dtype=np.int32)   # pad -> OOB (dropped)
            ids[: len(pend)] = pend
            vals = self._theta_host[g][np.minimum(ids, cap - 1)]
            # recycled slots sit below device nvar — count only FRESH vars
            fresh = self._nvar[g] - self._nvar_dev.get(g, 0)
            theta[g], delta[g], nvar[g] = _append_vars(
                theta[g], delta[g], nvar[g], jnp.asarray(ids),
                jnp.asarray(vals), fresh)
            self._nvar_dev[g] = self._nvar[g]
            self._pending_vars[g] = []
        batches = []
        for key, b in zip(self._batch_keys, st.batches):
            h = self._hosts[key]
            pend = h["pending"]
            if not pend:
                batches.append(b)
                continue
            P = _bucket(len(pend))
            cap = h["cap"]
            ids = np.full(P, cap, dtype=np.int32)
            ids[: len(pend)] = pend
            safe = np.minimum(ids, cap - 1)
            idx_new = jnp.asarray(h["idx"][:, safe])
            meas_new = {mk: jnp.asarray(mv[safe]) for mk, mv in h["meas"].items()}
            nd_new = (None if h["noise_data"] is None
                      else jnp.asarray(h["noise_data"][safe]))
            nk_new = (None if h["noise_k"] is None
                      else jnp.asarray(h["noise_k"][safe]))
            batches.append(_append_rows(b, jnp.asarray(ids), idx_new,
                                        meas_new, nd_new, nk_new, len(pend)))
            h["pending"] = []
        self._state = _State(theta, delta, nvar, batches)

    # -- the update ------------------------------------------------------------
    def update(self, extra_cg: int = 0) -> ISAM2Result:
        """Inject staged factors/values, relinearize stale rows, re-solve Δ
        (one resident device program). Reference: ISAM2::update."""
        added_vars = any(self._pending_vars.values())
        if self._rebuild:
            self._build_device_state()
            self._pcache = None      # capacity shapes changed
        else:
            self._inject_pending()
        # a cached preconditioner is only valid for the variables it saw:
        # a new variable's block is zero in the stale cache and inverts to
        # ~1/lam * I — catastrophic mis-scaling for stiff factor chains
        # (measured: diverges IMU+GPS fusion). Rebuild whenever vars appear.
        use_cache = (self._pcache is not None
                     and not added_vars
                     and self._updates_since_refresh
                     < self.params.precond_refresh)
        st, relin_rows, cg_it, self._pcache = _isam2_update(
            self._state, self.params.relinearize_threshold, self.params.lam,
            self.params.cg_maxiter + extra_cg, self.params.cg_tol,
            self.params.cg_tol_abs, self.params.relin_chunk,
            self.params.precond,
            self._pcache if use_cache else None, use_cache,
            self.params.max_delta)
        self._updates_since_refresh = (self._updates_since_refresh + 1
                                       if use_cache else 1)
        self._state = st
        return ISAM2Result(
            factors_total=sum(h["k"] for h in self._hosts.values()),
            variables_total=sum(self._nvar.values()),
            relinearized_rows=int(relin_rows),
            cg_iterations=int(cg_it))

    # -- queries ---------------------------------------------------------------
    def _flush_staged(self):
        if self._rebuild:
            self._build_device_state()
        elif (any(self._pending_vars.values())
              or any(h["pending"] for h in self._hosts.values())):
            self._inject_pending()

    def calculate_estimate(self) -> Values:
        """theta ⊞ delta (reference: ISAM2::calculateEstimate)."""
        self._flush_staged()
        st = self._state
        out = {}
        for g in st.theta:
            m = manifolds.get(g)
            est = jax.vmap(m.retract)(st.theta[g], st.delta[g].T)
            out[g] = est[: self._nvar[g]]
        return Values(out)

    def error(self) -> float:
        """Nonlinear error at the current estimate."""
        self._flush_staged()
        return float(_isam2_error(self._state))

    def marginalize_variables(self, marg: Dict[str, Sequence[int]]):
        """In-engine eviction — the reference's ISAM2::marginalizeLeaves
        (nonlinear/ISAM2.h:199) / IncrementalFixedLagSmoother analogue.

        Factor rows touching the evicted variables are Schur-complemented
        (at the CURRENT estimate theta ⊞ delta) into ONE dense Gaussian
        prior over their Markov blanket, which re-enters through the normal
        staging path; the rows are removed (host mirrors compacted, every
        surviving row marked for relinearization), and the evicted variable
        slots join a free list that add_variable RECYCLES — so an unbounded
        stream runs at bounded device memory. The per-eviction cost is
        O(window), not O(stream).

        Note: the boundary's (groups, dim) signature keys the marginal's
        batch; streams whose eviction boundary signature is stable (chains,
        fixed-lag windows) re-use one batch and one compiled program."""
        self._flush_staged()
        est = self.calculate_estimate()
        marg_sets = {g: set(map(int, ix)) for g, ix in marg.items()}
        from gtsam_personal_tpu.core.graph import FactorBatch, FactorGraph
        from gtsam_personal_tpu.linear import marginal as marg_mod

        involved, removals = [], {}
        for key in self._batch_keys:
            h = self._hosts[key]
            name, groups, rdim, nkind, rob = key
            k = h["k"]
            if k == 0:
                continue
            idx = h["idx"][:, :k]
            hit = np.zeros(k, dtype=bool)
            for s, g in enumerate(groups):
                if marg_sets.get(g):
                    hit |= np.isin(idx[s], list(marg_sets[g]))
            rows = np.where(hit)[0]
            if rows.size == 0:
                continue
            removals[key] = rows
            meas = {mk: jnp.asarray(mv[rows]) for mk, mv in h["meas"].items()}
            nd = (None if h["noise_data"] is None
                  else jnp.asarray(h["noise_data"][rows]))
            nk = (None if h["noise_k"] is None
                  else jnp.asarray(h["noise_k"][rows]))
            involved.append(FactorBatch(
                name, h["residual_fn"], groups, rdim,
                jnp.asarray(np.ascontiguousarray(idx[:, rows].T)), meas,
                NoiseModel(nkind, nd, rob, nk)))

        if involved:
            _, mbatch, bound = marg_mod.marginalize(
                FactorGraph(involved), est, marg)
            for key, rows in removals.items():
                self._remove_rows(key, rows)
            if mbatch is not None:
                meas1 = {mk: np.asarray(mv[0])
                         for mk, mv in mbatch.meas.items()}
                self.add_factor(mbatch.name, mbatch.residual_fn,
                                mbatch.groups, mbatch.rdim,
                                [i for _, i in bound], meas1,
                                NoiseModel("unit"))
        for g, ids in marg_sets.items():
            self._free_vars.setdefault(g, []).extend(sorted(ids))
        self._rebuild = True

    def _remove_rows(self, key, rows):
        """Compact a host batch mirror after eviction: surviving rows slide
        down, every row is marked pending (the cached device (J, r) blocks
        no longer line up and must relinearize once)."""
        h = self._hosts[key]
        keep = np.setdiff1d(np.arange(h["k"]), rows)
        kk = len(keep)
        h["idx"][:, :kk] = h["idx"][:, keep]
        for mk in h["meas"]:
            h["meas"][mk][:kk] = h["meas"][mk][keep]
        if h["noise_data"] is not None:
            h["noise_data"][:kk] = h["noise_data"][keep]
        if h["noise_k"] is not None:
            h["noise_k"][:kk] = h["noise_k"][keep]
        h["k"] = kk
        h["pending"] = list(range(kk))

    def clone(self) -> "ISAM2":
        """Cheap fork of the engine (hypothesis branching for hybrid
        inference). Device pytrees (_state, _pcache) are immutable —
        updates always REPLACE them — so they are shared; host staging
        mirrors are copied. Clones with identical capacity trajectories
        share all jit caches. Call after update()/error() so nothing is
        staged."""
        c = ISAM2(self.params)
        c._pcache = self._pcache
        c._updates_since_refresh = self._updates_since_refresh
        c._theta_host = {g: a.copy() for g, a in self._theta_host.items()}
        c._nvar = dict(self._nvar)
        c._cap_n = dict(self._cap_n)
        c._pending_vars = {g: list(v) for g, v in self._pending_vars.items()}
        c._batch_keys = list(self._batch_keys)
        c._hosts = {}
        for k, h in self._hosts.items():
            c._hosts[k] = {
                "residual_fn": h["residual_fn"], "cap": h["cap"], "k": h["k"],
                "idx": None if h["idx"] is None else h["idx"].copy(),
                "meas": (None if h["meas"] is None
                         else {mk: mv.copy() for mk, mv in h["meas"].items()}),
                "noise_data": (None if h["noise_data"] is None
                               else h["noise_data"].copy()),
                "noise_k": (None if h["noise_k"] is None
                            else h["noise_k"].copy()),
                "pending": list(h["pending"]),
            }
        c._state = self._state
        c._rebuild = self._rebuild
        c._free_vars = {g: list(v) for g, v in self._free_vars.items()}
        c._nvar_dev = dict(self._nvar_dev)
        return c

    def estimate_array(self, group: str) -> np.ndarray:
        return np.asarray(self.calculate_estimate()[group])

    def estimate_at(self, group: str, i: int) -> np.ndarray:
        """O(1) single-variable estimate (streaming init helper)."""
        self._flush_staged()
        st = self._state
        return np.asarray(_estimate_one(st.theta[group], st.delta[group],
                                        group, i))


# ---------------------------------------------------------------------------
# jitted pieces
# ---------------------------------------------------------------------------

# NOTE: no buffer donation here — ISAM2.clone() (hybrid hypothesis
# branching) shares the device state across engines, and donating theta/
# delta would invalidate the sibling engines' references ("Buffer has been
# deleted or donated"). The extra copy is ~1 MB per injection.
@partial(jax.jit, static_argnames=("count",))
def _append_vars(theta_g, delta_g, nvar_g, ids, vals, count):
    theta_g = theta_g.at[ids].set(vals, mode="drop")
    delta_g = delta_g.at[:, ids].set(0.0, mode="drop")
    return theta_g, delta_g, nvar_g + count


@partial(jax.jit, static_argnames=("count",))
def _append_rows(b: _BatchState, ids, idx_new, meas_new, nd_new, nk_new,
                 count):
    idx = b.idx.at[:, ids].set(idx_new, mode="drop")
    meas = {mk: b.meas[mk].at[ids].set(meas_new[mk], mode="drop")
            for mk in b.meas}
    nd = b.noise_data if nd_new is None else b.noise_data.at[ids].set(
        nd_new, mode="drop")
    nk = b.noise_k if nk_new is None else b.noise_k.at[ids].set(
        nk_new, mode="drop")
    needs = b.needs_lin.at[ids].set(True, mode="drop")
    return _BatchState(b.name, b.residual_fn, b.groups, b.rdim, b.noise_kind,
                       b.robust, idx, meas, nd, nk, b.J, b.r,
                       b.nfac + count, needs)


def _relinearize_rows(b: _BatchState, theta, rows):
    """Whitened fm (J, r) for rows `rows` ([C] int; OOB rows clamp-gather,
    their writes are dropped by the caller)."""
    ms = [manifolds.get(g) for g in b.groups]
    dims = [m.dim for m in ms]
    dtype = b.r.dtype
    safe = jnp.minimum(rows, b.cap - 1)
    pts = tuple(theta[g][b.idx[s][safe]] for s, g in enumerate(b.groups))
    meas = jax.tree.map(lambda x: x[safe], b.meas)

    def res_local(deltas, points, mrow):
        xs = tuple(m.retract(p, dd) for m, p, dd in zip(ms, points, deltas))
        return b.residual_fn(xs, mrow)

    zeros = tuple(jnp.zeros((m.dim,), dtype=dtype) for m in ms)

    def one(points, mrow):
        r = res_local(zeros, points, mrow)
        Js = jax.jacfwd(res_local, argnums=0)(zeros, points, mrow)
        return r, Js

    r, Js = jax.vmap(one)(pts, meas)                 # [C, rdim], [C, rdim, d]
    C = rows.shape[0]
    r_fm = r.T
    Js_fm = tuple(J.transpose(1, 2, 0).reshape(b.rdim * d, C)
                  for J, d in zip(Js, dims))
    noise = NoiseModel(
        b.noise_kind,
        None if b.noise_data is None else b.noise_data[safe],
        b.robust,
        None if b.noise_k is None else b.noise_k[safe])
    return fm.whiten_system_fm(noise, r_fm, Js_fm, b.rdim, dims)


@partial(jax.jit, static_argnames=("cg_maxiter", "relin_chunk",
                                   "precond_kind", "use_cache", "max_delta"))
def _isam2_update(st: _State, beta, lam, cg_maxiter, cg_tol, cg_tol_abs,
                  relin_chunk, precond_kind="jacobi", pcache=None,
                  use_cache=False, max_delta=0.0):
    # ---- 1. fluid relinearization: variables with |delta| > beta ----
    relin_var = {}
    for g in st.theta:
        nrm2 = jnp.sum(st.delta[g] ** 2, axis=0)
        act = jnp.arange(st.delta[g].shape[1]) < st.nvar[g]
        relin_var[g] = (nrm2 > beta * beta) & act

    theta, delta = {}, {}
    for g in st.theta:
        m = manifolds.get(g)
        mask = relin_var[g]
        d_masked = jnp.where(mask[None, :], st.delta[g], 0.0)
        theta[g] = jax.vmap(m.retract)(st.theta[g], d_masked.T)
        delta[g] = jnp.where(mask[None, :], 0.0, st.delta[g])

    # ---- 2. stale rows = needs_lin | incident to relinearized vars ----
    new_batches = []
    total_relin = jnp.zeros((), dtype=jnp.int32)
    for b in st.batches:
        stale = b.needs_lin
        for s, g in enumerate(b.groups):
            stale = stale | relin_var[g][b.idx[s]]
        stale = stale & b.active()
        n_stale = jnp.sum(stale.astype(jnp.int32))
        total_relin = total_relin + n_stale
        # chunked relinearization: `relin_chunk` rows per while step; write
        # targets for dead lanes go out of bounds and are DROPPED (no
        # clobbering of live rows by padding duplicates)
        rows_all = jnp.nonzero(stale, size=b.cap, fill_value=b.cap)[0]

        def cond(carry):
            start, J, r = carry
            return start < n_stale

        def body(carry, b=b):
            start, J, r = carry
            ids = jax.lax.dynamic_slice_in_dim(
                jnp.concatenate([rows_all,
                                 jnp.full((relin_chunk,), b.cap,
                                          dtype=rows_all.dtype)]),
                start, relin_chunk)
            live = (start + jnp.arange(relin_chunk)) < n_stale
            ids = jnp.where(live, ids, b.cap)
            bb = _BatchState(b.name, b.residual_fn, b.groups, b.rdim,
                             b.noise_kind, b.robust, b.idx, b.meas,
                             b.noise_data, b.noise_k, J, r, b.nfac,
                             b.needs_lin)
            rw, Jw = _relinearize_rows(bb, theta, ids)
            r = r.at[:, ids].set(rw, mode="drop")
            J = tuple(J[s].at[:, ids].set(Jw[s], mode="drop")
                      for s in range(len(b.groups)))
            return start + relin_chunk, J, r

        _, J, r = jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32),
                                                  b.J, b.r))
        # zero inactive rows so they never contribute to the solve
        act = b.active()
        J = tuple(jnp.where(act[None, :], Js, 0.0) for Js in J)
        r = jnp.where(act[None, :], r, 0.0)
        new_batches.append(_BatchState(
            b.name, b.residual_fn, b.groups, b.rdim, b.noise_kind, b.robust,
            b.idx, b.meas, b.noise_data, b.noise_k, J, r, b.nfac,
            jnp.zeros_like(b.needs_lin)))

    # ---- 3. warm-started PCG on the cached system (wildfire analogue) ----
    counts = {g: int(st.delta[g].shape[1]) for g in st.delta}
    lin = fm.FMGraph(
        [fm.FMBatch(b.groups, b.idx, b.J, b.r) for b in new_batches], counts)
    b_rhs = jax.tree.map(lambda x: -x, lin.gradient_at_zero())

    def matvec(x):
        hx = lin.hessian_vector_product(x)
        return jax.tree.map(lambda h, xg: h + lam * xg, hx, x)

    if not use_cache or pcache is None:
        pcache = _build_precond_cache(lin, st, lam, precond_kind)
    precond = lambda r: _apply_precond(pcache, precond_kind, r)
    delta_new, cg_it = _pcg_counting(matvec, b_rhs, precond, delta,
                                     cg_maxiter, cg_tol, cg_tol_abs)
    if max_delta > 0.0:
        # per-variable trust region: scale each variable's tangent column so
        # its norm is <= max_delta (keeps direction, bounds the GN step)
        clipped = {}
        for g, d in delta_new.items():
            nrm = jnp.sqrt(jnp.sum(d * d, axis=0, keepdims=True))
            scale = jnp.minimum(1.0, max_delta / jnp.maximum(nrm, 1e-30))
            clipped[g] = d * scale
        delta_new = clipped
    return (_State(theta, delta_new, st.nvar, new_batches), total_relin,
            cg_it, pcache)


# ---------------------------------------------------------------------------
# preconditioners
# ---------------------------------------------------------------------------

def _build_precond_cache(lin: fm.FMGraph, st: _State, lam, kind: str):
    """'jacobi' — per-variable block diagonal; 'chain:<group>' — block-
    tridiagonal along <group>'s index chain (the spanning-subgraph/SPCG
    preconditioner, reference: SubgraphPreconditioner linear/SubgraphSolver.h
    :76 — made incremental); 'superchain:<g1>+<g2>+...' — block-tridiagonal
    over the COMBINED per-timestep state of several groups sharing one index
    (e.g. se3+vel3+imu_bias for VIO: 15-dim blocks): exact for pure
    odometric chains, which is what makes stiff preintegrated-IMU fusion
    converge (block-jacobi cannot move information along the chain). The
    cache is reused for `precond_refresh` updates (a stale SPD preconditioner
    is still a valid preconditioner)."""
    blocks = lin.hessian_block_diagonal()
    if kind.startswith("superchain:"):
        groups = tuple(kind[len("superchain:"):].split("+"))
        Dm, Om, cap = _superchain_harvest(lin, groups)
        n = st.nvar[groups[0]]
        Uinv, Omk = _chain_factorize_m(Dm, Om, n, lam)
        others = {g: B for g, B in blocks.items() if g not in groups}
        inv = _invert_blocks_fm(others, lam)
        return {"Uinv": Uinv, "Om": Omk, "inv": inv}
    if kind.startswith("chain:"):
        cgroup = kind[len("chain:"):]
        cap = blocks[cgroup].shape[-1]
        O = _chain_offdiag(lin, cgroup, cap)
        Uinv, Om = _chain_factorize(blocks[cgroup], O, st.nvar[cgroup], lam)
        others = {g: B for g, B in blocks.items() if g != cgroup}
        inv = _invert_blocks_fm(others, lam)
        return {"Uinv": Uinv, "Om": Om, "inv": inv}
    return {"inv": _invert_blocks_fm(blocks, lam)}


def _super_offsets(groups):
    offs, off = {}, 0
    for g in groups:
        offs[g] = off
        off += manifolds.get(g).dim
    return offs, off


def _superchain_harvest(lin: fm.FMGraph, groups):
    """Assemble the block-tridiagonal Hessian of the combined per-timestep
    state: D_i = H[(·,i),(·,i)] (all group pairs at timestep i, [cap, D, D])
    and O_i = H[(·,i),(·,i+1)]. Groups must share capacity (one variable of
    each group per timestep)."""
    offs, D = _super_offsets(groups)
    caps = {g: lin.counts[g] for g in groups}
    assert len(set(caps.values())) == 1, \
        f"superchain groups must share capacity, got {caps}"
    cap = caps[groups[0]]
    dtype = lin._dtype()
    Dm = jnp.zeros((cap + 1, D, D), dtype=dtype)   # +1 = drop row
    Om = jnp.zeros((cap + 1, D, D), dtype=dtype)
    for b in lin.batches:
        K = b.idx.shape[1]
        rdim = b.rdim
        for s, gs in enumerate(b.groups):
            if gs not in offs:
                continue
            ds = manifolds.get(gs).dim
            for t, gt in enumerate(b.groups):
                if gt not in offs:
                    continue
                dt = manifolds.get(gt).dim
                C = fm.fm_atb(b.Js[s], b.Js[t], rdim, ds, dt)  # [ds*dt, K]
                Cm = C.T.reshape(K, ds, dt)
                ii, jj = b.idx[s], b.idx[t]
                same = jj == ii
                Dm = Dm.at[jnp.where(same, ii, cap),
                           offs[gs]:offs[gs] + ds,
                           offs[gt]:offs[gt] + dt].add(
                    jnp.where(same[:, None, None], Cm, 0.0), mode="drop")
                nxt = jj == ii + 1
                Om = Om.at[jnp.where(nxt, ii, cap),
                           offs[gs]:offs[gs] + ds,
                           offs[gt]:offs[gt] + dt].add(
                    jnp.where(nxt[:, None, None], Cm, 0.0), mode="drop")
    return Dm[:cap], Om[:cap], cap


def _chain_factorize_m(Dm, Om, nvar, lam):
    """Block-Thomas factorization of a tridiagonal system given as matrices
    (Dm [cap, D, D] diagonal blocks, Om [cap, D, D] coupling i -> i+1)."""
    cap, d, _ = Dm.shape
    eye = jnp.eye(d, dtype=Dm.dtype)
    act = jnp.arange(cap) < nvar
    Dm = Dm + (lam + 1e-12) * eye
    Dm = jnp.where(act[:, None, None], Dm, eye[None])
    oact = jnp.arange(cap) < (nvar - 1)
    Om = jnp.where(oact[:, None, None], Om, 0.0)
    Oprev = jnp.concatenate([jnp.zeros((1, d, d), dtype=Om.dtype), Om[:-1]])

    def step(Uinv_prev, inp):
        Di, Oim1 = inp
        # _mm_unrolled, not @: the sequential factorization recurrence has
        # the same bf16-MXU-compounding failure mode as the apply scans
        Dt = Di - _mm_unrolled(Oim1.T, _mm_unrolled(Uinv_prev, Oim1))
        Uinv = jnp.linalg.inv(Dt)
        return Uinv, Uinv

    _, Uinv = jax.lax.scan(step, jnp.zeros((d, d), dtype=Dm.dtype),
                           (Dm, Oprev))
    return Uinv, Om


def _invert_blocks_fm(blocks, lam):
    inv = {}
    for g, Bf in blocks.items():
        d = manifolds.get(g).dim
        N = Bf.shape[-1]
        B = Bf.T.reshape(N, d, d)
        eye = jnp.eye(d, dtype=Bf.dtype)
        B = B + (lam + 1e-10) * eye
        inv[g] = jnp.linalg.inv(B).reshape(N, d * d).T
    return inv


def _apply_precond(cache, kind: str, r):
    out = {}
    for g, I in cache["inv"].items():
        d = manifolds.get(g).dim
        out[g] = fm.fm_matvec(I, r[g], d, d)
    if kind.startswith("superchain:"):
        groups = tuple(kind[len("superchain:"):].split("+"))
        offs, D = _super_offsets(groups)
        cap = cache["Uinv"].shape[0]
        stacked = jnp.concatenate(
            [r[g][:, :cap] for g in groups], axis=0)      # [D, cap]
        x = _chain_apply(cache["Uinv"], cache["Om"], stacked)
        for g in groups:
            d = manifolds.get(g).dim
            xg = x[offs[g]:offs[g] + d]
            full_cap = r[g].shape[1]
            if full_cap > cap:
                # columns beyond the cached chain capacity: fall back to the
                # block-Jacobi inverse already in out[g] (zero-filling would
                # make the preconditioner singular for those variables if a
                # stale cache were ever applied after capacity growth;
                # ADVICE r2)
                if g in out:
                    tail = out[g][:, cap:full_cap]
                else:
                    tail = r[g][:, cap:full_cap]
                xg = jnp.concatenate([xg, tail], axis=1)
            out[g] = xg
    elif kind.startswith("chain:"):
        cgroup = kind[len("chain:"):]
        out[cgroup] = _chain_apply(cache["Uinv"], cache["Om"], r[cgroup])
    return out


def _chain_offdiag(lin: fm.FMGraph, group: str, cap: int):
    """Harvest consecutive-coupling blocks H_{i,i+1} of `group` as flat
    [d*d, cap] (column i holds the block coupling i and i+1)."""
    d = manifolds.get(group).dim
    O = jnp.zeros((d * d, cap), dtype=lin._dtype())
    for b in lin.batches:
        rdim = b.rdim
        for s in range(len(b.groups)):
            for t in range(len(b.groups)):
                if s == t or b.groups[s] != group or b.groups[t] != group:
                    continue
                ii, jj = b.idx[s], b.idx[t]
                consec = jj == ii + 1
                C = fm.fm_atb(b.Js[s], b.Js[t], rdim, d, d)   # H_{ii,jj}
                tgt = jnp.where(consec, ii, cap)              # OOB -> dropped
                O = O.at[:, tgt].add(jnp.where(consec[None, :], C, 0.0),
                                     mode="drop")
    return O


def _chain_factorize(Dbd, O, nvar, lam):
    """Block-Thomas LDLᵀ of the tridiagonal system (scan over the chain).
    Dbd: [d*d, cap] diagonal blocks (all factors), O: [d*d, cap] (O_i couples
    i, i+1). Returns (Uinv [cap, d, d] = inv(D̃_i), Om [cap, d, d])."""
    dd, cap = Dbd.shape
    d = int(round(dd ** 0.5))
    eye = jnp.eye(d, dtype=Dbd.dtype)
    act = jnp.arange(cap) < nvar
    Dm = Dbd.T.reshape(cap, d, d) + (lam + 1e-12) * eye
    Dm = jnp.where(act[:, None, None], Dm, eye[None])
    oact = jnp.arange(cap) < (nvar - 1)
    Om = jnp.where(oact[:, None, None], O.T.reshape(cap, d, d), 0.0)
    Oprev = jnp.concatenate([jnp.zeros((1, d, d), dtype=O.dtype), Om[:-1]])

    def step(Uinv_prev, inp):
        Di, Oim1 = inp
        # _mm_unrolled, not @: the sequential factorization recurrence has
        # the same bf16-MXU-compounding failure mode as the apply scans
        Dt = Di - _mm_unrolled(Oim1.T, _mm_unrolled(Uinv_prev, Oim1))
        Uinv = jnp.linalg.inv(Dt)
        return Uinv, Uinv

    _, Uinv = jax.lax.scan(step, jnp.zeros((d, d), dtype=Dbd.dtype),
                           (Dm, Oprev))
    return Uinv, Om


def _mm_unrolled(A, B):
    """Batched small matmul as broadcast-multiply + reduce. On TPU an
    einsum/dot of f32 inputs lowers to bf16 MXU passes; the chain
    preconditioner's parallel-prefix RECURRENCE multiplies thousands of
    these blocks together, and bf16 error compounds to NaN at City10000
    scale (full 10k fp32 run on the real chip diverged; the identical fp32
    run on CPU — true f32 arithmetic — reaches the batch optimum). The
    elementwise form stays on the VPU in full f32 (the CLAUDE.md
    'unroll small contractions' rule)."""
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def _mv_unrolled(M, v):
    return jnp.sum(M * v[..., None, :], axis=-1)


def _affine_scan(M, c, reverse=False):
    """Solve the first-order recurrence z_i = M_i z_{i-1} + c_i for all i via
    associative_scan (O(log N) depth, fully vectorized: the reason chain
    substitution is viable on TPU at all). M: [N, d, d], c: [N, d]."""
    def combine(a, b):
        Ma, ca = a
        Mb, cb = b
        return (_mm_unrolled(Mb, Ma), _mv_unrolled(Mb, ca) + cb)

    _, z = jax.lax.associative_scan(combine, (M, c), reverse=reverse, axis=0)
    return z


def _chain_apply(Uinv, Om, r_fm):
    """Solve the tridiagonal preconditioner system: forward then backward
    block substitution as two parallel-prefix affine recurrences."""
    cap, d, _ = Uinv.shape
    r = r_fm.T                                       # [cap, d]
    Oprev = jnp.concatenate([jnp.zeros((1, d, d), dtype=Om.dtype), Om[:-1]])
    Uinv_prev = jnp.concatenate([jnp.eye(d, dtype=Uinv.dtype)[None],
                                 Uinv[:-1]])
    # forward: z_i = r_i - O_{i-1}^T U_{i-1} z_{i-1}
    Mf = -_mm_unrolled(jnp.swapaxes(Oprev, 1, 2), Uinv_prev)
    z = _affine_scan(Mf, r)
    # backward: x_i = U_i z_i - U_i O_i x_{i+1}
    Mb = -_mm_unrolled(Uinv, Om)
    cb = _mv_unrolled(Uinv, z)
    # reverse recurrence: x_i depends on x_{i+1}
    x = _affine_scan(Mb, cb, reverse=True)
    return x.T


def _pcg_counting(matvec, b, precond, x0, maxiter, tol, tol_abs=0.0):
    """Warm-started PCG; returns (x, iterations_used). The early-exit
    tolerance is the wildfire analogue: iterations stop once the residual
    has shrunk by `tol` relative to THIS update's entry residual (with an
    absolute floor for already-converged systems, e.g. pure odometry where
    the composed init is exact)."""
    from gtsam_personal_tpu.core.values import tree_axpy, tree_sub, tree_vdot
    r0 = tree_sub(b, matvec(x0))
    z0 = precond(r0)
    rz0 = tree_vdot(r0, z0)
    r0norm2 = tree_vdot(r0, r0)
    threshold = jnp.maximum(tol * tol * r0norm2, tol_abs * tol_abs)

    def cond(state):
        k, x, r, z, p, rz = state
        return jnp.logical_and(k < maxiter, tree_vdot(r, r) > threshold)

    def body(state):
        k, x, r, z, p, rz = state
        Ap = matvec(p)
        pAp = tree_vdot(p, Ap)
        alpha = jnp.where(pAp > 0, rz / jnp.where(pAp > 0, pAp, 1.0), 0.0)
        x = tree_axpy(alpha, p, x)
        r = tree_axpy(-alpha, Ap, r)
        z = precond(r)
        rz_new = tree_vdot(r, z)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        p = tree_axpy(beta, p, z)
        return k + 1, x, r, z, p, rz_new

    k, x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), x0, r0, z0, z0, rz0))
    return x, k


@partial(jax.jit, static_argnames=("group",))
def _estimate_one(theta_g, delta_g, group, i):
    m = manifolds.get(group)
    return m.retract(theta_g[i], delta_g[:, i])


@jax.jit
def _isam2_error(st: _State):
    """Nonlinear error at theta ⊞ delta over all active factor rows."""
    est = {}
    for g in st.theta:
        m = manifolds.get(g)
        est[g] = jax.vmap(m.retract)(st.theta[g], st.delta[g].T)
    total = jnp.zeros((), dtype=st.batches[0].r.dtype)
    from gtsam_personal_tpu.linear.noise import error as noise_error
    for b in st.batches:
        pts = tuple(est[g][b.idx[s]] for s, g in enumerate(b.groups))
        r = jax.vmap(b.residual_fn)(pts, b.meas)
        r = jnp.where(b.active()[:, None], r, 0.0)
        noise = NoiseModel(b.noise_kind, b.noise_data, b.robust, b.noise_k)
        total = total + noise_error(noise, r)
    return total
