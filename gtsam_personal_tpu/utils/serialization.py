"""Checkpoint / resume: serialize Values and FactorGraphs.

Reference parity: boost::serialization snapshots used operationally by
examples/SolverComparer.cpp:416-519 to save/restore whole solver states
(SURVEY.md §5.4). Arrays go to an .npz archive; structure (group names,
factor types, residual-function names) to a JSON header. Residual functions
are re-resolved by name through a registry at load time (functions are code,
not data).
"""

import json
import os
from typing import Callable, Dict

import numpy as np
import jax.numpy as jnp

from gtsam_personal_tpu.core.graph import FactorBatch, FactorGraph
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.linear.noise import NoiseModel

_RESIDUAL_REGISTRY: Dict[str, Callable] = {}


def register_residual(name: str, fn: Callable):
    _RESIDUAL_REGISTRY[name] = fn


def _default_registry():
    from gtsam_personal_tpu.slam import factors as F
    for g in ("se2", "se3", "so3", "so2", "point3"):
        register_residual(f"prior_{g}", F.make_prior_residual(g))
        register_residual(f"between_{g}", F.make_between_residual(g))
    register_residual("bearing_range_2d", F.bearing_range_2d_residual)


_default_registry()


# Factories whose closures can be reconstructed from the header alone
# (qualname prefix -> builder taking the batch's groups tuple).
def _factory_resolvers():
    from gtsam_personal_tpu.slam import factors as F
    from gtsam_personal_tpu.linear.marginal import make_marginal_residual
    return {
        "make_prior_residual": lambda groups: F.make_prior_residual(groups[0]),
        "make_between_residual":
            lambda groups: F.make_between_residual(groups[0]),
        "make_marginal_residual":
            lambda groups: make_marginal_residual(tuple(groups)),
    }


def _resolve_residual(h):
    """Residual resolution order: explicit registry (by batch name) ->
    module-level function by recorded (module, qualname) -> reconstructable
    factory closure. Module-level residuals — the entire factor zoo in
    slam/factors, slam/unstable, navigation/factors, sfm/* — therefore
    round-trip with NO registration at all."""
    if h["name"] in _RESIDUAL_REGISTRY:
        return _RESIDUAL_REGISTRY[h["name"]]
    mod, qn = h.get("residual_module"), h.get("residual_qualname")
    if mod and qn:
        if "<locals>" not in qn:
            import importlib
            obj = importlib.import_module(mod)
            for part in qn.split("."):
                obj = getattr(obj, part)
            return obj
        factory = qn.split(".<locals>.")[0].split(".")[-1]
        resolver = _factory_resolvers().get(factory)
        if resolver is not None:
            return resolver(tuple(h["groups"]))
    raise KeyError(
        f"residual {h['name']!r} not resolvable (module={mod!r}, "
        f"qualname={qn!r}); call register_residual() before loading")


def save_values(path: str, values: Values):
    np.savez(path, **{g: np.asarray(v) for g, v in values.blocks.items()})


def load_values(path: str, dtype=None) -> Values:
    data = np.load(path)
    cast = (lambda x: jnp.asarray(x, dtype=dtype)) if dtype else jnp.asarray
    return Values({k: cast(data[k]) for k in data.files})


def _fn_desc(fn):
    return {"residual_module": getattr(fn, "__module__", None),
            "residual_qualname": getattr(fn, "__qualname__", None)}


def save_isam2(path: str, engine):
    """Snapshot a FULL resident ISAM2 engine: params, host staging mirrors,
    and the device `_State` (theta / delta / nvar / per-batch capacity
    arrays INCLUDING the cached whitened (J, r) blocks and needs_lin
    flags). The reference analogue is SolverComparer's solver-state
    save/restore (examples/SolverComparer.cpp:416-519). The preconditioner
    cache is NOT saved — the restored engine rebuilds it on the next
    update (a refresh that would have happened within `precond_refresh`
    updates anyway)."""
    import pickle
    import numpy as np_
    eng = engine
    hosts = {}
    for key in eng._batch_keys:
        h = eng._hosts[key]
        hosts[key] = {k: v for k, v in h.items() if k != "residual_fn"}
        hosts[key]["residual_desc"] = _fn_desc(h["residual_fn"])
    dev = None
    if eng._state is not None:
        batches = []
        for b in eng._state.batches:
            batches.append({
                "name": b.name, "groups": b.groups, "rdim": b.rdim,
                "noise_kind": b.noise_kind, "robust": b.robust,
                "residual_desc": _fn_desc(b.residual_fn),
                "idx": np_.asarray(b.idx),
                "meas": {k: np_.asarray(v) for k, v in b.meas.items()},
                "noise_data": (None if b.noise_data is None
                               else np_.asarray(b.noise_data)),
                "noise_k": (None if b.noise_k is None
                            else np_.asarray(b.noise_k)),
                "J": tuple(np_.asarray(x) for x in b.J),
                "r": np_.asarray(b.r),
                "nfac": np_.asarray(b.nfac),
                "needs_lin": np_.asarray(b.needs_lin)})
        dev = {"theta": {g: np_.asarray(v)
                         for g, v in eng._state.theta.items()},
               "delta": {g: np_.asarray(v)
                         for g, v in eng._state.delta.items()},
               "nvar": {g: np_.asarray(v)
                        for g, v in eng._state.nvar.items()},
               "batches": batches}
    blob = {"params": eng.params,
            "theta_host": eng._theta_host, "nvar": eng._nvar,
            "cap_n": eng._cap_n, "pending_vars": eng._pending_vars,
            "batch_keys": eng._batch_keys, "hosts": hosts, "dev": dev,
            "rebuild": eng._rebuild, "free_vars": eng._free_vars,
            "nvar_dev": eng._nvar_dev}
    with open(path, "wb") as f:
        pickle.dump(blob, f)


def load_isam2(path: str):
    """Restore an ISAM2 engine saved by save_isam2; continuing the stream
    produces the identical trajectory (the device state is the engine's
    entire memory; the preconditioner rebuilds on the first update)."""
    import pickle
    from gtsam_personal_tpu.nonlinear.isam2 import ISAM2, _State, _BatchState
    with open(path, "rb") as f:
        blob = pickle.load(f)

    def resolve(name, groups, desc):
        return _resolve_residual({"name": name, "groups": list(groups),
                                  **desc})

    eng = ISAM2(blob["params"])
    eng._theta_host = blob["theta_host"]
    eng._nvar = blob["nvar"]
    eng._cap_n = blob["cap_n"]
    eng._pending_vars = blob["pending_vars"]
    eng._batch_keys = blob["batch_keys"]
    eng._hosts = {}
    for key, h in blob["hosts"].items():
        hh = {k: v for k, v in h.items() if k != "residual_desc"}
        hh["residual_fn"] = resolve(key[0], key[1], h["residual_desc"])
        eng._hosts[key] = hh
    dev = blob["dev"]
    if dev is not None:
        batches = []
        for b in dev["batches"]:
            batches.append(_BatchState(
                b["name"], resolve(b["name"], b["groups"],
                                   b["residual_desc"]),
                b["groups"], b["rdim"], b["noise_kind"], b["robust"],
                jnp.asarray(b["idx"]),
                {k: jnp.asarray(v) for k, v in b["meas"].items()},
                None if b["noise_data"] is None else jnp.asarray(
                    b["noise_data"]),
                None if b["noise_k"] is None else jnp.asarray(b["noise_k"]),
                tuple(jnp.asarray(x) for x in b["J"]),
                jnp.asarray(b["r"]), jnp.asarray(b["nfac"]),
                jnp.asarray(b["needs_lin"])))
        eng._state = _State(
            {g: jnp.asarray(v) for g, v in dev["theta"].items()},
            {g: jnp.asarray(v) for g, v in dev["delta"].items()},
            {g: jnp.asarray(v) for g, v in dev["nvar"].items()},
            batches)
    eng._rebuild = blob["rebuild"]
    eng._free_vars = blob.get("free_vars", {})
    eng._nvar_dev = blob.get("nvar_dev", dict(eng._nvar))
    eng._pcache = None
    return eng


def save_lm_carry(path: str, values: Values, lam, err):
    """Checkpoint an lm_run / optimize_ba_pk outer carry (values, lambda,
    error). Restoring and continuing reproduces the uninterrupted run
    exactly: the first post-restore iteration relinearizes at the restored
    values, which is bitwise what the cached-linearization carry held."""
    np.savez(path, __lam__=np.asarray(lam), __err__=np.asarray(err),
             **{g: np.asarray(v) for g, v in values.blocks.items()})


def load_lm_carry(path: str, dtype=None):
    data = np.load(path)
    cast = (lambda x: jnp.asarray(x, dtype=dtype)) if dtype else jnp.asarray
    vals = Values({k: cast(data[k]) for k in data.files
                   if not k.startswith("__")})
    return vals, cast(data["__lam__"]), cast(data["__err__"])


def save_graph(path: str, graph: FactorGraph):
    arrays = {}
    header = []
    for i, b in enumerate(graph.batches):
        arrays[f"b{i}_idx"] = np.asarray(b.idx)
        meas_keys = []
        for k, v in b.meas.items():
            arrays[f"b{i}_meas_{k}"] = np.asarray(v)
            meas_keys.append(k)
        noise = {"kind": b.noise.kind, "robust": b.noise.robust}
        if b.noise.data is not None:
            arrays[f"b{i}_noise"] = np.asarray(b.noise.data)
        if b.noise.k is not None:
            arrays[f"b{i}_noisek"] = np.asarray(b.noise.k)
        header.append({"name": b.name, "groups": list(b.groups),
                       "rdim": b.rdim, "meas_keys": meas_keys, "noise": noise,
                       "sign": b.sign,
                       "residual_module": getattr(b.residual_fn,
                                                  "__module__", None),
                       "residual_qualname": getattr(b.residual_fn,
                                                    "__qualname__", None)})
    np.savez(path, **arrays)
    with open(path + ".json", "w") as f:
        json.dump(header, f)


def load_graph(path: str, dtype=None) -> FactorGraph:
    data = np.load(path)
    with open(path + ".json") as f:
        header = json.load(f)
    cast = (lambda x: jnp.asarray(x, dtype=dtype)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else jnp.asarray(x)) \
        if dtype else jnp.asarray
    batches = []
    for i, h in enumerate(header):
        fn = _resolve_residual(h)
        meas = {k: cast(data[f"b{i}_meas_{k}"]) for k in h["meas_keys"]}
        nd = cast(data[f"b{i}_noise"]) if f"b{i}_noise" in data.files else None
        nk = cast(data[f"b{i}_noisek"]) if f"b{i}_noisek" in data.files else None
        noise = NoiseModel(h["noise"]["kind"], nd, h["noise"]["robust"], nk)
        batches.append(FactorBatch(h["name"], fn, tuple(h["groups"]), h["rdim"],
                                   jnp.asarray(data[f"b{i}_idx"]), meas, noise,
                                   sign=h.get("sign", 1.0)))
    return FactorGraph(batches)
