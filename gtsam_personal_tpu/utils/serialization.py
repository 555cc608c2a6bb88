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
