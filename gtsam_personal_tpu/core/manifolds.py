"""Manifold registry — the TPU-native analogue of the reference's traits system.

The reference makes any type optimizable through `traits<T>` requiring
{dimension, Local, Retract} (gtsam/base/Manifold.h:92). Here a manifold is a
small record of pure functions over fixed-shape arrays; variables of one
manifold type are stored as a stacked array [N, *param_shape] and all chart
operations batch with `jax.vmap`.
"""

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gtsam_personal_tpu.geometry import se2, se3, so2, so3


class Manifold(NamedTuple):
    name: str
    dim: int                      # tangent dimension
    param_shape: Tuple[int, ...]  # storage shape of one element
    retract: Callable             # (point, tangent[dim]) -> point
    local: Callable               # (point, point) -> tangent[dim]
    identity: Callable            # (dtype) -> point


def _vector_space(name, d):
    """R^d as a trivial manifold (reference: base/VectorSpace.h)."""
    return Manifold(
        name=name, dim=d, param_shape=(d,),
        retract=lambda p, x: p + x,
        local=lambda a, b: b - a,
        identity=lambda dtype=jnp.float32: jnp.zeros(d, dtype=dtype),
    )


SO2 = Manifold("so2", so2.TANGENT_DIM, so2.PARAM_SHAPE, so2.retract, so2.local, so2.identity)
SE2 = Manifold("se2", se2.TANGENT_DIM, se2.PARAM_SHAPE, se2.retract, se2.local, se2.identity)
SO3 = Manifold("so3", so3.TANGENT_DIM, so3.PARAM_SHAPE, so3.retract, so3.local, so3.identity)
SE3 = Manifold("se3", se3.TANGENT_DIM, se3.PARAM_SHAPE, se3.retract, se3.local, se3.identity)
R1 = _vector_space("r1", 1)
R2 = _vector_space("r2", 2)
R3 = _vector_space("r3", 3)
R6 = _vector_space("r6", 6)
R9 = _vector_space("r9", 9)

POINT2 = R2._replace(name="point2")
POINT3 = R3._replace(name="point3")
VEL3 = R3._replace(name="vel3")
IMU_BIAS = R6._replace(name="imu_bias")  # (acc_bias, gyro_bias) — reference ImuBias::ConstantBias

_REGISTRY = {}


def register(m: Manifold):
    _REGISTRY[m.name] = m
    return m


for _m in (SO2, SE2, SO3, SE3, R1, R2, R3, R6, R9, POINT2, POINT3, VEL3, IMU_BIAS):
    register(_m)


def get(name: str) -> Manifold:
    return _REGISTRY[name]


def vector_space(name: str, d: int) -> Manifold:
    """Get-or-create an R^d manifold under a custom group name."""
    if name not in _REGISTRY:
        register(_vector_space("r%d" % d, d)._replace(name=name))
    return _REGISTRY[name]


def batched_retract(m: Manifold, points, tangents):
    """Retract a stacked [N, *param_shape] block by tangents [N, dim]."""
    return jax.vmap(m.retract)(points, tangents)


def batched_local(m: Manifold, a, b):
    return jax.vmap(m.local)(a, b)
