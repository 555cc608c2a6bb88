"""Values — structure-of-arrays container of manifold points.

The reference stores a type-erased `std::map<Key, unique_ptr<Value>>`
(gtsam/nonlinear/Values.h:65). The TPU-native design replaces it with one
stacked array per variable *group* (manifold type): `{"se2": f[N,3],
"point3": f[M,3], ...}`. A key is the pair (group, index). The global tangent
space is the matching dict of `[N, dim]` arrays — a pytree that every solver
operates on directly.
"""

from typing import Dict

import jax
import jax.numpy as jnp

from gtsam_personal_tpu.core import manifolds


@jax.tree_util.register_pytree_node_class
class Values:
    """Immutable dict of per-group stacked manifold points."""

    def __init__(self, blocks: Dict[str, jnp.ndarray]):
        self.blocks = dict(blocks)

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        names = tuple(sorted(self.blocks))
        return tuple(self.blocks[n] for n in names), names

    @classmethod
    def tree_unflatten(cls, names, children):
        return cls(dict(zip(names, children)))

    # -- access ------------------------------------------------------------
    def __getitem__(self, group):
        return self.blocks[group]

    def at(self, group, i):
        return self.blocks[group][i]

    def groups(self):
        return sorted(self.blocks)

    def counts(self):
        return {g: int(self.blocks[g].shape[0]) for g in self.blocks}

    def with_block(self, group, arr):
        b = dict(self.blocks)
        b[group] = arr
        return Values(b)

    # -- charts ------------------------------------------------------------
    def retract(self, tangent: Dict[str, jnp.ndarray]) -> "Values":
        """Per-variable manifold retract (reference: Values::retract, Values.h:223)."""
        out = {}
        for g, x in self.blocks.items():
            d = tangent.get(g)
            if d is None:
                out[g] = x
            else:
                out[g] = jax.vmap(manifolds.get(g).retract)(x, d)
        return Values(out)

    def retract_masked(self, tangent: Dict[str, jnp.ndarray],
                       mask: Dict[str, jnp.ndarray]) -> "Values":
        """Retract only where mask is True (reference: Values::retractMasked,
        Values.h:229 — used by ISAM2 partial relinearization)."""
        out = {}
        for g, x in self.blocks.items():
            d = tangent.get(g)
            if d is None:
                out[g] = x
                continue
            m = mask.get(g)
            if m is not None:
                d = d * m[:, None].astype(d.dtype)
            out[g] = jax.vmap(manifolds.get(g).retract)(x, d)
        return Values(out)

    def local(self, other: "Values") -> Dict[str, jnp.ndarray]:
        """Tangent from self to other, per variable."""
        return {
            g: jax.vmap(manifolds.get(g).local)(self.blocks[g], other.blocks[g])
            for g in self.blocks
        }

    def zero_tangent(self) -> Dict[str, jnp.ndarray]:
        out = {}
        for g, x in self.blocks.items():
            m = manifolds.get(g)
            out[g] = jnp.zeros((x.shape[0], m.dim), dtype=x.dtype)
        return out

    def tangent_dim(self) -> int:
        return sum(x.shape[0] * manifolds.get(g).dim for g, x in self.blocks.items())

    def __repr__(self):
        return "Values(%s)" % ", ".join(
            "%s[%d]" % (g, self.blocks[g].shape[0]) for g in self.groups())


# ---------------------------------------------------------------------------
# Tangent-space (VectorValues) helpers — reference: gtsam/linear/VectorValues.h
# ---------------------------------------------------------------------------

def tree_vdot(a, b):
    return sum(jnp.vdot(x, y) for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def tree_sub(a, b):
    return jax.tree.map(jnp.subtract, a, b)


def tree_scale(a, s):
    return jax.tree.map(lambda x: x * s, a)


def tree_axpy(alpha, x, y):
    return jax.tree.map(lambda u, v: alpha * u + v, x, y)


def tree_zeros_like(a):
    return jax.tree.map(jnp.zeros_like, a)


def tree_norm(a):
    return jnp.sqrt(tree_vdot(a, a))


class Layout:
    """Static map of (group, index) -> slice of the flat tangent vector.

    Used by dense solvers; the sparse/CG paths work on the dict pytree
    directly. The analogue of the reference's `Scatter` (linear/Scatter.h).
    """

    def __init__(self, counts: Dict[str, int]):
        self.groups = sorted(counts)
        self.counts = dict(counts)
        self.dims = {g: manifolds.get(g).dim for g in self.groups}
        self.offsets = {}
        off = 0
        for g in self.groups:
            self.offsets[g] = off
            off += self.counts[g] * self.dims[g]
        self.total_dim = off

    @classmethod
    def of(cls, values: Values) -> "Layout":
        return cls(values.counts())

    def flatten(self, tangent: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        parts = [tangent[g].reshape(-1) for g in self.groups]
        return jnp.concatenate(parts) if parts else jnp.zeros(0)

    def unflatten(self, vec: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        out = {}
        for g in self.groups:
            n, d = self.counts[g], self.dims[g]
            off = self.offsets[g]
            out[g] = vec[off:off + n * d].reshape(n, d)
        return out

    def var_offset(self, group: str, i: int) -> int:
        return self.offsets[group] + i * self.dims[group]
