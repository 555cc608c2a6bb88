"""Batched linearization: the whole graph's Jacobians in a handful of vmaps.

Replaces the reference's per-factor `linearize` virtual calls under TBB
(nonlinear/NonlinearFactorGraph.cpp:239-260) and both of its derivative
pathways (hand-written `evaluateError` Jacobians and the Expression AD engine,
nonlinear/Expression.h) with JAX forward-mode autodiff *through the manifold
retraction*: J = d residual(x ⊞ delta) / d delta at delta = 0, which is
exactly the local-coordinates Jacobian the Gauss-Newton system needs.

The result is a `GaussianGraph` — the analogue of the reference's
`GaussianFactorGraph` (linear/GaussianFactorGraph.h:73) in whitened
Jacobian (sqrt) form, stored as per-batch block arrays.
"""

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax as _lax


def _einsum_hp(spec, *ops):
    """einsum pinned to full-f32 accumulation: TPU default matmul
    precision is bf16, which destroys normal-equations conditioning."""
    return jnp.einsum(spec, *ops, precision=_lax.Precision.HIGHEST)


from typing import TYPE_CHECKING

from gtsam_personal_tpu.core import manifolds
from gtsam_personal_tpu.core.values import Layout, Values
from gtsam_personal_tpu.linear.noise import whiten_system

if TYPE_CHECKING:  # only for annotations; avoids circular import with core.graph
    from gtsam_personal_tpu.core.graph import FactorBatch, FactorGraph


@jax.tree_util.register_pytree_node_class
class LinearBatch:
    """Whitened linearized factor batch: sum_s J_s delta_s + r, with
    J_s: [K, rdim, dim_s] and r: [K, rdim]."""

    def __init__(self, groups: Tuple[str, ...], idx: jnp.ndarray,
                 Js: Tuple[jnp.ndarray, ...], r: jnp.ndarray,
                 sign: float = 1.0):
        self.groups = tuple(groups)
        self.idx = idx
        self.Js = tuple(Js)
        self.r = r
        self.sign = float(sign)   # -1.0: AntiFactor (subtract contribution)

    def tree_flatten(self):
        return (self.idx, self.Js, self.r), (self.groups, self.sign)

    @classmethod
    def tree_unflatten(cls, aux, children):
        groups, sign = aux
        idx, Js, r = children
        return cls(groups, idx, Js, r, sign)

    @property
    def size(self):
        return self.idx.shape[0]


@jax.tree_util.register_pytree_node_class
class GaussianGraph:
    """The linear(ized) system min_delta 0.5 || J delta + r ||^2 as a list of
    LinearBatch. All solver entry points (matvec, gradient, preconditioners,
    dense assembly) live here."""

    def __init__(self, batches: Sequence[LinearBatch], counts: Dict[str, int]):
        self.batches = list(batches)
        self.counts = dict(counts)

    def tree_flatten(self):
        return tuple(self.batches), tuple(sorted(self.counts.items()))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(list(children), dict(aux))

    # -- quadratic model ---------------------------------------------------
    def error_at_zero(self):
        """0.5 ||r||^2 — the linearized cost at delta = 0."""
        return sum(b.sign * 0.5 * jnp.sum(b.r * b.r) for b in self.batches)

    def zero_tangent(self, dtype):
        return {g: jnp.zeros((n, manifolds.get(g).dim), dtype=dtype)
                for g, n in self.counts.items()}

    def _dtype(self):
        return self.batches[0].r.dtype

    def apply_J(self, delta):
        """Per-batch products u_b = sum_s J_s delta[g_s][idx_s]."""
        outs = []
        for b in self.batches:
            u = jnp.zeros_like(b.r)
            for s, g in enumerate(b.groups):
                d = delta[g][b.idx[:, s]]
                u = u + _einsum_hp("kij,kj->ki", b.Js[s], d)
            outs.append(u)
        return outs

    def apply_Jt(self, us):
        """delta-shaped accumulation of J^T u."""
        out = self.zero_tangent(self._dtype())
        for b, u in zip(self.batches, us):
            for s, g in enumerate(b.groups):
                contrib = _einsum_hp("kij,ki->kj", b.Js[s], u)
                out[g] = out[g].at[b.idx[:, s]].add(b.sign * contrib)
        return out

    def hessian_vector_product(self, delta):
        """(J^T J) delta — the CG matvec. Reference analogue:
        GaussianFactorGraph::multiplyHessianAdd."""
        return self.apply_Jt(self.apply_J(delta))

    def gradient_at_zero(self):
        """J^T r — gradient of 0.5||J delta + r||^2 at delta=0
        (reference: GaussianFactorGraph::gradientAtZero)."""
        return self.apply_Jt([b.r for b in self.batches])

    def hessian_diagonal(self):
        """Per-coordinate diag(J^T J) as a tangent-shaped dict (reference:
        GaussianFactorGraph::hessianDiagonal) — used for LM diagonal damping."""
        out = self.zero_tangent(self._dtype())
        for b in self.batches:
            for s, g in enumerate(b.groups):
                d2 = jnp.sum(b.Js[s] * b.Js[s], axis=1)  # [K, dim_s]
                out[g] = out[g].at[b.idx[:, s]].add(b.sign * d2)
        return out

    def hessian_block_diagonal(self):
        """Per-variable dense d x d blocks of J^T J (block-Jacobi data).

        Reference analogue: Preconditioner 'BlockJacobi'
        (linear/Preconditioner.h)."""
        out = {g: jnp.zeros((n, manifolds.get(g).dim, manifolds.get(g).dim),
                            dtype=self._dtype())
               for g, n in self.counts.items()}
        for b in self.batches:
            for s, g in enumerate(b.groups):
                blk = _einsum_hp("kij,kil->kjl", b.Js[s], b.Js[s])
                out[g] = out[g].at[b.idx[:, s]].add(b.sign * blk)
        return out

    # -- dense path (reference: GaussianFactorGraph::optimizeDensely) -------
    def assemble_dense(self, layout: Layout):
        """Assemble the full (D, D) normal-equations matrix H = J^T J and
        gradient g = J^T r by block scatter-add."""
        D = layout.total_dim
        H = jnp.zeros((D, D), dtype=self._dtype())
        gvec = jnp.zeros((D,), dtype=self._dtype())
        for b in self.batches:
            row_offsets = []
            for s, g in enumerate(b.groups):
                d = layout.dims[g]
                base = layout.offsets[g] + b.idx[:, s] * d
                row_offsets.append(base[:, None] + jnp.arange(d)[None, :])  # [K, d]
            for s in range(len(b.groups)):
                Jts = _einsum_hp("kij,ki->kj", b.Js[s], b.r)
                gvec = gvec.at[row_offsets[s]].add(b.sign * Jts)
                for t in range(len(b.groups)):
                    blk = _einsum_hp("kij,kil->kjl", b.Js[s], b.Js[t])  # [K, ds, dt]
                    rows = row_offsets[s][:, :, None]
                    cols = row_offsets[t][:, None, :]
                    H = H.at[rows, cols].add(b.sign * blk)
        return H, gvec


def linearize_batch(batch: "FactorBatch", values: Values) -> LinearBatch:
    """One vmap over K factors: residual + all slot Jacobians via jacfwd
    through the retraction, then whitening (+ robust IRLS weights)."""
    ms = [manifolds.get(g) for g in batch.groups]
    pts = batch.gather_points(values)
    dtype = batch.r_dtype if hasattr(batch, "r_dtype") else pts[0].dtype

    def res_local(deltas, points, meas):
        xs = tuple(m.retract(p, d) for m, p, d in zip(ms, points, deltas))
        return batch.residual_fn(xs, meas)

    K = batch.size
    zeros = tuple(jnp.zeros((m.dim,), dtype=dtype) for m in ms)

    def one(points, meas):
        r = res_local(zeros, points, meas)
        Js = jax.jacfwd(res_local, argnums=0)(zeros, points, meas)
        return r, Js

    r, Js = jax.vmap(one)(pts, batch.meas)
    rw, Jw = whiten_system(batch.noise, r, Js)
    return LinearBatch(batch.groups, batch.idx, Jw, rw,
                       getattr(batch, "sign", 1.0))


def linearize(graph: "FactorGraph", values: Values) -> GaussianGraph:
    """Linearize the whole graph (reference: NonlinearFactorGraph::linearize)."""
    return GaussianGraph([linearize_batch(b, values) for b in graph.batches],
                         values.counts())
