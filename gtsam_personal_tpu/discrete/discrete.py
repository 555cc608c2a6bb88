"""Discrete factor graphs: dense-table inference.

Reference parity: gtsam/discrete/ (SURVEY.md §2.4) — DecisionTreeFactor /
TableFactor, DiscreteConditional, DiscreteBayesNet, sum-product and
max-product elimination, DiscreteMarginals, DiscreteSearch-style best
assignments. The reference's ADDs (DecisionTree with merged leaves) exist to
compress sparsity on CPUs; the TPU-native representation is the dense
potential table contracted with einsum — XLA-friendly and exact for the
cardinalities these problems use.

Variables are integers with cardinalities; a factor holds `vars` (ordered) and
a dense `table` with shape = their cardinalities.
"""

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


class DiscreteFactor:
    def __init__(self, vars: Sequence[int], table):
        self.vars = tuple(vars)
        self.table = jnp.asarray(table)
        assert self.table.ndim == len(self.vars)

    def cardinality(self, v):
        return self.table.shape[self.vars.index(v)]

    def value(self, assignment: Dict[int, int]):
        idx = tuple(assignment[v] for v in self.vars)
        return self.table[idx]

    def __repr__(self):
        return f"DiscreteFactor(vars={self.vars}, shape={self.table.shape})"


class DiscreteConditional(DiscreteFactor):
    """P(frontal | parents): table over (frontal, *parents), normalized over
    the frontal axis (reference: DiscreteConditional)."""

    def __init__(self, frontal: int, parents: Sequence[int], table):
        super().__init__((frontal,) + tuple(parents), table)
        self.frontal = frontal
        self.parents = tuple(parents)


def _multiply(factors: Sequence[DiscreteFactor]) -> DiscreteFactor:
    """Product over the union domain via broadcasting."""
    all_vars: List[int] = []
    cards: Dict[int, int] = {}
    for f in factors:
        for v, c in zip(f.vars, f.table.shape):
            if v not in cards:
                all_vars.append(v)
                cards[v] = c
    shape = tuple(cards[v] for v in all_vars)
    out = jnp.ones(shape, dtype=jnp.result_type(*[f.table.dtype for f in factors]))
    for f in factors:
        # transpose f's axes into their order of appearance in all_vars, then
        # reshape with singleton axes for broadcasting
        order = sorted(range(len(f.vars)), key=lambda s: all_vars.index(f.vars[s]))
        t = jnp.transpose(f.table, order)
        bshape = [1] * len(all_vars)
        for s, ax in enumerate(order):
            bshape[all_vars.index(f.vars[ax])] = f.table.shape[ax]
        out = out * t.reshape(tuple(bshape))
    return DiscreteFactor(all_vars, out)


class DiscreteFactorGraph:
    def __init__(self):
        self.factors: List[DiscreteFactor] = []

    def add(self, vars, table):
        self.factors.append(DiscreteFactor(vars, table))
        return self

    def eliminate(self, ordering: Sequence[int], mode: str = "sum"):
        """Sequential elimination -> (DiscreteBayesNet, remaining factors).

        mode 'sum' = sum-product (posterior), 'max' = max-product (MPE)."""
        factors = list(self.factors)
        conditionals: List[DiscreteConditional] = []
        for v in ordering:
            involved = [f for f in factors if v in f.vars]
            if not involved:
                continue
            factors = [f for f in factors if v not in f.vars]
            prod = _multiply(involved)
            ax = prod.vars.index(v)
            rest = tuple(x for x in prod.vars if x != v)
            # move frontal axis first
            t = jnp.moveaxis(prod.table, ax, 0)
            if mode == "sum":
                msg = jnp.sum(t, axis=0)
            else:
                msg = jnp.max(t, axis=0)
            denom = jnp.where(msg > 0, msg, 1.0)
            cond_table = t / denom[None, ...]
            conditionals.append(DiscreteConditional(v, rest, cond_table))
            if rest:
                factors.append(DiscreteFactor(rest, msg))
            else:
                factors.append(DiscreteFactor((), msg.reshape(())))
        return DiscreteBayesNet(conditionals), factors

    def optimize(self, ordering: Optional[Sequence[int]] = None) -> Dict[int, int]:
        """MPE assignment via max-product + backtracking (reference:
        DiscreteFactorGraph::optimize)."""
        if ordering is None:
            ordering = self.variables()
        bn, _ = self.eliminate(ordering, mode="max")
        return bn.argmax_back_substitute()

    def marginal(self, v: int) -> jnp.ndarray:
        """Normalized marginal of one variable (reference: DiscreteMarginals)."""
        ordering = [u for u in self.variables() if u != v]
        _, remaining = self.eliminate(ordering, mode="sum")
        prod = _multiply([f for f in remaining if f.vars])
        ax = prod.vars.index(v)
        t = prod.table
        other = tuple(i for i in range(t.ndim) if i != ax)
        m = jnp.sum(t, axis=other) if other else t
        return m / jnp.sum(m)

    def k_best(self, k: int) -> List[Tuple[Dict[int, int], float]]:
        """Top-k assignments by joint potential (reference: DiscreteSearch,
        discrete/DiscreteSearch.h). Exact enumeration over the joint domain —
        the domains in the reference's own use cases are small."""
        prod = _multiply(self.factors)
        flat = np.asarray(prod.table).reshape(-1)
        order = np.argsort(-flat)[:k]
        shape = prod.table.shape
        out = []
        for f in order:
            idx = np.unravel_index(int(f), shape)
            out.append(({v: int(i) for v, i in zip(prod.vars, idx)},
                        float(flat[f])))
        return out

    def variables(self) -> List[int]:
        seen = []
        for f in self.factors:
            for v in f.vars:
                if v not in seen:
                    seen.append(v)
        return seen

    def evaluate(self, assignment: Dict[int, int]):
        out = 1.0
        for f in self.factors:
            out = out * float(f.value(assignment))
        return out


class DiscreteBayesNet:
    def __init__(self, conditionals: List[DiscreteConditional]):
        self.conditionals = conditionals

    def argmax_back_substitute(self) -> Dict[int, int]:
        """Back-substitution for MPE: assign in reverse elimination order."""
        assignment: Dict[int, int] = {}
        for cond in reversed(self.conditionals):
            idx = tuple(assignment[p] for p in cond.parents)
            col = cond.table[(slice(None),) + idx]
            assignment[cond.frontal] = int(jnp.argmax(col))
        return assignment

    def evaluate(self, assignment: Dict[int, int]):
        out = 1.0
        for cond in self.conditionals:
            idx = (assignment[cond.frontal],) + tuple(assignment[p] for p in cond.parents)
            out *= float(cond.table[idx])
        return out

    def sample(self, key, fixed: Optional[Dict[int, int]] = None) -> Dict[int, int]:
        import jax
        assignment = dict(fixed or {})
        for cond in reversed(self.conditionals):
            if cond.frontal in assignment:
                continue
            idx = tuple(assignment[p] for p in cond.parents)
            probs = cond.table[(slice(None),) + idx]
            probs = probs / jnp.sum(probs)
            key, sub = jax.random.split(key)
            assignment[cond.frontal] = int(jax.random.choice(
                sub, probs.shape[0], p=probs))
        return assignment


def cpt(frontal: int, parents: Sequence[int], rows: Sequence[Sequence[float]],
        cards: Optional[Sequence[int]] = None) -> DiscreteConditional:
    """Build a conditional from rows of probabilities, one row per parent
    assignment (row-major over parents) — the analogue of the reference's
    Signature strings like "A|B=1/2 2/1" (discrete/Signature.h)."""
    rows = np.asarray(rows, dtype=np.float64)
    rows = rows / rows.sum(axis=-1, keepdims=True)
    card_f = rows.shape[-1]
    if parents:
        if cards is None:
            raise ValueError("parent cardinalities required")
        table = rows.reshape(tuple(cards) + (card_f,))
        table = np.moveaxis(table, -1, 0)
    else:
        table = rows.reshape(card_f)
    return DiscreteConditional(frontal, parents, table)


def parse_signature(spec: str, frontal: int, parents: Sequence[int],
                    cards: Optional[Sequence[int]] = None):
    """Reference Signature-string CPT syntax (discrete/SignatureParser.cpp):
    rows separated by whitespace, each row's outcome weights separated by
    '/' — e.g. P(D|B,E) as "9/1 2/8 3/7 1/9" (row-major over parents) or a
    prior as "4/6". Returns a DiscreteConditional via cpt()."""
    rows = [[float(v) for v in tok.split("/")] for tok in spec.split()]
    if len(rows) == 1 and not parents:
        return cpt(frontal, (), rows)
    if cards is None:
        raise ValueError("parent cardinalities required")
    import numpy as _np
    expect = int(_np.prod(list(cards)))
    if len(rows) != expect:
        raise ValueError(
            f"signature '{spec}' has {len(rows)} rows, parents need {expect}")
    return cpt(frontal, parents, rows, cards)
