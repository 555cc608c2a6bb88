"""Failure diagnosis for linear systems: name the offending variable/factor.

Reference parity: linear/linearExceptions.h — IndeterminantLinearSystemException
carries the key of the variable whose elimination hit a zero/indefinite pivot,
so users can find the under-constrained or corrupt part of their graph. The
TPU-native solvers never pivot (batched Cholesky of padded fronts yields NaN
silently), so this module provides the equivalent post-hoc diagnosis: check a
linearized system for (a) non-finite residual/Jacobian rows, naming the factor
batch and row, and (b) per-variable block-diagonal Hessian conditioning,
naming variables whose blocks are singular/indefinite (under-constrained:
gauge freedom, missing priors, disconnected variables).

Used by the LM/GN drivers on failure (optimizers.py: diagnose_on_failure) and
directly:

    from gtsam_personal_tpu.linear import diagnostics
    report = diagnostics.diagnose(graph, values)
    print(report)                    # or report.raise_if_bad()
"""

from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np
import jax.numpy as jnp


@dataclass
class Report:
    """Human-readable diagnosis; empty lists mean the system looks solvable."""
    nonfinite_factors: List[Tuple[str, int]] = field(default_factory=list)
    singular_variables: List[Tuple[str, int, float]] = field(default_factory=list)
    min_block_eig: float = float("inf")

    @property
    def ok(self) -> bool:
        return not self.nonfinite_factors and not self.singular_variables

    def __str__(self):
        if self.ok:
            return ("linear system OK: all residuals/Jacobians finite, "
                    f"min per-variable block eigenvalue {self.min_block_eig:.3e}")
        lines = ["linear system diagnosis:"]
        for name, row in self.nonfinite_factors[:20]:
            lines.append(f"  NON-FINITE residual/Jacobian in factor batch "
                         f"'{name}' row {row}")
        for g, i, ev in self.singular_variables[:20]:
            lines.append(f"  SINGULAR/INDEFINITE block for variable "
                         f"{g}[{i}]: min eigenvalue {ev:.3e} "
                         f"(under-constrained? missing prior/gauge fix?)")
        extra = (len(self.nonfinite_factors) + len(self.singular_variables)
                 - min(20, len(self.nonfinite_factors))
                 - min(20, len(self.singular_variables)))
        if extra > 0:
            lines.append(f"  ... and {extra} more")
        return "\n".join(lines)

    def raise_if_bad(self):
        """Analogue of throwing IndeterminantLinearSystemException
        (reference: linear/linearExceptions.h:35)."""
        if not self.ok:
            raise IndeterminantLinearSystemError(str(self), self)


class IndeterminantLinearSystemError(RuntimeError):
    def __init__(self, msg, report: Report):
        super().__init__(msg)
        self.report = report


def diagnose_linear(lin, eig_tol: float = 1e-10) -> Report:
    """Diagnose a linearized system (GaussianGraph from linear/linearize.py).

    Checks every factor batch for non-finite rows and every variable's
    block-diagonal Hessian for near-zero/negative eigenvalues."""
    rep = Report()
    for b in lin.batches:
        bad = ~jnp.isfinite(jnp.sum(b.r, axis=tuple(range(1, b.r.ndim))))
        for J in b.Js:
            bad = bad | ~jnp.isfinite(jnp.sum(J, axis=tuple(range(1, J.ndim))))
        rows = np.nonzero(np.asarray(bad))[0]
        name = getattr(b, "name", None) or "+".join(b.groups)
        for row in rows[:50]:
            rep.nonfinite_factors.append((name, int(row)))

    blocks = lin.hessian_block_diagonal()
    for g, B in blocks.items():
        Bh = np.asarray(B)
        if Bh.ndim == 2:  # feature-major [d*d, N]
            d = int(round(Bh.shape[0] ** 0.5))
            Bh = Bh.T.reshape(-1, d, d)
        if not np.all(np.isfinite(Bh)):
            badv = np.nonzero(~np.isfinite(Bh.reshape(Bh.shape[0], -1)).all(1))[0]
            for i in badv[:50]:
                rep.singular_variables.append((g, int(i), float("nan")))
            continue
        evs = np.linalg.eigvalsh(0.5 * (Bh + np.swapaxes(Bh, 1, 2)))
        mins = evs[:, 0]
        rep.min_block_eig = min(rep.min_block_eig, float(mins.min()))
        for i in np.nonzero(mins < eig_tol)[0][:50]:
            rep.singular_variables.append((g, int(i), float(mins[i])))
    return rep


def diagnose(graph, values, eig_tol: float = 1e-10) -> Report:
    """Linearize `graph` at `values` and diagnose (host-side, eager)."""
    from gtsam_personal_tpu.linear.linearize import linearize
    return diagnose_linear(linearize(graph, values), eig_tol=eig_tol)
