"""Failure diagnosis naming the offending variable/factor (reference:
IndeterminantLinearSystemException, linear/linearExceptions.h)."""

import numpy as np
import pytest

from gtsam_personal_tpu.core.graph import GraphBuilder
from gtsam_personal_tpu.core.values import Values
from gtsam_personal_tpu.linear import diagnostics
from gtsam_personal_tpu.slam import factors as F

import jax.numpy as jnp


def _chain(n=4, with_prior=True, orphan=False):
    b = GraphBuilder()
    if with_prior:
        F.add_prior(b, "se2", 0, np.zeros(3), F.diag_noise([1.0, 1.0, 1.0]))
    for i in range(n - 1):
        F.add_between(b, "se2", i, i + 1, np.array([1.0, 0.0, 0.0]),
                      F.diag_noise([0.1, 0.1, 0.05]))
    m = n + 1 if orphan else n  # an extra variable no factor touches
    vals = Values({"se2": jnp.asarray(np.random.default_rng(0).normal(
        scale=0.1, size=(m, 3)))})
    return b.build(), vals


def test_healthy_system_reports_ok():
    graph, vals = _chain()
    rep = diagnostics.diagnose(graph, vals)
    assert rep.ok
    assert rep.min_block_eig > 1e-6
    rep.raise_if_bad()  # no-op


def test_orphan_variable_named():
    graph, vals = _chain(orphan=True)
    rep = diagnostics.diagnose(graph, vals)
    assert not rep.ok
    groups = [g for g, i, ev in rep.singular_variables]
    idxs = [i for g, i, ev in rep.singular_variables]
    assert "se2" in groups and 4 in idxs   # the orphan is variable se2[4]
    with pytest.raises(diagnostics.IndeterminantLinearSystemError):
        rep.raise_if_bad()
    assert "se2[4]" in str(rep)


def test_nonfinite_measurement_named():
    b = GraphBuilder()
    F.add_prior(b, "se2", 0, np.zeros(3), F.diag_noise([1.0, 1.0, 1.0]))
    F.add_between(b, "se2", 0, 1, np.array([np.nan, 0.0, 0.0]),
                  F.diag_noise([0.1, 0.1, 0.05]))
    vals = Values({"se2": jnp.zeros((2, 3))})
    rep = diagnostics.diagnose(b.build(), vals)
    assert rep.nonfinite_factors, str(rep)
