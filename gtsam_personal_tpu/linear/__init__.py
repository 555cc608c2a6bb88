"""Gaussian layer: noise models, linearization, linear solvers (reference: gtsam/linear/).

Submodules `linearize` and `solvers` are imported lazily by users to avoid a
circular import with core.graph (which needs noise models).
"""
from gtsam_personal_tpu.linear import noise
