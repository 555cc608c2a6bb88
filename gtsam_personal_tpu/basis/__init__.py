"""Pseudospectral bases (reference: gtsam/basis/)."""
from gtsam_personal_tpu.basis import chebyshev
