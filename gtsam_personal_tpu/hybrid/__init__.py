"""Hybrid discrete-continuous inference (reference: gtsam/hybrid/)."""
from gtsam_personal_tpu.hybrid.hybrid import HybridFactor, HybridFactorGraph
