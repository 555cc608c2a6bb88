"""Manifold & camera zoo (reference: gtsam/geometry/, SURVEY.md §2.8)."""

from gtsam_personal_tpu.geometry import so2, so3, se2, se3

__all__ = ["so2", "so3", "se2", "se3"]
