"""Auxiliary subsystems (SURVEY.md §5): profiling, serialization, graphviz."""
from gtsam_personal_tpu.utils import timing, dot
