"""Elimination structure analysis: variable indexing, partitioning
(reference: gtsam/inference/)."""
from gtsam_personal_tpu.inference import partition
