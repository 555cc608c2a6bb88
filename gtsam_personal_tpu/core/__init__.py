"""Core data model: manifold registry, Values, factor graph containers."""
from gtsam_personal_tpu.core import manifolds
from gtsam_personal_tpu.core.values import Values, Layout
from gtsam_personal_tpu.core.graph import FactorBatch, FactorGraph, GraphBuilder
