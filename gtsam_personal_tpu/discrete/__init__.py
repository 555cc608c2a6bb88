"""Discrete inference (reference: gtsam/discrete/)."""
from gtsam_personal_tpu.discrete.discrete import (DiscreteFactor, DiscreteFactorGraph,
                                                  DiscreteConditional, DiscreteBayesNet, cpt)
