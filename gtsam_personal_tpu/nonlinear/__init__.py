"""Nonlinear optimization (reference: gtsam/nonlinear/)."""
from gtsam_personal_tpu.nonlinear.optimizers import (Params, Result, optimize_gn,
                                                     optimize_lm, optimize_lm_jit)
