"""gtsam_personal_tpu — a TPU-native factor-graph optimization framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of GTSAM 4.3
(reference: zhexin1904/gtsam_personal): manifold geometry, batched factor
linearization, sparse Gaussian elimination, nonlinear least-squares optimizers,
SLAM/SfM/navigation domain libraries, and multi-device sharded solving.

Design stance (see SURVEY.md §7): structure-of-arrays factor batches, static
shapes, host-side symbolic analysis + device-side batched numerics, `vmap`
autodiff through manifold retractions instead of hand-written Jacobians.
"""

__version__ = "0.1.0"

from gtsam_personal_tpu import geometry, core, linear, nonlinear, slam

__all__ = ["geometry", "core", "linear", "nonlinear", "slam", "__version__"]
