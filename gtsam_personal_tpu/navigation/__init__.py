"""Inertial navigation (reference: gtsam/navigation/): NavState, scan-based
IMU preintegration, ImuFactor/CombinedImuFactor, GPS/attitude factors,
simulation scenarios."""
from gtsam_personal_tpu.navigation import navstate, preintegration, factors, scenario
