"""SLAM domain library: measurement factors, dataset I/O (reference: gtsam/slam/)."""
from gtsam_personal_tpu.slam import factors
