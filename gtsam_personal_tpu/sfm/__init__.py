"""Structure-from-motion (reference: gtsam/sfm/): BAL I/O, bundle adjustment,
smart factors, Shonan averaging, translation recovery, MFAS."""
from gtsam_personal_tpu.sfm import bal, ba, synthetic
