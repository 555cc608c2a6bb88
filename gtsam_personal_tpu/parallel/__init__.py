"""Multi-device sharding over jax.sharding.Mesh (the new distribution axis;
the reference is single-process TBB, SURVEY.md §2.11)."""
from gtsam_personal_tpu.parallel import mesh
