"""Multi-host (multi-process) bootstrap for the distributed solvers.

Single-host multi-chip needs nothing: `jax.devices()` already sees every
local chip and the shard_map/psum paths in parallel/dist_schur.py and
parallel/dist_ba.py span them through one Mesh.

Multi-HOST TPU pods additionally need every process to join one JAX
runtime before any device state exists — the reference's distributed story
is MPI process bootstrap; the JAX-native equivalent is
`jax.distributed.initialize` (each host then sees the GLOBAL device list
and the same shard_map programs span hosts, collectives riding ICI).

This module is the flag-guarded entry point:

    from gtsam_personal_tpu.parallel import bootstrap
    bootstrap.maybe_init_distributed()      # no-op unless configured

Configuration (env vars, mirroring jax.distributed's own):
    GTSAM_TPU_DIST=1            enable (otherwise ALWAYS a no-op)
    GTSAM_TPU_COORD=host:port   coordinator address (process 0's)
    GTSAM_TPU_NPROCS=N          number of processes (optional on TPU pods:
                                jax infers it from the TPU topology)
    GTSAM_TPU_PROC_ID=k         this process's id (optional on TPU pods)

Must be called BEFORE any jax device/array use in the process (the same
rule as jax.distributed.initialize itself). Call it at program start in
every process; only one environment (this repo's dev box) has a single
chip, so the flag stays off everywhere in tests and the dryrun exercises
the sharded paths on a virtual mesh instead (SURVEY.md §7 distributed
correctness strategy).
"""

import os
from typing import Optional


def maybe_init_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Join the global JAX runtime if distributed mode is configured.

    Explicit arguments override the GTSAM_TPU_* environment variables.
    Returns True if `jax.distributed.initialize` was called, False for the
    single-process no-op. Raises if enabled but under-configured."""
    enabled = (coordinator is not None
               or os.environ.get("GTSAM_TPU_DIST") == "1")
    if not enabled:
        return False
    coordinator = coordinator or os.environ.get("GTSAM_TPU_COORD")
    if num_processes is None and "GTSAM_TPU_NPROCS" in os.environ:
        num_processes = int(os.environ["GTSAM_TPU_NPROCS"])
    if process_id is None and "GTSAM_TPU_PROC_ID" in os.environ:
        process_id = int(os.environ["GTSAM_TPU_PROC_ID"])
    if coordinator is None:
        raise ValueError(
            "distributed mode enabled (GTSAM_TPU_DIST=1) but no coordinator "
            "address: set GTSAM_TPU_COORD=host:port (process 0's address)")
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def process_info():
    """(process_index, process_count, local_device_count, global_device_count)
    — after maybe_init_distributed; also valid in single-process mode."""
    import jax
    return (jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count())
