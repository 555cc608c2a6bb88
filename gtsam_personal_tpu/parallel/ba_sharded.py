"""Multi-device sharded bundle adjustment.

The distribution design of SURVEY.md §7 step 8: observations (and the
cam-major / point-major dual layouts) are sharded across the device mesh on
their leading axes; camera and landmark state stays replicated. Inside the
jitted BA step the per-device partial products reduce with psum-style
collectives that GSPMD inserts automatically from the sharding annotations —
per-block elimination happens device-local, the reduced camera system is the
all-reduce, exactly the distributed-Schur recipe.

On real hardware the mesh axis maps onto ICI; here it is exercised on the
virtual CPU mesh (tests) and via the driver's dryrun.

This module is the *implicit* (GSPMD-annotation) route: shard the inputs and
let the compiler insert collectives. The EXPLICIT distributed engine —
`shard_map` with hand-placed `psum` for the landmark aggregates, device-local
camera fronts, and the compute/collective split measurement — lives in
`parallel/dist_ba.py` (and `parallel/dist_schur.py` for pose graphs); use
those when you need control over what rides the interconnect.
"""

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gtsam_personal_tpu.sfm import ba
from gtsam_personal_tpu.sfm.ba_layout import BALayout


def shard_ba(state: ba.BAState, obs: ba.BAObservations, layout: BALayout,
             mesh: Mesh, axis: str = "dp"):
    """Place BA data on the mesh: obs arrays sharded on M, dual-layout index
    arrays sharded on their leading (C*Q / P*T) axes, state replicated."""
    repl = NamedSharding(mesh, P())
    sh = NamedSharding(mesh, P(axis))

    def put_sharded(x):
        n = int(np.prod(mesh.devices.shape))
        if x.shape[0] % n == 0:
            return jax.device_put(x, sh)
        return jax.device_put(x, repl)

    state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
    obs = ba.BAObservations(put_sharded(obs.cam), put_sharded(obs.point),
                            put_sharded(obs.uv))
    layout = jax.tree.map(put_sharded, layout)
    return state, obs, layout


def sharded_ba_step(state, obs, layout, lam, cg_maxiter=25):
    """The standard BA try-step; sharding comes from the input placements
    (GSPMD propagates and inserts collectives)."""
    return ba.ba_try_step(state, obs, layout, lam, cg_maxiter=cg_maxiter)
