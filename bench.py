"""Benchmark driver: prints ONE JSON line with the headline metric.

Current headline (round 1): batch LM iterations/sec on the city10000 2D pose
graph (10k poses, ~20k constraints) — linearize (vmapped autodiff) + exact
partitioned-Schur solve + retract + error, all on-device in fp32.

vs_baseline is measured against a GTSAM-equivalent C++ single-thread time of
~1.0 s/iteration for a full city10000 linearize+multifrontal solve (the
reference publishes no numbers; this is a conservative placeholder until the
reference harness is built and timed in this environment — see BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from gtsam_personal_tpu.slam import dataset
    from gtsam_personal_tpu.linear import schur
    from gtsam_personal_tpu.linear.linearize import linearize
    from gtsam_personal_tpu.nonlinear import optimizers

    dtype = np.float32
    try:
        graph, initial = dataset.load_2d(
            dataset.find_example_data("city10000.g2o"), dtype=dtype)
        name = "city10000"
    except FileNotFoundError:
        from __graft_entry__ import _synthetic_pose_graph
        graph, initial = _synthetic_pose_graph(n_poses=2048, dtype=dtype)
        name = "synthetic2048"

    plan = schur.make_plan(graph, initial.counts(), max_part_size=128)

    @jax.jit
    def lm_step(graph, values, lam):
        lin = linearize(graph, values)
        delta = schur.solve_partitioned(lin, plan, lam)
        nv = values.retract(delta)
        return nv, graph.error(nv)

    lam = jnp.asarray(1e-4, dtype=dtype)
    values = initial
    # compile + warmup
    values, err = lm_step(graph, values, lam)
    jax.block_until_ready(err)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        values, err = lm_step(graph, values, lam)
    jax.block_until_ready(err)
    dt = time.perf_counter() - t0

    iters_per_sec = iters / dt
    baseline_iters_per_sec = 1.0  # conservative GTSAM-class CPU estimate
    print(json.dumps({
        "metric": f"pose_graph_lm_iters_per_sec_{name}",
        "value": round(iters_per_sec, 3),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_sec / baseline_iters_per_sec, 3),
    }))


if __name__ == "__main__":
    main()
