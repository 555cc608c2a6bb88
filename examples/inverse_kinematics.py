"""Inverse kinematics of a planar 3R arm as factor-graph optimization.

Mirrors the reference's examples/InverseKinematicsExampleExpressions.cpp:
the end-effector pose is the product of exponentials
  forward(q) = Exp(q1*xi1) * Exp(q2*xi2) * Exp(q3*xi3) * sXt0
with screw axes xi1=(0,0,1), xi2=(L1,0,1), xi3=(L1+L2,0,1) and rest pose
sXt0 = Pose2(0, L1+L2+L3, pi/2); one 6-line residual + JAX autodiff
replaces the reference's Expression tree (the repo's CustomFactor story:
any Python function of manifold values is a factor).

Run:
  python -c "import jax; jax.config.update('jax_platforms','cpu'); \
             jax.config.update('jax_enable_x64', True); \
             exec(open('examples/inverse_kinematics.py').read())"
"""

import numpy as np


def main():
    import jax.numpy as jnp
    from gtsam_personal_tpu.geometry import se2
    from gtsam_personal_tpu.core.graph import GraphBuilder
    from gtsam_personal_tpu.core.values import Values
    from gtsam_personal_tpu.nonlinear import optimizers

    L1, L2, L3 = 3.5, 3.5, 2.5
    sXt0 = np.array([0.0, L1 + L2 + L3, np.pi / 2])
    xis = np.array([[0.0, 0.0, 1.0],
                    [L1, 0.0, 1.0],
                    [L1 + L2, 0.0, 1.0]])
    desired = np.array([3.0, 2.0, 0.0])     # Pose2(3, 2, 0)

    def forward(q):
        pose = se2.expmap(q[0] * jnp.asarray(xis[0]))
        pose = se2.compose(pose, se2.expmap(q[1] * jnp.asarray(xis[1])))
        pose = se2.compose(pose, se2.expmap(q[2] * jnp.asarray(xis[2])))
        return se2.compose(pose, jnp.asarray(sXt0))

    def ik_residual(xs, meas):
        (q,) = xs
        return se2.local(jnp.asarray(meas["desired"]), forward(q))

    b = GraphBuilder()
    b.add("ik", ik_residual, ("r3",), 3, [0], {"desired": desired},
          {"kind": "diag", "data": np.full(3, 100.0)})
    graph = b.build(dtype=np.float64)
    # reference initial estimate: slightly-bent configuration
    init = Values({"r3": jnp.asarray([[0.1, 0.2, 0.3]])})
    res = optimizers.optimize_lm(graph, init,
                                 optimizers.Params(max_iterations=50))
    q = np.asarray(res.values["r3"])[0]
    reached = np.asarray(forward(jnp.asarray(q)))
    print(f"joint angles (deg): {np.round(np.rad2deg(q), 2).tolist()}")
    print(f"end effector: ({reached[0]:.6f}, {reached[1]:.6f}, "
          f"{reached[2]:.6f})  target {desired.tolist()}")
    err = np.abs(np.asarray(se2.local(jnp.asarray(desired),
                                      jnp.asarray(reached)))).max()
    ok = err < 1e-8
    print("IK OK" if ok else "IK FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
