"""View-graph calibration-free SfM: estimate fundamental matrices directly
from point correspondences with transfer factors.

Mirrors the reference's examples/ViewGraphExample.cpp: 4 poses on a circle
observe the 8 cube corners; the 8 unknown fundamental matrices (edges one
and two poses apart, cyclic) are estimated from TransferFactors that chain
epipolar transfer across view triplets — no poses, no 3D points, no
calibration in the optimization.

Run:
  python -c "import jax; jax.config.update('jax_platforms','cpu'); \
             jax.config.update('jax_enable_x64', True); \
             exec(open('examples/view_graph.py').read())"
"""

import numpy as np


def main():
    import jax.numpy as jnp
    from gtsam_personal_tpu.geometry import se3, so3, cameras as cam_geo
    from gtsam_personal_tpu.geometry import fundamental as fmat
    from gtsam_personal_tpu.core.graph import GraphBuilder
    from gtsam_personal_tpu.core.values import Values
    from gtsam_personal_tpu.nonlinear import optimizers
    from gtsam_personal_tpu.slam.factors import transfer_factor_residual

    # scene: cube + 4 cameras on a circle (reference SFMdata)
    d = 10.0
    pts = np.array([[d, d, d], [-d, d, d], [-d, -d, d], [d, -d, d],
                    [d, d, -d], [-d, d, -d], [-d, -d, -d], [d, -d, -d]])
    cal = np.array([50.0, 50.0, 0.0, 50.0, 50.0])
    K = np.array([[50.0, 0, 50], [0, 50, 50], [0, 0, 1.0]])
    poses = []
    for i in range(4):
        th = 2 * np.pi * i / 4
        eye = np.array([30 * np.cos(th), 30 * np.sin(th), 0.0])
        zc = -eye / np.linalg.norm(eye)
        xc = np.cross(zc, [0.0, 0.0, 1.0]); xc /= np.linalg.norm(xc)
        R = np.stack([xc, np.cross(zc, xc), zc], axis=1)
        poses.append(np.concatenate([R, eye[:, None]], axis=1))

    def F_between(a, b):
        """F with x_a^T F x_b = 0 on pixel correspondences."""
        aTb = np.asarray(se3.between(jnp.asarray(poses[a]),
                                     jnp.asarray(poses[b])))
        R, t = aTb[:, :3], aTb[:, 3]
        E = np.asarray(so3.hat(jnp.asarray(t / np.linalg.norm(t)))) @ R
        return np.linalg.inv(K).T @ E @ np.linalg.inv(K)

    pix = np.asarray([[np.asarray(cam_geo.project_point(
        jnp.asarray(p), jnp.asarray(pt), jnp.asarray(cal)))
        for pt in pts] for p in poses])              # [4, 8, 2]

    # the 8 unknown edges: one apart and two apart, cyclic (reference: 8
    # unique EdgeKeys)
    edges = [(a, (a + 1) % 4) for a in range(4)] + \
            [(a, (a + 2) % 4) for a in range(4)]
    eix = {e: i for i, e in enumerate(edges)}
    truth = [F_between(a, b) for a, b in edges]

    b = GraphBuilder()
    npts = len(pts)
    for a in range(4):
        bb, c = (a + 1) % 4, (a + 2) % 4
        for j in range(npts):
            pa, pb, pc = pix[a, j], pix[bb, j], pix[c, j]
            noise = {"kind": "diag", "data": np.full(2, 1.0)}
            # predict c from a, b: needs F(c,a), F(c,b) = transposes of the
            # stored (a,c), (b,c) edges
            b.add("transfer", transfer_factor_residual,
                  ("fundamental", "fundamental"), 2,
                  [eix[(a, c)], eix[(bb, c)]],
                  {"pa": pa, "pb": pb, "pc": pc,
                   "transpose1": np.asarray(True),
                   "transpose2": np.asarray(True)}, noise)
            # predict b from a, c: F(b,a) = (a,b)^T, F(b,c) = (bb,c)
            b.add("transfer", transfer_factor_residual,
                  ("fundamental", "fundamental"), 2,
                  [eix[(a, bb)], eix[(bb, c)]],
                  {"pa": pa, "pb": pc, "pc": pb,
                   "transpose1": np.asarray(True),
                   "transpose2": np.asarray(False)}, noise)
            # predict a from b, c: F(a,b) = (a,bb), F(a,c) = (a,c)
            b.add("transfer", transfer_factor_residual,
                  ("fundamental", "fundamental"), 2,
                  [eix[(a, bb)], eix[(a, c)]],
                  {"pa": pb, "pb": pc, "pc": pa,
                   "transpose1": np.asarray(False),
                   "transpose2": np.asarray(False)}, noise)

    graph = b.build(dtype=np.float64)
    # perturb ground truth like the reference (ViewGraphExample.cpp:104 —
    # delta = [1..7] * 1e-5; the transfer cost surface is sharply nonconvex
    # in F-space, so view-graph refinement starts near a good estimate, e.g.
    # from the 8-point algorithm)
    delta = np.arange(1, 8) * 1e-5
    m = __import__("gtsam_personal_tpu.core.manifolds",
                   fromlist=["get"]).get("fundamental")
    init_F = [np.asarray(m.retract(fmat.fundamental_from_matrix(
        jnp.asarray(F)), jnp.asarray(delta))) for F in truth]
    init = Values({"fundamental": jnp.asarray(np.stack(init_F))})
    res = optimizers.optimize_lm(graph, init,
                                 optimizers.Params(max_iterations=50))
    got = np.asarray(res.values["fundamental"])
    print(f"8 fundamental matrices from {3 * 4 * npts} transfer factors: "
          f"final error {res.error:.3e} in {res.iterations} iterations")
    worst = 0.0
    for i, (e, F_gt) in enumerate(zip(edges, truth)):
        M = np.asarray(fmat.fundamental_matrix(jnp.asarray(got[i])))
        Mn, Gn = M / np.linalg.norm(M), F_gt / np.linalg.norm(F_gt)
        if np.sum(Mn * Gn) < 0:
            Mn = -Mn
        err = np.abs(Mn - Gn).max()
        worst = max(worst, err)
        print(f"  edge {e}: |F - F_gt| (normalized) = {err:.2e}")
    ok = res.error < 1e-10 and worst < 1e-4
    print("VIEW-GRAPH OK" if ok else "VIEW-GRAPH FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
