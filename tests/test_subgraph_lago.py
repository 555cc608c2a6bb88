"""Subgraph preconditioner (SPCG), DSF/track generation, Kruskal MST, and
LAGO 2D initialization tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.core.dsf import DSF, generate_tracks, kruskal_mst
from gtsam_personal_tpu.core.values import Layout
from gtsam_personal_tpu.linear import subgraph, solvers
from gtsam_personal_tpu.linear.linearize import linearize
from gtsam_personal_tpu.nonlinear import optimizers
from gtsam_personal_tpu.slam import dataset, initialize, metrics


class TestDSF:
    def test_union_find(self):
        d = DSF(5)
        d.union(0, 1); d.union(3, 4)
        assert d.find(0) == d.find(1)
        assert d.find(0) != d.find(3)
        sets = d.sets()
        assert sorted(len(v) for v in sets.values()) == [1, 2, 2]

    def test_track_generation(self):
        meas = {(0, 0): np.array([1.0, 2.0]), (1, 5): np.array([3.0, 4.0]),
                (2, 7): np.array([5.0, 6.0]), (0, 1): np.array([9.0, 9.0]),
                (1, 6): np.array([8.0, 8.0])}
        matches = [((0, 0), (1, 5)), ((1, 5), (2, 7)), ((0, 1), (1, 6))]
        tracks = generate_tracks(matches, meas)
        lens = sorted(len(t) for t in tracks)
        assert lens == [2, 3]

    def test_inconsistent_track_dropped(self):
        meas = {(0, 0): np.zeros(2), (0, 1): np.zeros(2), (1, 5): np.zeros(2)}
        matches = [((0, 0), (1, 5)), ((0, 1), (1, 5))]  # cam 0 twice
        assert generate_tracks(matches, meas) == []

    def test_kruskal(self):
        edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
        w = [1.0, 2.0, 3.0, 1.0]
        chosen = kruskal_mst(4, edges, w)
        assert len(chosen) == 3
        assert 2 in chosen  # heaviest edge first


class TestSPCG:
    def test_spcg_matches_dense(self):
        graph, initial = dataset.load_2d(dataset.find_example_data("w100.graph"))
        lin = linearize(graph, initial)
        layout = Layout.of(initial)
        masks = subgraph.build_spanning_tree_selection(graph.batches,
                                                       initial.counts())
        d_ref = solvers.solve_dense(lin, layout, lam=1e-6)
        d_spcg = subgraph.solve_spcg(lin, masks, layout, lam=1e-6,
                                     maxiter=300, tol=1e-12)
        np.testing.assert_allclose(np.asarray(layout.flatten(d_spcg)),
                                   np.asarray(layout.flatten(d_ref)), atol=1e-6)

    def test_spcg_converges_faster_than_jacobi_on_chain(self):
        """On a long chain, SPCG's tree preconditioner is exact -> converges
        in O(1) iterations while block-Jacobi needs O(n)."""
        from gtsam_personal_tpu.core.graph import GraphBuilder
        from gtsam_personal_tpu.core.values import Values
        from gtsam_personal_tpu.slam import factors as F
        b = GraphBuilder()
        F.add_prior(b, "se2", 0, np.zeros(3), F.diag_noise([0.1, 0.1, 0.1]))
        n = 120
        for i in range(n - 1):
            F.add_between(b, "se2", i, i + 1, np.array([1.0, 0, 0]),
                          F.diag_noise([0.1, 0.1, 0.1]))
        graph = b.build()
        poses = np.zeros((n, 3)); poses[:, 0] = np.arange(n) + 0.1
        vals = Values({"se2": jnp.asarray(poses)})
        lin = linearize(graph, vals)
        layout = Layout.of(vals)
        masks = subgraph.build_spanning_tree_selection(graph.batches, vals.counts())
        d_ref = solvers.solve_dense(lin, layout)
        # pure chain: the tree system IS the whole system -> 1-2 CG iters
        d_spcg = subgraph.solve_spcg(lin, masks, layout, maxiter=3, tol=1e-12)
        np.testing.assert_allclose(np.asarray(layout.flatten(d_spcg)),
                                   np.asarray(layout.flatten(d_ref)), atol=1e-8)


class TestLago:
    def test_lago_on_w100(self):
        graph, initial = dataset.load_2d(dataset.find_example_data("w100.graph"))
        init = initialize.lago_init_2d(graph, 100)
        e_lago = float(optimizers.graph_error(graph, init))
        res_file = float(optimizers.graph_error(graph, initial))
        # LAGO init should be in the right basin; LM refines to the optimum
        res = optimizers.optimize_lm(graph, init)
        res2 = optimizers.optimize_lm(graph, initial)
        np.testing.assert_allclose(res.error, res2.error, rtol=1e-3)
