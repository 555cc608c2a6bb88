"""Round-4 long-tail parity sweep (reference gtsam_unstable/slam +
slam/EssentialMatrixConstraint): each factor checked against the
finite-difference Jacobian oracle and/or a constructed zero-residual case."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.geometry import se3, extra
from gtsam_personal_tpu.slam import factors as F
from gtsam_personal_tpu.navigation import factors as NF
from gtsam_personal_tpu.testing.numerical import numerical_jacobian


def _pose(seed=0):
    key = jax.random.PRNGKey(seed)
    return se3.random(key, dtype=jnp.float64)


def _fd_check(residual, xs, meas, retracts, atol=1e-6, delta=1e-6):
    """jacfwd through each argument's retraction == FD oracle."""
    for s, (x, retract) in enumerate(zip(xs, retracts)):
        vector = retract is None

        def at(xi):
            pt = (xs[s] + xi.reshape(np.asarray(xs[s]).shape) if vector
                  else retract(xs[s], jnp.asarray(xi)))
            xs2 = list(xs)
            xs2[s] = pt
            return residual(tuple(xs2), meas)
        dim = np.asarray(x).size if vector else 6
        J_ad = jax.jacfwd(lambda t: at(t))(jnp.zeros(dim, dtype=jnp.float64))
        J_fd = numerical_jacobian(
            lambda p: np.asarray(residual(
                tuple(x if i != s else p for i, x in enumerate(xs)), meas)),
            np.asarray(x),
            retract=None if vector else lambda p, d: np.asarray(
                retract(jnp.asarray(p), jnp.asarray(d))), delta=delta)
        np.testing.assert_allclose(np.asarray(J_ad), J_fd, atol=atol)


def test_partial_prior_se3():
    res = F.make_partial_prior_residual("se3", [2, 5])   # yaw-ish + z-ish
    p = _pose(1)
    full = np.asarray(se3.logmap(p))
    meas = {"prior": jnp.asarray(full[[2, 5]])}
    r = res((p,), meas)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)
    _fd_check(res, (p,), meas, [se3.retract])


def test_relative_elevation():
    p = _pose(2)
    pt = jnp.array([1.0, -2.0, 3.0])
    h = float(se3.translation(p)[2]) - 3.0
    meas = {"measured": jnp.asarray([h])}
    r = F.relative_elevation_residual((p, pt), meas)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)
    _fd_check(F.relative_elevation_residual, (p, pt), meas,
              [se3.retract, None])


def test_essential_matrix_constraint():
    p1, p2 = _pose(3), _pose(4)
    rel = se3.between(p1, p2)
    t = np.asarray(se3.translation(rel))
    meas = {"measured_R": se3.rotation(rel),
            "measured_t": jnp.asarray(t / np.linalg.norm(t))}
    r = F.essential_matrix_constraint_residual((p1, p2), meas)
    assert r.shape == (5,)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-9)
    _fd_check(F.essential_matrix_constraint_residual, (p1, p2), meas,
              [se3.retract, se3.retract], atol=5e-6, delta=1e-4)


def test_projection_ppp():
    wTb = _pose(5)
    bTc = se3.retract(se3.identity(jnp.float64),
                      jnp.array([0.05, -0.02, 0.1, 0.2, 0.0, -0.1]))
    cam = se3.compose(wTb, bTc)
    pt = np.asarray(se3.transform_from(cam, jnp.array([0.3, -0.2, 4.0])))
    cal = jnp.array([500.0, 500.0, 0.0, 320.0, 240.0])
    from gtsam_personal_tpu.geometry import cameras as cam_geo
    uv = cam_geo.project_point(cam, jnp.asarray(pt), cal)
    meas = {"measured": uv, "cal": cal}
    r = F.projection_ppp_residual((wTb, bTc, jnp.asarray(pt)), meas)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-9)
    _fd_check(F.projection_ppp_residual, (wTb, bTc, jnp.asarray(pt)), meas,
              [se3.retract, se3.retract, None], atol=5e-5)


def test_between_and_prior_with_sensor_offset():
    res_b = F.make_between_sensor_residual("se3")
    res_p = F.make_prior_sensor_residual("se3")
    a, b = _pose(6), _pose(7)
    bTs = se3.retract(se3.identity(jnp.float64),
                      jnp.array([0.1, 0.0, -0.05, 0.3, 0.1, 0.0]))
    sa, sb = se3.compose(a, bTs), se3.compose(b, bTs)
    meas = {"body_P_sensor": bTs, "measured": se3.between(sa, sb)}
    np.testing.assert_allclose(np.asarray(res_b((a, b), meas)), 0.0,
                               atol=1e-12)
    _fd_check(res_b, (a, b), meas, [se3.retract, se3.retract])
    measp = {"body_P_sensor": bTs, "prior": sa}
    np.testing.assert_allclose(np.asarray(res_p((a,), measp)), 0.0,
                               atol=1e-12)
    _fd_check(res_p, (a,), measp, [se3.retract])


def test_local_oriented_plane3():
    pose, anchor = _pose(8), _pose(9)
    plane = jnp.array([0.0, 0.0, 1.0, 2.0])     # unit normal + distance
    rel = se3.compose(se3.inverse(anchor), pose)
    meas = {"measured": extra.plane_transform(plane, rel)}
    r = F.local_oriented_plane3_residual((pose, anchor, plane), meas)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-9)


def test_biased_gps():
    p = _pose(10)
    bias = jnp.array([0.5, -0.2, 0.1])
    meas = {"measured": se3.translation(p) + bias}
    r = NF.biased_gps_residual((p, bias), meas)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)
    _fd_check(NF.biased_gps_residual, (p, bias), meas,
              [se3.retract, None])


def test_gauss_markov():
    v1 = jnp.array([1.0, -2.0, 0.5])
    tau = jnp.array([10.0, 5.0, 1.0])
    dt = 0.5
    alpha = np.exp(-dt / np.asarray(tau))
    v2 = jnp.asarray(alpha * np.asarray(v1))
    meas = {"dt": jnp.asarray(dt), "tau": tau}
    r = NF.gauss_markov_residual((v1, v2), meas)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)
    s = NF.gauss_markov_discrete_sigmas([0.1, 0.2, 0.3], 0.25)
    np.testing.assert_allclose(s, np.array([0.05, 0.1, 0.15]))


def test_signature_parser():
    from gtsam_personal_tpu.discrete import discrete as D
    # the reference's Asia-network style spec: P(T|A) = "99/1 95/5"
    c = D.parse_signature("99/1 95/5", 1, (0,), (2,))
    np.testing.assert_allclose(c.table[0, :], [0.99, 0.95])  # P(f=0|parent)
    prior = D.parse_signature("4/6", 0, ())
    np.testing.assert_allclose(prior.table, [0.4, 0.6])
    with pytest.raises(ValueError):
        D.parse_signature("1/1 2/2 3/3", 1, (0,), (2,))


def test_partial_prior_in_graph():
    """PartialPrior in an actual optimization: pin only z + yaw of a free
    pose, leave the rest to odometry."""
    from gtsam_personal_tpu.core.graph import GraphBuilder
    from gtsam_personal_tpu.core.values import Values
    from gtsam_personal_tpu.nonlinear import optimizers
    res = F.make_partial_prior_residual("se3", [2, 5])
    truth = se3.retract(se3.identity(jnp.float64),
                        jnp.array([0.0, 0.0, 0.3, 1.0, 2.0, 0.7]))
    full = np.asarray(se3.logmap(truth))
    b = GraphBuilder()
    b.add("prior_se3", F.make_prior_residual("se3"), ("se3",), 6, [0],
          {"prior": np.asarray(se3.identity(jnp.float64))},
          {"kind": "diag", "data": np.full(6, 10.0)})
    b.add("between_se3", F.make_between_residual("se3"), ("se3", "se3"), 6,
          [0, 1], {"measured": np.asarray(truth)},  # relative from identity
          {"kind": "diag", "data": np.full(6, 1.0)})
    b.add("partial", res, ("se3",), 2, [1],
          {"prior": full[[2, 5]]}, {"kind": "diag", "data": np.full(2, 100.0)})
    graph = b.build(dtype=np.float64)
    init = Values({"se3": jnp.stack([se3.identity(jnp.float64),
                                     se3.identity(jnp.float64)])})
    out = optimizers.optimize_lm(graph, init,
                                 optimizers.Params(max_iterations=20))
    got = np.asarray(se3.logmap(out.values["se3"][1]))
    np.testing.assert_allclose(got[[2, 5]], full[[2, 5]], atol=1e-2)
