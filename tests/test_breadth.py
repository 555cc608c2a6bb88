"""Breadth-sweep parity tests: Sim2, FundamentalMatrix + transfer, SOn,
Cal3Unified/Cal3_S2Stereo, slam long-tail factors, Mag/AHRS factors,
ManifoldPreintegration, AcceleratingScenario, AntiFactor, QPS parser.

Mirrors the reference's unit-test strategy (testSimilarity2.cpp,
testFundamentalMatrix.cpp, testTransferFactor.cpp, testRotateFactor.cpp,
testMagFactor.cpp, testAHRSFactor.cpp, QPSParser tests)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gtsam_personal_tpu.core import manifolds
from gtsam_personal_tpu.geometry import se2, se3, so3, extra, fundamental as fmat, son, cameras
from gtsam_personal_tpu.testing.numerical import numerical_jacobian


# ---------------------------------------------------------------------------
# Sim2
# ---------------------------------------------------------------------------

def test_sim2_group_ops():
    a = extra.sim2_make(jnp.array([1.0, 2.0]), 0.7, 1.5)
    b = extra.sim2_make(jnp.array([-0.5, 0.3]), -0.2, 0.8)
    ab = extra.sim2_compose(a, b)
    p = jnp.array([0.4, -1.1])
    np.testing.assert_allclose(
        extra.sim2_transform(ab, p),
        extra.sim2_transform(a, extra.sim2_transform(b, p)), atol=1e-12)
    ai = extra.sim2_inverse(a)
    np.testing.assert_allclose(
        extra.sim2_compose(a, ai), extra.sim2_identity(jnp.float64), atol=1e-12)


def test_sim2_exp_log_roundtrip():
    for xi in ([0.3, -0.2, 0.5, 0.1], [0.0, 0.0, 0.0, 0.0],
               [1.0, 2.0, 1e-9, 1e-9], [0.5, -0.5, 0.8, -0.6]):
        xi = jnp.asarray(xi, dtype=jnp.float64)
        g = extra.sim2_expmap(xi)
        np.testing.assert_allclose(extra.sim2_logmap(g), xi, atol=1e-9)


def test_sim2_manifold_consistency():
    m = manifolds.get("sim2")
    g = extra.sim2_make(jnp.array([1.0, -2.0]), 0.4, 2.0)
    xi = jnp.array([0.1, -0.2, 0.3, -0.1])
    h = m.retract(g, xi)
    np.testing.assert_allclose(m.local(g, h), xi, atol=1e-9)


def test_sim2_align_pairs():
    true = extra.sim2_make(jnp.array([0.5, -1.0]), 0.9, 1.7)
    src = jnp.asarray(np.random.default_rng(0).normal(size=(6, 2)))
    dst = jax.vmap(lambda p: extra.sim2_transform(true, p))(src)
    est = extra.sim2_align_pairs(src, dst)
    np.testing.assert_allclose(est, true, atol=1e-9)


# ---------------------------------------------------------------------------
# FundamentalMatrix
# ---------------------------------------------------------------------------

def _three_view_setup():
    rng = np.random.default_rng(3)
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    poses = []
    for c in range(3):
        w = 0.1 * rng.normal(size=3)
        t = np.array([c * 1.0, 0.1 * rng.normal(), 0.0])
        poses.append(np.asarray(se3.make(so3.expmap(jnp.asarray(w)), jnp.asarray(t))))
    return K, poses


def _F_between(K, pose_a, pose_b):
    """F such that x_a^T F x_b = 0 for pixel correspondences."""
    aTb = np.asarray(se3.between(jnp.asarray(pose_a), jnp.asarray(pose_b)))
    R, t = aTb[:, :3], aTb[:, 3]
    tn = t / np.linalg.norm(t)
    E = np.asarray(so3.hat(jnp.asarray(tn))) @ R
    return np.linalg.inv(K).T @ E @ np.linalg.inv(K)


def test_fundamental_matrix_roundtrip():
    K, poses = _three_view_setup()
    F = _F_between(K, poses[0], poses[1])
    f = fmat.fundamental_from_matrix(jnp.asarray(F))
    M = np.asarray(fmat.fundamental_matrix(f))
    # fundamental matrices are projective: compare up to scale AND sign
    Mn, Fn = M / np.linalg.norm(M), F / np.linalg.norm(F)
    if np.sum(Mn * Fn) < 0:
        Mn = -Mn
    np.testing.assert_allclose(Mn, Fn, atol=1e-9)


def test_fundamental_manifold():
    m = manifolds.get("fundamental")
    f = m.identity(jnp.float64)
    xi = jnp.array([0.1, -0.05, 0.2, 0.3, 0.02, -0.1, 0.15])
    g = m.retract(f, xi)
    np.testing.assert_allclose(m.local(f, g), xi, atol=1e-9)


def test_simple_fundamental_manifold():
    m = manifolds.get("simple_fundamental")
    f = m.identity(jnp.float64)
    xi = jnp.array([0.1, -0.05, 0.2, 0.05, -0.1, 0.3, -0.2])
    g = m.retract(f, xi)
    np.testing.assert_allclose(m.local(f, g), xi, atol=1e-9)


def test_epipolar_transfer_recovers_point():
    K, poses = _three_view_setup()
    P = np.array([0.7, -0.3, 5.0])
    pix = [np.asarray(cameras.project_point(
        jnp.asarray(p), jnp.asarray(P),
        jnp.array([500.0, 500.0, 0.0, 320.0, 240.0]), "cal3_s2"))
        for p in poses]
    # transfer into view c=2 using F(2,0) and F(2,1)
    Fca = _F_between(K, poses[2], poses[0])
    Fcb = _F_between(K, poses[2], poses[1])
    pred = fmat.epipolar_transfer(jnp.asarray(Fca), jnp.asarray(pix[0]),
                                  jnp.asarray(Fcb), jnp.asarray(pix[1]))
    np.testing.assert_allclose(pred, pix[2], atol=1e-6)


def test_transfer_factor_residual_zero_at_truth():
    from gtsam_personal_tpu.slam.factors import transfer_factor_residual
    K, poses = _three_view_setup()
    P = np.array([0.2, 0.4, 6.0])
    pix = [np.asarray(cameras.project_point(
        jnp.asarray(p), jnp.asarray(P),
        jnp.array([500.0, 500.0, 0.0, 320.0, 240.0]), "cal3_s2"))
        for p in poses]
    F1 = fmat.fundamental_from_matrix(jnp.asarray(_F_between(K, poses[2], poses[0])))
    F2 = fmat.fundamental_from_matrix(jnp.asarray(_F_between(K, poses[2], poses[1])))
    meas = {"pa": jnp.asarray(pix[0]), "pb": jnp.asarray(pix[1]),
            "pc": jnp.asarray(pix[2]),
            "transpose1": jnp.asarray(False), "transpose2": jnp.asarray(False)}
    r = transfer_factor_residual((F1, F2), meas)
    np.testing.assert_allclose(r, 0.0, atol=1e-5)


# ---------------------------------------------------------------------------
# SOn
# ---------------------------------------------------------------------------

def test_son_hat_matches_so3():
    xi = jnp.array([0.3, -0.2, 0.5])
    np.testing.assert_allclose(son.hat(xi, 3), so3.hat(xi), atol=1e-15)
    np.testing.assert_allclose(son.vee(so3.hat(xi)), xi, atol=1e-15)


@pytest.mark.parametrize("n", [2, 3, 4, 5])
def test_son_hat_vee_roundtrip(n):
    d = son.tangent_dim(n)
    xi = jnp.asarray(np.random.default_rng(n).normal(size=d))
    W = son.hat(xi, n)
    np.testing.assert_allclose(W, -W.T, atol=1e-15)
    np.testing.assert_allclose(son.vee(W), xi, atol=1e-14)


@pytest.mark.parametrize("n", [3, 4, 5])
def test_son_retract_local(n):
    m = son.register_son(n)
    d = son.tangent_dim(n)
    rng = np.random.default_rng(n + 10)
    R = son.expmap(jnp.asarray(0.3 * rng.normal(size=d)), n)
    np.testing.assert_allclose(R @ R.T, np.eye(n), atol=1e-12)
    assert abs(np.linalg.det(np.asarray(R)) - 1.0) < 1e-10
    xi = jnp.asarray(0.2 * rng.normal(size=d))
    S = m.retract(R, xi)
    np.testing.assert_allclose(np.asarray(S) @ np.asarray(S).T, np.eye(n), atol=1e-12)
    np.testing.assert_allclose(m.local(R, S), xi, atol=1e-10)


def test_son_exp_log_roundtrip():
    xi = jnp.asarray(np.random.default_rng(7).normal(size=6) * 0.4)
    R = son.expmap(xi, 4)
    np.testing.assert_allclose(son.logmap(R), xi, atol=1e-9)


# ---------------------------------------------------------------------------
# Calibrations
# ---------------------------------------------------------------------------

def test_cal3unified_reduces_to_ds2_at_zero_xi():
    k10 = jnp.array([500.0, 510.0, 0.1, 320.0, 240.0,
                     1e-2, -3e-3, 1e-4, -2e-4, 0.0])
    p = jnp.array([0.1, -0.2])
    np.testing.assert_allclose(cameras.uncalibrate_cal3unified(k10, p),
                               cameras.uncalibrate_cal3ds2(k10[:9], p), atol=1e-12)


def test_cal3unified_sphere_mapping_inverts():
    k = jnp.array([500.0, 510.0, 0.0, 320.0, 240.0, 0.0, 0.0, 0.0, 0.0, 0.9])
    p = jnp.array([0.3, -0.15])
    xi = k[9]
    pn = p / (1.0 + xi * jnp.sqrt(p[0] ** 2 + p[1] ** 2 + 1.0))
    back = cameras.nplane_to_space_cal3unified(k, pn)
    np.testing.assert_allclose(back, p, atol=1e-10)


def test_cal3_s2stereo_projection():
    k = jnp.array([500.0, 510.0, 0.0, 320.0, 240.0, 0.12])
    pc = jnp.array([0.5, -0.3, 4.0])
    uLuRv = cameras.stereo_project(k, pc)
    np.testing.assert_allclose(uLuRv[0] - uLuRv[1], 500.0 * 0.12 / 4.0, atol=1e-10)
    np.testing.assert_allclose(uLuRv[2], 510.0 * (-0.3 / 4.0) + 240.0, atol=1e-10)


# ---------------------------------------------------------------------------
# slam long-tail factors
# ---------------------------------------------------------------------------

def test_planar_projection_residual():
    from gtsam_personal_tpu.slam import factors as F
    wTb = jnp.array([1.0, 2.0, 0.3])
    bTc = se3.make(so3.expmap(jnp.array([0.0, 0.2, 0.0])), jnp.array([0.1, 0.0, 0.5]))
    calib = jnp.array([500.0, 500.0, 0.0, 320.0, 240.0, 0.0, 0.0, 0.0, 0.0])
    landmark = jnp.array([5.0, 2.5, 1.0])
    pix = F._planar_project(landmark, wTb, bTc, calib)
    meas = {"landmark": landmark, "bTc": bTc, "calib": calib, "measured": pix}
    np.testing.assert_allclose(
        F.planar_projection1_residual((wTb,), meas), 0.0, atol=1e-10)
    np.testing.assert_allclose(
        F.planar_projection2_residual((wTb, landmark), meas), 0.0, atol=1e-10)
    np.testing.assert_allclose(
        F.planar_projection3_residual((wTb, bTc, calib), meas), 0.0, atol=1e-10)
    # FD Jacobian through the pose slot matches autodiff-through-retraction
    def res_of_delta(delta):
        return F.planar_projection1_residual((se2.retract(wTb, delta),), meas)

    J_ad = np.asarray(jax.jacfwd(res_of_delta)(jnp.zeros(3, dtype=jnp.float64)))
    J_fd = numerical_jacobian(
        lambda d: np.asarray(res_of_delta(jnp.asarray(d))), np.zeros(3))
    np.testing.assert_allclose(J_ad, J_fd, atol=1e-4)


def test_rotate_factors():
    from gtsam_personal_tpu.slam import factors as F
    R = so3.expmap(jnp.array([0.2, -0.1, 0.4]))
    z = jnp.array([0.0, 0.0, 1.0])
    p = R @ z
    np.testing.assert_allclose(
        F.rotate_residual((R,), {"z": z, "p": p}), 0.0, atol=1e-12)
    np.testing.assert_allclose(
        F.rotate_directions_residual((R,), {"c_z": z, "i_p": p}), 0.0, atol=1e-9)


def test_reference_frame_factor():
    from gtsam_personal_tpu.slam import factors as F
    res = F.make_reference_frame_residual()
    lTg = se3.make(so3.expmap(jnp.array([0.1, 0.2, -0.1])), jnp.array([1.0, 2.0, 3.0]))
    p_global = jnp.array([0.5, -0.5, 1.5])
    p_local = se3.transform_from(lTg, p_global)
    np.testing.assert_allclose(res((p_global, lTg, p_local), {}), 0.0, atol=1e-12)


def test_oriented_plane3_factor():
    from gtsam_personal_tpu.slam import factors as F
    pose = se3.make(so3.expmap(jnp.array([0.0, 0.1, 0.3])), jnp.array([1.0, 0.0, 2.0]))
    plane = jnp.array([0.0, 0.0, 1.0, 3.0])
    measured = extra.plane_transform(plane, pose)
    r = F.oriented_plane3_residual((pose, plane), {"measured": measured})
    np.testing.assert_allclose(r, 0.0, atol=1e-10)
    rp = F.oriented_plane3_direction_prior_residual(
        (plane,), {"measured": plane})
    np.testing.assert_allclose(rp, 0.0, atol=1e-12)


def test_bounding_constraint_hinge():
    from gtsam_personal_tpu.slam import factors as F
    a = jnp.array([0.0, 0.0, 0.0])
    b = jnp.array([3.0, 4.0, 0.0])   # range 5
    r = F.range_bound_residual((a, b), {"threshold": jnp.asarray(6.0)})
    np.testing.assert_allclose(r, 0.0, atol=1e-9)
    r2 = F.range_bound_residual((a, b), {"threshold": jnp.asarray(4.0)})
    np.testing.assert_allclose(r2, 1.0, atol=1e-6)


def test_anti_factor_cancels():
    from gtsam_personal_tpu.core.graph import GraphBuilder, FactorGraph
    from gtsam_personal_tpu.core.values import Values
    from gtsam_personal_tpu.slam import factors as F
    from gtsam_personal_tpu.linear.linearize import linearize

    rb = F.make_between_residual("se2")
    pr = F.make_prior_residual("se2")
    gb = GraphBuilder()
    gb.add("prior_se2", pr, ["se2"], 3, [0], {"prior": np.zeros(3)},
           F.diag_noise(np.full(3, 1e-3)))
    gb.add("between_se2", rb, ["se2", "se2"], 3, [0, 1],
           {"measured": np.array([1.0, 0.0, 0.1])}, F.diag_noise(np.full(3, 0.1)))
    base = gb.build(dtype=np.float64)

    gb2 = GraphBuilder()
    gb2.add("between_se2", rb, ["se2", "se2"], 3, [0, 1],
            {"measured": np.array([2.0, 1.0, -0.2])}, F.diag_noise(np.full(3, 0.2)))
    extra_batch = gb2.build(dtype=np.float64).batches[0]

    vals = Values({"se2": jnp.asarray(np.random.default_rng(0).normal(size=(2, 3)) * 0.1)})
    with_anti = FactorGraph(base.batches + [extra_batch, extra_batch.negated()])
    np.testing.assert_allclose(float(with_anti.error(vals)),
                               float(base.error(vals)), atol=1e-10)
    lin_base = linearize(base, vals)
    lin_anti = linearize(with_anti, vals)
    x = {"se2": jnp.asarray(np.random.default_rng(1).normal(size=(2, 3)))}
    hv_b = lin_base.hessian_vector_product(x)
    hv_a = lin_anti.hessian_vector_product(x)
    np.testing.assert_allclose(hv_a["se2"], hv_b["se2"], atol=1e-10)
    np.testing.assert_allclose(lin_anti.gradient_at_zero()["se2"],
                               lin_base.gradient_at_zero()["se2"], atol=1e-10)


# ---------------------------------------------------------------------------
# navigation: Mag, AHRS, manifold preintegration, accelerating scenario
# ---------------------------------------------------------------------------

def test_mag_factors_zero_at_truth():
    from gtsam_personal_tpu.navigation import factors as NF
    nRb = so3.expmap(jnp.array([0.1, -0.3, 0.7]))
    nM = jnp.array([22.0, 0.0, -44.0])
    bias = jnp.array([1.0, -2.0, 3.0])
    measured = nRb.T @ nM + bias
    np.testing.assert_allclose(NF.mag_rot3_residual(
        (nRb,), {"nM": nM, "bias": bias, "measured": measured}), 0.0, atol=1e-10)
    np.testing.assert_allclose(NF.mag_field_bias_residual(
        (nM, bias), {"bRn": nRb.T, "measured": measured}), 0.0, atol=1e-10)
    scale = jnp.linalg.norm(nM)
    direction = nM / scale
    np.testing.assert_allclose(NF.mag_scale_dir_bias_residual(
        (jnp.atleast_1d(scale), direction, bias),
        {"bRn": nRb.T, "measured": measured}), 0.0, atol=1e-9)
    pose = se3.make(nRb, jnp.array([5.0, 6.0, 7.0]))
    np.testing.assert_allclose(NF.mag_pose_residual(
        (pose,), {"nM": nM, "bias": bias, "measured": measured}), 0.0, atol=1e-10)


def test_ahrs_preintegration_and_factor():
    from gtsam_personal_tpu.navigation import preintegration as pre
    rng = np.random.default_rng(4)
    true_bias = jnp.array([0.01, -0.02, 0.005])
    gyros = jnp.asarray(0.3 * rng.normal(size=(50, 3)) + np.array([0.1, 0.2, -0.1]))
    dts = jnp.full(50, 0.01)
    apim = pre.integrate_ahrs(jnp.eye(3) * 1e-6, true_bias, gyros + true_bias, dts)
    # ground-truth deltaR from direct integration of the unbiased rates
    R = jnp.eye(3, dtype=jnp.float64)
    for k in range(50):
        R = R @ so3.expmap(gyros[k] * dts[k])
    Ri = so3.expmap(jnp.array([0.3, -0.1, 0.2]))
    Rj = Ri @ R
    meas = {"theta": apim.theta, "H_bw": apim.H_bw, "bias_hat": apim.bias_hat}
    r = pre.ahrs_residual((Ri, Rj, true_bias), meas)
    np.testing.assert_allclose(r, 0.0, atol=1e-9)
    # the bias correction moves the residual by the first-order prediction
    delta = jnp.asarray([1e-3, -2e-3, 5e-4])
    r2 = pre.ahrs_residual((Ri, Rj, true_bias + delta), meas)
    # Exp(theta + Hd) = Exp(theta) Exp(Jr(theta) Hd) => r = -Jr(theta) Hd
    Jr = so3.left_jacobian(-apim.theta)
    np.testing.assert_allclose(r2, -Jr @ (apim.H_bw @ delta), atol=1e-7)


def test_manifold_preintegration_matches_tangent():
    from gtsam_personal_tpu.navigation import preintegration as pre
    params = pre.PreintegrationParams.make_shared_u(dtype=jnp.float64)
    rng = np.random.default_rng(5)
    accs = jnp.asarray(rng.normal(size=(100, 3)) + np.array([0.0, 0.0, 9.81]))
    gyros = jnp.asarray(0.2 * rng.normal(size=(100, 3)))
    dts = jnp.full(100, 0.005)
    bias = jnp.zeros(6, dtype=jnp.float64)
    pim_t = pre.integrate(params, bias, accs, gyros, dts)
    pim_m = pre.integrate_manifold(params, bias, accs, gyros, dts)
    # both backends agree to integration error O(dt^2)
    np.testing.assert_allclose(pim_m.zeta, pim_t.zeta, atol=1e-4)
    np.testing.assert_allclose(pim_m.H_ba, pim_t.H_ba, atol=1e-3)
    np.testing.assert_allclose(pim_m.H_bw, pim_t.H_bw, atol=2e-2)


def test_accelerating_scenario_preintegration():
    from gtsam_personal_tpu.navigation import preintegration as pre, scenario, navstate
    params = pre.PreintegrationParams.make_shared_u(dtype=jnp.float64)
    sc = scenario.AcceleratingScenario(
        R0=np.eye(3), p0=np.zeros(3), v0=np.array([1.0, 0.0, 0.0]),
        a_n=np.array([0.3, -0.2, 0.0]), omega_b=np.array([0.0, 0.0, 0.1]))
    accs, gyros, dts = sc.imu_measurements(1.0, 0.001, np.array([0.0, 0.0, -9.81]))
    pim = pre.integrate_manifold(params, jnp.zeros(6),
                                 jnp.asarray(accs), jnp.asarray(gyros),
                                 jnp.asarray(dts))
    state0 = sc.nav_state(0.0)
    pred = pre.predict(pim, params, state0, jnp.zeros(6))
    expected = sc.nav_state(1.0)
    np.testing.assert_allclose(navstate.position(pred),
                               navstate.position(expected), atol=1e-4)
    np.testing.assert_allclose(navstate.velocity(pred),
                               navstate.velocity(expected), atol=1e-4)


# ---------------------------------------------------------------------------
# smart rig factor
# ---------------------------------------------------------------------------

def test_smart_rig_factor_zero_at_truth():
    from gtsam_personal_tpu.sfm import smart
    rng = np.random.default_rng(6)
    # two rig cameras on a body, three body poses
    rig_bTc = np.stack([
        np.asarray(se3.make(jnp.eye(3), jnp.array([0.1, 0.0, 0.0]))),
        np.asarray(se3.make(so3.expmap(jnp.array([0.0, 0.3, 0.0])),
                            jnp.array([-0.1, 0.0, 0.0])))])
    rig_cal = np.tile(np.array([400.0, 400.0, 0.0, 320.0, 240.0]), (2, 1))
    bodies = [np.asarray(se3.make(so3.expmap(jnp.asarray(0.05 * rng.normal(size=3))),
                                  jnp.array([i * 0.5, 0.0, 0.0])))
              for i in range(3)]
    P = np.array([0.3, 0.2, 5.0])
    track, uvs, cam_ids = [0, 1, 2], [], [0, 1, 0]
    for i, c in zip(track, cam_ids):
        wTc = se3.compose(jnp.asarray(bodies[i]), jnp.asarray(rig_bTc[c]))
        uvs.append(np.asarray(cameras.project_point(
            wTc, jnp.asarray(P), jnp.asarray(rig_cal[c]), "cal3_s2")))
    batches = smart.build_smart_rig_batches(
        [track], [np.asarray(uvs)], [cam_ids], rig_bTc, rig_cal)
    assert len(batches) == 1
    b = batches[0]
    xs = tuple(jnp.asarray(bodies[i])[None][0] for i in track)
    meas0 = jax.tree.map(lambda x: x[0], b.meas)
    r = b.residual_fn(xs, meas0)
    np.testing.assert_allclose(r, 0.0, atol=1e-6)


# ---------------------------------------------------------------------------
# QPS parser
# ---------------------------------------------------------------------------

def test_qps_parser_qptest():
    from gtsam_personal_tpu.io import qps
    from gtsam_personal_tpu.slam.dataset import find_example_data
    qp = qps.parse_qps(find_example_data("QPTEST.QPS"))
    assert qp.var_names == ("c1", "c2")
    np.testing.assert_allclose(qp.G, [[8.0, 2.0], [2.0, 10.0]])
    np.testing.assert_allclose(qp.g, [1.5, -2.0])
    x, obj = qps.solve_qps(find_example_data("QPTEST.QPS"))
    # cross-check with scipy on the same parsed arrays
    from scipy.optimize import minimize
    cons = [{"type": "ineq", "fun": lambda v, a=a, b=b: b - a @ v}
            for a, b in zip(qp.A_in, qp.b_in)]
    ref = minimize(lambda v: 0.5 * v @ qp.G @ v + qp.g @ v, [0.5, 0.5],
                   constraints=cons, method="SLSQP")
    np.testing.assert_allclose(x, ref.x, atol=1e-3)   # SLSQP is the loose one
    # exact KKT check: active constraint 2x1 + x2 = 2, gradient = lambda * a
    np.testing.assert_allclose(2 * x[0] + x[1], 2.0, atol=1e-10)
    grad = qp.G @ x + qp.g
    np.testing.assert_allclose(grad[0] / 2.0, grad[1], atol=1e-10)


def test_qps_parser_hs21():
    from gtsam_personal_tpu.io import qps
    from gtsam_personal_tpu.slam.dataset import find_example_data
    x, obj = qps.solve_qps(find_example_data("HS21.QPS"))
    # known Maros-Meszaros optimum for HS21: -99.96
    np.testing.assert_allclose(obj, -99.96, atol=1e-4)
