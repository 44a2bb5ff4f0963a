"""Golden cross-check: production preintegration vs a literal transliteration
of the reference C++ recursion (tests/golden_ref.py).

This is the SURVEY §7 stage-2 requirement ("golden-test against a tiny NumPy
reimplementation of the C++ recursion"): every block of the 15-dim
(integration_base.h:102-137) and 31-dim (imu_leg_integration_base.cpp:138-469)
midpoint recursion — deltas, the F/V transition blocks including the kron g/h
terms, the noise layout of parameters.h:135-172, J/P accumulation, contact
models 0 and 2, the airborne branch, repropagation, and the residual
evaluate() — is asserted element-wise against an independent NumPy port. A
misread of any block in the JAX implementation fails these tests.

Tolerance scheme: the golden port runs in "instep" quaternion mode (matching
the production choice of normalizing the step quaternion before use); there
agreement must be at roundoff (`REL_TOL`, ~1e-12 matrix-relative). The
literal Eigen semantics (unnormalized mid-step quaternion, utility.h:28-38 /
integration_base.h:165) are separately bounded against "instep" to show the
production normalization choice is numerically immaterial.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.kinematics import (
    leg_dfk_drho, leg_dJ_dq, leg_dJ_drho, leg_fk, leg_jac,
)
from cerberus_tpu.ops import (
    PreintParams, il_preintegrate, il_residual, imu_preintegrate, imu_residual,
)
from cerberus_tpu.ops.preintegration import il_init_carry, il_step_full
from cerberus_tpu.utils import lie

from golden_ref import (
    GoldenIMULegIntegrationBase, GoldenILParams, GoldenIntegrationBase,
    GoldenKinematics, dfk_drho_literal, fk_literal, jac_literal,
)

REL_TOL = 1e-12     # "instep" agreement: pure roundoff
G = np.array([0.0, 0.0, 9.805])


def assert_rel(got, want, name, tol=REL_TOL):
    got = np.asarray(got, float)
    want = np.asarray(want, float)
    scale = max(1.0, np.max(np.abs(want)))
    err = np.max(np.abs(got - want)) / scale
    assert err < tol, f"{name}: matrix-relative error {err:.3e} >= {tol:.1e}"


# ---------------------------------------------------------------------------
# Nontrivial geometry so R_br / p_br terms are exercised
# ---------------------------------------------------------------------------

def _rot(ax, ang):
    ax = np.asarray(ax, float) / np.linalg.norm(ax)
    K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
    return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K

R_BR = _rot([0.3, -0.5, 0.8], 0.17)
P_BR = np.array([0.02, -0.013, 0.041])


def make_cfg(contact_sensor_type):
    cfg = EstimatorConfig(contact_sensor_type=contact_sensor_type)
    robot = dataclasses.replace(
        cfg.robot, p_br=tuple(P_BR), R_br=tuple(map(tuple, R_BR)))
    # contact_lo_guard_rescale=0 restores EXACT reference noise semantics
    # for binary contact models (the guard is an intentional deviation —
    # see PreintParams.lo_guard; its behavior has its own test below)
    noise = dataclasses.replace(cfg.noise, contact_lo_guard_rescale=0.0)
    return dataclasses.replace(cfg, robot=robot, noise=noise)


def golden_params(cfg):
    n = cfg.noise
    return GoldenILParams(
        acc_n=n.acc_n, acc_n_z=n.acc_n_z, gyr_n=n.gyr_n, acc_w=n.acc_w,
        gyr_w=n.gyr_w, phi_n=n.joint_angle_n, dphi_n=n.joint_velocity_n,
        rho_c_n=n.leg_bias_c_n, rho_nc_n=n.leg_bias_nc_n,
        v_n_min_xy=n.v_n_min_xy, v_n_min_z=n.v_n_min_z, v_n_min=n.v_n_min,
        v_n_max=n.v_n_max, v_n_force_thres_ratio=n.v_n_force_thres_ratio,
        v_n_term1_steep=n.v_n_term1_steep,
        v_n_term2_var_rescale=n.v_n_term2_var_rescale,
        v_n_term3_distance_rescale=n.v_n_term3_distance_rescale,
        contact_sensor_type=cfg.contact_sensor_type,
        rho_fix_list=[np.asarray(r, float) for r in cfg.robot.rho_fix()],
        p_br=P_BR, R_br=R_BR,
    )


# ---------------------------------------------------------------------------
# Randomized, gait-like sample streams
# ---------------------------------------------------------------------------

def make_stream(rng, S=36, contact_sensor_type=0, airborne_at=None):
    """Realistic 500 Hz-ish sensor stream: jittered dt, smooth IMU with
    gravity-scale accelerations, sinusoidal trot joints, alternating
    diagonal contact pairs; optionally an all-feet-airborne burst."""
    dt = 0.002 * (1.0 + 0.1 * rng.uniform(-1, 1, size=S))
    t = np.cumsum(dt) - dt[0]
    acc = np.stack([
        0.8 * np.sin(7 * t) + rng.normal(scale=0.3, size=S),
        0.6 * np.cos(9 * t) + rng.normal(scale=0.3, size=S),
        9.8 + 1.5 * np.sin(11 * t) + rng.normal(scale=0.3, size=S)], -1)
    gyr = np.stack([
        0.8 * np.sin(5 * t), -0.6 * np.cos(6 * t),
        0.4 * np.sin(3 * t)], -1) + rng.normal(scale=0.05, size=(S, 3))
    phase = 2 * np.pi * 2.0 * t    # 2 Hz gait
    phi = np.zeros((S, 12))
    dphi = np.zeros((S, 12))
    for leg in range(4):
        ph = phase + (np.pi if leg in (1, 2) else 0.0)
        phi[:, 3 * leg + 0] = 0.05 * np.sin(ph)
        phi[:, 3 * leg + 1] = 0.72 + 0.25 * np.sin(ph)
        phi[:, 3 * leg + 2] = -1.45 + 0.30 * np.cos(ph)
        w = 2 * np.pi * 2.0
        dphi[:, 3 * leg + 0] = 0.05 * w * np.cos(ph)
        dphi[:, 3 * leg + 1] = 0.25 * w * np.cos(ph)
        dphi[:, 3 * leg + 2] = -0.30 * w * np.sin(ph)
    phi += rng.normal(scale=1e-3, size=phi.shape)
    dphi += rng.normal(scale=1e-2, size=dphi.shape)

    stance = np.zeros((S, 4))
    for leg in range(4):
        ph = phase + (np.pi if leg in (1, 2) else 0.0)
        stance[:, leg] = (np.sin(ph) > -0.2).astype(float)
    if contact_sensor_type == 2:
        c = stance * (55.0 + 10.0 * np.sin(3 * t)[:, None]) \
            + rng.normal(scale=3.0, size=(S, 4))
    else:
        # mix of hard 0/1 and soft values to exercise the >= 0.5 threshold
        c = stance * rng.uniform(0.6, 1.0, size=(S, 4)) \
            + (1 - stance) * rng.uniform(0.0, 0.4, size=(S, 4))
    if airborne_at is not None:
        a0, a1 = airborne_at
        c[a0:a1, :] = 0.0
    mask = np.ones(S, bool)
    mask[0] = False
    return dict(dt=dt, acc=acc, gyr=gyr, phi=phi, dphi=dphi, c=c, mask=mask)


def run_repo_il(stream, ba, bg, rho, params):
    j = lambda x: jnp.asarray(x, jnp.float64)
    return il_preintegrate(
        j(stream["dt"]), j(stream["acc"]), j(stream["gyr"]), j(stream["phi"]),
        j(stream["dphi"]), j(stream["c"]), jnp.asarray(stream["mask"]),
        j(ba), j(bg), j(rho), params)


def run_golden_il(stream, ba, bg, rho, gp, mode):
    g = GoldenIMULegIntegrationBase(
        stream["acc"][0], stream["gyr"][0], stream["phi"][0],
        stream["dphi"][0], stream["c"][0], ba, bg, rho, gp, mode=mode)
    for k in range(1, len(stream["dt"])):
        g.push_back(stream["dt"][k], stream["acc"][k], stream["gyr"][k],
                    stream["phi"][k], stream["dphi"][k], stream["c"][k])
    return g


# ---------------------------------------------------------------------------
# Kinematics: golden grounds itself on the literal transcription, then pins
# the production implementation at analytic accuracy (the existing
# test_kinematics.py FD pins stop at ~1e-6; this closes it to roundoff)
# ---------------------------------------------------------------------------

def test_golden_kinematics_matches_literal_transcription(rng):
    cfg = make_cfg(0)
    for leg in range(4):
        rf = np.asarray(cfg.robot.rho_fix()[leg], float)
        for _ in range(25):
            q = rng.uniform(-1.3, 1.3, size=3)
            lc = 0.21 + rng.uniform(-0.05, 0.05)
            assert_rel(GoldenKinematics.fk(q, [lc], rf),
                       fk_literal(q, lc, rf), "fk")
            assert_rel(GoldenKinematics.jac(q, [lc], rf),
                       jac_literal(q, lc, rf), "jac")
            assert_rel(GoldenKinematics.dfk_drho(q, [lc], rf)[:, 0],
                       dfk_drho_literal(q, lc, rf), "dfk_drho")


def test_golden_kinematics_pins_production(rng):
    cfg = make_cfg(0)
    for leg in range(4):
        rf = np.asarray(cfg.robot.rho_fix()[leg], float)
        for _ in range(10):
            q = rng.uniform(-1.3, 1.3, size=3)
            lc = np.array([0.21 + rng.uniform(-0.05, 0.05)])
            jq, jlc, jrf = jnp.asarray(q), jnp.asarray(lc), jnp.asarray(rf)
            assert_rel(leg_fk(jq, jlc, jrf), GoldenKinematics.fk(q, lc, rf),
                       "fk", 1e-11)
            assert_rel(leg_jac(jq, jlc, jrf), GoldenKinematics.jac(q, lc, rf),
                       "jac", 1e-11)
            assert_rel(leg_dfk_drho(jq, jlc, jrf),
                       GoldenKinematics.dfk_drho(q, lc, rf), "dfk_drho", 1e-11)
            assert_rel(leg_dJ_dq(jq, jlc, jrf),
                       GoldenKinematics.dJ_dq(q, lc, rf), "dJ_dq", 1e-11)
            assert_rel(leg_dJ_drho(jq, jlc, jrf),
                       GoldenKinematics.dJ_drho(q, lc, rf), "dJ_drho", 1e-11)


# ---------------------------------------------------------------------------
# 15-dim IMU recursion
# ---------------------------------------------------------------------------

def _golden_imu(stream, ba, bg, cfg, mode):
    n = cfg.noise
    g = GoldenIntegrationBase(
        stream["acc"][0], stream["gyr"][0], ba, bg,
        acc_n=n.acc_n, gyr_n=n.gyr_n, acc_w=n.acc_w, gyr_w=n.gyr_w,
        acc_n_z=n.acc_n_z, mode=mode)
    for k in range(1, len(stream["dt"])):
        g.push_back(stream["dt"][k], stream["acc"][k], stream["gyr"][k])
    return g


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_imu_matches_golden_instep(seed):
    rng = np.random.default_rng(seed)
    cfg = make_cfg(0)
    stream = make_stream(rng)
    ba = rng.normal(scale=0.05, size=3)
    bg = rng.normal(scale=0.01, size=3)
    params = PreintParams.from_config(cfg)
    j = lambda x: jnp.asarray(x, jnp.float64)
    pre = imu_preintegrate(j(stream["dt"]), j(stream["acc"]), j(stream["gyr"]),
                           jnp.asarray(stream["mask"]), j(ba), j(bg), params)
    g = _golden_imu(stream, ba, bg, cfg, "instep")
    assert_rel(pre.dp, g.delta_p, "dp")
    assert_rel(pre.dq, g.delta_q, "dq")
    assert_rel(pre.dv, g.delta_v, "dv")
    assert_rel(pre.J, g.jacobian, "J")
    assert_rel(pre.P, g.covariance, "P")
    assert_rel(pre.sum_dt, g.sum_dt, "sum_dt")


def test_imu_eigen_vs_instep_immaterial(rng):
    """Literal Eigen semantics (unnormalized mid-step quaternion) vs the
    production in-step normalization: the difference must be far below
    sensor noise — justifying the normalization as a pure numerics choice."""
    cfg = make_cfg(0)
    stream = make_stream(rng, S=40)
    ba, bg = np.zeros(3), np.zeros(3)
    ge = _golden_imu(stream, ba, bg, cfg, "eigen")
    gi = _golden_imu(stream, ba, bg, cfg, "instep")
    assert np.max(np.abs(ge.delta_p - gi.delta_p)) < 1e-8
    assert np.max(np.abs(ge.delta_q - gi.delta_q)) < 1e-8
    assert np.max(np.abs(ge.delta_v - gi.delta_v)) < 1e-7
    assert np.max(np.abs(ge.jacobian - gi.jacobian)) < 1e-7
    scale = max(1.0, np.max(np.abs(gi.covariance)))
    assert np.max(np.abs(ge.covariance - gi.covariance)) / scale < 1e-7


def test_imu_residual_matches_golden(rng):
    cfg = make_cfg(0)
    stream = make_stream(rng)
    ba = rng.normal(scale=0.05, size=3)
    bg = rng.normal(scale=0.01, size=3)
    params = PreintParams.from_config(cfg)
    j = lambda x: jnp.asarray(x, jnp.float64)
    pre = imu_preintegrate(j(stream["dt"]), j(stream["acc"]), j(stream["gyr"]),
                           jnp.asarray(stream["mask"]), j(ba), j(bg), params)
    g = _golden_imu(stream, ba, bg, cfg, "instep")

    def rand_state():
        q = np.asarray(lie.quat_normalize(jnp.asarray(rng.normal(size=4))))
        return dict(p=rng.normal(size=3), q=q, v=rng.normal(size=3),
                    ba=ba + rng.normal(scale=0.01, size=3),
                    bg=bg + rng.normal(scale=0.002, size=3))

    for _ in range(5):
        si, sj = rand_state(), rand_state()
        r_repo = imu_residual(pre, {k: j(v) for k, v in si.items()},
                              {k: j(v) for k, v in sj.items()}, j(G))
        r_gold = g.evaluate(si["p"], si["q"], si["v"], si["ba"], si["bg"],
                            sj["p"], sj["q"], sj["v"], sj["ba"], sj["bg"], G)
        assert_rel(r_repo, r_gold, "imu residual", 1e-11)


# ---------------------------------------------------------------------------
# 31-dim IMU+leg recursion
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ct,seed", [(0, 0), (0, 3), (2, 1), (2, 4)])
def test_il_matches_golden_instep(ct, seed):
    rng = np.random.default_rng(seed)
    cfg = make_cfg(ct)
    stream = make_stream(rng, contact_sensor_type=ct, airborne_at=(20, 24))
    ba = rng.normal(scale=0.05, size=3)
    bg = rng.normal(scale=0.01, size=3)
    rho = 0.21 + rng.normal(scale=0.01, size=4)
    params = PreintParams.from_config(cfg)
    gp = golden_params(cfg)

    pre = run_repo_il(stream, ba, bg, rho, params)
    g = run_golden_il(stream, ba, bg, rho, gp, "instep")

    assert_rel(pre.dp, g.delta_p, "dp", 1e-11)
    assert_rel(pre.dq, g.delta_q, "dq", 1e-11)
    assert_rel(pre.dv, g.delta_v, "dv", 1e-11)
    assert_rel(pre.deps, np.stack(g.delta_epsilon), "deps", 1e-11)
    assert_rel(pre.sum_deps, g.sum_delta_epsilon, "sum_deps", 1e-11)
    assert_rel(pre.J, g.jacobian, "J", 1e-11)
    assert_rel(pre.P, g.covariance, "P", 1e-10)
    assert_rel(pre.sum_dt, g.sum_dt, "sum_dt")
    assert_rel(pre.contact_flag, g.foot_contact_flag, "contact_flag", 1e-11)
    np.testing.assert_array_equal(
        np.asarray(pre.integration_contact),
        np.array(g.integration_contact_flag))
    if ct == 2:
        assert_rel(pre.ff_min, g.foot_force_min, "ff_min", 1e-11)
        assert_rel(pre.ff_max, g.foot_force_max, "ff_max", 1e-11)
        assert_rel(pre.ff_window, g.foot_force_window, "ff_window", 1e-11)
        np.testing.assert_array_equal(np.asarray(pre.ff_idx),
                                      g.foot_force_window_idx)


@pytest.mark.parametrize("ct", [0, 2])
def test_il_step_blocks_match_golden(ct):
    """Per-step F (31x31), V (31x46) and the 46-dim noise diagonal, block by
    block against the literal port — localizes any misread to a single step
    and block rather than the accumulated J/P."""
    rng = np.random.default_rng(7)
    cfg = make_cfg(ct)
    stream = make_stream(rng, S=12, contact_sensor_type=ct)
    ba = rng.normal(scale=0.05, size=3)
    bg = rng.normal(scale=0.01, size=3)
    rho = 0.21 + rng.normal(scale=0.01, size=4)
    params = PreintParams.from_config(cfg)
    gp = golden_params(cfg)
    g = run_golden_il(stream, ba, bg, rho, gp, "instep")

    j = lambda x: jnp.asarray(x, jnp.float64)
    carry = il_init_carry(j(stream["acc"][0]), j(stream["gyr"][0]),
                          j(stream["phi"][0]), j(stream["dphi"][0]),
                          j(stream["c"][0]))
    for k in range(1, len(stream["dt"])):
        inp = (j(stream["dt"][k]), j(stream["acc"][k]), j(stream["gyr"][k]),
               j(stream["phi"][k]), j(stream["dphi"][k]), j(stream["c"][k]),
               jnp.asarray(True))
        carry, F, V, noise = il_step_full(carry, inp, j(ba), j(bg), j(rho),
                                          params)
        assert_rel(F, g.step_F[k - 1], f"F step {k}", 1e-11)
        assert_rel(V, g.step_V[k - 1], f"V step {k}", 1e-11)
        assert_rel(noise, g.step_noise[k - 1], f"noise step {k}", 1e-11)


def test_il_airborne_noise_override():
    """All-feet-airborne must inflate leg-velocity noise to 1e11 and reset
    rho noise to RHO_NC_N (imu_leg_integration_base.cpp:353-358)."""
    rng = np.random.default_rng(2)
    cfg = make_cfg(0)
    stream = make_stream(rng, S=8, contact_sensor_type=0, airborne_at=(0, 8))
    gp = golden_params(cfg)
    g = run_golden_il(stream, np.zeros(3), np.zeros(3), np.full(4, 0.21), gp,
                      "instep")
    nd = g.step_noise[-1]
    assert np.all(nd[30:42] == 10e10)
    assert np.all(nd[42:46] == cfg.noise.leg_bias_nc_n)
    # and the production path agrees (checked element-wise in
    # test_il_step_blocks_match_golden; here assert the semantic directly)
    params = PreintParams.from_config(cfg)
    pre = run_repo_il(stream, np.zeros(3), np.zeros(3), np.full(4, 0.21),
                      params)
    assert not bool(np.any(np.asarray(pre.integration_contact)))


def test_il_repropagate_matches_golden():
    """Repropagation under new linearization (imu_leg_integration_base
    repropagate == calling the pure function with new points)."""
    rng = np.random.default_rng(5)
    cfg = make_cfg(0)
    stream = make_stream(rng, contact_sensor_type=0)
    params = PreintParams.from_config(cfg)
    gp = golden_params(cfg)
    g = run_golden_il(stream, np.zeros(3), np.zeros(3), np.full(4, 0.21), gp,
                      "instep")
    ba2 = rng.normal(scale=0.05, size=3)
    bg2 = rng.normal(scale=0.01, size=3)
    rho2 = 0.21 + rng.normal(scale=0.01, size=4)
    g.repropagate(ba2, bg2, rho2)
    pre = run_repo_il(stream, ba2, bg2, rho2, params)
    assert_rel(pre.dp, g.delta_p, "dp", 1e-11)
    assert_rel(pre.dq, g.delta_q, "dq", 1e-11)
    assert_rel(pre.deps, np.stack(g.delta_epsilon), "deps", 1e-11)
    assert_rel(pre.J, g.jacobian, "J", 1e-11)
    assert_rel(pre.P, g.covariance, "P", 1e-10)


def test_il_residual_matches_golden(rng):
    cfg = make_cfg(0)
    stream = make_stream(rng, contact_sensor_type=0)
    ba = rng.normal(scale=0.05, size=3)
    bg = rng.normal(scale=0.01, size=3)
    rho = 0.21 + rng.normal(scale=0.005, size=4)
    params = PreintParams.from_config(cfg)
    gp = golden_params(cfg)
    pre = run_repo_il(stream, ba, bg, rho, params)
    g = run_golden_il(stream, ba, bg, rho, gp, "instep")
    j = lambda x: jnp.asarray(x, jnp.float64)

    def rand_state():
        q = np.asarray(lie.quat_normalize(jnp.asarray(rng.normal(size=4))))
        return dict(p=rng.normal(size=3), q=q, v=rng.normal(size=3),
                    ba=ba + rng.normal(scale=0.01, size=3),
                    bg=bg + rng.normal(scale=0.002, size=3),
                    rho=rho + rng.normal(scale=0.002, size=4))

    for _ in range(5):
        si, sj = rand_state(), rand_state()
        r_repo = il_residual(pre, {k: j(v) for k, v in si.items()},
                             {k: j(v) for k, v in sj.items()}, j(G))
        r_gold = g.evaluate(si["p"], si["q"], si["v"], si["ba"], si["bg"],
                            si["rho"], sj["p"], sj["q"], sj["v"], sj["ba"],
                            sj["bg"], sj["rho"], G)
        assert_rel(r_repo, r_gold, "il residual", 1e-10)

    # literal Eigen inverse() (conj/|q|^2 on the unnormalized corrected
    # delta_q) vs production conj(): bounded well below measurement noise
    ge = run_golden_il(stream, ba, bg, rho, gp, "eigen")
    si, sj = rand_state(), rand_state()
    r_i = g.evaluate(si["p"], si["q"], si["v"], si["ba"], si["bg"], si["rho"],
                     sj["p"], sj["q"], sj["v"], sj["ba"], sj["bg"], sj["rho"], G)
    r_e = ge.evaluate(si["p"], si["q"], si["v"], si["ba"], si["bg"], si["rho"],
                      sj["p"], sj["q"], sj["v"], sj["ba"], sj["bg"], sj["rho"], G)
    assert np.max(np.abs(r_i - r_e)) < 1e-6


def test_il_lo_guard_downweights_inconsistent_leg(rng):
    """The (intentional, non-reference) LO-consistency guard: with
    contact_lo_guard_rescale > 0, a leg whose contact flag claims stance
    but whose kinematic velocity disagrees with delta_v gets a larger
    velocity variance than a consistent leg; with the guard at 0 the two
    noise models are identical to the reference's (pinned above)."""
    cfg0 = make_cfg(0)                       # guard off
    cfg1 = dataclasses.replace(
        cfg0, noise=dataclasses.replace(cfg0.noise,
                                        contact_lo_guard_rescale=0.1))
    stream = make_stream(rng, S=10, contact_sensor_type=0)
    stream["c"][:] = 1.0                     # all legs claim stance
    # make leg 0 kinematically violent: fast joint sweep
    stream["dphi"][:, 0:3] *= 25.0
    ba, bg, rho = np.zeros(3), np.zeros(3), np.full(4, 0.21)

    for cfg, guard in ((cfg0, False), (cfg1, True)):
        params = PreintParams.from_config(cfg)
        j = lambda x: jnp.asarray(x, jnp.float64)
        carry = il_init_carry(j(stream["acc"][0]), j(stream["gyr"][0]),
                              j(stream["phi"][0]), j(stream["dphi"][0]),
                              j(stream["c"][0]))
        for k in range(1, len(stream["dt"])):
            inp = (j(stream["dt"][k]), j(stream["acc"][k]),
                   j(stream["gyr"][k]), j(stream["phi"][k]),
                   j(stream["dphi"][k]), j(stream["c"][k]),
                   jnp.asarray(True))
            carry, F, V, noise = il_step_full(carry, inp, j(ba), j(bg),
                                              j(rho), params)
        leg0_var = float(noise[30])          # leg-0 velocity noise, x
        leg1_var = float(noise[33])
        if guard:
            assert leg0_var > 50 * leg1_var, (leg0_var, leg1_var)
        else:
            assert abs(leg0_var - leg1_var) < 1e-12


def test_il_eigen_vs_instep_immaterial(rng):
    cfg = make_cfg(2)
    stream = make_stream(rng, contact_sensor_type=2)
    gp = golden_params(cfg)
    ba, bg, rho = np.zeros(3), np.zeros(3), np.full(4, 0.21)
    ge = run_golden_il(stream, ba, bg, rho, gp, "eigen")
    gi = run_golden_il(stream, ba, bg, rho, gp, "instep")
    assert np.max(np.abs(ge.delta_p - gi.delta_p)) < 1e-8
    assert np.max(np.abs(np.stack(ge.delta_epsilon)
                         - np.stack(gi.delta_epsilon))) < 1e-8
    assert np.max(np.abs(ge.jacobian - gi.jacobian)) < 1e-6
    scale = max(1.0, np.max(np.abs(gi.covariance)))
    assert np.max(np.abs(ge.covariance - gi.covariance)) / scale < 1e-7
