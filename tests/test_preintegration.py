"""Preintegration tests.

Covers what the reference's embedded (commented-out) checkers covered
(imu_leg_integration_base.cpp:472-843, integration_base.h:223-459) and more:
  * accumulated bias/rho Jacobians vs finite differences of re-preintegration
  * zero-noise integration vs analytic ground truth (incl. fixed-foot leg
    odometry via numerical IK)
  * residual ≈ 0 at ground-truth states
  * Monte-Carlo covariance consistency for the IMU block
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cerberus_tpu import config as C
from cerberus_tpu.config import EstimatorConfig
from cerberus_tpu.kinematics import leg_fk, leg_jac
from cerberus_tpu.ops import (
    PreintParams, il_preintegrate, il_residual, imu_preintegrate, imu_residual,
)
from cerberus_tpu.utils import lie

CFG = EstimatorConfig()
PARAMS = PreintParams.from_config(CFG)
G = jnp.array([0.0, 0.0, 9.805])


# ---------------------------------------------------------------------------
# synthetic trajectory: sinusoidal motion with rotation
# ---------------------------------------------------------------------------

def make_trajectory(t):
    """Ground truth p(t), q(t), plus world-frame v, a and body-frame imu."""
    p = jnp.stack([0.5 * t + 0.2 * jnp.sin(t), 0.3 * jnp.cos(t), 0.1 * jnp.sin(2 * t)], -1)
    v = jnp.stack([0.5 + 0.2 * jnp.cos(t), -0.3 * jnp.sin(t), 0.2 * jnp.cos(2 * t)], -1)
    a = jnp.stack([-0.2 * jnp.sin(t), -0.3 * jnp.cos(t), -0.4 * jnp.sin(2 * t)], -1)
    rotvec = jnp.stack([0.2 * jnp.sin(t), 0.1 * t, 0.15 * jnp.cos(t)], -1)
    q = lie.so3_exp_quat(rotvec)
    return p, q, v, a


def imu_from_trajectory(t, dt):
    p, q, v, a = make_trajectory(t)
    R = lie.quat_to_rot(q)
    acc = jnp.einsum("nij,nj->ni", jnp.swapaxes(R, 1, 2), a + G)
    # angular velocity by numerical differentiation of q (central, fine for test)
    q_next = make_trajectory(t + 1e-6)[1]
    dq = lie.quat_mul(lie.quat_conj(q), q_next)
    gyr = lie.quat_log(dq) / 1e-6
    return p, q, v, acc, gyr


def build_inputs(S=30, dt_s=0.002, bias_a=None, bias_g=None, rng=None):
    t = jnp.arange(S) * dt_s
    p, q, v, acc, gyr = imu_from_trajectory(t, dt_s)
    dt = jnp.full((S,), dt_s)
    mask = jnp.ones((S,), bool).at[0].set(False)
    if bias_a is not None:
        acc = acc + bias_a
    if bias_g is not None:
        gyr = gyr + bias_g
    if rng is not None:
        acc = acc + jnp.array(rng.normal(size=acc.shape)) * 0.01
        gyr = gyr + jnp.array(rng.normal(size=gyr.shape)) * 0.001
    return dict(t=t, p=p, q=q, v=v, acc=acc, gyr=gyr, dt=dt, mask=mask)


# ---------------------------------------------------------------------------
# IMU-only preintegration
# ---------------------------------------------------------------------------

def test_imu_zero_noise_matches_ground_truth():
    d = build_inputs(S=50)
    ba = jnp.zeros(3)
    bg = jnp.zeros(3)
    pre = imu_preintegrate(d["dt"], d["acc"], d["gyr"], d["mask"], ba, bg, PARAMS)
    T = pre.sum_dt
    qi_inv = lie.quat_conj(d["q"][0])
    want_dp = lie.quat_rotate(qi_inv, d["p"][-1] - d["p"][0] - d["v"][0] * T + 0.5 * G * T**2)
    want_dv = lie.quat_rotate(qi_inv, d["v"][-1] - d["v"][0] + G * T)
    want_dq = lie.quat_mul(qi_inv, d["q"][-1])
    np.testing.assert_allclose(np.asarray(pre.dp), np.asarray(want_dp), atol=2e-6)
    np.testing.assert_allclose(np.asarray(pre.dv), np.asarray(want_dv), atol=2e-5)
    assert float(jnp.abs(jnp.sum(pre.dq * want_dq))) > 1 - 1e-8


def test_imu_residual_zero_at_truth():
    d = build_inputs(S=40)
    pre = imu_preintegrate(d["dt"], d["acc"], d["gyr"], d["mask"],
                           jnp.zeros(3), jnp.zeros(3), PARAMS)
    si = dict(p=d["p"][0], q=d["q"][0], v=d["v"][0], ba=jnp.zeros(3), bg=jnp.zeros(3))
    sj = dict(p=d["p"][-1], q=d["q"][-1], v=d["v"][-1], ba=jnp.zeros(3), bg=jnp.zeros(3))
    r = imu_residual(pre, si, sj, G)
    np.testing.assert_allclose(np.asarray(r), 0, atol=5e-5)


def test_imu_bias_jacobian_fd():
    """J's bias columns must predict delta changes under re-preintegration."""
    d = build_inputs(S=25)
    ba0, bg0 = jnp.zeros(3), jnp.zeros(3)
    pre = imu_preintegrate(d["dt"], d["acc"], d["gyr"], d["mask"], ba0, bg0, PARAMS)
    eps = 1e-6
    for k in range(3):
        db = jnp.zeros(3).at[k].set(eps)
        pp = imu_preintegrate(d["dt"], d["acc"], d["gyr"], d["mask"], ba0 + db, bg0, PARAMS)
        np.testing.assert_allclose(
            np.asarray((pp.dp - pre.dp) / eps), np.asarray(pre.J[0:3, 9 + k]),
            atol=1e-5)
        np.testing.assert_allclose(
            np.asarray((pp.dv - pre.dv) / eps), np.asarray(pre.J[6:9, 9 + k]),
            atol=1e-5)
        pg = imu_preintegrate(d["dt"], d["acc"], d["gyr"], d["mask"], ba0, bg0 + db, PARAMS)
        np.testing.assert_allclose(
            np.asarray((pg.dp - pre.dp) / eps), np.asarray(pre.J[0:3, 12 + k]),
            atol=1e-5)
        dtheta = 2 * lie.quat_mul(lie.quat_conj(pre.dq), pg.dq)[1:]
        np.testing.assert_allclose(
            np.asarray(dtheta / eps), np.asarray(pre.J[3:6, 12 + k]), atol=1e-4)


def test_imu_covariance_montecarlo_single_step(rng):
    """Empirical covariance over one midpoint step matches propagated P.

    Note the reference's noise model treats acc_n/gyr_n as *discrete
    per-sample* stds with independent noise at both step endpoints
    (integration_base.h:30 'one measurement relates to two accs'), so the MC
    draws fresh noise per endpoint.
    """
    S, dt_s = 2, 0.002
    d = build_inputs(S=S, dt_s=dt_s)
    N = 6000

    acc_std = jnp.array([PARAMS.acc_n, PARAMS.acc_n, PARAMS.acc_n_z])

    def one(key):
        ka, kg = jax.random.split(key)
        acc = d["acc"] + jax.random.normal(ka, (S, 3)) * acc_std
        gyr = d["gyr"] + jax.random.normal(kg, (S, 3)) * PARAMS.gyr_n
        pre = imu_preintegrate(d["dt"], acc, gyr, d["mask"], jnp.zeros(3),
                               jnp.zeros(3), PARAMS)
        return jnp.concatenate([pre.dp, pre.dv])

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    samples = jax.vmap(one)(keys)
    emp = jnp.cov(samples.T)
    pre0 = imu_preintegrate(d["dt"], d["acc"], d["gyr"], d["mask"],
                            jnp.zeros(3), jnp.zeros(3), PARAMS)
    Pref = np.asarray(pre0.P)
    want = np.block([[Pref[0:3, 0:3], Pref[0:3, 6:9]],
                     [Pref[6:9, 0:3], Pref[6:9, 6:9]]])
    got = np.asarray(emp)
    # xy entries within MC tolerance; z uses acc_n_z (2.5 vs 0.9)
    np.testing.assert_allclose(np.diag(got), np.diag(want), rtol=0.12)


def _one_step_setup():
    from cerberus_tpu.ops.preintegration import il_init_carry, il_step_full

    d = build_leg_inputs(S=2)
    init = il_init_carry(d["acc"][0], d["gyr"][0], d["phi"][0], d["dphi"][0],
                         d["c"][0])
    zero3 = jnp.zeros(3)

    def run(acc0, gyr0, phi0, dphi0, acc1, gyr1, phi1, dphi1, carry_pert=None):
        carry = il_init_carry(acc0, gyr0, phi0, dphi0, d["c"][0])
        if carry_pert is not None:
            carry = carry._replace(**carry_pert)
        inp = (d["dt"][1], acc1, gyr1, phi1, dphi1, d["c"][1], jnp.array(True))
        out, F, V, noise = il_step_full(carry, inp, zero3, zero3, d["rho"], PARAMS)
        # delta-state vector in error-state ordering [p,theta,v,eps1..4]
        vec = jnp.concatenate([out.dp, 2 * out.dq[1:], out.dv,
                               out.deps.reshape(-1)])
        return vec, F, V

    args = (d["acc"][0], d["gyr"][0], d["phi"][0], d["dphi"][0],
            d["acc"][1], d["gyr"][1], d["phi"][1], d["dphi"][1])
    return d, run, args


@pytest.mark.slow
def test_il_step_V_matches_sample_sensitivities():
    """V's measurement-noise columns ARE d(deltas)/d(sample): check by FD.

    Automates the reference's disabled per-step checkJacobian
    (imu_leg_integration_base.cpp:472-843)."""
    d, run, args = _one_step_setup()
    base, F, V = run(*args)
    V = np.asarray(V)
    rows = np.r_[0:21]  # [p, theta, v, eps1..4]
    col_of = {0: C.ILNO_AI, 1: C.ILNO_GI, 2: C.ILNO_PHI, 3: C.ILNO_DPHI,
              4: C.ILNO_AI1, 5: C.ILNO_GI1, 6: C.ILNO_PHI1, 7: C.ILNO_DPHI1}
    # sign convention: V maps +noise; measurement = truth + noise, so FD wrt
    # the measured sample equals the V column directly for acc/gyr; for
    # phi/dphi the reference defines noise with the same sign (checked here).
    eps = 1e-7
    for ai, col0 in col_of.items():
        dim = args[ai].shape[0]
        if dim == 3:  # acc / gyr: full-row comparison
            for k in range(3):
                pert = jnp.zeros_like(args[ai]).at[k].set(eps)
                a = list(args)
                a[ai] = args[ai] + pert
                fd = (np.asarray(run(*a)[0]) - np.asarray(base)) / eps
                np.testing.assert_allclose(fd[rows], V[rows, col0 + k],
                                           atol=5e-5, err_msg=f"arg{ai} axis{k}")
        else:
            # phi / dphi: the reference maps all four legs' joint noise onto
            # the SAME 3 noise slots (imu_leg_integration_base.cpp:452-455,
            # V.block(ILO_EPSj, ILNO_PHIi) for every j) — i.e. joint noise is
            # modeled as perfectly correlated across legs. So validate leg by
            # leg: perturbing leg j's joint k must move ONLY leg j's eps rows,
            # by exactly V[eps_j rows, col0+k].
            for j in range(4):
                for k in range(3):
                    pert = jnp.zeros_like(args[ai]).at[3 * j + k].set(eps)
                    a = list(args)
                    a[ai] = args[ai] + pert
                    fd = (np.asarray(run(*a)[0]) - np.asarray(base)) / eps
                    r = C.ILO_EPS + 3 * j
                    np.testing.assert_allclose(
                        fd[r:r + 3], V[r:r + 3, col0 + k], atol=5e-5,
                        err_msg=f"arg{ai} leg{j} axis{k}")
                    np.testing.assert_allclose(fd[0:9], 0, atol=1e-9)
                    others = [x for x in range(4) if x != j]
                    for o in others:
                        ro = C.ILO_EPS + 3 * o
                        np.testing.assert_allclose(fd[ro:ro + 3], 0, atol=1e-9)


def test_il_step_F_matches_state_sensitivities():
    """F's [p, v, eps, theta] columns vs FD over the incoming carry state."""
    d, run, args = _one_step_setup()
    base, F, V = run(*args)
    F = np.asarray(F)
    rows = np.r_[0:21]
    eps = 1e-7
    # position column: shifting dp shifts result dp identically
    for k in range(3):
        pert = {"dp": jnp.zeros(3).at[k].set(eps)}
        fd = (np.asarray(run(*args, carry_pert=pert)[0]) - base) / eps
        np.testing.assert_allclose(fd[rows], F[rows, C.ILO_P + k], atol=1e-6)
    # velocity column
    for k in range(3):
        pert = {"dv": jnp.zeros(3).at[k].set(eps)}
        fd = (np.asarray(run(*args, carry_pert=pert)[0]) - base) / eps
        np.testing.assert_allclose(fd[rows], F[rows, C.ILO_V + k], atol=1e-6)
    # eps columns (identity propagation)
    pert = {"deps": jnp.zeros((4, 3)).at[2, 1].set(eps)}
    fd = (np.asarray(run(*args, carry_pert=pert)[0]) - base) / eps
    np.testing.assert_allclose(fd[rows], F[rows, C.ILO_EPS + 7], atol=1e-9)
    # theta column: right-perturb the carry quaternion dq -> dq*dq(eps_k)
    for k in range(3):
        dtheta = jnp.zeros(3).at[k].set(eps)
        q_pert = lie.quat_mul(lie.quat_identity(), lie.delta_q(dtheta))
        pert = {"dq": q_pert}
        fd = (np.asarray(run(*args, carry_pert=pert)[0]) - base) / eps
        np.testing.assert_allclose(fd[rows], F[rows, C.ILO_R + k], atol=5e-4)


# ---------------------------------------------------------------------------
# IMU + leg preintegration
# ---------------------------------------------------------------------------

def leg_ik(target, rho, rho_fix, q0=None):
    """Numerical IK: find joint angles putting the foot at `target` (body frame)."""
    q = np.array([0.0, 0.8, -1.6]) if q0 is None else np.array(q0)
    for _ in range(50):
        err = np.asarray(leg_fk(jnp.array(q), rho, rho_fix)) - np.asarray(target)
        if np.linalg.norm(err) < 1e-12:
            break
        Jm = np.asarray(leg_jac(jnp.array(q), rho, rho_fix))
        q = q - np.linalg.solve(Jm, err)
    return q


def build_leg_inputs(S=30, dt_s=0.002, body_only_translation=True):
    """Body translates at constant velocity (no rotation), feet pinned to the
    world floor => joint streams from IK; leg odometry must recover the motion."""
    rho = jnp.full((4,), 0.21)
    rho_fix = PARAMS.rho_fix
    v_body = np.array([0.4, 0.1, 0.0])
    t = np.arange(S) * dt_s
    p_body = t[:, None] * v_body[None, :]
    # feet world positions: neutral stance under the body at t=0
    q_neutral = jnp.array([0.0, 0.8, -1.6])
    feet_w = np.stack([
        np.asarray(leg_fk(q_neutral, rho[j:j+1], rho_fix[j])) for j in range(4)
    ])
    phi = np.zeros((S, 12))
    for k in range(S):
        for j in range(4):
            target = feet_w[j] - p_body[k]  # body frame (R = I)
            qk = leg_ik(jnp.array(target), rho[j:j+1], rho_fix[j],
                        q0=phi[k - 1, 3*j:3*j+3] if k else None)
            phi[k, 3*j:3*j+3] = qk
    dphi = np.gradient(phi, dt_s, axis=0)
    acc = np.tile(np.asarray(G), (S, 1))  # stationary-velocity body: a=0 => acc=g
    gyr = np.zeros((S, 3))
    c = np.ones((S, 4))
    dt = np.full((S,), dt_s)
    mask = np.ones((S,), bool)
    mask[0] = False
    return dict(
        p=jnp.array(p_body), v=jnp.array(np.tile(v_body, (S, 1))),
        q=jnp.tile(lie.quat_identity(), (S, 1)),
        phi=jnp.array(phi), dphi=jnp.array(dphi), acc=jnp.array(acc),
        gyr=jnp.array(gyr), c=jnp.array(c), dt=jnp.array(dt),
        mask=jnp.array(mask), rho=rho,
    )


@pytest.mark.slow
def test_leg_odometry_recovers_translation():
    d = build_leg_inputs(S=40)
    pre = il_preintegrate(d["dt"], d["acc"], d["gyr"], d["phi"], d["dphi"],
                          d["c"], d["mask"], jnp.zeros(3), jnp.zeros(3),
                          d["rho"], PARAMS)
    want = np.asarray(d["p"][-1] - d["p"][0])
    # per-leg epsilon and fused displacement must match the true body motion
    for j in range(4):
        np.testing.assert_allclose(np.asarray(pre.deps[j]), want, atol=2e-3)
    np.testing.assert_allclose(np.asarray(pre.sum_deps), want, atol=2e-3)
    assert bool(jnp.all(pre.integration_contact))


def test_il_imu_block_matches_imu_only():
    """The IMU sub-block of the 31-state preintegration must equal the 15-state one."""
    d = build_inputs(S=30)
    S = 30
    phi = jnp.tile(jnp.array([0.0, 0.8, -1.6]), (S, 4)).reshape(S, 12)
    dphi = jnp.zeros((S, 12))
    c = jnp.ones((S, 4))
    rho = jnp.full((4,), 0.21)
    ili = il_preintegrate(d["dt"], d["acc"], d["gyr"], phi, dphi, c, d["mask"],
                          jnp.zeros(3), jnp.zeros(3), rho, PARAMS)
    imu = imu_preintegrate(d["dt"], d["acc"], d["gyr"], d["mask"],
                           jnp.zeros(3), jnp.zeros(3), PARAMS)
    np.testing.assert_allclose(np.asarray(ili.dp), np.asarray(imu.dp), atol=1e-12)
    np.testing.assert_allclose(np.asarray(ili.dv), np.asarray(imu.dv), atol=1e-12)
    np.testing.assert_allclose(np.asarray(ili.dq), np.asarray(imu.dq), atol=1e-12)
    # J blocks: rows/cols [p,theta,v] x [p,theta,v,ba,bg]
    m = np.r_[0:9]
    Jil = np.asarray(ili.J)
    Jimu = np.asarray(imu.J)
    np.testing.assert_allclose(Jil[np.ix_(m, m)], Jimu[np.ix_(m, m)], atol=1e-12)
    np.testing.assert_allclose(Jil[np.ix_(m, np.r_[21:27])],
                               Jimu[np.ix_(m, np.r_[9:15])], atol=1e-12)
    Pil = np.asarray(ili.P)
    Pimu = np.asarray(imu.P)
    np.testing.assert_allclose(Pil[np.ix_(m, m)], Pimu[np.ix_(m, m)], atol=1e-14)


@pytest.mark.slow
def test_il_bias_rho_jacobian_fd():
    d = build_leg_inputs(S=25)
    ba0, bg0 = jnp.zeros(3), jnp.zeros(3)
    args = (d["dt"], d["acc"], d["gyr"], d["phi"], d["dphi"], d["c"], d["mask"])
    pre = il_preintegrate(*args, ba0, bg0, d["rho"], PARAMS)
    eps = 1e-6
    # gyro-bias columns of the eps rows (the novel coupling)
    for k in range(3):
        db = jnp.zeros(3).at[k].set(eps)
        pg = il_preintegrate(*args, ba0, bg0 + db, d["rho"], PARAMS)
        for j in range(4):
            r = C.ILO_EPS + 3 * j
            np.testing.assert_allclose(
                np.asarray((pg.deps[j] - pre.deps[j]) / eps),
                np.asarray(pre.J[r:r + 3, C.ILO_BG + k]), atol=2e-4)
    # rho columns
    for j in range(4):
        drho = jnp.zeros(4).at[j].set(eps)
        pr = il_preintegrate(*args, ba0, bg0, d["rho"] + drho, PARAMS)
        r = C.ILO_EPS + 3 * j
        np.testing.assert_allclose(
            np.asarray((pr.deps[j] - pre.deps[j]) / eps),
            np.asarray(pre.J[r:r + 3, C.ILO_RHO + j]), atol=2e-4)


def test_il_residual_zero_at_truth():
    d = build_leg_inputs(S=30)
    pre = il_preintegrate(d["dt"], d["acc"], d["gyr"], d["phi"], d["dphi"],
                          d["c"], d["mask"], jnp.zeros(3), jnp.zeros(3),
                          d["rho"], PARAMS)
    si = dict(p=d["p"][0], q=d["q"][0], v=d["v"][0], ba=jnp.zeros(3),
              bg=jnp.zeros(3), rho=d["rho"])
    sj = dict(p=d["p"][-1], q=d["q"][-1], v=d["v"][-1], ba=jnp.zeros(3),
              bg=jnp.zeros(3), rho=d["rho"])
    r = il_residual(pre, si, sj, G)
    np.testing.assert_allclose(np.asarray(r), 0, atol=3e-3)


def test_il_airborne_gives_huge_leg_noise():
    d = build_leg_inputs(S=20)
    c = jnp.zeros_like(d["c"])  # all feet airborne
    pre = il_preintegrate(d["dt"], d["acc"], d["gyr"], d["phi"], d["dphi"],
                          c, d["mask"], jnp.zeros(3), jnp.zeros(3),
                          d["rho"], PARAMS)
    # eps covariance must be enormous => factor ignores leg residuals
    for j in range(4):
        r = C.ILO_EPS + 3 * j
        assert float(pre.P[r, r]) > 1e3
    assert not bool(jnp.any(pre.integration_contact))


def test_il_vmap_jit_batched():
    d = build_leg_inputs(S=20)
    B = 3
    batch = jax.tree.map(lambda x: jnp.tile(x[None], (B,) + (1,) * x.ndim),
                         {k: d[k] for k in ("dt", "acc", "gyr", "phi", "dphi",
                                            "c", "mask")})
    fn = jax.jit(jax.vmap(
        lambda dt, acc, gyr, phi, dphi, c, mask: il_preintegrate(
            dt, acc, gyr, phi, dphi, c, mask, jnp.zeros(3), jnp.zeros(3),
            jnp.full((4,), 0.21), PARAMS)))
    out = fn(batch["dt"], batch["acc"], batch["gyr"], batch["phi"],
             batch["dphi"], batch["c"], batch["mask"])
    assert out.dp.shape == (B, 3)
    assert out.P.shape == (B, 31, 31)
    single = il_preintegrate(d["dt"], d["acc"], d["gyr"], d["phi"], d["dphi"],
                             d["c"], d["mask"], jnp.zeros(3), jnp.zeros(3),
                             jnp.full((4,), 0.21), PARAMS)
    np.testing.assert_allclose(np.asarray(out.dp[0]), np.asarray(single.dp),
                               atol=1e-12)


def test_padding_mask_invariance():
    """Appending masked padding must not change any result."""
    d = build_leg_inputs(S=20)
    pre = il_preintegrate(d["dt"], d["acc"], d["gyr"], d["phi"], d["dphi"],
                          d["c"], d["mask"], jnp.zeros(3), jnp.zeros(3),
                          d["rho"], PARAMS)
    pad = 7
    ext = lambda x: jnp.concatenate([x, jnp.tile(x[-1:], (pad,) + (1,) * (x.ndim - 1))])
    mask2 = jnp.concatenate([d["mask"], jnp.zeros((pad,), bool)])
    pre2 = il_preintegrate(ext(d["dt"]), ext(d["acc"]), ext(d["gyr"]),
                           ext(d["phi"]), ext(d["dphi"]), ext(d["c"]), mask2,
                           jnp.zeros(3), jnp.zeros(3), d["rho"], PARAMS)
    np.testing.assert_allclose(np.asarray(pre2.dp), np.asarray(pre.dp), atol=0)
    np.testing.assert_allclose(np.asarray(pre2.P), np.asarray(pre.P), atol=0)
    np.testing.assert_allclose(np.asarray(pre2.sum_dt), np.asarray(pre.sum_dt), atol=0)


@pytest.mark.slow
def test_ff_state_threads_across_intervals():
    """Contact model 2: splitting a force stream at an interval boundary and
    threading ILPreint.ff_* must reproduce the unsplit adaptive-threshold
    evolution exactly (the estimator shares the boundary sample between
    consecutive intervals, so the step pair sequence is identical)."""
    rng = np.random.default_rng(3)
    S = 40
    d = build_leg_inputs(S=S)
    # gait-like: stance (~60 N) for the first half, swing (~2 N) after —
    # the adaptive threshold needs to see both phases of a leg to
    # discriminate (its min/max track that leg's own force range)
    forces = np.concatenate([60 + 5 * rng.standard_normal((S // 2, 4)),
                             2 + 0.5 * rng.standard_normal((S - S // 2, 4))])
    c = jnp.asarray(forces)
    p2 = PARAMS._replace(contact_sensor_type=2)
    args = lambda sl: (d["dt"][sl], d["acc"][sl], d["gyr"][sl],
                       d["phi"][sl], d["dphi"][sl], c[sl], d["mask"][sl])
    zero3 = jnp.zeros(3)
    full = il_preintegrate(*args(slice(None)), zero3, zero3, d["rho"], p2)
    k = 17
    first = il_preintegrate(*args(slice(0, k)), zero3, zero3, d["rho"], p2)
    # second interval shares boundary sample k-1 (estimator convention)
    mask2 = d["mask"][k - 1:].at[0].set(False)
    second = il_preintegrate(
        d["dt"][k - 1:], d["acc"][k - 1:], d["gyr"][k - 1:],
        d["phi"][k - 1:], d["dphi"][k - 1:], c[k - 1:], mask2,
        zero3, zero3, d["rho"], p2,
        ff_init=(first.ff_min, first.ff_max, first.ff_window, first.ff_idx))
    np.testing.assert_allclose(np.asarray(second.ff_min),
                               np.asarray(full.ff_min), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(second.ff_max),
                               np.asarray(full.ff_max), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(second.contact_flag),
                               np.asarray(full.contact_flag), atol=1e-12)
    # warm thresholds classify the final swing samples as airborne...
    assert np.all(np.asarray(full.contact_flag) < 0.05)
    # ...whereas a COLD-started integration of ONLY the swing samples
    # misclassifies them as contact (the per-interval reset this threading
    # fixes: the leg's own ~2 N swing force becomes its max -> threshold
    # sits below it)
    m = S // 2
    mask3 = d["mask"][m:].at[0].set(False)
    cold = il_preintegrate(
        d["dt"][m:], d["acc"][m:], d["gyr"][m:],
        d["phi"][m:], d["dphi"][m:], c[m:], mask3,
        zero3, zero3, d["rho"], p2)
    assert np.all(np.asarray(cold.contact_flag) > 0.5)
    warm = il_preintegrate(
        d["dt"][m:], d["acc"][m:], d["gyr"][m:],
        d["phi"][m:], d["dphi"][m:], c[m:], mask3,
        zero3, zero3, d["rho"], p2,
        ff_init=(first.ff_min, first.ff_max, first.ff_window, first.ff_idx))
    assert np.all(np.asarray(warm.contact_flag) < 0.05)


# ---------------------------------------------------------------------------
# Parallel (log-depth) formulation vs the sequential scan
# ---------------------------------------------------------------------------

def _leg_stream(rng, S, ct):
    t = np.cumsum(np.full(S, 0.002) * (1 + 0.1 * rng.uniform(-1, 1, S)))
    acc = np.stack([0.5 * np.sin(7 * t), 0.4 * np.cos(9 * t),
                    9.8 + np.sin(11 * t)], -1) + rng.normal(scale=0.2,
                                                            size=(S, 3))
    gyr = np.stack([0.6 * np.sin(5 * t), -0.5 * np.cos(6 * t),
                    0.3 * np.sin(3 * t)], -1)
    phi = np.tile([0.05, 0.75, -1.45], 4) + rng.normal(scale=0.2,
                                                       size=(S, 12))
    dphi = rng.normal(scale=2.0, size=(S, 12))
    if ct == 2:
        c = np.abs(rng.normal(scale=30.0, size=(S, 4))) + 20.0
        c[S // 2:S // 2 + 3] = 0.0
    else:
        c = (rng.uniform(size=(S, 4)) > 0.4).astype(float)
        c[S // 2] = 0.0
    dt = np.diff(t, prepend=t[0] - 0.002)
    mask = np.ones(S, bool)
    mask[0] = False
    mask[-3:] = False   # padded tail — parallel must honor the mask
    return dt, acc, gyr, phi, dphi, c, mask


@pytest.mark.parametrize("ct,guard", [(0, 0.0), (0, 0.1), (2, 0.0)])
def test_parallel_matches_sequential(ct, guard, rng):
    """il_preintegrate_parallel must agree with the sequential scan (which
    is itself pinned loop-by-loop to the reference C++ by
    tests/test_golden_reference.py) to reassociation roundoff."""
    import dataclasses
    from cerberus_tpu.ops import il_preintegrate_parallel

    cfg = dataclasses.replace(
        CFG, contact_sensor_type=ct,
        noise=dataclasses.replace(CFG.noise, contact_lo_guard_rescale=guard))
    params = PreintParams.from_config(cfg)
    S = 37
    dt, acc, gyr, phi, dphi, c, mask = _leg_stream(rng, S, ct)
    ba = jnp.asarray(rng.normal(scale=0.05, size=3))
    bg = jnp.asarray(rng.normal(scale=0.01, size=3))
    rho = jnp.asarray(0.21 + rng.normal(scale=0.005, size=4))
    ff = (jnp.asarray(rng.uniform(size=4) * 10),
          jnp.asarray(40 + rng.uniform(size=4) * 10),
          jnp.asarray(rng.uniform(size=(4, C.FOOT_VAR_WINDOW_SIZE)) * 50),
          jnp.asarray(rng.integers(0, 5, size=4), jnp.int32))
    j = lambda x: jnp.asarray(x, jnp.float64)
    args = (j(dt), j(acc), j(gyr), j(phi), j(dphi), j(c), jnp.asarray(mask),
            ba, bg, rho, params)
    seq = il_preintegrate(*args, ff_init=ff)
    par = il_preintegrate_parallel(*args, ff_init=ff)

    def close(a, b, name, tol=1e-10):
        a, b = np.asarray(a, float), np.asarray(b, float)
        scale = max(1.0, np.max(np.abs(b)))
        err = np.max(np.abs(a - b)) / scale
        assert err < tol, f"{name}: {err:.3e}"

    close(par.dp, seq.dp, "dp")
    close(par.dq, seq.dq, "dq")
    close(par.dv, seq.dv, "dv")
    close(par.deps, seq.deps, "deps")
    close(par.sum_deps, seq.sum_deps, "sum_deps")
    close(par.J, seq.J, "J")
    close(par.P, seq.P, "P", 5e-10)
    close(par.sum_dt, seq.sum_dt, "sum_dt")
    close(par.contact_flag, seq.contact_flag, "contact_flag")
    np.testing.assert_array_equal(np.asarray(par.integration_contact),
                                  np.asarray(seq.integration_contact))
    close(par.ff_min, seq.ff_min, "ff_min")
    close(par.ff_max, seq.ff_max, "ff_max")
    close(par.ff_window, seq.ff_window, "ff_window")
    np.testing.assert_array_equal(np.asarray(par.ff_idx),
                                  np.asarray(seq.ff_idx))
