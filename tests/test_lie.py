"""Quaternion/SO(3) algebra tests (cross-checked against scipy)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from cerberus_tpu.utils import lie


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def to_scipy(q_wxyz):
    return Rotation.from_quat(np.roll(np.asarray(q_wxyz), -1, axis=-1))  # xyzw


def test_quat_mul_matches_scipy(rng):
    q = random_quats(rng, 32)
    p = random_quats(rng, 32)
    got = lie.quat_mul(jnp.array(q), jnp.array(p))
    want = (to_scipy(q) * to_scipy(p)).as_quat()  # xyzw
    want = np.roll(want, 1, axis=-1)
    # sign-agnostic comparison
    sign = np.sign(np.sum(np.asarray(got) * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(got), want * sign, atol=1e-12)


def test_quat_rotate_matches_matrix(rng):
    q = jnp.array(random_quats(rng, 16))
    v = jnp.array(rng.normal(size=(16, 3)))
    R = lie.quat_to_rot(q)
    np.testing.assert_allclose(
        np.asarray(lie.quat_rotate(q, v)),
        np.einsum("nij,nj->ni", np.asarray(R), np.asarray(v)),
        atol=1e-12,
    )


def test_rot_quat_roundtrip(rng):
    q = random_quats(rng, 64)
    R = lie.quat_to_rot(jnp.array(q))
    q2 = lie.rot_to_quat(R)
    sign = np.sign(np.sum(q * np.asarray(q2), axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(q2) * sign, q, atol=1e-9)


def test_rot_to_quat_vmap_jit(rng):
    q = jnp.array(random_quats(rng, 8))
    R = lie.quat_to_rot(q)
    q2 = jax.jit(jax.vmap(lie.rot_to_quat))(R)
    dots = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(np.asarray(dots), 1.0, atol=1e-9)


def test_exp_log_roundtrip(rng):
    theta_np = rng.normal(size=(32, 3))
    theta_np = theta_np / np.linalg.norm(theta_np, axis=-1, keepdims=True)
    theta = jnp.array(theta_np * rng.uniform(1e-9, 3.0, size=(32, 1)))  # principal range
    q = lie.so3_exp_quat(theta)
    np.testing.assert_allclose(np.asarray(lie.quat_log(q)), np.asarray(theta), atol=1e-9)
    # against scipy
    want = Rotation.from_rotvec(np.array(theta)).as_quat()
    want = np.roll(want, 1, axis=-1)
    sign = np.sign(np.sum(np.asarray(q) * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(q), want * sign, atol=1e-12)


def test_delta_q_first_order(rng):
    theta = jnp.array(rng.normal(size=(8, 3)) * 1e-4)
    np.testing.assert_allclose(
        np.asarray(lie.delta_q(theta)), np.asarray(lie.so3_exp_quat(theta)), atol=1e-10
    )


def test_quat_left_right(rng):
    q = jnp.array(random_quats(rng, 8))
    p = jnp.array(random_quats(rng, 8))
    qp = lie.quat_mul(q, p)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("nij,nj->ni", lie.quat_left(q), p)), np.asarray(qp), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("nij,nj->ni", lie.quat_right(p), q)), np.asarray(qp), atol=1e-12
    )


def test_ypr_roundtrip(rng):
    ypr = jnp.array(rng.uniform(-60, 60, size=(16, 3)))
    R = lie.ypr_to_rot(ypr)
    np.testing.assert_allclose(np.asarray(lie.rot_to_ypr(R)), np.asarray(ypr), atol=1e-9)


def test_g2r_aligns_gravity(rng):
    g = jnp.array(rng.normal(size=(3,)) * 3 + jnp.array([0.1, 0.2, 9.8]))
    R0 = lie.g_to_rot(g)
    aligned = R0 @ (g / jnp.linalg.norm(g))
    np.testing.assert_allclose(np.asarray(aligned), [0, 0, 1], atol=1e-9)
    # yaw of R0 is zero
    assert abs(float(lie.rot_to_ypr(R0)[0])) < 1e-6


def test_skew(rng):
    a = jnp.array(rng.normal(size=(5, 3)))
    b = jnp.array(rng.normal(size=(5, 3)))
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("nij,nj->ni", lie.skew(a), b)),
        np.asarray(jnp.cross(a, b)),
        atol=1e-12,
    )
