"""Quaternion / SO(3) utilities.

Functional equivalents of the reference's `Utility` static helpers
(reference: src/utils/utility.{h,cpp}), written for JAX: pure, batched via
vmap, and differentiable. Quaternions are stored as (..., 4) arrays in
**wxyz** order (scalar first).
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_identity(dtype=jnp.float64):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_mul(q, p):
    """Hamilton product q ⊗ p, both (..., 4) wxyz."""
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    pw, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    return jnp.stack(
        [
            qw * pw - qx * px - qy * py - qz * pz,
            qw * px + qx * pw + qy * pz - qz * py,
            qw * py - qx * pz + qy * pw + qz * px,
            qw * pz + qx * py - qy * px + qz * pw,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q, v):
    """Rotate vector(s) v (..., 3) by unit quaternion(s) q (..., 4)."""
    w = q[..., :1]
    xyz = q[..., 1:]
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


def quat_to_rot(q):
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rot_to_quat(R):
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) wxyz.

    Shepperd's branchless method (max-trace selection), safe under vmap/jit.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # four candidate constructions, each valid where its pivot is largest
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) / 2
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0)], axis=-1)
    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) / 2
    q1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
                    (m02 + m20) / (4 * qx1)], axis=-1)
    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) / 2
    q2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
                    (m12 + m21) / (4 * qy2)], axis=-1)
    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) / 2
    q3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
                    (m12 + m21) / (4 * qz3), qz3], axis=-1)

    cases = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(cases, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(qs, idx[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    # canonical sign: w >= 0
    return quat_normalize(q * jnp.sign(q[..., :1] + 1e-30))


def delta_q(theta):
    """Small-angle rotation vector (..., 3) -> unit quaternion (..., 4).

    First-order form q = normalize([1, theta/2]) matching the reference's
    Utility::deltaQ (utility.h:28-38); exactness beyond first order is not
    required because callers feed small per-step angles.
    """
    half = theta / 2.0
    w = jnp.ones_like(half[..., :1])
    return quat_normalize(jnp.concatenate([w, half], axis=-1))


def so3_exp_quat(theta):
    """Exact exponential map: rotation vector (..., 3) -> quaternion (..., 4)."""
    angle = jnp.linalg.norm(theta, axis=-1, keepdims=True)
    half = angle / 2.0
    small = angle < 1e-8
    sinc = jnp.where(small, 0.5 - angle**2 / 48.0, jnp.sin(half) / jnp.maximum(angle, 1e-30))
    w = jnp.cos(half)
    return jnp.concatenate([w, sinc * theta], axis=-1)


def quat_log(q):
    """Unit quaternion (..., 4) -> rotation vector (..., 3)."""
    q = q * jnp.sign(q[..., :1] + 1e-30)  # w >= 0 branch
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    vn = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(vn, w)
    scale = jnp.where(vn < 1e-12, 2.0 / jnp.maximum(w, 1e-12), angle / jnp.maximum(vn, 1e-30))
    return scale * q[..., 1:]


def skew(v):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], axis=-1
    )
    return rows.reshape(v.shape[:-1] + (3, 3))


def quat_left(q):
    """Left-multiplication matrix: quat_mul(q, p) == quat_left(q) @ p."""
    w = q[..., 0]
    v = q[..., 1:]
    top = jnp.concatenate([w[..., None], -v], axis=-1)[..., None, :]
    bottom = jnp.concatenate(
        [v[..., None], w[..., None, None] * jnp.eye(3, dtype=q.dtype) + skew(v)], axis=-1
    )
    return jnp.concatenate([top, bottom], axis=-2)


def quat_right(p):
    """Right-multiplication matrix: quat_mul(q, p) == quat_right(p) @ q."""
    w = p[..., 0]
    v = p[..., 1:]
    top = jnp.concatenate([w[..., None], -v], axis=-1)[..., None, :]
    bottom = jnp.concatenate(
        [v[..., None], w[..., None, None] * jnp.eye(3, dtype=p.dtype) - skew(v)], axis=-1
    )
    return jnp.concatenate([top, bottom], axis=-2)


def rot_to_ypr(R):
    """Rotation matrix -> yaw/pitch/roll in degrees (reference: Utility::R2ypr)."""
    n, o, a = R[..., :, 0], R[..., :, 1], R[..., :, 2]
    y = jnp.arctan2(n[..., 1], n[..., 0])
    p = jnp.arctan2(-n[..., 2], n[..., 0] * jnp.cos(y) + n[..., 1] * jnp.sin(y))
    r = jnp.arctan2(
        a[..., 0] * jnp.sin(y) - a[..., 1] * jnp.cos(y),
        -o[..., 0] * jnp.sin(y) + o[..., 1] * jnp.cos(y),
    )
    return jnp.stack([y, p, r], axis=-1) / jnp.pi * 180.0


def ypr_to_rot(ypr_deg):
    """yaw/pitch/roll degrees (..., 3) -> rotation matrix (reference: Utility::ypr2R)."""
    y, p, r = (ypr_deg[..., i] / 180.0 * jnp.pi for i in range(3))
    cy, sy, cp, sp, cr, sr = jnp.cos(y), jnp.sin(y), jnp.cos(p), jnp.sin(p), jnp.cos(r), jnp.sin(r)
    zero, one = jnp.zeros_like(y), jnp.ones_like(y)
    Rz = jnp.stack([cy, -sy, zero, sy, cy, zero, zero, zero, one], axis=-1).reshape(y.shape + (3, 3))
    Ry = jnp.stack([cp, zero, sp, zero, one, zero, -sp, zero, cp], axis=-1).reshape(y.shape + (3, 3))
    Rx = jnp.stack([one, zero, zero, zero, cr, -sr, zero, sr, cr], axis=-1).reshape(y.shape + (3, 3))
    return Rz @ Ry @ Rx


def g_to_rot(g):
    """Gravity-aligning rotation with zeroed yaw (reference: Utility::g2R).

    Returns R0 such that R0 @ normalize(g) == [0, 0, 1] and yaw(R0) == 0.
    """
    ng1 = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    ng2 = jnp.array([0.0, 0.0, 1.0], dtype=g.dtype)
    # rotation taking ng1 to ng2
    v = jnp.cross(ng1, ng2)
    c = jnp.sum(ng1 * ng2, axis=-1)
    s = jnp.linalg.norm(v, axis=-1)
    axis = v / jnp.maximum(s, 1e-12)[..., None]
    angle = jnp.arctan2(s, c)
    R0 = quat_to_rot(so3_exp_quat(axis * angle[..., None]))
    yaw = rot_to_ypr(R0)[..., 0]
    return ypr_to_rot(jnp.stack([-yaw, jnp.zeros_like(yaw), jnp.zeros_like(yaw)], axis=-1)) @ R0


def rot_x(a):
    """Rotation about x by angle a (...,) -> (..., 3, 3)."""
    c, s = jnp.cos(a), jnp.sin(a)
    zero, one = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack([one, zero, zero, zero, c, -s, zero, s, c], axis=-1).reshape(a.shape + (3, 3))


def rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    zero, one = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack([c, zero, s, zero, one, zero, -s, zero, c], axis=-1).reshape(a.shape + (3, 3))


def rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    zero, one = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack([c, -s, zero, s, c, zero, zero, zero, one], axis=-1).reshape(a.shape + (3, 3))
