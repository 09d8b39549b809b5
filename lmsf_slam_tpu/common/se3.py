"""Batched SO(3)/SE(3) operations for TPU.

Capability parity with the reference's pose math
(`/root/reference/src/MultiSensorFusionEstimator3D/include/Math.hpp:29-60`
se3 exp map, skew; `include/Common/pose.hpp` q/t wrapper), re-designed as
vectorized, jit-friendly ops over trailing-dim arrays:

- rotations as unit quaternions ``(..., 4)`` in ``(w, x, y, z)`` order, or as
  matrices ``(..., 3, 3)``;
- SE(3) poses as ``(..., 7)`` arrays ``[qw qx qy qz tx ty tz]``;
- tangent vectors as ``(..., 6)`` arrays ``[rot(3), trans(3)]``.

All functions broadcast over leading batch dims, are differentiable, and use
Taylor fallbacks near zero angle so they are safe under float32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of (...,3) -> (...,3,3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_identity(shape=()) -> jax.Array:
    q = jnp.zeros(shape + (4,), jnp.float32)
    return q.at[..., 0].set(1.0)


def quat_normalize(q: jax.Array) -> jax.Array:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(n, _EPS)
    # canonicalize sign (w >= 0) so that pose comparisons are stable
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors (...,3) by quaternions (...,4)."""
    qw, qv = q[..., :1], q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix (...,3,3) -> quaternion, branch-free (Shepperd)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    # four candidate quaternions, each valid when its pivot is largest
    qw = jnp.stack([1 + m00 + m11 + m22, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], -1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (...,4,4)
    pivots = jnp.stack(
        [1 + m00 + m11 + m22, 1 + m00 - m11 - m22,
         1 - m00 + m11 - m22, 1 - m00 - m11 + m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)
    return quat_normalize(q[..., 0, :])


# ---------------------------------------------------------------------------
# SO(3) exp/log
# ---------------------------------------------------------------------------

def so3_exp_quat(w: jax.Array) -> jax.Array:
    """Rotation vector (...,3) -> quaternion."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    half = 0.5 * theta
    small = theta2 < 1e-8
    # sin(half)/theta with Taylor fallback 0.5 - theta^2/48
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    qw = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return quat_normalize(jnp.concatenate([qw, k * w], axis=-1))


def so3_log(q: jax.Array) -> jax.Array:
    """Quaternion -> rotation vector (...,3)."""
    q = quat_normalize(q)
    qw = jnp.clip(q[..., :1], -1.0, 1.0)
    qv = q[..., 1:]
    sin_half = jnp.linalg.norm(qv, axis=-1, keepdims=True)
    half = jnp.arctan2(sin_half, qw)
    small = sin_half < 1e-6
    k = jnp.where(small, 2.0 + 2.0 * (1.0 - qw), 2.0 * half / jnp.maximum(sin_half, _EPS))
    return k * qv


def so3_exp_matrix(w: jax.Array) -> jax.Array:
    return quat_to_matrix(so3_exp_quat(w))


# ---------------------------------------------------------------------------
# SE(3) poses: (..., 7) = [qw qx qy qz tx ty tz]
# ---------------------------------------------------------------------------

def pose_identity(shape=()) -> jax.Array:
    p = jnp.zeros(shape + (7,), jnp.float32)
    return p.at[..., 0].set(1.0)


def make_pose(q: jax.Array, t: jax.Array) -> jax.Array:
    return jnp.concatenate([quat_normalize(q), t], axis=-1)


def pose_quat(p: jax.Array) -> jax.Array:
    return p[..., :4]


def pose_trans(p: jax.Array) -> jax.Array:
    return p[..., 4:]


def pose_compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """a ∘ b (apply b then a)."""
    q = quat_mul(pose_quat(a), pose_quat(b))
    t = quat_rotate(pose_quat(a), pose_trans(b)) + pose_trans(a)
    return make_pose(q, t)


def pose_inverse(p: jax.Array) -> jax.Array:
    qi = quat_conj(pose_quat(p))
    ti = -quat_rotate(qi, pose_trans(p))
    return make_pose(qi, ti)


def pose_apply(p: jax.Array, pts: jax.Array) -> jax.Array:
    """Transform points (...,N,3) or (...,3) by poses (...,7)."""
    if pts.ndim == p.ndim:  # (...,3)
        return quat_rotate(pose_quat(p), pts) + pose_trans(p)
    q = pose_quat(p)[..., None, :]
    t = pose_trans(p)[..., None, :]
    return quat_rotate(q, pts) + t


def pose_between(a: jax.Array, b: jax.Array) -> jax.Array:
    """Relative pose a^{-1} ∘ b."""
    return pose_compose(pose_inverse(a), b)


def se3_exp(xi: jax.Array) -> jax.Array:
    """Tangent (...,6) [rot, trans] -> pose (...,7).

    Uses the full SE(3) exponential (V-matrix on the translation part) so that
    pose_log(se3_exp(xi)) == xi.
    """
    w, v = xi[..., :3], xi[..., 3:]
    q = so3_exp_quat(w)
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = skew(w)
    W2 = W @ W
    # wide Taylor switch: the exact branch cancels catastrophically in f32
    small = theta2 < 1e-3
    A = jnp.where(small, 0.5 - theta2 / 24.0, (1 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS))
    B = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, _EPS))
    V = jnp.eye(3, dtype=xi.dtype) + A * W + B * W2
    t = jnp.einsum("...ij,...j->...i", V, v)
    return make_pose(q, t)


def pose_log(p: jax.Array) -> jax.Array:
    """Pose (...,7) -> tangent (...,6) [rot, trans]."""
    w = so3_log(pose_quat(p))
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = skew(w)
    W2 = W @ W
    small = theta2 < 1e-3
    # V^{-1} = I - W/2 + coef * W^2
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - theta * jnp.sin(theta) / (2.0 * (1.0 - jnp.cos(theta)) + _EPS))
        / jnp.maximum(theta2, _EPS),
    )
    Vinv = jnp.eye(3, dtype=p.dtype) - 0.5 * W + coef * W2
    v = jnp.einsum("...ij,...j->...i", Vinv, pose_trans(p))
    return jnp.concatenate([w, v], axis=-1)


def pose_retract(p: jax.Array, xi: jax.Array) -> jax.Array:
    """Right-multiplicative retraction p ∘ exp(xi) — the GN update used by all
    solvers (matches the right-perturbation Jacobians of the reference's
    registration, `edgeSurfFeatureRegistration.hpp:255-264`)."""
    return pose_compose(p, se3_exp(xi))


def pose_to_matrix(p: jax.Array) -> jax.Array:
    """(...,7) -> (...,4,4) homogeneous matrix."""
    R = quat_to_matrix(pose_quat(p))
    t = pose_trans(p)[..., :, None]
    top = jnp.concatenate([R, t], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def matrix_to_pose(m: jax.Array) -> jax.Array:
    return make_pose(matrix_to_quat(m[..., :3, :3]), m[..., :3, 3])


def pose_interp(a: jax.Array, b: jax.Array, alpha) -> jax.Array:
    """Geodesic interpolation between poses (for deskew / IMU alignment)."""
    d = pose_between(a, b)
    return pose_compose(a, se3_exp(alpha * pose_log(d)))


def quat_left_matrix(q: jax.Array) -> jax.Array:
    """L(q): 4×4 with L(q)·p = q⊗p (batched over leading dims).

    Reference: the quaternion product matrices of `Math.hpp` used by the
    hand-eye rotation solve (`handeye_calibration_base.hpp:113-148`).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([w, -x, -y, -z], -1),
            jnp.stack([x, w, -z, y], -1),
            jnp.stack([y, z, w, -x], -1),
            jnp.stack([z, -y, x, w], -1),
        ],
        axis=-2,
    )


def quat_right_matrix(q: jax.Array) -> jax.Array:
    """R(q): 4×4 with R(q)·p = p⊗q."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([w, -x, -y, -z], -1),
            jnp.stack([x, w, z, -y], -1),
            jnp.stack([y, -z, w, x], -1),
            jnp.stack([z, y, -x, w], -1),
        ],
        axis=-2,
    )
