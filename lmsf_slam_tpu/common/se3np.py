"""Host-side numpy mirror of the small-pose subset of :mod:`se3`.

The host orchestration layers (keyframe gate, lifelong FSM bookkeeping,
async publication) compose and difference SINGLE (7,) poses. Doing that with
the jnp ops costs a full device dispatch per call — over the remote-TPU
tunnel that is tens of milliseconds of RPC for nanoseconds of math, and the
host layers make several such calls per frame. This module mirrors exactly
the ops those layers need, in numpy float64 (more precision than the device
f32, so round-tripping through the host never degrades a pose).

Conventions identical to :mod:`se3`: quaternions (w,x,y,z), poses
``[qw qx qy qz tx ty tz]``, tangents ``[rot(3), trans(3)]``; broadcasting
over leading dims.
"""
from __future__ import annotations

import numpy as np

_EPS = 1e-12


def quat_normalize(q):
    q = np.asarray(q, np.float64)
    q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    # canonicalize sign (w >= 0) — must match se3.quat_normalize exactly,
    # so3_log branches depend on it
    return np.where(q[..., :1] < 0, -q, q)


def quat_mul(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q):
    return np.asarray(q, np.float64) * np.asarray([1.0, -1.0, -1.0, -1.0])


def quat_rotate(q, v):
    q = np.asarray(q, np.float64)
    v = np.asarray(v, np.float64)
    qw, qv = q[..., :1], q[..., 1:]
    t = 2.0 * np.cross(qv, v)
    return v + qw * t + np.cross(qv, t)


def so3_exp_quat(w):
    w = np.asarray(w, np.float64)
    theta2 = np.sum(w * w, axis=-1, keepdims=True)
    theta = np.sqrt(np.maximum(theta2, _EPS * _EPS))
    half = 0.5 * theta
    small = theta2 < 1e-12
    k = np.where(small, 0.5 - theta2 / 48.0, np.sin(half) / theta)
    qw = np.where(small, 1.0 - theta2 / 8.0, np.cos(half))
    return quat_normalize(np.concatenate([qw, k * w], axis=-1))


def so3_log(q):
    q = quat_normalize(q)
    qw = np.clip(q[..., :1], -1.0, 1.0)
    qv = q[..., 1:]
    sin_half = np.linalg.norm(qv, axis=-1, keepdims=True)
    half = np.arctan2(sin_half, qw)
    small = sin_half < 1e-9
    k = np.where(
        small, 2.0 + 2.0 * (1.0 - qw), 2.0 * half / np.maximum(sin_half, _EPS)
    )
    return k * qv


def pose_identity():
    return np.array([1.0, 0, 0, 0, 0, 0, 0])


def make_pose(q, t):
    return np.concatenate(
        [np.asarray(q, np.float64), np.asarray(t, np.float64)], axis=-1
    )


def pose_quat(p):
    return np.asarray(p, np.float64)[..., :4]


def pose_trans(p):
    return np.asarray(p, np.float64)[..., 4:]


def pose_compose(a, b):
    q = quat_mul(pose_quat(a), pose_quat(b))
    t = quat_rotate(pose_quat(a), pose_trans(b)) + pose_trans(a)
    return make_pose(q, t)


def pose_inverse(p):
    qi = quat_conj(pose_quat(p))
    ti = -quat_rotate(qi, pose_trans(p))
    return make_pose(qi, ti)


def pose_between(a, b):
    return pose_compose(pose_inverse(a), b)


def _skew(w):
    x, y, z = w[..., 0], w[..., 1], w[..., 2]
    zero = np.zeros_like(x)
    return np.stack(
        [
            np.stack([zero, -z, y], axis=-1),
            np.stack([z, zero, -x], axis=-1),
            np.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def se3_exp(xi):
    xi = np.asarray(xi, np.float64)
    w, v = xi[..., :3], xi[..., 3:]
    q = so3_exp_quat(w)
    theta2 = np.sum(w * w, axis=-1)[..., None, None]
    theta = np.sqrt(np.maximum(theta2, _EPS * _EPS))
    W = _skew(w)
    W2 = W @ W
    small = theta2 < 1e-8
    A = np.where(
        small, 0.5 - theta2 / 24.0,
        (1 - np.cos(theta)) / np.maximum(theta2, _EPS),
    )
    B = np.where(
        small, 1.0 / 6.0 - theta2 / 120.0,
        (theta - np.sin(theta)) / np.maximum(theta2 * theta, _EPS),
    )
    V = np.eye(3) + A * W + B * W2
    t = np.einsum("...ij,...j->...i", V, v)
    return make_pose(q, t)


def pose_log(p):
    w = so3_log(pose_quat(p))
    theta2 = np.sum(w * w, axis=-1)[..., None, None]
    theta = np.sqrt(np.maximum(theta2, _EPS * _EPS))
    W = _skew(w)
    W2 = W @ W
    small = theta2 < 1e-8
    coef = np.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - theta * np.sin(theta) / (2.0 * (1.0 - np.cos(theta)) + _EPS))
        / np.maximum(theta2, _EPS),
    )
    Vinv = np.eye(3) - 0.5 * W + coef * W2
    v = np.einsum("...ij,...j->...i", Vinv, pose_trans(p))
    return np.concatenate([w, v], axis=-1)


def pose_retract(p, xi):
    return pose_compose(p, se3_exp(xi))
