"""IMU preintegration over scan intervals.

Capability parity with the reference's LIO-SAM-style IMU odometry
(`src/apps/src/LIO/FactorGraphLIO/imuPreintegration_node.cpp:433-460` uses
gtsam PreintegratedImuMeasurements): integrate gyro/accel between two lidar
keyframes into a bias-corrected relative motion (Δq, Δv, Δp) with
covariance, usable as (a) the front-end motion prediction and (b) an IMU
between-factor in the graph.

TPU-first: one ``lax.scan`` over the sample window — the whole
preintegration is a single fused program; first-order bias Jacobians are
carried so a later bias estimate re-linearizes the delta without
re-integration (standard Forster-style preintegration).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..common import se3


class PreintegratedImu(NamedTuple):
    dq: jax.Array  # (4,) Δ rotation (body frame at start → end)
    dv: jax.Array  # (3,) Δ velocity (start body frame)
    dp: jax.Array  # (3,) Δ position (start body frame)
    dt: jax.Array  # () total time
    cov: jax.Array  # (9,9) covariance of [δθ, δv, δp]
    # first-order bias Jacobians
    dq_dbg: jax.Array  # (3,3) ∂δθ/∂bg
    dv_dbg: jax.Array  # (3,3)
    dv_dba: jax.Array  # (3,3)
    dp_dbg: jax.Array  # (3,3)
    dp_dba: jax.Array  # (3,3)


@partial(jax.jit, static_argnames=())
def preintegrate(
    gyro: jax.Array,  # (N,3)
    acc: jax.Array,  # (N,3)
    dts: jax.Array,  # (N,) duration of each sample interval
    valid: jax.Array,  # (N,) bool — padded windows
    bg: jax.Array,
    ba: jax.Array,
    gyro_noise: float = 1e-3,
    acc_noise: float = 1e-2,
) -> PreintegratedImu:
    """Integrate a (padded) IMU window into a preintegrated delta."""

    def step(carry, inp):
        dq, dv, dp, T, cov, Jqg, Jvg, Jva, Jpg, Jpa = carry
        w, a, dt, ok = inp
        dt = jnp.where(ok, dt, 0.0)
        w_c = w - bg
        a_c = a - ba
        R = se3.quat_to_matrix(dq)
        # nominal
        dp_n = dp + dv * dt + 0.5 * (R @ a_c) * dt * dt
        dv_n = dv + (R @ a_c) * dt
        dq_n = se3.quat_mul(dq, se3.so3_exp_quat(w_c * dt))
        # covariance of [δθ δv δp] (first-order)
        A = jnp.eye(9)
        Rw = se3.so3_exp_matrix(w_c * dt)
        A = A.at[0:3, 0:3].set(Rw.T)
        A = A.at[3:6, 0:3].set(-R @ se3.skew(a_c) * dt)
        A = A.at[6:9, 0:3].set(-0.5 * R @ se3.skew(a_c) * dt * dt)
        A = A.at[6:9, 3:6].set(jnp.eye(3) * dt)
        qd = jnp.concatenate(
            [
                jnp.full(3, gyro_noise**2 * dt),
                jnp.full(3, acc_noise**2 * dt),
                jnp.full(3, 0.25 * acc_noise**2 * dt**3 + 1e-12),
            ]
        )
        cov_n = A @ cov @ A.T + jnp.diag(qd)
        # bias Jacobians (Forster eq. 69-71 first order)
        Jqg_n = Rw.T @ Jqg - jnp.eye(3) * dt
        Jvg_n = Jvg - R @ se3.skew(a_c) @ Jqg * dt
        Jva_n = Jva - R * dt
        Jpg_n = Jpg + Jvg * dt - 0.5 * R @ se3.skew(a_c) @ Jqg * dt * dt
        Jpa_n = Jpa + Jva * dt - 0.5 * R * dt * dt
        new = (dq_n, dv_n, dp_n, T + dt, cov_n, Jqg_n, Jvg_n, Jva_n, Jpg_n, Jpa_n)
        return new, None

    init = (
        se3.quat_identity(), jnp.zeros(3), jnp.zeros(3), jnp.float32(0.0),
        jnp.zeros((9, 9)),
        jnp.zeros((3, 3)), jnp.zeros((3, 3)), jnp.zeros((3, 3)),
        jnp.zeros((3, 3)), jnp.zeros((3, 3)),
    )
    (dq, dv, dp, T, cov, Jqg, Jvg, Jva, Jpg, Jpa), _ = jax.lax.scan(
        step, init, (gyro, acc, dts, valid)
    )
    return PreintegratedImu(dq, dv, dp, T, cov, Jqg, Jvg, Jva, Jpg, Jpa)


def predict_pose(
    pose_i: jax.Array,  # (7,) pose at interval start (world)
    v_i: jax.Array,  # (3,) velocity at start (world)
    pre: PreintegratedImu,
    gravity: float = 9.81,
):
    """World-frame (pose, velocity) at the interval end from a delta."""
    g = jnp.asarray([0.0, 0.0, -gravity])
    q_i = se3.pose_quat(pose_i)
    p_i = se3.pose_trans(pose_i)
    T = pre.dt
    p_j = p_i + v_i * T + 0.5 * g * T * T + se3.quat_rotate(q_i, pre.dp)
    v_j = v_i + g * T + se3.quat_rotate(q_i, pre.dv)
    q_j = se3.quat_mul(q_i, pre.dq)
    return se3.make_pose(q_j, p_j), v_j


def correct_bias(pre: PreintegratedImu, dbg: jax.Array, dba: jax.Array):
    """First-order re-linearization of the delta at an updated bias."""
    dq = se3.quat_mul(pre.dq, se3.so3_exp_quat(pre.dq_dbg @ dbg))
    dv = pre.dv + pre.dv_dbg @ dbg + pre.dv_dba @ dba
    dp = pre.dp + pre.dp_dbg @ dbg + pre.dp_dba @ dba
    return pre._replace(dq=dq, dv=dv, dp=dp)
