"""Error-state Kalman filter (ESKF) for IMU(+GNSS) inertial navigation.

Capability parity with the reference's INS stack (`ins_node` executable):

- 15-dim error state [δp δv δθ δba δbg] with the reference's index layout
  (`inc/Estimator/states.hpp:18-27`);
- mid-point IMU integration of nominal P/V/Q
  (`inc/Model/MotionModel/Imu_MotionModel/imu_midIntegral_model.hpp:44-71`);
- error covariance propagation with the standard Fx/Fi/Qi blocks
  (`inc/Estimator/Predictor/imu_predictor.hpp:108-147`);
- Joseph-form position correction + error injection
  (`inc/Estimator/Correction/eskf_corrector.hpp:39-78`,
  `.../GNSS/position_correction.hpp`);
- static initialization: stillness check on accelerometer variance, gravity-
  aligned initial attitude, gyro-bias from the mean
  (`inc/Estimator/Initialized/imu_initialized_tool.hpp`).

TPU-first: the filter is pure functions over a pytree state; a whole
IMU+GNSS log runs as ONE ``lax.scan`` program (``eskf_run``) — per-sample
predict, masked correct — no host round-trips, differentiable end-to-end.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..common import se3

# error-state block offsets (states.hpp:18-27)
P0, V0, TH0, BA0, BG0 = 0, 3, 6, 9, 12


class EskfConfig(NamedTuple):
    acc_noise: float = 1e-2  # m/s² /√Hz
    gyro_noise: float = 1e-3  # rad/s /√Hz
    acc_bias_noise: float = 1e-4  # random-walk densities
    gyro_bias_noise: float = 1e-5
    gravity: float = 9.81
    init_pos_std: float = 0.1
    init_vel_std: float = 0.1
    init_att_std: float = 0.05
    init_ba_std: float = 0.05
    init_bg_std: float = 0.01


class EskfState(NamedTuple):
    p: jax.Array  # (3,) position (nav frame)
    v: jax.Array  # (3,) velocity
    q: jax.Array  # (4,) body→nav rotation
    ba: jax.Array  # (3,) accelerometer bias
    bg: jax.Array  # (3,) gyro bias
    cov: jax.Array  # (15,15) error covariance


def eskf_init_state(config: EskfConfig = EskfConfig(), q0=None) -> EskfState:
    d = jnp.concatenate(
        [
            jnp.full(3, config.init_pos_std**2),
            jnp.full(3, config.init_vel_std**2),
            jnp.full(3, config.init_att_std**2),
            jnp.full(3, config.init_ba_std**2),
            jnp.full(3, config.init_bg_std**2),
        ]
    )
    return EskfState(
        p=jnp.zeros(3),
        v=jnp.zeros(3),
        q=se3.quat_identity() if q0 is None else q0,
        ba=jnp.zeros(3),
        bg=jnp.zeros(3),
        cov=jnp.diag(d),
    )


def static_initialize(
    acc: jax.Array,  # (N,3) accelerometer samples while (supposedly) still
    gyro: jax.Array,  # (N,3)
    config: EskfConfig = EskfConfig(),
    still_acc_std: float = 0.1,
):
    """(state, is_still): gravity-aligned attitude + gyro bias from a static
    window (`imu_initialized_tool.hpp` semantics)."""
    acc_mean = jnp.mean(acc, axis=0)
    acc_std = jnp.sqrt(jnp.mean(jnp.sum((acc - acc_mean) ** 2, -1)))
    is_still = acc_std < still_acc_std
    # rotation taking measured gravity direction to nav +z
    g_b = acc_mean / jnp.maximum(jnp.linalg.norm(acc_mean), 1e-9)
    z = jnp.asarray([0.0, 0.0, 1.0])
    axis = jnp.cross(g_b, z)
    s = jnp.linalg.norm(axis)
    c = jnp.dot(g_b, z)
    angle = jnp.arctan2(s, c)
    axis = jnp.where(s > 1e-8, axis / jnp.maximum(s, 1e-9), jnp.asarray([1.0, 0, 0]))
    q0 = se3.so3_exp_quat(axis * angle)
    state = eskf_init_state(config, q0=q0)
    return state._replace(bg=jnp.mean(gyro, axis=0)), is_still


@partial(jax.jit, static_argnames=("config",))
def eskf_predict(
    state: EskfState,
    gyro0: jax.Array, acc0: jax.Array,  # sample at t
    gyro1: jax.Array, acc1: jax.Array,  # sample at t+dt
    dt: jax.Array,
    config: EskfConfig = EskfConfig(),
) -> EskfState:
    """Mid-point nominal propagation + 15-dim covariance propagation."""
    g_vec = jnp.asarray([0.0, 0.0, -config.gravity])
    w_mid = 0.5 * (gyro0 + gyro1) - state.bg
    # attitude: half-step rotations for the two accelerometer frames
    q_full = se3.quat_mul(state.q, se3.so3_exp_quat(w_mid * dt))
    a0_n = se3.quat_rotate(state.q, acc0 - state.ba)
    a1_n = se3.quat_rotate(q_full, acc1 - state.ba)
    a_mid = 0.5 * (a0_n + a1_n) + g_vec
    p = state.p + state.v * dt + 0.5 * a_mid * dt * dt
    v = state.v + a_mid * dt

    # error-state transition Fx (imu_predictor.hpp:108-147)
    R = se3.quat_to_matrix(state.q)
    a_b = 0.5 * (acc0 + acc1) - state.ba
    I3 = jnp.eye(3)
    F = jnp.eye(15)
    F = F.at[P0:P0 + 3, V0:V0 + 3].set(I3 * dt)
    F = F.at[V0:V0 + 3, TH0:TH0 + 3].set(-R @ se3.skew(a_b) * dt)
    F = F.at[V0:V0 + 3, BA0:BA0 + 3].set(-R * dt)
    F = F.at[TH0:TH0 + 3, TH0:TH0 + 3].set(
        jnp.eye(3) - se3.skew(w_mid * dt)
    )
    F = F.at[TH0:TH0 + 3, BG0:BG0 + 3].set(-I3 * dt)

    qn = jnp.concatenate(
        [
            jnp.zeros(3),
            jnp.full(3, (config.acc_noise**2) * dt),
            jnp.full(3, (config.gyro_noise**2) * dt),
            jnp.full(3, (config.acc_bias_noise**2) * dt),
            jnp.full(3, (config.gyro_bias_noise**2) * dt),
        ]
    )
    cov = F @ state.cov @ F.T + jnp.diag(qn)
    return EskfState(p, v, se3.quat_normalize(q_full), state.ba, state.bg, cov)


@jax.jit
def eskf_update_position(
    state: EskfState, pos: jax.Array, pos_std: jax.Array
) -> EskfState:
    """Joseph-form position correction + error injection
    (`eskf_corrector.hpp:39-78`, H = [I₃ 0 …])."""
    P = state.cov
    V = jnp.eye(3) * (pos_std**2)
    S = P[P0:P0 + 3, P0:P0 + 3] + V  # H P Hᵀ + V
    K = P[:, P0:P0 + 3] @ jnp.linalg.inv(S)  # (15,3)
    r = pos - state.p
    dx = K @ r  # (15,)
    IKH = jnp.eye(15) - jnp.pad(K, ((0, 0), (0, 12)))  # K H with H=[I 0]
    cov = IKH @ P @ IKH.T + K @ V @ K.T
    # inject error into nominal (states_update.hpp:33-55)
    return EskfState(
        p=state.p + dx[P0:P0 + 3],
        v=state.v + dx[V0:V0 + 3],
        q=se3.quat_normalize(
            se3.quat_mul(state.q, se3.so3_exp_quat(dx[TH0:TH0 + 3]))
        ),
        ba=state.ba + dx[BA0:BA0 + 3],
        bg=state.bg + dx[BG0:BG0 + 3],
        cov=cov,
    )


@jax.jit
def eskf_update_wheel(
    state: EskfState,
    speed: jax.Array,  # scalar: signed forward wheel speed (body x), m/s
    speed_std: jax.Array,
    nhc_std: jax.Array = jnp.float32(0.05),
    chi2_gate: jax.Array = jnp.float32(16.27),  # χ²₃ @ 0.999
) -> EskfState:
    """Wheel-odometry velocity update with non-holonomic constraints.

    Completes the reference's wheel stack, which is declared but empty
    (`inc/Estimator/Predictor/wheels_predictor.hpp` stub, wheel states
    `inc/Estimator/states.hpp:68-74`, LWIO node skeleton
    `src/apps/src/LIO/FilterLIO/simple_lwio_node.cpp`): the measurement is
    the body-frame velocity, z = [speed, 0, 0] — the encoder gives forward
    speed, and a ground vehicle has (approximately) zero lateral/vertical
    body velocity (NHC rows). A χ² gate on the whitened residual rejects
    wheel slip / skid samples instead of dragging the state (branchless:
    the update is computed and masked).

    h(x) = Rᵀ v; ∂h/∂δv = Rᵀ, ∂h/∂δθ = skew(Rᵀ v) (right-perturbation).
    """
    R = se3.quat_to_matrix(state.q)
    vb = R.T @ state.v
    r = jnp.concatenate([speed[None], jnp.zeros(2)]) - vb  # (3,)
    H = jnp.zeros((3, 15))
    H = H.at[:, V0:V0 + 3].set(R.T)
    H = H.at[:, TH0:TH0 + 3].set(se3.skew(vb))
    V = jnp.diag(jnp.stack([speed_std**2, nhc_std**2, nhc_std**2]))
    P = state.cov
    PHt = P @ H.T  # (15,3)
    S = H @ PHt + V
    Sinv = jnp.linalg.inv(S)
    # slip rejection: Mahalanobis gate on the innovation
    ok = (r @ Sinv @ r) < chi2_gate
    K = PHt @ Sinv  # (15,3)
    dx = K @ r
    IKH = jnp.eye(15) - K @ H
    cov = IKH @ P @ IKH.T + K @ V @ K.T
    updated = EskfState(
        p=state.p + dx[P0:P0 + 3],
        v=state.v + dx[V0:V0 + 3],
        q=se3.quat_normalize(
            se3.quat_mul(state.q, se3.so3_exp_quat(dx[TH0:TH0 + 3]))
        ),
        ba=state.ba + dx[BA0:BA0 + 3],
        bg=state.bg + dx[BG0:BG0 + 3],
        cov=cov,
    )
    return jax.tree_util.tree_map(
        lambda u, s: jnp.where(ok, u, s), updated, state
    )


@partial(jax.jit, static_argnames=("config",))
def eskf_run(
    init: EskfState,
    gyro: jax.Array,  # (N,3)
    acc: jax.Array,  # (N,3)
    dt: jax.Array,  # (N,) step to the NEXT sample
    gnss_pos: jax.Array,  # (N,3) position measurement at sample i (nav/ENU)
    gnss_valid: jax.Array,  # (N,) bool
    gnss_std: float | jax.Array = 0.05,
    config: EskfConfig = EskfConfig(),
    wheel_speed: jax.Array | None = None,  # (N,) forward wheel speed
    wheel_valid: jax.Array | None = None,  # (N,) bool
    wheel_std: float | jax.Array = 0.1,
):
    """Whole-log filtering as ONE fused scan: per IMU sample predict (to the
    next sample) and, where ``gnss_valid``/``wheel_valid``, correct. Returns
    (final state, stacked per-sample (p, v, cov_diag)). With wheel inputs
    this is the LWIO configuration (lidar corrections ride separately via
    ``eskf_update_pose``)."""
    has_wheel = wheel_speed is not None
    if not has_wheel:
        wheel_speed = jnp.zeros(gyro.shape[0])
        wheel_valid = jnp.zeros(gyro.shape[0], bool)

    def step(state, inp):
        g0, a0, g1, a1, d, zp, zv, ws, wv = inp
        state = eskf_predict(state, g0, a0, g1, a1, d, config)
        corrected = eskf_update_position(state, zp, jnp.asarray(gnss_std))
        state = jax.tree_util.tree_map(
            lambda c, s: jnp.where(zv, c, s), corrected, state
        )
        if has_wheel:
            wheeled = eskf_update_wheel(state, ws, jnp.asarray(wheel_std))
            state = jax.tree_util.tree_map(
                lambda c, s: jnp.where(wv, c, s), wheeled, state
            )
        return state, (state.p, state.v, jnp.diagonal(state.cov))

    g1 = jnp.concatenate([gyro[1:], gyro[-1:]])
    a1 = jnp.concatenate([acc[1:], acc[-1:]])
    final, traj = jax.lax.scan(
        step,
        init,
        (gyro, acc, g1, a1, dt, gnss_pos, gnss_valid, wheel_speed, wheel_valid),
    )
    return final, traj


@jax.jit
def eskf_update_pose(
    state: EskfState,
    pose: jax.Array,  # (7,) measured pose (e.g. scan-to-map registration)
    pos_std: jax.Array,
    rot_std: jax.Array,
) -> EskfState:
    """6-dim pose correction (position + attitude) — the lidar-odometry
    update of a filter LIO (reference FilterLIO intent,
    `src/apps/src/LIO/FilterLIO/simple_lio_node.cpp:1-13`). Rotation residual
    is the local angle error log(q⁻¹ ⊗ q_meas); H is identity on the δp and
    δθ blocks."""
    P = state.cov
    r = jnp.concatenate(
        [
            pose[4:] - state.p,
            se3.so3_log(se3.quat_mul(se3.quat_conj(state.q), pose[:4])),
        ]
    )  # (6,)
    # H = [I3 0 0 ...; 0 0 I3 0 0] → S = P[idx][:, idx] + V
    idx = jnp.asarray([0, 1, 2, 6, 7, 8])
    V = jnp.diag(
        jnp.concatenate([jnp.full(3, pos_std**2), jnp.full(3, rot_std**2)])
    )
    PHt = P[:, idx]  # (15,6)
    S = PHt[idx, :] + V
    K = PHt @ jnp.linalg.inv(S)  # (15,6)
    dx = K @ r
    H = jnp.zeros((6, 15)).at[0:3, 0:3].set(jnp.eye(3)).at[3:6, 6:9].set(jnp.eye(3))
    IKH = jnp.eye(15) - K @ H
    cov = IKH @ P @ IKH.T + K @ V @ K.T
    return EskfState(
        p=state.p + dx[P0:P0 + 3],
        v=state.v + dx[V0:V0 + 3],
        q=se3.quat_normalize(
            se3.quat_mul(state.q, se3.so3_exp_quat(dx[TH0:TH0 + 3]))
        ),
        ba=state.ba + dx[BA0:BA0 + 3],
        bg=state.bg + dx[BG0:BG0 + 3],
        cov=cov,
    )
