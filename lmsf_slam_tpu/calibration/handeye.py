"""Online hand-eye (lidar-lidar extrinsic) calibration.

Capability parity with the reference's multi-LiDAR extrinsic initializer
(`inc/Algorithm/calibration/handeye_calibration_base.hpp`):

- screw-motion consistency check — a motion pair (primary A, sub B) is
  usable only if both increments have the same rotation angle and the same
  translation projection onto the rotation axis, which are extrinsic-
  invariant (`checkScrewMotion`, `:207-242`);
- rotation via the nullspace of stacked quaternion constraint matrices
  [L(q_A) − R(q_B)] q_X = 0, with a degeneracy gate on the second-smallest
  singular value (> 0.25) so single-axis motion never yields a fake solve
  (`:113-148`);
- translation by LSQ of (R_A − I) t_X = R_X t_B − t_A (`:160-184`);
- bounded sample store (≤300 pose pairs, `:71-106`).

TPU-first: the pair store is a fixed-capacity masked ring buffer (pytree);
acceptance is branchless; the solve is one fused program — a 4×4 eigh of the
accumulated Σ AᵀA (equivalent to the SVD of the 4N×4 stack) plus a 3×3
normal-equation solve. Everything autodiff-safe and jittable.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..common import se3


class HandEyeConfig(NamedTuple):
    capacity: int = 300  # max stored pose pairs (ref :71-106)
    min_rot_angle: float = 0.05  # rad — pair must carry rotation signal
    screw_rot_tol: float = 0.02  # rad — |angle_A − angle_B| gate (:207-242)
    screw_trans_tol: float = 0.05  # m — |d_A − d_B| axis-projection gate
    degeneracy_gate: float = 0.25  # 2nd-smallest singular value floor (:113-148)
    min_pairs: int = 15


class HandEyeState(NamedTuple):
    q_a: jax.Array  # (C, 4) primary rotation increments
    t_a: jax.Array  # (C, 3)
    q_b: jax.Array  # (C, 4) sub-lidar rotation increments
    t_b: jax.Array  # (C, 3)
    mask: jax.Array  # (C,)
    write_idx: jax.Array  # int32
    count: jax.Array  # int32 — total accepted pairs


class HandEyeResult(NamedTuple):
    extrinsic: jax.Array  # (7,) pose of sub lidar in primary frame (T_A_B)
    ok: jax.Array  # bool — degeneracy gate + enough pairs
    quality: jax.Array  # 2nd-smallest singular value of the rotation system
    rot_residual: jax.Array  # mean |[L−R] q_X| over pairs
    trans_residual: jax.Array  # rms translation equation residual (m)


def handeye_init(config: HandEyeConfig = HandEyeConfig()) -> HandEyeState:
    C = config.capacity
    return HandEyeState(
        q_a=jnp.zeros((C, 4)), t_a=jnp.zeros((C, 3)),
        q_b=jnp.zeros((C, 4)), t_b=jnp.zeros((C, 3)),
        mask=jnp.zeros(C, bool),
        write_idx=jnp.array(0, jnp.int32),
        count=jnp.array(0, jnp.int32),
    )


@partial(jax.jit, static_argnames=("config",))
def handeye_add_pair(
    state: HandEyeState,
    pose_a: jax.Array,  # (7,) primary odometry increment over the interval
    pose_b: jax.Array,  # (7,) sub-lidar odometry increment (same interval)
    config: HandEyeConfig = HandEyeConfig(),
) -> HandEyeState:
    """Branchless accept of one motion pair after the screw-motion check."""
    wa = se3.so3_log(se3.pose_quat(pose_a))
    wb = se3.so3_log(se3.pose_quat(pose_b))
    ang_a = jnp.linalg.norm(wa)
    ang_b = jnp.linalg.norm(wb)
    # translation projected on the rotation axis (screw pitch · angle)
    d_a = jnp.sum(se3.pose_trans(pose_a) * wa) / jnp.maximum(ang_a, 1e-9)
    d_b = jnp.sum(se3.pose_trans(pose_b) * wb) / jnp.maximum(ang_b, 1e-9)
    accept = (
        (ang_a > config.min_rot_angle)
        & (jnp.abs(ang_a - ang_b) < config.screw_rot_tol)
        & (jnp.abs(d_a - d_b) < config.screw_trans_tol)
    )
    i = state.write_idx
    upd = HandEyeState(
        q_a=state.q_a.at[i].set(se3.pose_quat(pose_a)),
        t_a=state.t_a.at[i].set(se3.pose_trans(pose_a)),
        q_b=state.q_b.at[i].set(se3.pose_quat(pose_b)),
        t_b=state.t_b.at[i].set(se3.pose_trans(pose_b)),
        mask=state.mask.at[i].set(True),
        write_idx=(i + 1) % config.capacity,
        count=jnp.minimum(state.count + 1, config.capacity),
    )
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(
            jnp.reshape(accept, (1,) * a.ndim) if a.ndim else accept, a, b
        ),
        upd,
        state,
    )


@partial(jax.jit, static_argnames=("config",))
def handeye_solve(
    state: HandEyeState, config: HandEyeConfig = HandEyeConfig()
) -> HandEyeResult:
    """Closed-form rotation + LSQ translation from the stored pairs."""
    m = state.mask.astype(jnp.float32)
    # rotation: A_i = L(q_a) − R(q_b); nullspace of Σ AᵀA (4×4)
    A = se3.quat_left_matrix(state.q_a) - se3.quat_right_matrix(state.q_b)
    M = jnp.einsum("nij,nik,n->jk", A, A, m)
    eigval, eigvec = jnp.linalg.eigh(M)  # ascending
    q_x = se3.quat_normalize(eigvec[:, 0])
    # singular values of the stacked system are sqrt(eigvals of M)
    quality = jnp.sqrt(jnp.maximum(eigval[1], 0.0))
    rot_res = jnp.sum(
        jnp.linalg.norm(jnp.einsum("nij,j->ni", A, q_x), axis=-1) * m
    ) / jnp.maximum(jnp.sum(m), 1.0)

    # translation: (R_a − I) t_x = R_x t_b − t_a
    R_a = se3.quat_to_matrix(state.q_a)
    lhs = R_a - jnp.eye(3)
    rhs = se3.quat_rotate(q_x[None, :], state.t_b) - state.t_a
    H = jnp.einsum("nij,nik,n->jk", lhs, lhs, m) + 1e-9 * jnp.eye(3)
    g = jnp.einsum("nij,ni,n->j", lhs, rhs, m)
    t_x = jnp.linalg.solve(H, g)
    resid = jnp.einsum("nij,j->ni", lhs, t_x) - rhs
    trans_res = jnp.sqrt(
        jnp.sum(jnp.sum(resid * resid, -1) * m) / jnp.maximum(jnp.sum(m), 1.0)
    )
    ok = (quality > config.degeneracy_gate) & (
        jnp.sum(state.mask) >= config.min_pairs
    )
    return HandEyeResult(
        extrinsic=se3.make_pose(q_x, t_x),
        ok=ok,
        quality=quality,
        rot_residual=rot_res,
        trans_residual=trans_res,
    )
