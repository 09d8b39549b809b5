"""Trajectory evaluation: ATE / RPE statistics and KITTI-format trajectory IO.

The reference evaluates offline with evo-style statistics on KITTI-format
trajectories (`slam_data/trajectory/results/table.csv` — rmse/mean/median/
std/max/sse; ground truth `slam_data/trajectory/ground_truth.txt`, 3×4
row-major poses). This module reproduces that pipeline natively so the
north-star ATE metric (BASELINE.md: 0.554 m RMSE) is measurable in-repo:
Umeyama SE(3) alignment → absolute trajectory error stats, plus relative
pose error over a fixed frame delta.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..common import se3


class TrajectoryStats(NamedTuple):
    rmse: float
    mean: float
    median: float
    std: float
    max: float
    sse: float
    n: int

    @staticmethod
    def from_errors(err: np.ndarray) -> "TrajectoryStats":
        err = np.asarray(err, np.float64)
        return TrajectoryStats(
            rmse=float(np.sqrt(np.mean(err**2))),
            mean=float(np.mean(err)),
            median=float(np.median(err)),
            std=float(np.std(err)),
            max=float(np.max(err)),
            sse=float(np.sum(err**2)),
            n=int(err.shape[0]),
        )


def umeyama_alignment(
    est: np.ndarray, gt: np.ndarray, with_scale: bool = False
):
    """Least-squares rigid (optionally similarity) alignment est→gt.

    Args: (N, 3) point sets. Returns (R (3,3), t (3,), s scalar) minimizing
    ‖gt − (s·R·est + t)‖².
    """
    est = np.asarray(est, np.float64)
    gt = np.asarray(gt, np.float64)
    mu_e = est.mean(axis=0)
    mu_g = gt.mean(axis=0)
    de = est - mu_e
    dg = gt - mu_g
    cov = dg.T @ de / est.shape[0]
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    if with_scale:
        var_e = np.mean(np.sum(de**2, axis=1))
        s = float(np.trace(np.diag(D) @ S) / max(var_e, 1e-12))
    else:
        s = 1.0
    t = mu_g - s * R @ mu_e
    return R, t, s


def ate_stats(
    est_poses: np.ndarray, gt_poses: np.ndarray, align: bool = True
) -> TrajectoryStats:
    """Absolute trajectory error of (N,7) pose arrays (evo-style).

    ``align=True`` applies Umeyama SE(3) alignment first (standard ATE;
    matches how the reference's table.csv numbers were produced).
    """
    p_est = np.asarray(est_poses, np.float64)[:, 4:]
    p_gt = np.asarray(gt_poses, np.float64)[:, 4:]
    assert p_est.shape == p_gt.shape, (p_est.shape, p_gt.shape)
    if align and p_est.shape[0] >= 3:
        R, t, _ = umeyama_alignment(p_est, p_gt)
        p_est = p_est @ R.T + t
    err = np.linalg.norm(p_est - p_gt, axis=1)
    return TrajectoryStats.from_errors(err)


def rpe_stats(
    est_poses: np.ndarray, gt_poses: np.ndarray, delta: int = 1
) -> TrajectoryStats:
    """Relative pose (translation) error over a fixed frame delta."""
    import jax.numpy as jnp

    est = jnp.asarray(est_poses)
    gt = jnp.asarray(gt_poses)
    de = se3.pose_between(est[:-delta], est[delta:])
    dg = se3.pose_between(gt[:-delta], gt[delta:])
    err = np.asarray(
        jnp.linalg.norm(se3.pose_trans(se3.pose_between(dg, de)), axis=-1)
    )
    return TrajectoryStats.from_errors(err)


def save_kitti_trajectory(poses: np.ndarray, path: str):
    """Write (N,7) poses as KITTI 3×4 row-major lines (the reference's
    export format, `slam_data/trajectory/*.txt`)."""
    import jax.numpy as jnp

    mats = np.asarray(se3.pose_to_matrix(jnp.asarray(poses)))[:, :3, :]
    np.savetxt(path, mats.reshape(-1, 12), fmt="%.9e")


def load_kitti_trajectory(path: str) -> np.ndarray:
    """Read KITTI 3×4 row-major pose lines into (N,7) poses."""
    import jax.numpy as jnp

    rows = np.loadtxt(path).reshape(-1, 3, 4)
    mats = np.concatenate(
        [rows, np.tile(np.array([[[0, 0, 0, 1.0]]]), (rows.shape[0], 1, 1))],
        axis=1,
    )
    return np.asarray(se3.matrix_to_pose(jnp.asarray(mats, jnp.float32)))
