"""KITTI odometry dataset ingest.

The reference's north-star evaluation is KITTI-style (BASELINE.md: 0.554 m
ATE RMSE on a 1905-pose sequence; trajectories stored in KITTI 3×4 format,
`slam_data/trajectory/ground_truth.txt`). This module reads the raw KITTI
odometry layout so the same metric is measurable end-to-end:

    <root>/sequences/<seq>/velodyne/000000.bin   (float32 x,y,z,intensity)
    <root>/sequences/<seq>/calib.txt             (P0..P3, Tr)
    <root>/poses/<seq>.txt                       (3×4 cam0 poses)

Ground-truth poses are published in the cam0 frame; ``load_poses`` conjugates
them by the velodyne→cam0 extrinsic ``Tr`` so they live in the LiDAR frame
the SLAM system estimates in.
"""
from __future__ import annotations

import os
from typing import Iterator, Optional

import numpy as np

from ..common.pointcloud import PointBatch

KITTI_SCAN_CAPACITY = 131072  # 2^17 ≥ any HDL-64 scan (~120k returns)


def read_velodyne_bin(
    path: str, capacity: int = KITTI_SCAN_CAPACITY
) -> PointBatch:
    """One KITTI velodyne scan → padded PointBatch.

    attr follows the named schema (`common.pointcloud.ATTR_TIME/-INTENSITY`):
    slot 0 carries the azimuth-derived relative sweep time (the reference's
    rotary preprocess, `RotaryLidar_preprocessing.hpp:77-91` — HDL-64 spins
    clockwise, one revolution per scan), slot 1 the return intensity, so the
    LIO deskew path is active on real KITTI data and can never consume
    intensity as time.

    Uses the native C++ reader when built (lmsf_slam_tpu.native), falling
    back to numpy."""
    from ..native import read_f32

    raw = read_f32(path).reshape(-1, 4)
    az = np.arctan2(raw[:, 1], raw[:, 0])
    rel_time = np.mod(az[0] - az, 2.0 * np.pi) / (2.0 * np.pi)
    attr = np.stack([rel_time.astype(np.float32), raw[:, 3]], axis=1)
    return PointBatch.from_points(raw[:, :3], capacity, attr=attr)


def read_calib(path: str) -> np.ndarray:
    """Parse calib.txt; returns the 4×4 velodyne→cam0 transform ``Tr``."""
    with open(path) as f:
        for line in f:
            if line.startswith("Tr"):
                vals = np.array(line.split(":")[1].split(), np.float64)
                T = np.eye(4)
                T[:3] = vals.reshape(3, 4)
                return T
    raise ValueError(f"no Tr line in {path}")


def load_poses(pose_path: str, calib_path: Optional[str] = None) -> np.ndarray:
    """GT poses as (N,7) in the velodyne frame (cam0 → velo conjugation)."""
    import jax.numpy as jnp

    from ..common import se3

    rows = np.loadtxt(pose_path).reshape(-1, 3, 4)
    mats = np.concatenate(
        [rows, np.tile(np.array([[[0, 0, 0, 1.0]]]), (rows.shape[0], 1, 1))],
        axis=1,
    )
    if calib_path is not None and os.path.exists(calib_path):
        Tr = read_calib(calib_path)
        mats = np.linalg.inv(Tr) @ mats @ Tr
    return np.asarray(se3.matrix_to_pose(jnp.asarray(mats, jnp.float32)))


class KittiSequence:
    """Iterable over (timestamp, PointBatch) of one KITTI odometry sequence."""

    def __init__(
        self,
        root: str,
        sequence: str = "00",
        capacity: int = KITTI_SCAN_CAPACITY,
        rate_hz: float = 10.0,
    ):
        self.seq_dir = os.path.join(root, "sequences", sequence)
        self.velo_dir = os.path.join(self.seq_dir, "velodyne")
        self.pose_path = os.path.join(root, "poses", f"{sequence}.txt")
        self.calib_path = os.path.join(self.seq_dir, "calib.txt")
        self.capacity = capacity
        self.dt = 1.0 / rate_hz
        if not os.path.isdir(self.velo_dir):
            raise FileNotFoundError(self.velo_dir)
        self.files = sorted(
            os.path.join(self.velo_dir, f)
            for f in os.listdir(self.velo_dir)
            if f.endswith(".bin")
        )

    def __len__(self) -> int:
        return len(self.files)

    def __iter__(self) -> Iterator[tuple[float, PointBatch]]:
        for i, f in enumerate(self.files):
            yield i * self.dt, read_velodyne_bin(f, self.capacity)

    def ground_truth(self) -> Optional[np.ndarray]:
        if os.path.exists(self.pose_path):
            return load_poses(self.pose_path, self.calib_path)
        return None
