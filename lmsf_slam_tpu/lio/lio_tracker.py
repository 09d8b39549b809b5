"""LiDAR-inertial odometry: ESKF-propagated prediction + deskew + scan-to-map.

Capability parity with the reference's LIO layer:

- the FilterLIO intent (`src/apps/src/LIO/FilterLIO/simple_lio_node.cpp:1-13`
  — eskf LIO with IMU deskew; construction commented out in the snapshot):
  IMU propagates the state between scans, the scan-to-local-map registration
  corrects it — here actually implemented and tested;
- LIO-SAM-style IMU odometry structure (`imuPreintegration_node.cpp`):
  high-rate propagation between corrections, failure detection on absurd
  velocity/bias (`:510-533`);
- motion deskew of feature points using per-point sweep time (LIO-SAM
  imageProjection behavior; reference deskew base is a stub).

TPU-first: IMU windows propagate through the fused ``eskf_run`` scan; deskew
is a batched per-point exp-map; the registration step is the same fused GN
tracker program — three device programs per scan, zero host math beyond
bookkeeping.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..common import se3
from ..common.pointcloud import PointBatch
from ..estimator.eskf import (
    EskfConfig,
    EskfState,
    eskf_init_state,
    eskf_run,
    eskf_update_pose,
)
from ..ops.preprocess import deskew
from ..tracker.tracker import TrackerConfig, tracker_init, tracker_step


class LioConfig(NamedTuple):
    tracker: TrackerConfig = TrackerConfig()
    eskf: EskfConfig = EskfConfig()
    reg_pos_std: float = 0.05  # registration measurement noise
    reg_rot_std: float = 0.01
    wheel_std: float = 0.1  # encoder speed noise (LWIO, TODO #1's wheel leg)
    deskew_enabled: bool = True
    # failure detection (imuPreintegration_node.cpp:510-533)
    max_velocity: float = 30.0
    max_bias: float = 1.0


class LioTracker:
    """IMU-aided scan-to-local-map odometry (host orchestration).

    Per scan: feed the IMU window since the previous scan; the ESKF
    propagates pose/velocity/biases; feature points are deskewed with the
    propagated motion; the tracker registers with the IMU prediction; the
    registration pose corrects the filter.
    """

    def __init__(self, config: LioConfig = LioConfig()):
        self.config = config
        self.tracker_state = tracker_init(config.tracker)
        self.eskf: EskfState = eskf_init_state(config.eskf)
        self.prev_pose = np.asarray(se3.pose_identity())
        self.n_scans = 0
        self.failures = 0

    def _propagate(self, gyro, acc, dts, wheel_speeds=None):
        wheel_kw = {}
        if wheel_speeds is not None:
            ws = np.broadcast_to(
                np.asarray(wheel_speeds, np.float32), (len(gyro),)
            )
            wheel_kw = dict(
                wheel_speed=jnp.asarray(ws),
                wheel_valid=jnp.ones(len(gyro), bool),
                wheel_std=jnp.float32(self.config.wheel_std),
            )
        final, _ = eskf_run(
            self.eskf,
            jnp.asarray(gyro, jnp.float32),
            jnp.asarray(acc, jnp.float32),
            jnp.asarray(dts, jnp.float32),
            jnp.zeros((len(gyro), 3)),
            jnp.zeros(len(gyro), bool),
            config=self.config.eskf,
            **wheel_kw,
        )
        return final

    def _failure_check(self, state: EskfState) -> bool:
        """Reset guard on absurd velocity or bias (LIO-SAM failureDetection)."""
        v = float(jnp.linalg.norm(state.v))
        ba = float(jnp.linalg.norm(state.ba))
        bg = float(jnp.linalg.norm(state.bg))
        return v > self.config.max_velocity or max(ba, bg) > self.config.max_bias

    def process_scan(
        self,
        edge: PointBatch,
        surf: PointBatch,
        timestamp: float,
        gyro: Optional[np.ndarray] = None,  # (M,3) IMU window since last scan
        acc: Optional[np.ndarray] = None,
        imu_dts: Optional[np.ndarray] = None,  # (M,)
        wheel_speeds: Optional[np.ndarray] = None,  # (M,) or scalar, m/s
    ):
        """One LIO step. Returns (pose (7,), TrackerOutput).

        ``wheel_speeds``: optional encoder forward-speed samples aligned with
        the IMU window — enables the LWIO configuration (wheel velocity +
        non-holonomic constraints fused in the same propagation scan)."""
        cfg = self.config
        prediction = None
        if self.n_scans > 0 and gyro is not None and len(gyro) > 0:
            self.eskf = self._propagate(gyro, acc, imu_dts, wheel_speeds)
            if self._failure_check(self.eskf):
                # reset velocity/bias, keep pose (LIO-SAM resets its graph)
                self.eskf = self.eskf._replace(
                    v=jnp.zeros(3), ba=jnp.zeros(3), bg=jnp.zeros(3),
                    cov=eskf_init_state(cfg.eskf).cov,
                )
                self.failures += 1
            prediction = se3.make_pose(self.eskf.q, self.eskf.p)
            if cfg.deskew_enabled and edge.attr.shape[-1] > 0:
                from ..common.pointcloud import ATTR_TIME

                motion = se3.pose_between(
                    jnp.asarray(self.prev_pose), prediction
                )
                edge = deskew(edge, edge.attr[:, ATTR_TIME], motion)
                surf = deskew(surf, surf.attr[:, ATTR_TIME], motion)

        self.tracker_state, out = tracker_step(
            self.tracker_state, edge, surf, jnp.float32(timestamp),
            cfg.tracker, prediction=prediction,
        )
        # registration corrects the filter — but a solve the tracker's
        # gates REJECTED (out.pose fell back to the prediction) is not a
        # measurement: updating with it would shrink covariance on zero
        # information and, under the prediction-trust gate, launder a
        # mover-dragged solve back into the filter
        if bool(out.solve_ok):
            self.eskf = eskf_update_pose(
                self.eskf, out.pose, jnp.float32(cfg.reg_pos_std),
                jnp.float32(cfg.reg_rot_std),
            )
        self.prev_pose = np.asarray(out.pose)
        self.n_scans += 1
        return np.asarray(out.pose), out
