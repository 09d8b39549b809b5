"""System orchestration: raw scans in → trajectory + lifelong map out.

Capability parity with the reference's central orchestrator
(`inc/System/ML_System.hpp`): per-lidar preprocess + feature extraction
(`Process()` `:118-162`), scan-to-local-map tracking (`process()` `:232-354`),
keyframe gating (`KeyframeUpdater` thresholds Δt>60 s ∨ trans>1 m ∨ rot>30°,
`inc/Common/keyframe_updater.hpp:34-107`), hand-off to the lifelong backend
(`backend_->AddKeyFrame` `:336-342`), and per-frame result publication
(`:344-353`). `SavePoseGraph`/`SaveGlobalMap`/`SystemLoad` (`:165-206`) map to
``save``/``global_map``/``load``.

TPU-first design: the per-frame hot path (organize → curvature → feature
top-k → predict → fused GN registration → branchless local-map update) is
ONE jitted XLA program (`tracker_step` over the featurized scan); the host
layer here is thin bookkeeping — keyframe gating, backend FSM calls, and
trajectory logging. Where the reference runs per-lidar OpenMP threads, the
multi-lidar path batches lidars into one vmapped program.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..backend.lifelong import BackendOutput, LifelongBackend, LifelongConfig, WorkMode
from ..backend.loop_closure import LoopConfig
from ..common import se3
from ..common.pointcloud import PointBatch
from ..ops import features as F
from ..ops.preprocess import PreprocessParams, preprocess
from ..ops.registration import RegistrationParams
from ..tracker.tracker import TrackerConfig, tracker_init, tracker_step


class FeatureParams(NamedTuple):
    """Range-image + LOAM feature extraction configuration.

    Output capacities are static: edges = rings·sectors·edges_per_sector,
    surfs = rings·sectors·surfs_per_sector.
    """

    rings: int = 16
    width: int = 900
    sectors: int = 6
    edges_per_sector: int = 4
    surfs_per_sector: int = 16
    edge_thresh: float = 0.5
    surf_thresh: float = 0.05
    nms_half: int = 5

    @property
    def edge_capacity(self) -> int:
        return self.rings * self.sectors * self.edges_per_sector

    @property
    def surf_capacity(self) -> int:
        return self.rings * self.sectors * self.surfs_per_sector


class SystemConfig(NamedTuple):
    feature: FeatureParams = FeatureParams()
    preprocess: PreprocessParams = PreprocessParams()
    # tracker (capacities derived from ``feature``)
    tracker_window: int = 20
    registration: RegistrationParams = RegistrationParams()
    map_update_trans: float = 0.3  # local-map insertion gate (ref :239-262)
    map_update_rot: float = 0.1
    map_update_dt: float = 10.0
    # backend keyframe gate (keyframe_updater.hpp:34-107)
    keyframe_trans: float = 1.0  # m
    keyframe_rot: float = math.radians(30.0)
    keyframe_dt: float = 60.0  # s
    lifelong: LifelongConfig = LifelongConfig()
    loop: LoopConfig = LoopConfig()


class FrameResult(NamedTuple):
    timestamp: float
    odom_pose: np.ndarray  # (7,) front-end odometry-frame pose
    map_pose: np.ndarray  # (7,) map-frame pose (odom2map ∘ odom)
    mode: WorkMode
    is_keyframe: bool
    keyframe_id: int  # backend DB id, -1 if not stored
    loop_closed: bool
    converged: bool  # front-end registration health
    num_matches: int


class KeyframeGate:
    """Reference `KeyframeUpdater` (`keyframe_updater.hpp:34-107`): pass a
    frame to the backend when motion since the last keyframe exceeds
    trans/rot thresholds or the time gap exceeds ``dt``. Also tracks the
    accumulated travelled distance (`:94-104`)."""

    def __init__(self, trans: float, rot: float, dt: float):
        self.trans = trans
        self.rot = rot
        self.dt = dt
        self.last_pose: Optional[np.ndarray] = None
        self.last_stamp = -np.inf
        self.accum_distance = 0.0

    def need_update(self, pose: np.ndarray, stamp: float) -> bool:
        if self.last_pose is None:
            self.last_pose = np.asarray(pose, np.float32)
            self.last_stamp = stamp
            return True
        delta = se3.pose_between(jnp.asarray(self.last_pose), jnp.asarray(pose))
        dx = float(jnp.linalg.norm(se3.pose_trans(delta)))
        dr = float(jnp.linalg.norm(se3.so3_log(se3.pose_quat(delta))))
        if dx > self.trans or dr > self.rot or (stamp - self.last_stamp) > self.dt:
            self.accum_distance += dx
            self.last_pose = np.asarray(pose, np.float32)
            self.last_stamp = stamp
            return True
        return False


class MultiLidarSystem:
    """Public end-to-end SLAM system (single- or multi-LiDAR).

    ``process(scan, timestamp)`` is the single entry point (reference
    `MultiLidarSystem::Process`, `ML_System.hpp:118`): a raw organized or
    unorganized scan goes in; the front end featurizes and tracks it; frames
    passing the keyframe gate feed the lifelong backend (mapping,
    localization, loop closure, relocalization); a ``FrameResult`` comes out
    every frame.
    """

    def __init__(
        self,
        config: SystemConfig = SystemConfig(),
        backend: Optional[LifelongBackend] = None,
    ):
        self.config = config
        f = config.feature
        self.tracker_config = TrackerConfig(
            window=config.tracker_window,
            edge_capacity=f.edge_capacity,
            surf_capacity=f.surf_capacity,
            map_update_trans=config.map_update_trans,
            map_update_rot=config.map_update_rot,
            map_update_dt=config.map_update_dt,
            registration=config.registration,
        )
        self.tracker_state = tracker_init(self.tracker_config)
        self.backend = backend if backend is not None else LifelongBackend(
            config=config.lifelong, loop_config=config.loop
        )
        self.gate = KeyframeGate(
            config.keyframe_trans, config.keyframe_rot, config.keyframe_dt
        )
        self.results: list[FrameResult] = []

    # -- per-frame pipeline ---------------------------------------------------

    def featurize(self, scan: PointBatch):
        """Raw scan → (edge, surf) feature PointBatches (sensor frame)."""
        cfg = self.config.feature
        processed = preprocess(scan, self.config.preprocess)
        grid = F.organize_scan(processed, rings=cfg.rings, width=cfg.width)
        feats = F.extract_loam_features(
            grid,
            sectors=cfg.sectors,
            edges_per_sector=cfg.edges_per_sector,
            surfs_per_sector=cfg.surfs_per_sector,
            edge_thresh=cfg.edge_thresh,
            surf_thresh=cfg.surf_thresh,
            nms_half=cfg.nms_half,
        )
        return feats.edge, feats.surf

    def process(self, scan: PointBatch, timestamp: float) -> FrameResult:
        """One frame: featurize → track → keyframe gate → backend."""
        edge, surf = self.featurize(scan)
        self.tracker_state, out = tracker_step(
            self.tracker_state, edge, surf, jnp.float32(timestamp),
            self.tracker_config,
        )
        odom_pose = np.asarray(out.pose)

        backend_out: Optional[BackendOutput] = None
        is_kf = self.gate.need_update(odom_pose, timestamp)
        if is_kf:
            backend_out = self.backend.add_keyframe(
                timestamp, edge, surf, odom_pose
            )

        if backend_out is not None and backend_out.keyframe_id >= 0:
            map_pose = np.asarray(backend_out.map_pose)
        else:
            map_pose = np.asarray(
                se3.pose_compose(
                    jnp.asarray(self.backend.odom2map), jnp.asarray(odom_pose)
                )
            )
        result = FrameResult(
            timestamp=float(timestamp),
            odom_pose=odom_pose,
            map_pose=map_pose,
            mode=self.backend.mode,
            is_keyframe=is_kf,
            keyframe_id=(backend_out.keyframe_id if backend_out else -1),
            loop_closed=bool(backend_out.loop_closed) if backend_out else False,
            converged=bool(out.registration.converged),
            num_matches=int(out.registration.num_matches),
        )
        self.results.append(result)
        return result

    # -- trajectory / map export ----------------------------------------------

    def trajectory(self) -> np.ndarray:
        """Per-frame map-frame poses (N, 7)."""
        return np.stack([r.map_pose for r in self.results]) if self.results else (
            np.zeros((0, 7), np.float32)
        )

    def keyframe_trajectory(self) -> np.ndarray:
        """Optimized keyframe poses from the backend database (K, 7)."""
        return self.backend.db.map_poses[: self.backend.db.n_keyframes].copy()

    def global_map(self, voxel_size: float = 0.0) -> np.ndarray:
        """Assemble the global map from all keyframe clouds at their current
        optimized poses (reference `SaveGlobalMap`, `ML_System.hpp:173-196`).
        Returns a compact (M, 3) numpy array."""
        db = self.backend.db
        if db.n_keyframes == 0:
            return np.zeros((0, 3), np.float32)
        edge, surf = db.local_map_ids(np.arange(db.n_keyframes))
        pts = np.concatenate([edge.to_numpy(), surf.to_numpy()])
        if voxel_size > 0:
            keys = np.floor(pts / voxel_size).astype(np.int64)
            _, idx = np.unique(keys, axis=0, return_index=True)
            pts = pts[idx]
        return pts

    def force_global_optimize(self):
        return self.backend.force_global_optimize()

    # -- persistence (reference SavePoseGraph / SystemLoad) --------------------

    def save(self, path: str):
        self.backend.save(path)

    @classmethod
    def load(
        cls, path: str, config: SystemConfig = SystemConfig()
    ) -> "MultiLidarSystem":
        """Boot from a saved lifelong database → backend starts in
        RELOCALIZATION (reference `SystemLoad`, `ML_System.hpp:202-206`)."""
        backend = LifelongBackend.load(
            path, config=config.lifelong, loop_config=config.loop
        )
        return cls(config=config, backend=backend)
