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

import jax
import jax.numpy as jnp
import numpy as np

from ..backend.keyframe_db import KeyframeDatabase
from ..backend.lifelong import BackendOutput, LifelongBackend, LifelongConfig, WorkMode
from ..backend.loop_closure import LoopConfig
from ..calibration.handeye import (
    HandEyeConfig,
    handeye_add_pair,
    handeye_init,
    handeye_solve,
)
from ..common import se3, se3np
from ..common.pointcloud import PointBatch, concat as pb_concat
from ..ops import features as F
from ..ops.preprocess import PreprocessParams, preprocess
from ..ops.registration import RegistrationParams, register_edge_surf
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
    # sensor range noise σ (m): enables the noise-floor-compensated curvature
    # (ops.features) so near-range noise can't fabricate edge features
    range_noise: float = 0.0
    # LeGO-LOAM-style ground segmentation: bar ground cells from the edge
    # channel (ground keeps feeding the surf/plane channel)
    exclude_ground_edges: bool = False
    # keep foreground silhouette points (reject only the occluded/background
    # side) — right at HDL-64 urban density where poles/corners dominate;
    # leave False where round objects dominate the edge budget (their limb
    # slides with viewpoint). See ops.features.bad_point_mask.
    one_sided_occlusion: bool = False

    @property
    def edge_capacity(self) -> int:
        return self.rings * self.sectors * self.edges_per_sector

    @property
    def surf_capacity(self) -> int:
        return self.rings * self.sectors * self.surfs_per_sector


class SystemConfig(NamedTuple):
    n_lidars: int = 1
    feature: FeatureParams = FeatureParams()
    preprocess: PreprocessParams = PreprocessParams()
    # front-end matching method (reference factory string,
    # `ML_SystemFactory.hpp:151-191`): "feature_based" = LOAM edge+surf GN;
    # "sparse_point_plane_icp" = voxel-downsampled whole cloud as planar
    # points, no edge classification (the registration core treats empty
    # edges as pure point-to-plane ICP). NDT remains a registration-level
    # option (`ops.registration.register_ndt`).
    registration_method: str = "feature_based"
    icp_voxel_size: float = 0.4  # scan downsample for the ICP method
    # multi-lidar online extrinsic calibration (ML_System.hpp:239-323):
    # phase 0 = per-lidar odometry + hand-eye init; phase 1 = refinement of
    # each sub extrinsic against the primary local map; phase 2 = fused
    # tracking of all lidars in the primary frame
    handeye: HandEyeConfig = HandEyeConfig(min_pairs=10)
    calib_refine_frames: int = 5  # accepted refinements before phase 2
    # phase-1 refinement registration: longer leash than tracking (the
    # hand-eye init can be decimeters off) and a degeneracy floor scaled to
    # a single sub scan's match count rather than a fused frame's
    calib_refine_registration: RegistrationParams = RegistrationParams(
        max_iters=16, max_corr_dist=2.0, degen_thresh=25.0
    )
    # known extrinsics (list of (7,) poses of lidar i in lidar-0 frame) skip
    # calibration entirely; None → calibrate online
    extrinsics: Optional[tuple] = None
    # run the backend (loop detection + optimization) on a worker thread so
    # the frontend never stalls (reference thread pipeline, §2.9).
    # async_policy: backpressure behavior when the worker falls behind —
    # "coalesce" (default: supersede pending localization refreshes, never
    # drop mapping keyframes), "block" (always lossless), "drop" (shed —
    # measured to destroy quality at city scale, kept for experiments only)
    async_backend: bool = False
    async_policy: str = "coalesce"
    # IMU-aided mode (the LIG system the reference stubs,
    # `LIG_System.hpp:173-182`): ESKF-propagated prediction + sweep deskew;
    # ``process`` then accepts per-frame IMU windows, and GNSS fixes fuse
    # into the filter via ``process_gnss``
    use_imu: bool = False
    # tracker (capacities derived from ``feature``)
    tracker_window: int = 20
    # IMU-free constant-velocity sweep deskew in the tracker (consumes the
    # per-point rel-time attr when present — e.g. KITTI azimuth times); the
    # IMU-propagated deskew in LioTracker takes precedence under use_imu
    deskew: bool = False
    # frontend dynamic-object probation gate (tracker.py TrackerConfig.
    # probation): admit scan points to the odometry local map only when
    # map-supported or re-sighted at a static world position
    dynamic_probation: bool = False
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
    calib_status: int = 2  # 0 = hand-eye init, 1 = refining, 2 = calibrated


def _average_poses(samples: list) -> np.ndarray:
    """Robust average of clustered (7,) poses: sign-aligned quaternion mean
    + component-wise MEDIAN translation — individual refinement samples
    occasionally land decimeters off (scan-dependent minima), and the median
    shrugs those off where a mean would drag."""
    qs = np.stack([s[:4] for s in samples])
    qs = np.where((qs @ qs[0])[:, None] < 0, -qs, qs)
    q = qs.mean(axis=0)
    q = q / max(np.linalg.norm(q), 1e-12)
    t = np.median(np.stack([s[4:] for s in samples]), axis=0)
    return np.concatenate([q, t]).astype(np.float32)


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
        # host-side pose math (se3np): this runs every frame — a device
        # dispatch here costs an RPC round-trip per frame on remote TPUs
        delta = se3np.pose_between(self.last_pose, pose)
        dx = float(np.linalg.norm(se3np.pose_trans(delta)))
        dr = float(np.linalg.norm(se3np.so3_log(se3np.pose_quat(delta))))
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
        n = config.n_lidars
        # the main tracker is sized for the FUSED feature stream (n lidars);
        # during calibration only the primary's slice is populated
        self.tracker_config = TrackerConfig(
            window=config.tracker_window,
            edge_capacity=n * f.edge_capacity,
            surf_capacity=n * f.surf_capacity,
            map_update_trans=config.map_update_trans,
            map_update_rot=config.map_update_rot,
            map_update_dt=config.map_update_dt,
            registration=config.registration,
            # under use_imu the LIO layer deskews with the IMU-propagated
            # motion BEFORE tracker_step — don't deskew twice
            deskew=config.deskew and not config.use_imu,
            probation=config.dynamic_probation,
            carve_map=config.dynamic_probation,
        )
        self.tracker_state = tracker_init(self.tracker_config)
        if backend is not None:
            self.backend = backend
        else:
            db = KeyframeDatabase(
                edge_capacity=n * f.edge_capacity,
                surf_capacity=n * f.surf_capacity,
            )
            self.backend = LifelongBackend(
                db=db, config=config.lifelong, loop_config=config.loop
            )
        self._async = None
        if config.async_backend:
            from ..backend.async_backend import AsyncBackend

            self._async = AsyncBackend(self.backend, policy=config.async_policy)

        # fused per-frame program for the common path (single lidar, no
        # IMU, feature_based): preprocess → organize → features → track in
        # ONE jitted dispatch. The split path costs 4+ device dispatches
        # per frame, which on a remote-TPU tunnel is RPC-bound, not
        # compute-bound (measured: 220 ms/frame split vs ~12 ms fused).
        self._fused_step = None
        if (
            config.n_lidars == 1
            and not config.use_imu
            and config.registration_method == "feature_based"
        ):
            self._fused_step = self._build_fused_step()

        # IMU-aided front end (LIG capability; single-lidar only for now)
        self._lio = None
        self._enu = None
        self._pending_gnss = None  # latest ENU fix, attached to next keyframe
        if config.use_imu:
            assert n == 1, "use_imu currently supports a single lidar"
            from ..lio import LioConfig, LioTracker

            # under IMU the per-frame prediction is physically grounded, so
            # the prediction-trust gate is safe AND necessary: a coherent
            # mover (leading car in a corridor, along-track structure
            # occluded) drags the registration while the IMU knows better —
            # reject the dragged solve, coast on the propagated pose, keep
            # the dragged scan out of the local map (measured: the city
            # mover-corridor segment breaks every pure-LiDAR defense)
            self._lio = LioTracker(LioConfig(
                tracker=self.tracker_config._replace(pred_trust_k=0.3)
            ))
        self.gate = KeyframeGate(
            config.keyframe_trans, config.keyframe_rot, config.keyframe_dt
        )
        self.results: list[FrameResult] = []

        # -- multi-lidar calibration state (phase FSM, ML_System.hpp:239-323)
        if config.extrinsics is not None:
            assert len(config.extrinsics) == n - 1
            self.extrinsics = [np.asarray(e, np.float32) for e in config.extrinsics]
            self.calib_status = 2
        elif n == 1:
            self.extrinsics = []
            self.calib_status = 2
        else:
            self.extrinsics = [None] * (n - 1)
            self.calib_status = 0
        if n > 1 and self.calib_status == 0:
            sub_cfg = TrackerConfig(
                window=config.tracker_window,
                edge_capacity=f.edge_capacity,
                surf_capacity=f.surf_capacity,
                map_update_trans=config.map_update_trans,
                map_update_rot=config.map_update_rot,
                map_update_dt=config.map_update_dt,
                registration=config.registration,
            )
            self._sub_config = sub_cfg
            self._sub_trackers = [tracker_init(sub_cfg) for _ in range(n - 1)]
            self._handeye = [handeye_init(config.handeye) for _ in range(n - 1)]
            # motion anchors: (primary_pose, sub_pose) at the last sampled pair
            self._anchors = [None] * (n - 1)
            self._refine_ok = [0] * (n - 1)
            self._refine_samples = [[] for _ in range(n - 1)]

    # -- per-frame pipeline ---------------------------------------------------

    def _build_fused_step(self):
        cfg = self.config
        f = cfg.feature
        tracker_config = self.tracker_config

        @jax.jit
        def step(state, xyz, mask, attr, t):
            pb = PointBatch(xyz, mask, attr)
            processed = preprocess(pb, cfg.preprocess)
            grid = F.organize_scan(processed, rings=f.rings, width=f.width)
            feats = F.extract_loam_features(
                grid,
                sectors=f.sectors,
                edges_per_sector=f.edges_per_sector,
                surfs_per_sector=f.surfs_per_sector,
                edge_thresh=f.edge_thresh,
                surf_thresh=f.surf_thresh,
                nms_half=f.nms_half,
                range_noise=f.range_noise,
                exclude_ground_edges=f.exclude_ground_edges,
                one_sided_occlusion=f.one_sided_occlusion,
            )
            state, out = tracker_step(
                state, feats.edge, feats.surf, t, tracker_config,
                scan_grid=grid if tracker_config.carve_map else None,
            )
            return state, out, feats.edge, feats.surf, grid

        return step

    def featurize(self, scan: PointBatch):
        """Raw scan → (edge, surf, range-image grid) in the sensor frame.

        The grid rides along so the backend can carve dynamic points with
        the scan's free space; it is None on the ICP path unless carving is
        enabled."""
        cfg = self.config.feature
        processed = preprocess(scan, self.config.preprocess)
        if self.config.registration_method == "sparse_point_plane_icp":
            from ..ops.voxel import voxel_downsample

            surf = voxel_downsample(
                processed, self.config.icp_voxel_size, cfg.surf_capacity
            )
            grid = None
            if self.backend.config.dynamic_carve_knn > 0:
                grid = F.organize_scan(processed, rings=cfg.rings, width=cfg.width)
            return PointBatch.empty(cfg.edge_capacity), surf, grid
        grid = F.organize_scan(processed, rings=cfg.rings, width=cfg.width)
        feats = F.extract_loam_features(
            grid,
            sectors=cfg.sectors,
            edges_per_sector=cfg.edges_per_sector,
            surfs_per_sector=cfg.surfs_per_sector,
            edge_thresh=cfg.edge_thresh,
            surf_thresh=cfg.surf_thresh,
            nms_half=cfg.nms_half,
            range_noise=cfg.range_noise,
            exclude_ground_edges=cfg.exclude_ground_edges,
            one_sided_occlusion=cfg.one_sided_occlusion,
        )
        return feats.edge, feats.surf, grid

    def _pad_to_fused(self, edge: PointBatch, surf: PointBatch):
        """Pad single-lidar features to the fused tracker capacity."""
        n = self.config.n_lidars
        if n == 1:
            return edge, surf
        f = self.config.feature
        return (
            pb_concat([edge], capacity=n * f.edge_capacity),
            pb_concat([surf], capacity=n * f.surf_capacity),
        )

    def _calibration_step(self, feats, pose_p: np.ndarray, timestamp: float):
        """Phases 0/1 of the extrinsic FSM (runs AFTER the primary tracker
        step so ``pose_p`` is the current-frame primary pose — sub scans and
        the primary pose must be time-aligned for hand-eye increments)."""
        cfg = self.config
        for i, (se_, ss_, _) in enumerate(feats[1:]):
            if self.calib_status == 0:
                # phase 0: independent sub odometry + hand-eye accumulation
                self._sub_trackers[i], sub_out = tracker_step(
                    self._sub_trackers[i], se_, ss_, jnp.float32(timestamp),
                    self._sub_config,
                )
                pose_s = np.asarray(sub_out.pose)
                if self._anchors[i] is None:
                    self._anchors[i] = (pose_p, pose_s)
                else:
                    ap, asub = self._anchors[i]
                    inc_p = se3.pose_between(jnp.asarray(ap), jnp.asarray(pose_p))
                    inc_s = se3.pose_between(jnp.asarray(asub), jnp.asarray(pose_s))
                    ang = float(jnp.linalg.norm(se3.so3_log(se3.pose_quat(inc_p))))
                    if ang > cfg.handeye.min_rot_angle:
                        self._handeye[i] = handeye_add_pair(
                            self._handeye[i], inc_p, inc_s, cfg.handeye
                        )
                        self._anchors[i] = (pose_p, pose_s)
                        res = handeye_solve(self._handeye[i], cfg.handeye)
                        if bool(res.ok):
                            self.extrinsics[i] = np.asarray(res.extrinsic)
            elif self.calib_status == 1 and self._refine_ok[i] < cfg.calib_refine_frames:
                # phase 1: refine X against the primary local map
                # (ML_System.hpp:284-322 sub-to-primary-localmap phase).
                # Single-frame refinements scatter by centimeters–decimeters
                # (scan-dependent minima), so the extrinsic is the running
                # average of accepted refinements, not the last one.
                init = se3.pose_compose(
                    jnp.asarray(pose_p), jnp.asarray(self.extrinsics[i])
                )
                reg = register_edge_surf(
                    se_, ss_, self.tracker_state.edge_flat,
                    self.tracker_state.surf_flat, init,
                    cfg.calib_refine_registration,
                )
                if bool(reg.converged) and int(reg.n_constrained) == 6:
                    x_new = np.asarray(
                        se3.pose_between(jnp.asarray(pose_p), reg.pose)
                    )
                    self._refine_samples[i].append(x_new)
                    self.extrinsics[i] = _average_poses(self._refine_samples[i])
                    self._refine_ok[i] += 1
        if self.calib_status == 0 and all(e is not None for e in self.extrinsics):
            self.calib_status = 1
        if self.calib_status == 1 and all(
            k >= cfg.calib_refine_frames for k in self._refine_ok
        ):
            self.calib_status = 2

    def process_gnss(self, lla: np.ndarray, pos_std: float = 0.1):
        """Fuse a GNSS fix into the IMU filter (requires ``use_imu``) and
        remember it so the next keyframe carries it as an absolute graph
        prior. The first fix anchors the local ENU frame; the ENU frame
        coincides with the odometry frame only up to the initial pose —
        production use pairs this with a yaw alignment."""
        assert self._lio is not None, "process_gnss requires use_imu=True"
        from ..estimator import eskf_update_position
        from ..estimator.gnss import lla_to_enu, make_enu_frame

        if self._enu is None:
            self._enu = make_enu_frame(np.asarray(lla, np.float64))
        pos = lla_to_enu(self._enu, lla)
        self._lio.eskf = eskf_update_position(
            self._lio.eskf, jnp.asarray(pos), jnp.float32(pos_std)
        )
        self._pending_gnss = np.asarray(pos, np.float32)

    def process(
        self, scan, timestamp: float,
        gyro: Optional[np.ndarray] = None,
        acc: Optional[np.ndarray] = None,
        imu_dts: Optional[np.ndarray] = None,
        wheel_speeds: Optional[np.ndarray] = None,
    ) -> FrameResult:
        """One frame: featurize → (calibrate) → track → keyframe gate → backend.

        ``scan``: a PointBatch, or a list of PointBatches (one per lidar,
        index 0 = primary) for multi-lidar systems. With ``use_imu``, pass
        the IMU window since the previous frame (gyro/acc (M,3), dts (M,))
        for ESKF prediction + sweep deskew; ``wheel_speeds`` ((M,) or scalar)
        adds the encoder leg of the LiDAR-IMU-wheel-GNSS fusion (reference
        TODO #1, `simple_lwio_node.cpp`).
        """
        scans = scan if isinstance(scan, (list, tuple)) else [scan]
        assert len(scans) == self.config.n_lidars, (
            f"expected {self.config.n_lidars} scans, got {len(scans)}"
        )

        if self._fused_step is not None:
            # common path: ONE device dispatch for the whole frame
            s0 = scans[0]
            self.tracker_state, out, edge, surf, scan_grid = self._fused_step(
                self.tracker_state, s0.xyz, s0.mask, s0.attr,
                jnp.float32(timestamp),
            )
            return self._finish_frame(
                timestamp, out, edge, surf, scan_grid
            )

        feats = [self.featurize(s) for s in scans]

        scan_grid = feats[0][2]  # primary scan's range image (for carving)
        if self.calib_status == 2 and len(feats) > 1:
            # fused multi-lidar frame: sub features → primary sensor frame
            edges = [feats[0][0]]
            surfs = [feats[0][1]]
            for i, (se_, ss_, _) in enumerate(feats[1:]):
                x = jnp.asarray(self.extrinsics[i])
                edges.append(se_.transform(x))
                surfs.append(ss_.transform(x))
            f = self.config.feature
            n = self.config.n_lidars
            edge = pb_concat(edges, capacity=n * f.edge_capacity)
            surf = pb_concat(surfs, capacity=n * f.surf_capacity)
        else:
            # calibration phases track the primary alone
            edge, surf = self._pad_to_fused(feats[0][0], feats[0][1])

        if self._lio is not None:
            odom_pose, out = self._lio.process_scan(
                edge, surf, timestamp, gyro=gyro, acc=acc, imu_dts=imu_dts,
                wheel_speeds=wheel_speeds,
            )
            self.tracker_state = self._lio.tracker_state
        else:
            self.tracker_state, out = tracker_step(
                self.tracker_state, edge, surf, jnp.float32(timestamp),
                self.tracker_config,
                scan_grid=scan_grid if self.tracker_config.carve_map else None,
            )
            odom_pose = np.asarray(out.pose)

        if self.calib_status < 2:
            self._calibration_step(feats, odom_pose, timestamp)

        return self._finish_frame(
            timestamp, out, edge, surf, scan_grid, odom_pose=odom_pose
        )

    def _finish_frame(
        self, timestamp, out, edge, surf, scan_grid, odom_pose=None
    ) -> FrameResult:
        """Keyframe gate → backend hand-off → FrameResult. All per-frame
        scalars come down in ONE device_get; pose bookkeeping is host numpy
        (se3np) — no further device dispatches on the frame path."""
        if odom_pose is None:
            odom_pose, converged, num_matches = jax.device_get(
                (
                    out.pose,
                    out.registration.converged,
                    out.registration.num_matches,
                )
            )
            odom_pose = np.asarray(odom_pose, np.float32)
        else:
            converged, num_matches = jax.device_get(
                (out.registration.converged, out.registration.num_matches)
            )

        backend_out: Optional[BackendOutput] = None
        is_kf = self.gate.need_update(odom_pose, timestamp)
        if is_kf:
            gnss = self._pending_gnss
            self._pending_gnss = None
            grid_kw = (
                scan_grid
                if self.backend.config.dynamic_carve_knn > 0
                else None
            )
            if self._async is not None:
                # enqueue only: corrections arrive via the published odom2map;
                # GNSS priors and the scan grid ride the queue
                odom2map, mode, enqueued = self._async.submit(
                    timestamp, edge, surf, odom_pose, gnss_pos=gnss,
                    scan_grid=grid_kw,
                )
                if not enqueued and gnss is not None:
                    # shed item ("drop" policy): the fix must not vanish —
                    # re-stash it so it rides the next stored keyframe
                    self._pending_gnss = gnss
                if mode is WorkMode.RELOCALIZATION:
                    # while the system does not know where it is, the
                    # frontend must not run ahead of the relocalizer:
                    # pre-reloc frames would be published in the odometry
                    # frame and every queued scan is a stale reloc attempt
                    # once one succeeds (the reference's boot path is
                    # equally blocking: SystemLoad → RELOCALIZATION gates
                    # processing until a match, `backend_lifelong.hpp:
                    # 97-118`). Drain the queue so relocalization happens
                    # at frame cadence, then resume pipelining.
                    self._async.flush()
            else:
                backend_out = self.backend.add_keyframe(
                    timestamp, edge, surf, odom_pose, gnss_pos=gnss,
                    scan_grid=grid_kw,
                )

        if self._async is not None:
            odom2map, mode = self._async.odom2map, self._async.mode
        else:
            odom2map, mode = self.backend.odom2map, self.backend.mode

        if backend_out is not None and backend_out.keyframe_id >= 0:
            map_pose = np.asarray(backend_out.map_pose)
        else:
            map_pose = np.asarray(
                se3np.pose_compose(odom2map, odom_pose), np.float32
            )
        result = FrameResult(
            timestamp=float(timestamp),
            odom_pose=odom_pose,
            map_pose=map_pose,
            mode=mode,
            is_keyframe=is_kf,
            keyframe_id=(backend_out.keyframe_id if backend_out else -1),
            loop_closed=bool(backend_out.loop_closed) if backend_out else False,
            converged=bool(converged),
            num_matches=int(num_matches),
            calib_status=self.calib_status,
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

    def occupancy_grid(self):
        """Synchronized 2D log-odds occupancy grid (None unless enabled via
        ``LifelongConfig.occupancy``) — reference README TODO #3."""
        self.flush()
        return self.backend.occupancy_grid()

    def force_global_optimize(self):
        if self._async is not None:
            return self._async.force_global_optimize()
        return self.backend.force_global_optimize()

    def flush(self):
        """Drain the async backend (no-op for the sync backend)."""
        if self._async is not None:
            self._async.flush()

    # -- persistence (reference SavePoseGraph / SystemLoad) --------------------

    def save(self, path: str):
        self.flush()
        self.backend.save(path)

    @classmethod
    def load(
        cls,
        path: str,
        config: SystemConfig = SystemConfig(),
        storage_dir: Optional[str] = None,
    ) -> "MultiLidarSystem":
        """Boot from a saved lifelong database → backend starts in
        RELOCALIZATION (reference `SystemLoad`, `ML_System.hpp:202-206`).
        ``storage_dir``: session directory for disk-backed checkpoints."""
        backend = LifelongBackend.load(
            path, storage_dir=storage_dir, config=config.lifelong,
            loop_config=config.loop,
        )
        return cls(config=config, backend=backend)
