"""Constant-velocity (IMU-free) sweep deskew through the public System API.

The reference's deskew intent (`processing/deskew/deskew_base.hpp` +
per-point rel-time from `RotaryLidar_preprocessing.hpp:77-91`) without an
IMU: the tracker warps each point into the end-of-scan frame with its own
constant-velocity motion estimate (`TrackerConfig.deskew`). Validated at two
levels: the warp itself against a static end-frame scan, and an A/B through
``MultiLidarSystem.process`` on a city-style 90°-corner course — the
sustained-yaw-rate regime motion blur actually hurts in (KITTI corners).

Measured context for the default single-pass policy (same harness as the
A/B below, fixed seed): corner course ATE off 0.42 / deskew-on 0.19 /
oracle-motion variants within noise; on constant-rate courses distortion is
identical every frame and cancels in scan-to-map registration, so deskew is
neutral there — the IMU-propagated deskew in `lio/` (test_lio.py) covers the
high-rate varying case with a real motion source.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.common.pointcloud import ATTR_TIME
from lmsf_slam_tpu.datasets import make_sim_world, simulate_scan, simulate_scan_moving
from lmsf_slam_tpu.ops.preprocess import deskew
from lmsf_slam_tpu.ops.registration import RegistrationParams
from lmsf_slam_tpu.system import FeatureParams, MultiLidarSystem, SystemConfig

KEY = jax.random.PRNGKey(7)


def _corner_course(speed=0.5, straight=8, corner_frames=7):
    """Straight → 90° left → straight → 90° right → straight (10 Hz car)."""
    rates = (
        [0.0] * straight
        + [np.pi / 2 / corner_frames] * corner_frames
        + [0.0] * straight
        + [-np.pi / 2 / corner_frames] * corner_frames
        + [0.0] * straight
    )
    poses = [np.array([1, 0, 0, 0, 0, 0, 1.2], np.float32)]
    yaw = 0.0
    for r in rates:
        yaw += r
        d = np.array([speed * np.cos(yaw), speed * np.sin(yaw), 0])
        t = poses[-1][4:] + d
        q = np.array([np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)], np.float32)
        poses.append(np.concatenate([q, t]).astype(np.float32))
    return np.stack(poses)


def test_deskew_warp_matches_static_end_frame_scan():
    """deskew() moves a motion-blurred sweep markedly closer to the scan a
    static sensor would have taken at the end pose (warp correctness)."""
    world = make_sim_world(KEY, extent=20.0, n_boxes=10, n_cylinders=16)
    p0 = jnp.asarray(np.array([1, 0, 0, 0, 0, 0, 1.2], np.float32))
    p1 = se3.pose_compose(
        p0, se3.se3_exp(jnp.asarray([0, 0, 0.2, 0.8, 0, 0], jnp.float32))
    )
    moving = simulate_scan_moving(
        world, p0, p1, KEY, rings=16, width=360, max_range=40.0, noise=0.0
    )
    static_end = simulate_scan(
        world, p1, KEY, rings=16, width=360, max_range=40.0, noise=0.0
    )
    desk = deskew(moving, moving.attr[:, ATTR_TIME], se3.pose_between(p0, p1))

    ref = np.asarray(static_end.xyz)[np.asarray(static_end.mask)]

    def mean_nn(pb):
        pts = np.asarray(pb.xyz)[np.asarray(pb.mask)]
        d2 = np.sum((pts[:, None, :] - ref[None, :, :]) ** 2, -1).min(axis=1)
        return float(np.sqrt(d2).mean())

    assert mean_nn(desk) < 0.75 * mean_nn(moving)


@pytest.fixture(scope="module")
def corner_run():
    world = make_sim_world(KEY, extent=25.0, n_boxes=12, n_cylinders=18)
    poses = _corner_course()
    n = len(poses) - 1
    scans = [
        simulate_scan_moving(
            world, jnp.asarray(poses[i]), jnp.asarray(poses[i + 1]),
            jax.random.fold_in(KEY, i), rings=16, width=720,
            max_range=40.0, noise=0.01,
        )
        for i in range(n)
    ]
    gt = np.asarray(
        se3.pose_between(jnp.asarray(poses[1]), jnp.asarray(poses[1 : n + 1]))
    )
    return scans, gt


def _run_system(scans, deskew_on: bool):
    config = SystemConfig(
        feature=FeatureParams(
            rings=16, width=720, edges_per_sector=4, surfs_per_sector=14
        ),
        registration=RegistrationParams(max_iters=10, max_corr_dist=2.0),
        map_update_trans=0.15,
        deskew=deskew_on,
        keyframe_trans=1e9,  # frontend-only A/B: no backend interference
    )
    system = MultiLidarSystem(config)
    for i, s in enumerate(scans):
        system.process(s, 0.1 * i)
    return system.trajectory()


def _ate(est, gt):
    return float(np.sqrt(np.mean(np.sum((est[:, 4:] - gt[:, 4:]) ** 2, -1))))


@pytest.mark.slow
def test_deskew_ab_through_system_api(corner_run):
    scans, gt = corner_run
    off = _run_system(scans, deskew_on=False)
    on = _run_system(scans, deskew_on=True)
    e_off, e_on = _ate(off, gt[: len(off)]), _ate(on, gt[: len(on)])
    assert e_on < e_off, (e_on, e_off)


def test_deskew_noop_without_time_attr():
    """Scans without a rel-time attr run unchanged under deskew=True."""
    from lmsf_slam_tpu.common.pointcloud import PointBatch
    from lmsf_slam_tpu.tracker.tracker import (
        TrackerConfig, tracker_init, tracker_step,
    )

    cfg = TrackerConfig(
        window=4, edge_capacity=64, surf_capacity=128, deskew=True,
        registration=RegistrationParams(max_iters=2),
    )
    k = jax.random.PRNGKey(0)
    edge = PointBatch(jax.random.normal(k, (64, 3)) * 4.0, jnp.ones(64, bool))
    surf = PointBatch(
        jax.random.normal(k, (128, 3)) * 4.0, jnp.ones(128, bool)
    )
    state = tracker_init(cfg)
    state, out = tracker_step(state, edge, surf, jnp.float32(0.0), cfg)
    assert np.isfinite(np.asarray(out.pose)).all()
