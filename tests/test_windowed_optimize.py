"""Windowed re-solve policy: flat per-keyframe cost between loop closures
(SURVEY §7.3 'incremental optimization' answer)."""
import jax.numpy as jnp
import numpy as np

from lmsf_slam_tpu.backend import LifelongBackend, LifelongConfig, LoopConfig
from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.common.pointcloud import PointBatch


def _pb(seed, n=32):
    rng = np.random.default_rng(seed)
    return PointBatch.from_points(
        rng.normal(size=(n, 3)).astype(np.float32) * 5, capacity=n
    )


def test_windowed_optimize_freezes_old_vertices():
    backend = LifelongBackend(
        config=LifelongConfig(optimize_batch=5, optimize_window=6),
        loop_config=LoopConfig(min_frame_interval=10**9),  # no loops
    )
    step = se3.se3_exp(jnp.asarray([0, 0, 0.1, 1.0, 0, 0], jnp.float32))
    pose = se3.pose_identity()
    for i in range(20):
        backend.add_keyframe(0.1 * i, _pb(i), _pb(100 + i), np.asarray(pose))
        pose = se3.pose_compose(pose, step)
    n = backend.db.n_keyframes
    old_before = backend.db.map_poses[:5].copy()
    backend.optimize(full=False)
    # vertices outside the window are the fixed boundary: unchanged
    np.testing.assert_array_equal(backend.db.map_poses[:5], old_before)
    # a full solve may move everything except the gauge vertex
    backend.optimize(full=True)
    np.testing.assert_array_equal(
        backend.db.map_poses[0], old_before[0]
    )


def test_windowed_corrects_recent_noise():
    """Perturb the newest poses; a windowed solve pulls them back to the
    odometry chain without touching the frozen prefix."""
    backend = LifelongBackend(
        config=LifelongConfig(optimize_batch=10**9, optimize_window=8),
        loop_config=LoopConfig(min_frame_interval=10**9),
    )
    step = se3.se3_exp(jnp.asarray([0, 0, 0.05, 1.0, 0, 0], jnp.float32))
    pose = se3.pose_identity()
    gt = []
    for i in range(16):
        gt.append(np.asarray(pose))
        backend.add_keyframe(0.1 * i, _pb(i), _pb(100 + i), np.asarray(pose))
        pose = se3.pose_compose(pose, step)
    gt = np.stack(gt)
    # corrupt the stored estimates of the last 4 keyframes
    noisy = backend.db.map_poses[:16].copy()
    noisy[12:, 4:] += np.random.RandomState(0).randn(4, 3) * 0.5
    backend.db.update_poses(noisy)
    err_before = np.linalg.norm(backend.db.map_poses[12:16, 4:] - gt[12:, 4:],
                                axis=1).max()
    backend.optimize(full=False)
    err_after = np.linalg.norm(backend.db.map_poses[12:16, 4:] - gt[12:, 4:],
                               axis=1).max()
    assert err_after < 0.2 * err_before, (err_before, err_after)
    np.testing.assert_array_equal(backend.db.map_poses[:8], noisy[:8])
