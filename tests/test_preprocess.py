"""Preprocess chain: NaN/distance/voxel/outlier filters, sweep timing, deskew."""
import jax
import jax.numpy as jnp
import numpy as np

from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.common.pointcloud import PointBatch
from lmsf_slam_tpu.ops.preprocess import (
    PreprocessParams,
    deskew,
    preprocess,
    sweep_relative_times,
)


def test_distance_and_nan_filter():
    pts = np.array(
        [[0.5, 0, 0], [5, 0, 0], [100, 0, 0], [np.nan, 1, 1], [3, 4, 0]],
        np.float32,
    )
    pb = PointBatch.from_points(pts, capacity=8)
    out = preprocess(pb, PreprocessParams(min_range=1.0, max_range=60.0))
    kept = out.to_numpy()
    # keeps (5,0,0) and (3,4,0); drops near, far, NaN
    assert kept.shape[0] == 2
    assert np.isfinite(np.asarray(out.xyz)).all()


def test_voxel_chain():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-10, 10, size=(512, 3)).astype(np.float32)
    pb = PointBatch.from_points(pts, capacity=512)
    out = preprocess(
        pb, PreprocessParams(min_range=0.1, max_range=100.0, voxel_size=2.0),
        out_capacity=512,
    )
    n_in = int(pb.count())
    n_out = int(out.count())
    assert 0 < n_out < n_in


def test_outlier_removal():
    # a dense cluster + one isolated point
    pts = np.concatenate(
        [np.random.RandomState(0).randn(64, 3) * 0.2 + 5.0,
         np.array([[50.0, 50.0, 50.0]])]
    ).astype(np.float32)
    pb = PointBatch.from_points(pts, capacity=65)
    out = preprocess(
        pb,
        PreprocessParams(
            min_range=0.1, max_range=200.0, outlier_radius=1.0,
            outlier_min_neighbors=3,
        ),
    )
    kept = out.to_numpy()
    assert kept.shape[0] == 64  # isolated point removed
    assert not np.any(np.all(kept == 50.0, axis=1))


def test_sweep_relative_times_monotone_in_sweep():
    # points laid out clockwise (azimuth decreasing) starting at +x
    az = -np.linspace(0, 2 * np.pi * 0.9, 32)
    pts = np.stack([np.cos(az), np.sin(az), np.zeros_like(az)], axis=1) * 10
    pb = PointBatch.from_points(pts.astype(np.float32), capacity=32)
    rel = np.asarray(sweep_relative_times(pb))
    assert rel[0] == 0.0
    assert np.all(np.diff(rel[:32]) > 0)
    assert rel.max() < 1.0


def test_deskew_identity_motion_is_noop():
    pts = np.random.RandomState(1).randn(64, 3).astype(np.float32) * 5
    pb = PointBatch.from_points(pts, capacity=64)
    rel = jnp.linspace(0, 1, 64)
    out = deskew(pb, rel, se3.pose_identity())
    np.testing.assert_allclose(np.asarray(out.xyz), np.asarray(pb.xyz), atol=1e-5)


def test_deskew_recovers_static_geometry():
    """Points captured at interpolated sensor poses, deskewed into the
    end-of-scan frame, must match the static scan from the end pose."""
    rng = np.random.RandomState(2)
    world = rng.randn(128, 3).astype(np.float32) * 8
    p_start = se3.pose_identity()
    motion = se3.se3_exp(jnp.asarray([0, 0, 0.1, 0.5, 0.2, 0.0], jnp.float32))
    rel = jnp.linspace(0, 1, 128)
    # sensor pose at time s: p_start ∘ exp(s ξ)
    xi = se3.pose_log(motion)
    poses_t = se3.se3_exp(rel[:, None] * xi[None, :])
    # measured point = world point in the frame at capture time
    inv = se3.pose_inverse(poses_t)
    meas = se3.quat_rotate(inv[:, :4], jnp.asarray(world)) + inv[:, 4:]
    pb = PointBatch(meas, jnp.ones(128, bool))
    out = deskew(pb, rel, motion)
    # expected: world points in the end frame
    end_inv = se3.pose_inverse(se3.pose_compose(p_start, motion))
    expect = np.asarray(se3.pose_apply(end_inv, jnp.asarray(world)))
    np.testing.assert_allclose(np.asarray(out.xyz), expect, atol=1e-4)
