import jax.numpy as jnp
import numpy as np

from lmsf_slam_tpu.common.pointcloud import PointBatch
from lmsf_slam_tpu.ops import voxel


def test_voxel_downsample_merges_cells():
    # two clusters well inside distinct voxels
    pts = np.array(
        [[0.01, 0.01, 0.01], [0.02, 0.0, 0.0], [5.0, 5.0, 5.0], [5.01, 5.0, 5.0]],
        np.float32,
    )
    pb = PointBatch.from_points(pts, capacity=8)
    out = voxel.voxel_downsample(pb, voxel_size=0.5, out_capacity=8)
    got = np.sort(out.to_numpy(), axis=0)
    want = np.sort(np.array([[0.015, 0.005, 0.005], [5.005, 5.0, 5.0]]), axis=0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_voxel_downsample_ignores_padding():
    pts = np.random.RandomState(0).randn(20, 3).astype(np.float32)
    pb = PointBatch.from_points(pts, capacity=64)
    out = voxel.voxel_downsample(pb, voxel_size=0.001, out_capacity=64)
    # tiny voxels: every point survives
    assert out.to_numpy().shape[0] == 20


def test_voxel_gaussians_stats():
    rng = np.random.RandomState(1)
    # one dense cluster: mean/cov should match numpy
    # keep the cluster well inside one lattice cell (voxel_size=2 ⇒ centers
    # at odd coordinates)
    pts = (rng.randn(200, 3) * 0.05 + np.array([1.0, 3.0, 3.0])).astype(np.float32)
    pb = PointBatch.from_points(pts, capacity=256)
    g = voxel.voxel_gaussians(pb, voxel_size=2.0, max_voxels=16)
    valid = np.asarray(g["valid"])
    assert valid.sum() >= 1
    slot = np.argmax(np.asarray(g["counts"]))
    np.testing.assert_allclose(np.asarray(g["means"])[slot], pts.mean(0), atol=0.02)


def test_voxel_lookup():
    pts = np.array([[0.1, 0.1, 0.1]] * 5 + [[3.0, 3.0, 3.0]] * 5, np.float32)
    pb = PointBatch.from_points(pts, capacity=16)
    g = voxel.voxel_gaussians(pb, voxel_size=1.0, max_voxels=8)
    slot, found = voxel.voxel_lookup(g, jnp.asarray([[0.12, 0.1, 0.1], [50.0, 0, 0]]))
    assert bool(found[0]) and not bool(found[1])
    np.testing.assert_allclose(
        np.asarray(g["means"])[int(slot[0])], [0.1, 0.1, 0.1], atol=1e-5
    )
