"""Dynamic-object filtering: free-space carving removes a vanished object
from the map; unsupported-point gating flags a mover entering the scan."""
import jax
import jax.numpy as jnp
import numpy as np

from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.common.pointcloud import PointBatch, concat
from lmsf_slam_tpu.datasets import make_sim_world, simulate_scan
from lmsf_slam_tpu.ops import features as F
from lmsf_slam_tpu.ops.dynamic import carve_dynamic, unsupported_mask

KEY = jax.random.PRNGKey(88)


def _setup():
    world = make_sim_world(KEY, extent=18.0, n_boxes=8, n_cylinders=10)
    pose = se3.make_pose(se3.quat_identity(), jnp.asarray([0.0, 0.0, 1.5]))
    scan = simulate_scan(world, pose, KEY, rings=16, width=720,
                         max_range=40.0, noise=0.0)
    grid = F.organize_scan(scan, rings=16, width=720)
    # the static map = this scan in world frame
    static_map = PointBatch(
        se3.pose_apply(pose, scan.xyz), scan.mask
    )
    return world, pose, scan, grid, static_map


def test_carve_removes_vanished_object():
    world, pose, scan, grid, static_map = _setup()
    # a phantom 'parked car' in the map at a place the current scan sees
    # through (between sensor and the world geometry, in clear space)
    rng = np.random.RandomState(0)
    car = np.array([3.0, 0.5, 1.4]) + rng.randn(64, 3) * 0.3
    car_pb = PointBatch.from_points(car.astype(np.float32), capacity=64)
    test_map = concat([static_map, car_pb])
    keep = np.asarray(carve_dynamic(grid, test_map, pose))
    n_static = int(static_map.mask.sum())
    # car points are carved...
    car_keep = keep[static_map.capacity:static_map.capacity + 64]
    assert car_keep.mean() < 0.3, car_keep.mean()
    # ...while the true structure overwhelmingly survives
    static_keep = keep[:static_map.capacity][np.asarray(static_map.mask)]
    assert static_keep.mean() > 0.97, static_keep.mean()


def test_unsupported_flags_new_mover():
    world, pose, scan, grid, static_map = _setup()
    # a mover appears in the NEW scan but not the map
    mover = np.array([4.0, -1.0, 1.2]) + np.random.RandomState(1).randn(32, 3) * 0.2
    mover_local = np.asarray(
        se3.pose_apply(se3.pose_inverse(pose), jnp.asarray(mover, jnp.float32))
    )
    scan_plus = concat([scan, PointBatch.from_points(mover_local, capacity=32)])
    flags = np.asarray(unsupported_mask(scan_plus, static_map, pose))
    mover_flags = flags[scan.capacity:scan.capacity + 32]
    assert mover_flags.mean() > 0.9, mover_flags.mean()
    # static returns are supported
    static_flags = flags[:scan.capacity][np.asarray(scan.mask)]
    assert static_flags.mean() < 0.02, static_flags.mean()
