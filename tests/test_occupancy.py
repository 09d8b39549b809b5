"""2D occupancy grid: walls occupied, traversed space free, loop-corrected
rebuild from the database."""
import jax
import jax.numpy as jnp
import numpy as np

from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.datasets import make_sim_world, simulate_scan
from lmsf_slam_tpu.mapping import (
    OccupancyConfig,
    occupancy_from_database,
    occupancy_init,
    occupancy_probability,
    occupancy_update,
)

KEY = jax.random.PRNGKey(77)
CFG = OccupancyConfig(size=256, resolution=0.25)


def test_single_scan_free_and_occupied():
    world = make_sim_world(KEY, extent=20.0, n_boxes=8, n_cylinders=0)
    pose = se3.make_pose(se3.quat_identity(), jnp.asarray([0.0, 0.0, 1.0]))
    pb = simulate_scan(world, pose, KEY, rings=16, width=720, max_range=30.0,
                       noise=0.0)
    w = se3.pose_apply(pose, pb.xyz)
    band = (w[:, 2] > CFG.z_low) & (w[:, 2] < CFG.z_high)
    grid = occupancy_init(CFG)
    for _ in range(5):  # log-odds accumulate over repeated observations
        grid = occupancy_update(
            grid, jnp.asarray([0.0, 0.0]), w[:, :2], pb.mask & band, CFG
        )
    p = np.asarray(occupancy_probability(grid))

    # box faces visible from origin are occupied in the grid
    bmin = np.asarray(world.boxes_min)
    bmax = np.asarray(world.boxes_max)
    occ_hits = 0
    for lo, hi in zip(bmin, bmax):
        cx, cy = (lo[:2] + hi[:2]) / 2
        # the NEAR face midpoint of each box along the ray to origin
        direction = -np.array([cx, cy])
        direction /= max(np.linalg.norm(direction), 1e-9)
        face = np.array([cx, cy]) + direction * (hi[0] - lo[0]) / 2
        ci = int(np.floor(face[0] / CFG.resolution)) + CFG.size // 2
        cj = int(np.floor(face[1] / CFG.resolution)) + CFG.size // 2
        if 0 <= ci < CFG.size and 0 <= cj < CFG.size:
            if p[max(ci-1,0):ci+2, max(cj-1,0):cj+2].max() > 0.6:
                occ_hits += 1
    assert occ_hits >= len(bmin) * 0.6, occ_hits

    # cells near the sensor (traversed by many rays, above-ground obstacles
    # absent in the clear disc) are free
    c0 = CFG.size // 2
    near = p[c0 - 6:c0 + 6, c0 - 6:c0 + 6]
    assert near.mean() < 0.3, near.mean()
    # untouched far corner stays at the 0.5 prior
    assert abs(p[2, 2] - 0.5) < 1e-6


def test_grid_from_database_uses_optimized_poses():
    from lmsf_slam_tpu.backend import KeyframeDatabase
    from lmsf_slam_tpu.common.pointcloud import PointBatch

    db = KeyframeDatabase(edge_capacity=8, surf_capacity=64,
                          initial_keyframes=4)
    # one wall segment observed from two keyframes
    wall = np.stack([np.full(32, 5.0), np.linspace(-2, 2, 32),
                     np.full(32, 1.0)], 1).astype(np.float32)
    pb_e = PointBatch.empty(8)
    for i in range(2):
        pose = np.asarray(se3.make_pose(se3.quat_identity(),
                                        jnp.asarray([0.0, float(i), 0.0])))
        local = np.asarray(
            se3.pose_apply(se3.pose_inverse(jnp.asarray(pose)), jnp.asarray(wall))
        )
        db.add_keyframe(0.1 * i, pose, pose,
                        pb_e, PointBatch.from_points(local, capacity=64))
    grid = occupancy_from_database(db, CFG)
    p = np.asarray(occupancy_probability(grid))
    ci = int(np.floor(5.0 / CFG.resolution)) + CFG.size // 2
    cj = CFG.size // 2
    assert p[ci, cj] > 0.6
    # free space between the sensors and the wall
    assert p[CFG.size // 2 + 8, cj] < 0.4
