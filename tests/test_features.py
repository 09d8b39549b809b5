import jax.numpy as jnp
import numpy as np

from lmsf_slam_tpu.common.pointcloud import PointBatch
from lmsf_slam_tpu.ops import features


def synthetic_room_scan(n_rings=16, width=360, noise=0.0, seed=0):
    """Scanner at origin inside a 10x10 room with a floor at z=-2 (walls +
    floor planes, corners = edges) so that all 6 DoF are observable."""
    rng = np.random.RandomState(seed)
    pts = []
    for r in range(n_rings):
        elev = np.deg2rad(-25 + 2.5 * r)
        tan_e = np.tan(elev)
        for c in range(width):
            az = -np.pi + (c + 0.5) * 2 * np.pi / width
            dx, dy = np.cos(az), np.sin(az)
            # horizontal distance to square walls at x=±5, y=±5
            ts = []
            if abs(dx) > 1e-9:
                ts += [5 / dx, -5 / dx]
            if abs(dy) > 1e-9:
                ts += [5 / dy, -5 / dy]
            t = min(t for t in ts if t > 0)
            z = t * tan_e
            if z < -2.0:  # hits the floor first
                t = -2.0 / tan_e
                z = -2.0
            if z < 3:
                p = np.array([t * dx, t * dy, z]) + rng.randn(3) * noise
                pts.append(p)
    return PointBatch.from_points(np.array(pts, np.float32), capacity=8192)


def test_organize_scan_grid():
    pb = synthetic_room_scan()
    grid = features.organize_scan(pb, rings=16, width=360)
    occ = np.asarray(grid.mask).sum()
    assert occ > 3000  # most cells occupied
    # ranges positive where occupied
    assert np.all(np.asarray(grid.rng)[np.asarray(grid.mask)] > 1.0)


def test_curvature_flat_vs_corner():
    pb = synthetic_room_scan()
    grid = features.organize_scan(pb, rings=16, width=360)
    c, valid = features.curvature(grid)
    c = np.asarray(c)
    valid = np.asarray(valid)
    xyz = np.asarray(grid.xyz)
    # corner cells: both |x| and |y| near 5
    corner = (np.abs(np.abs(xyz[..., 0]) - 5) < 0.3) & (np.abs(np.abs(xyz[..., 1]) - 5) < 0.3)
    flat = (np.abs(np.abs(xyz[..., 0]) - 5) < 0.05) & (np.abs(xyz[..., 1]) < 2)
    corner &= valid
    flat &= valid
    assert c[corner].mean() > 10 * max(c[flat].mean(), 1e-9)


def test_extract_features_finds_corners():
    pb = synthetic_room_scan()
    grid = features.organize_scan(pb, rings=16, width=360)
    feats = features.extract_loam_features(grid, edges_per_sector=8, surfs_per_sector=30)
    edges = feats.edge.to_numpy()
    surfs = feats.surf.to_numpy()
    assert len(edges) > 10 and len(surfs) > 100
    # edges concentrate on geometric edges: vertical wall-wall corners or
    # floor-wall junction lines
    near_wall_x = np.abs(np.abs(edges[:, 0]) - 5) < 0.5
    near_wall_y = np.abs(np.abs(edges[:, 1]) - 5) < 0.5
    on_floor = np.abs(edges[:, 2] + 2) < 0.3
    frac_edge = np.mean((near_wall_x & near_wall_y) | (on_floor & (near_wall_x | near_wall_y)))
    assert frac_edge > 0.7, frac_edge
    # surfaces lie on walls or the floor
    wall_dist = np.minimum(
        np.abs(np.abs(surfs[:, 0]) - 5), np.abs(np.abs(surfs[:, 1]) - 5)
    )
    plane_dist = np.minimum(wall_dist, np.abs(surfs[:, 2] + 2))
    assert np.percentile(plane_dist, 90) < 0.1
