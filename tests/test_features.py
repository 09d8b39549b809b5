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


def test_ground_mask_flags_floor_not_walls():
    pb = synthetic_room_scan()
    grid = features.organize_scan(pb, rings=16, width=360)
    g = np.asarray(features.ground_mask(grid, z_max=-0.5))
    xyz = np.asarray(grid.xyz)
    mask = np.asarray(grid.mask)
    on_floor = np.abs(xyz[..., 2] + 2) < 0.15
    wall = (~on_floor) & mask
    # floor cells away from the wall junction are flagged; wall cells are not
    interior_floor = on_floor & (
        np.minimum(np.abs(np.abs(xyz[..., 0]) - 5), np.abs(np.abs(xyz[..., 1]) - 5))
        > 0.5
    )
    assert g[interior_floor].mean() > 0.9
    assert g[wall].mean() < 0.05


def test_ground_excluded_edges_keep_surfs():
    pb = synthetic_room_scan(noise=0.01, seed=3)
    grid = features.organize_scan(pb, rings=16, width=360)
    base = features.extract_loam_features(grid, edges_per_sector=8, surfs_per_sector=30)
    nog = features.extract_loam_features(
        grid, edges_per_sector=8, surfs_per_sector=30, exclude_ground_edges=True
    )
    edges = nog.edge.to_numpy()
    # no edge feature may sit on the interior floor plane
    if len(edges):
        on_floor = np.abs(edges[:, 2] + 2) < 0.15
        near_wall = (
            np.minimum(np.abs(np.abs(edges[:, 0]) - 5), np.abs(np.abs(edges[:, 1]) - 5))
            < 0.5
        )
        assert not np.any(on_floor & ~near_wall)
    # surf channel unchanged by the edge-side exclusion
    np.testing.assert_array_equal(
        np.asarray(nog.surf.mask), np.asarray(base.surf.mask)
    )


def test_range_noise_floor_suppresses_phantom_near_edges():
    """With heavy sensor noise, uncompensated near-range curvature crosses the
    edge threshold on smooth ground; the analytic floor subtraction kills
    those phantom edges while real corners survive."""
    pb = synthetic_room_scan(noise=0.03, seed=1)
    grid = features.organize_scan(pb, rings=16, width=360)
    raw = features.extract_loam_features(grid, edges_per_sector=8, surfs_per_sector=30)
    comp = features.extract_loam_features(
        grid, edges_per_sector=8, surfs_per_sector=30, range_noise=0.03
    )

    def phantom_fraction(f):
        e = f.edge.to_numpy()
        if len(e) == 0:
            return 0.0
        near_wall_x = np.abs(np.abs(e[:, 0]) - 5) < 0.5
        near_wall_y = np.abs(np.abs(e[:, 1]) - 5) < 0.5
        on_floor = np.abs(e[:, 2] + 2) < 0.3
        real = (near_wall_x & near_wall_y) | (on_floor & (near_wall_x | near_wall_y))
        return float(np.mean(~real))

    assert phantom_fraction(comp) <= phantom_fraction(raw)
    # compensated extraction still finds the actual corners
    assert int(np.asarray(comp.edge.mask).sum()) > 10


def test_one_sided_occlusion_keeps_foreground_silhouette():
    """A box in front of a far wall: the background side of the silhouette is
    always rejected; the foreground (box) side survives only in one-sided
    mode."""
    # single ring: wall at x=8, box edge spanning azimuth in front at x=3
    width = 360
    az = -np.pi + (np.arange(width) + 0.5) * 2 * np.pi / width
    in_box = np.abs(az) < 0.5  # box occupies the forward cone
    t = np.where(in_box, 3.0 / np.cos(az), np.where(np.cos(az) > 0.3, 8.0 / np.cos(az), 6.0))
    pts = np.stack([t * np.cos(az), t * np.sin(az), np.zeros(width)], -1)
    pts = np.tile(pts[None], (3, 1, 1)) + np.array([0, 0, -0.1])[None, None]
    pts[1, :, 2] = 0.0
    pts[2, :, 2] = 0.1
    n = 3 * width
    pb = PointBatch.from_points(pts.reshape(-1, 3).astype(np.float32), capacity=n)
    rid = np.repeat(np.arange(3), width)
    grid = features.organize_scan(pb, rings=3, width=width, ring_ids=jnp.asarray(rid))

    both = np.asarray(features.bad_point_mask(grid))
    one = np.asarray(features.bad_point_mask(grid, one_sided_occlusion=True))
    xyz = np.asarray(grid.xyz)
    on_box = np.abs(xyz[..., 0] - 3.0) < 0.2
    # columns adjacent to the box silhouette on the box side
    box_cols = np.where(on_box[1])[0]
    lo, hi = box_cols.min(), box_cols.max()
    assert not both[1, lo] and not both[1, hi]  # two-sided drops foreground rim
    assert one[1, lo] and one[1, hi]  # one-sided keeps it
    # background rim (wall side) rejected in BOTH modes
    assert not both[1, lo - 1] and not one[1, lo - 1]
    assert not both[1, hi + 1] and not one[1, hi + 1]
