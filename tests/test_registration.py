import jax.numpy as jnp
import numpy as np

from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.common.pointcloud import PointBatch
from lmsf_slam_tpu.ops import registration, voxel
from tests.test_features import synthetic_room_scan
from lmsf_slam_tpu.ops import features


def make_pose(w, t):
    return se3.make_pose(se3.so3_exp_quat(jnp.asarray(w, jnp.float32)),
                         jnp.asarray(t, jnp.float32))


def room_features(noise=0.005, seed=0):
    pb = synthetic_room_scan(noise=noise, seed=seed)
    grid = features.organize_scan(pb, rings=16, width=360)
    f = features.extract_loam_features(grid, edges_per_sector=8, surfs_per_sector=40)
    return pb, f


def pose_error(a, b):
    d = se3.pose_between(a, b)
    return float(jnp.linalg.norm(se3.pose_trans(d))), float(
        jnp.linalg.norm(se3.so3_log(se3.pose_quat(d)))
    )


def test_edge_surf_registration_known_transform():
    """The reference's own manual test: register a cloud against a transformed
    copy of itself (feature_registration_test.cpp)."""
    _, map_f = room_features(seed=0)
    true_pose = make_pose([0.0, 0.0, 0.05], [0.3, -0.2, 0.05])
    # source = map transformed into the scanner frame of true_pose
    inv = se3.pose_inverse(true_pose)
    src_edge = map_f.edge.transform(inv)
    src_surf = map_f.surf.transform(inv)
    res = registration.register_edge_surf(
        src_edge, src_surf, map_f.edge, map_f.surf, se3.pose_identity()
    )
    terr, rerr = pose_error(res.pose, true_pose)
    assert terr < 0.02, (terr, rerr)
    assert rerr < 0.01


def test_point_to_plane_icp():
    pb, _ = room_features(noise=0.0, seed=1)
    ds = voxel.voxel_downsample(pb, 0.3, 4096)
    true_pose = make_pose([0.0, 0.0, -0.03], [0.2, 0.1, 0.0])
    src = ds.transform(se3.pose_inverse(true_pose))
    res = registration.register_point_to_plane(src, ds, se3.pose_identity())
    terr, rerr = pose_error(res.pose, true_pose)
    assert terr < 0.03, (terr, rerr)
    assert rerr < 0.02


def test_ndt_registration():
    pb, _ = room_features(noise=0.0, seed=2)
    g = voxel.voxel_gaussians(pb, voxel_size=1.0, max_voxels=4096)
    true_pose = make_pose([0.0, 0.0, 0.04], [0.25, -0.15, 0.0])
    src = voxel.voxel_downsample(pb, 0.3, 4096).transform(se3.pose_inverse(true_pose))
    res = registration.register_ndt(src, g, se3.pose_identity())
    terr, rerr = pose_error(res.pose, true_pose)
    assert terr < 0.1, (terr, rerr)
    assert rerr < 0.05


def test_evaluate_alignment_good_vs_bad():
    pb, _ = room_features(noise=0.0, seed=3)
    ds = voxel.voxel_downsample(pb, 0.3, 4096)
    good_score, good_overlap = registration.evaluate_alignment(
        ds, ds, se3.pose_identity(), inlier_dist=1.0
    )
    bad_pose = make_pose([0, 0, 0.5], [3.0, 3.0, 0.0])
    bad_score, _ = registration.evaluate_alignment(ds, ds, bad_pose, inlier_dist=1.0)
    # point-to-plane scoring: the perfect-alignment floor is set by corner
    # neighborhoods' plane-fit residual (~1e-4 at 0.3 m voxel density), far
    # below the reference's 0.04/0.05 accept gates
    assert float(good_score) < 1e-3
    assert float(good_overlap) > 0.99
    assert float(bad_score) > float(good_score) * 100


def test_degenerate_direction_is_frozen():
    """A single infinite plane constrains only 3 DoF — the solver must not
    move along the degenerate directions (reference spec:
    edgeSurfFeatureRegistration.hpp:280-308)."""
    rng = np.random.RandomState(0)
    xy = rng.uniform(-5, 5, (2000, 2)).astype(np.float32)
    plane = np.concatenate([xy, np.zeros((2000, 1), np.float32)], 1)
    map_pb = PointBatch.from_points(plane, 2048)
    src = PointBatch.from_points(plane[:1000], 1024)
    # initial error purely in z (observable): should be corrected
    init = make_pose([0, 0, 0], [0.0, 0.0, 0.3])
    res = registration.register_point_to_plane(src, map_pb, init)
    t = np.asarray(se3.pose_trans(res.pose))
    assert abs(t[2]) < 0.02  # z corrected
    # x/y unobservable: update must not have wandered far
    assert abs(t[0]) < 0.05 and abs(t[1]) < 0.05


def test_alignment_score_robust_at_map_boundary():
    """The map-update gate mechanism (reference `backend_lifelong.hpp:
    355-373`): a WELL-ALIGNED scan straddling the map frontier must keep an
    alignment-quality score (≤ the 0.04 gate) while overlap reports partial
    coverage — frontier points 0.5-1 m past the last mapped features count
    toward coverage, not alignment. A genuinely misaligned scan must still
    score far above the gate."""
    import numpy as np

    rng = np.random.default_rng(0)
    # map: dense plane strip x ∈ [0, 10]
    mx = np.stack([
        rng.uniform(0, 10, 4000), rng.uniform(-4, 4, 4000),
        rng.normal(0, 0.01, 4000),
    ], 1).astype(np.float32)
    map_pb = PointBatch(jnp.asarray(mx), jnp.ones(4000, bool))
    # scan: same plane but x ∈ [5, 15] — half on-map, half frontier
    sx = np.stack([
        rng.uniform(5, 15, 1000), rng.uniform(-4, 4, 1000),
        rng.normal(0, 0.01, 1000),
    ], 1).astype(np.float32)
    scan = PointBatch(jnp.asarray(sx), jnp.ones(1000, bool))
    ident = se3.pose_identity()
    score, overlap = registration.evaluate_alignment(scan, map_pb, ident)
    assert 0.4 < float(overlap) < 0.95  # partial coverage visible
    assert float(score) <= 0.04, float(score)  # alignment gate passes

    # shift the scan 0.35 m off-plane: misaligned — must fail the gate
    bad = PointBatch(scan.xyz + jnp.asarray([0.0, 0.0, 0.35]), scan.mask)
    score_b, _ = registration.evaluate_alignment(bad, map_pb, ident)
    assert float(score_b) > 0.04, float(score_b)
