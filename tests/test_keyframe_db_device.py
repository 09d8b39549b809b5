"""Device-resident local-map assembly: the fixed-K padded gather must match
the host-upload path exactly (same points, same masks, in map frame), stay
consistent after optimize (pose refresh) and carve (mask refresh), and keep
shapes static across calls (no per-query recompiles — round-4 weak #2)."""
import jax
import jax.numpy as jnp
import numpy as np

from lmsf_slam_tpu.backend.keyframe_db import KeyframeDatabase
from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.common.pointcloud import PointBatch

KEY = jax.random.PRNGKey(3)


def _fill(db: KeyframeDatabase, n: int):
    for i in range(n):
        k = jax.random.fold_in(KEY, i)
        e = jax.random.uniform(k, (db.edge_capacity, 3), minval=-5, maxval=5)
        s = jax.random.uniform(
            jax.random.fold_in(k, 1), (db.surf_capacity, 3), minval=-5, maxval=5
        )
        em = jnp.arange(db.edge_capacity) < (db.edge_capacity - i)
        sm = jnp.arange(db.surf_capacity) < (db.surf_capacity - 2 * i)
        pose = np.asarray(
            se3.pose_compose(
                se3.pose_identity(),
                se3.se3_exp(jnp.asarray(
                    [0.01 * i, 0, 0.1 * i, 1.0 * i, 0.2 * i, 0.0],
                    jnp.float32)),
            )
        )
        db.add_keyframe(0.1 * i, pose, pose, PointBatch(e, em), PointBatch(s, sm))


def _sorted_pts(pb: PointBatch):
    pts = np.asarray(pb.xyz)[np.asarray(pb.mask)]
    return pts[np.lexsort(pts.T)]


def test_device_gather_matches_host_path():
    db = KeyframeDatabase(edge_capacity=64, surf_capacity=128,
                          initial_keyframes=4)
    _fill(db, 7)
    ids = np.array([1, 3, 4])
    eh, sh = db.local_map_ids(ids)
    ed, sd = db.local_map_ids_device(ids, k=5)  # padded K > len(ids)
    # static shapes: K * capacity regardless of how many real ids
    assert ed.xyz.shape == (5 * 64, 3)
    assert sd.xyz.shape == (5 * 128, 3)
    assert int(jnp.sum(ed.mask)) == int(jnp.sum(eh.mask))
    np.testing.assert_allclose(_sorted_pts(ed), _sorted_pts(eh), atol=1e-5)
    np.testing.assert_allclose(_sorted_pts(sd), _sorted_pts(sh), atol=1e-5)


def test_device_gather_tracks_pose_updates_and_carve():
    db = KeyframeDatabase(edge_capacity=64, surf_capacity=128,
                          initial_keyframes=4)
    _fill(db, 5)
    ids = np.array([0, 2])
    # 1) optimize moves poses → device map must follow
    new_poses = db.map_poses[:5].copy()
    new_poses[:, 4] += 2.5
    db.update_poses(new_poses)
    eh, _ = db.local_map_ids(ids)
    ed, _ = db.local_map_ids_device(ids, k=2)
    np.testing.assert_allclose(_sorted_pts(ed), _sorted_pts(eh), atol=1e-5)
    # 2) carve shrinks masks → device map must follow
    keep_e = np.ones(64, bool)
    keep_e[:10] = False
    db.carve(2, keep_e, np.ones(128, bool))
    eh2, sh2 = db.local_map_ids(ids)
    ed2, sd2 = db.local_map_ids_device(ids, k=2)
    assert int(jnp.sum(ed2.mask)) == int(jnp.sum(eh2.mask))
    assert int(jnp.sum(ed2.mask)) < int(jnp.sum(ed.mask))
    np.testing.assert_allclose(_sorted_pts(ed2), _sorted_pts(eh2), atol=1e-5)
    np.testing.assert_allclose(_sorted_pts(sd2), _sorted_pts(sh2), atol=1e-5)


def test_device_gather_window_clamp():
    """local_map_device clamps the window at sequence edges and masks the
    padded tail — never wraps (reference Appendix-A bug not replicated)."""
    db = KeyframeDatabase(edge_capacity=32, surf_capacity=64,
                          initial_keyframes=4)
    _fill(db, 4)
    eh, _ = db.local_map(0, half_window=2)  # clamped to ids 0..2
    ed, _ = db.local_map_device(0, half_window=2)  # K = 5, 3 real
    assert ed.xyz.shape[0] == 5 * 32
    np.testing.assert_allclose(_sorted_pts(ed), _sorted_pts(eh), atol=1e-5)
