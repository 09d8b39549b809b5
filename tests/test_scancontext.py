"""Scan-context descriptor: rotation invariance, yaw recovery, place search."""
import jax
import jax.numpy as jnp
import numpy as np

from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.common.pointcloud import PointBatch
from lmsf_slam_tpu.datasets import make_world, scan_at, make_trajectory
from lmsf_slam_tpu.ops import scancontext as sc


def _scan(key, n=2048):
    world = make_world(key, extent=25.0)
    e, s = scan_at(world, se3.pose_identity(), key, n_edge=256, n_surf=n)
    xyz = jnp.concatenate([e.xyz, s.xyz])
    mask = jnp.concatenate([e.mask, s.mask])
    return PointBatch(xyz, mask)


def _rotz(pb, yaw):
    q = jnp.array([jnp.cos(yaw / 2), 0.0, 0.0, jnp.sin(yaw / 2)])
    pose = se3.make_pose(q, jnp.zeros(3))
    return pb.transform(pose)


def test_sc_shape_and_selfdistance():
    pb = _scan(jax.random.PRNGKey(0))
    d = sc.make_scan_context(pb)
    assert d.shape == (sc.RINGS, sc.SECTORS)
    dist, shift = sc.sc_distance(d, d)
    assert float(dist) < 1e-5
    assert int(shift) == 0


def test_sc_yaw_recovery():
    pb = _scan(jax.random.PRNGKey(1))
    d0 = sc.make_scan_context(pb)
    true_yaw = 2 * np.pi * 7 / sc.SECTORS  # exactly 7 sectors
    d1 = sc.make_scan_context(_rotz(pb, true_yaw))
    dist, shift = sc.sc_distance(d0, d1)
    assert float(dist) < 0.1, float(dist)
    yaw = float(sc.shift_to_yaw(shift))
    # recovered yaw must match the applied rotation (up to sign convention
    # fixed here): rotating the scene by +yaw must be recoverable
    assert min(abs(yaw - true_yaw), abs(-yaw - true_yaw)) < (2 * np.pi / sc.SECTORS) * 1.5, yaw


def test_sc_search_finds_revisit():
    key = jax.random.PRNGKey(2)
    world = make_world(key, extent=30.0)
    traj = make_trajectory(16, radius=12.0, loop=True)
    descs = []
    for i in range(16):
        e, s = scan_at(world, traj[i], jax.random.fold_in(key, i), n_surf=2048)
        pb = PointBatch(jnp.concatenate([e.xyz, s.xyz]), jnp.concatenate([e.mask, s.mask]))
        descs.append(sc.make_scan_context(pb))
    db = jnp.stack(descs)
    keys = sc.ring_key(db)
    valid = jnp.ones(16, bool).at[10:].set(False)  # only first 10 in DB
    # query: a new scan from the same place as frame 2
    e, s = scan_at(world, traj[2], jax.random.fold_in(key, 99), n_surf=2048)
    pb = PointBatch(jnp.concatenate([e.xyz, s.xyz]), jnp.concatenate([e.mask, s.mask]))
    q = sc.make_scan_context(pb)
    best, dist, yaw = sc.sc_search(q, db, keys, valid)
    assert int(best) == 2, (int(best), float(dist))
    assert float(dist) < 0.2  # reference SC_DIST_THRES

    # empty database → -1
    best, dist, _ = sc.sc_search(q, db, keys, jnp.zeros(16, bool))
    assert int(best) == -1
