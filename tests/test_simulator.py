"""Ray-cast simulator: geometry correctness of the organized scans."""
import jax
import jax.numpy as jnp
import numpy as np

from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.datasets import make_sim_world, simulate_scan

KEY = jax.random.PRNGKey(3)


def test_scan_hits_world_surfaces():
    world = make_sim_world(KEY, extent=20.0, n_boxes=6, n_cylinders=10)
    pose = se3.make_pose(se3.quat_identity(), jnp.asarray([0.0, 0.0, 1.5]))
    pb = simulate_scan(world, pose, jax.random.fold_in(KEY, 0), rings=16,
                       width=360, noise=0.0)
    pts = pb.to_numpy()
    assert pts.shape[0] > 1000
    # world-frame points: sensor at (0,0,1.5), identity rotation
    w = pts + np.array([0.0, 0.0, 1.5])
    on_ground = np.abs(w[:, 2]) < 1e-3
    bmin = np.asarray(world.boxes_min)
    bmax = np.asarray(world.boxes_max)
    on_box = np.zeros(len(w), bool)
    for lo, hi in zip(bmin, bmax):
        d = np.maximum(lo - w, w - hi).max(axis=1)
        on_box |= np.abs(d) < 1e-3
    cyl = np.asarray(world.cylinders)
    on_cyl = np.zeros(len(w), bool)
    for cx, cy, r, h in cyl:
        dr = np.abs(np.hypot(w[:, 0] - cx, w[:, 1] - cy) - r)
        on_cyl |= (dr < 1e-3) & (w[:, 2] > -1e-3) & (w[:, 2] < h + 1e-3)
    frac = np.mean(on_ground | on_box | on_cyl)
    assert frac > 0.999, frac


def test_scan_rel_time_attr():
    world = make_sim_world(KEY, extent=20.0)
    pose = se3.make_pose(se3.quat_identity(), jnp.asarray([0.0, 0.0, 1.5]))
    pb = simulate_scan(world, pose, KEY, rings=4, width=100)
    rel = np.asarray(pb.attr[:, 0])
    assert rel.min() >= 0.0 and rel.max() < 1.0
    # row-major by (ring, azimuth): within a ring rel_time is increasing
    assert np.all(np.diff(rel[:100]) > 0)


def test_scan_from_moved_pose_consistent():
    """Points observed from a moved pose map back to the same world geometry."""
    world = make_sim_world(KEY, extent=20.0, n_boxes=6, n_cylinders=8)
    p0 = se3.make_pose(se3.quat_identity(), jnp.asarray([0.0, 0.0, 1.5]))
    p1 = se3.pose_compose(
        p0, se3.se3_exp(jnp.asarray([0, 0, 0.3, 1.0, 0.5, 0.0], jnp.float32))
    )
    pb0 = simulate_scan(world, p0, KEY, rings=16, width=360, noise=0.0)
    pb1 = simulate_scan(world, p1, KEY, rings=16, width=360, noise=0.0)
    w0 = np.asarray(se3.pose_apply(p0, pb0.xyz))[np.asarray(pb0.mask)]
    w1 = np.asarray(se3.pose_apply(p1, pb1.xyz))[np.asarray(pb1.mask)]
    # each w1 ground point should lie on the ground plane, same as w0
    assert np.abs(w1[:, 2].min() - w0[:, 2].min()) < 1e-3
