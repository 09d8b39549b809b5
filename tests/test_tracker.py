"""Tracker + local map: odometry on a synthetic world must track ground truth.

The reference never tests its tracker (SURVEY.md §4); golden-trajectory
synthetic-world tracking is the replacement.
"""
import jax
import jax.numpy as jnp
import numpy as np

from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.common.pointcloud import PointBatch
from lmsf_slam_tpu.datasets import make_trajectory, make_world, scan_at
from lmsf_slam_tpu.ops.registration import RegistrationParams
from lmsf_slam_tpu.tracker import (
    localmap_add,
    localmap_empty,
    localmap_flatten,
    tracker_init,
    tracker_step,
    TrackerConfig,
)


def test_localmap_ring_buffer():
    lm = localmap_empty(window=3, points_per_scan=4)
    for i in range(5):
        pb = PointBatch.from_points(np.full((4, 3), float(i)), capacity=4)
        lm = localmap_add(lm, pb)
    assert int(lm.count) == 3
    flat = localmap_flatten(lm)
    vals = np.unique(np.asarray(flat.xyz[flat.mask][:, 0]))
    # window of 3 keeps scans 2,3,4
    np.testing.assert_array_equal(vals, [2.0, 3.0, 4.0])


def test_tracker_follows_synthetic_trajectory():
    key = jax.random.PRNGKey(0)
    world = make_world(key, extent=25.0, n_pillars=40, n_ground=4000, n_wall=2000)
    n_frames = 40  # ≈0.63 m/frame — realistic 10 Hz scanner spacing
    traj = make_trajectory(n_frames, radius=8.0, loop=False)

    config = TrackerConfig(
        window=8,
        edge_capacity=256,
        surf_capacity=1024,
        map_update_trans=0.2,
        registration=RegistrationParams(max_iters=8, max_corr_dist=2.0),
    )
    state = tracker_init(config)
    errs = []
    for i in range(n_frames):
        edge, surf = scan_at(
            world, traj[i], jax.random.fold_in(key, i),
            n_edge=256, n_surf=1024, noise=0.01,
        )
        state, out = tracker_step(state, edge, surf, jnp.float32(0.1 * i), config)
        # tracker pose is relative to frame 0: compare increments
        gt_rel = se3.pose_between(traj[0], traj[i])
        err = se3.pose_between(gt_rel, out.pose)
        errs.append(float(jnp.linalg.norm(se3.pose_trans(err))))
    # after warmup the tracker should stay within 15 cm of ground truth
    assert max(errs[1:]) < 0.15, errs


def test_tracker_map_update_gating():
    config = TrackerConfig(
        window=4, edge_capacity=64, surf_capacity=64,
        map_update_trans=1e9, map_update_rot=1e9, map_update_dt=1e9,
        registration=RegistrationParams(max_iters=2),
    )
    state = tracker_init(config)
    pb = PointBatch.from_points(np.random.RandomState(0).randn(64, 3), capacity=64)
    state, out = tracker_step(state, pb, pb, jnp.float32(0.0), config)
    assert bool(out.map_updated)  # first frame always inserts
    state, out = tracker_step(state, pb, pb, jnp.float32(0.1), config)
    assert not bool(out.map_updated)  # thresholds unreachable
    assert int(state.edge_map.count) == 1


def test_tracker_odometry_failure_gate():
    """A poisoned constant-velocity model (one insane increment) must not
    dead-reckon to infinity: the implausible solve/prediction is rejected,
    the velocity resets, and the tracker holds position (the front-end analog
    of the reference LIO failureDetection, `imuPreintegration_node.cpp:510`)."""
    key = jax.random.PRNGKey(1)
    world = make_world(key, extent=25.0, n_pillars=40, n_ground=4000, n_wall=2000)
    n_frames = 26  # ≈0.63 m/frame over a 40-frame-circle parametrization
    traj = make_trajectory(40, radius=8.0, loop=False)
    config = TrackerConfig(
        window=8, edge_capacity=256, surf_capacity=1024,
        map_update_trans=0.2,
        registration=RegistrationParams(max_iters=8, max_corr_dist=2.0),
    )
    state = tracker_init(config)
    poison_at = 20
    for i in range(poison_at):
        edge, surf = scan_at(
            world, traj[i], jax.random.fold_in(key, i),
            n_edge=256, n_surf=1024, noise=0.01,
        )
        state, out = tracker_step(state, edge, surf, jnp.float32(0.1 * i), config)
    sane_pose = np.asarray(state.pose)

    # poison the motion model with a 1e10 m/frame velocity (what an
    # unguarded degenerate solve once produced)
    bad_motion = np.array([1, 0, 0, 0, 1e10, 0, 0], np.float32)
    state = state._replace(motion=jnp.asarray(bad_motion))
    edge, surf = scan_at(
        world, traj[poison_at], jax.random.fold_in(key, poison_at),
        n_edge=256, n_surf=1024, noise=0.01,
    )
    state, out = tracker_step(
        state, edge, surf, jnp.float32(0.1 * poison_at), config
    )
    # pose held (not teleported), velocity reset to something plausible
    assert (
        np.linalg.norm(np.asarray(out.pose)[4:] - sane_pose[4:])
        < config.max_motion_trans
    )
    assert np.linalg.norm(np.asarray(state.motion)[4:]) < config.max_motion_trans
    # and the tracker recovers: subsequent frames re-anchor on the local map
    for i in range(poison_at, n_frames):
        edge, surf = scan_at(
            world, traj[i], jax.random.fold_in(key, i),
            n_edge=256, n_surf=1024, noise=0.01,
        )
        state, out = tracker_step(state, edge, surf, jnp.float32(0.1 * i), config)
    gt_rel = se3.pose_between(traj[0], traj[n_frames - 1])
    err = se3.pose_between(gt_rel, out.pose)
    assert float(jnp.linalg.norm(se3.pose_trans(err))) < 0.3


def test_tracker_fast_start_gate_warmup():
    """Advisor r4 (medium): a sequence that STARTS above motion_floor
    (KITTI-highway-class ~2.5 m/frame, or rebooting mid-drive) must not
    deadlock the speed-relative motion gate — cold gate falls back to
    max_motion_trans until motion is first accepted, and re-opens after
    consecutive rejections."""
    key = jax.random.PRNGKey(5)
    world = make_world(key, extent=40.0, n_pillars=60, n_ground=6000,
                       n_wall=3000)
    n = 12
    traj = make_trajectory(40, radius=16.0, loop=False)  # ≈2.5 m/frame
    config = TrackerConfig(
        window=8, edge_capacity=256, surf_capacity=1024,
        map_update_trans=0.2,
        registration=RegistrationParams(max_iters=16, max_corr_dist=4.0),
    )
    state = tracker_init(config)
    for i in range(n):
        edge, surf = scan_at(
            world, traj[i], jax.random.fold_in(key, i),
            n_edge=256, n_surf=1024, noise=0.01,
        )
        state, out = tracker_step(state, edge, surf, jnp.float32(0.1 * i),
                                  config)
    gt_rel = se3.pose_between(traj[0], traj[n - 1])
    gt_dist = float(jnp.linalg.norm(se3.pose_trans(gt_rel)))
    est_dist = float(jnp.linalg.norm(se3.pose_trans(state.pose)))
    # the old gate held position forever (est_dist ≈ 0); the warm-started
    # gate must actually travel
    assert est_dist > 0.5 * gt_dist, (est_dist, gt_dist)
    assert float(state.speed_ema) > 1.0


def test_probation_gate_blocks_movers_admits_static():
    """Dynamic-object probation at map insert (TrackerConfig.probation):
    points displacing between map updates never enter the local map; static
    new structure is admitted on its second sighting."""
    config = TrackerConfig(
        window=8, edge_capacity=64, surf_capacity=256,
        map_update_trans=0.0,  # insert every frame
        map_update_dt=0.0,
        map_insert_min_matches=1,
        probation=True, support_radius=0.6, consist_radius=0.3,
        registration=RegistrationParams(max_iters=2, max_corr_dist=2.0),
    )
    state = tracker_init(config)
    rng = np.random.default_rng(0)
    # static scene: floor + two orthogonal walls (fully constrains the pose)
    g = np.linspace(-4.0, 8.0, 10)
    floor = np.stack(np.meshgrid(g, g), -1).reshape(-1, 2)
    floor = np.concatenate([floor, np.zeros((floor.shape[0], 1))], 1)
    wx = np.stack(np.meshgrid(g, np.linspace(0.2, 2.6, 7)), -1).reshape(-1, 2)
    wall_a = np.stack([wx[:, 0], np.full(wx.shape[0], 8.0), wx[:, 1]], 1)
    wall_b = np.stack([np.full(wx.shape[0], 8.0), wx[:, 0], wx[:, 1]], 1)
    static = np.concatenate([floor, wall_a, wall_b]).astype(np.float32)
    # a mover sweeping 0.8 m/frame and a new static object appearing at
    # frame 2 (both absent from the initial map)
    def scan(i):
        pts = [static + rng.normal(0, 0.01, static.shape).astype(np.float32)]
        mover = np.array([[0.0 + 0.8 * i, 5.0, 1.0]], np.float32) + \
            rng.normal(0, 0.01, (8, 3)).astype(np.float32)
        pts.append(mover)
        if i >= 2:
            newobj = np.array([[-4.0, -4.0, 1.0]], np.float32) + \
                rng.normal(0, 0.02, (8, 3)).astype(np.float32)
            pts.append(newobj)
        p = np.concatenate(pts)
        return (PointBatch.from_points(p[:32], capacity=64),
                PointBatch.from_points(p, capacity=256))

    for i in range(6):
        edge, surf = scan(i)
        state, _ = tracker_step(state, edge, surf, jnp.float32(0.1 * i),
                                config)
    flat = np.asarray(state.surf_flat.xyz)[np.asarray(state.surf_flat.mask)]
    # the new static object (around (-4, -4)) made it into the map
    d_new = np.linalg.norm(flat[:, :2] - np.array([-4.0, -4.0]), axis=1)
    assert (d_new < 0.5).any(), "static new structure never admitted"
    # no mover ghost trail: mover positions at frames 1..4 (x = 0.8..3.2,
    # y = 5) must be absent (frame-0 position was admitted with the first
    # scan, which seeds the map wholesale)
    for i in range(1, 5):
        d_mov = np.linalg.norm(
            flat[:, :2] - np.array([0.8 * i, 5.0]), axis=1
        )
        assert not (d_mov < 0.25).any(), f"mover ghost at frame {i}"
