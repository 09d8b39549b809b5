"""Lifelong backend: keyframe DB persistence, loop closure, relocalization,
and the RELOCALIZATION/LOCALIZATION/MAPPING FSM on a synthetic loop world.

The reference has zero automated coverage of its signature component
(SURVEY.md §4); these are the golden-trajectory replacements.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsf_slam_tpu.backend import (
    KeyframeDatabase,
    LifelongBackend,
    LifelongConfig,
    LoopConfig,
    LoopDetector,
    WorkMode,
)
from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.datasets import make_trajectory, make_world, scan_at

KEY = jax.random.PRNGKey(7)
N_FRAMES = 36


@pytest.fixture(scope="module")
def world():
    return make_world(KEY, extent=25.0, n_pillars=50, n_ground=5000, n_wall=2500)


@pytest.fixture(scope="module")
def loop_traj():
    return make_trajectory(N_FRAMES, radius=10.0, loop=True)


def _scan(world, pose, i):
    # max_range 12 < world extent: scans see only local structure, so loops
    # can only close on genuine revisit (full visibility would make every
    # scan align with every local map)
    return scan_at(
        world, pose, jax.random.fold_in(KEY, i),
        n_edge=256, n_surf=1024, noise=0.01, max_range=12.0,
    )


def _loop_cfg(**kw):
    """Small-world loop config: the reference gates (100-frame age, 50-recent
    exclusion) assume multi-thousand-frame sequences; scale them down but keep
    every stage active."""
    # score gates scale with point density: the synthetic world samples
    # ~0.7 m spacing (mean-sq 1-NN ≈ 0.12 at perfect alignment) vs the
    # ~0.1 m real-lidar spacing the reference's 0.05 gate assumes
    d = dict(min_frame_interval=20, exclude_recent=20, detect_spacing=1,
             search_radius=6.0, adjacent_window=3,
             refine_score_thresh=0.3, reloc_score_thresh=0.3)
    d.update(kw)
    return LoopConfig(**d)


@pytest.fixture(scope="module")
def mapped_backend(world, loop_traj):
    """Drive a full mapping session around the loop with drifty odometry."""
    rng = np.random.default_rng(0)
    backend = LifelongBackend(
        config=LifelongConfig(optimize_batch=100),  # optimize only on loop
        loop_config=_loop_cfg(),
    )
    gt, odom = [], []
    pose_odom = se3.pose_identity()
    drift = se3.se3_exp(jnp.asarray([0, 0, 0.002, 0.01, 0.004, 0.0], jnp.float32))
    for i in range(N_FRAMES):
        gt.append(loop_traj[i])
        if i == 0:
            pose_odom = loop_traj[0]
        else:
            inc = se3.pose_between(loop_traj[i - 1], loop_traj[i])
            pose_odom = se3.pose_compose(pose_odom, se3.pose_compose(inc, drift))
        odom.append(pose_odom)
        edge, surf = _scan(world, gt[i], i)
        # scans are simulated at ground truth; odometry pose carries drift
        backend.add_keyframe(float(i) * 0.1, edge, surf, np.asarray(pose_odom))
    return backend, jnp.stack(gt), jnp.stack(odom)


def test_db_roundtrip(tmp_path):
    db = KeyframeDatabase(edge_capacity=8, surf_capacity=8, initial_keyframes=2)
    rng = np.random.default_rng(1)
    from lmsf_slam_tpu.common.pointcloud import PointBatch

    for i in range(5):
        pb = PointBatch.from_points(rng.normal(size=(8, 3)), capacity=8)
        db.add_keyframe(0.1 * i, se3.pose_identity(), se3.pose_identity(), pb, pb)
    db.add_edge(0, 1, np.asarray(se3.pose_identity()))
    path = str(tmp_path / "graph.npz")
    db.save(path)
    db2 = KeyframeDatabase.load(path)
    assert db2.n_keyframes == 5 and db2.n_edges == 1
    np.testing.assert_array_equal(db2.stamps[:5], db.stamps[:5])
    np.testing.assert_array_equal(db2.surf_xyz[:5], db.surf_xyz[:5])
    np.testing.assert_array_equal(db2.sc[:5], db.sc[:5])
    np.testing.assert_array_equal(db2.eij[:1], db.eij[:1])


def test_mapping_closes_loop_and_reduces_drift(mapped_backend):
    backend, gt, odom = mapped_backend
    # mapping runs until the loop closes; after that the FSM localizes and
    # (correctly) stops adding keyframes unless the map needs extension
    n = backend.db.n_keyframes
    assert n >= 25
    eij = backend.db.eij[: backend.db.n_edges]
    loop_edges = eij[np.abs(eij[:, 1] - eij[:, 0]) > 1]
    assert len(loop_edges) > 0, "no loop closure found"
    # every loop edge links a late keyframe to a genuinely old one
    assert (np.abs(loop_edges[:, 1] - loop_edges[:, 0]) >= 20).all()
    # optimized trajectory must beat raw odometry at the last stored keyframe
    backend.force_global_optimize()
    k = n - 1
    est = backend.db.map_poses[:n]
    gt_np = np.asarray(gt)
    err_est = np.linalg.norm(est[k, 4:] - gt_np[k, 4:])
    err_odom = np.linalg.norm(np.asarray(odom)[k, 4:] - gt_np[k, 4:])
    assert err_est < err_odom * 0.5, (err_est, err_odom)
    # FSM auto-switched to LOCALIZATION after the loop closed (:421-426)
    assert backend.mode is WorkMode.LOCALIZATION


def test_save_load_relocalize_localize(mapped_backend, world, loop_traj, tmp_path):
    backend, gt, _ = mapped_backend
    path = str(tmp_path / "lifelong.npz")
    backend.save(path)

    # boot session 2 from the database → RELOCALIZATION mode
    b2 = LifelongBackend.load(
        path, config=LifelongConfig(), loop_config=_loop_cfg()
    )
    assert b2.mode is WorkMode.RELOCALIZATION

    # a scan from a mapped location, but odometry frame is arbitrary
    true_pose = loop_traj[9]
    edge, surf = _scan(world, true_pose, 1009)
    odom_pose = se3.pose_identity()  # fresh odometry frame
    out = b2.add_keyframe(1000.0, edge, surf, np.asarray(odom_pose))
    assert out.mode is WorkMode.LOCALIZATION, "relocalization failed"
    err = se3.pose_between(jnp.asarray(out.map_pose), true_pose)
    assert float(jnp.linalg.norm(se3.pose_trans(err))) < 0.3

    # next scans: localization keeps tracking through the odom→map correction
    for j in (10, 11):
        inc = se3.pose_between(loop_traj[j - 1], loop_traj[j])
        odom_pose = se3.pose_compose(odom_pose, inc)
        edge, surf = _scan(world, loop_traj[j], 1000 + j)
        out = b2.add_keyframe(1000.0 + j, edge, surf, np.asarray(odom_pose))
        assert out.mode in (WorkMode.LOCALIZATION, WorkMode.MAPPING)
        err = se3.pose_between(jnp.asarray(out.map_pose), loop_traj[j])
        assert float(jnp.linalg.norm(se3.pose_trans(err))) < 0.3


def test_localization_loss_triggers_relocalization(mapped_backend, world, tmp_path):
    backend, _, _ = mapped_backend
    path = str(tmp_path / "g.npz")
    backend.save(path)
    b2 = LifelongBackend.load(path, loop_config=_loop_cfg())
    b2.mode = WorkMode.LOCALIZATION
    # a scan from far outside the mapped area → alignment score blows up
    far_pose = se3.make_pose(se3.quat_identity(), jnp.asarray([500.0, 500.0, 0.0]))
    edge, surf = _scan(world, far_pose, 2000)
    # shift points so they genuinely don't match anything
    from lmsf_slam_tpu.common.pointcloud import PointBatch

    edge = PointBatch(edge.xyz + 300.0, edge.mask)
    surf = PointBatch(surf.xyz + 300.0, surf.mask)
    out = b2.add_keyframe(2000.0, edge, surf, np.asarray(far_pose))
    assert out.mode is WorkMode.RELOCALIZATION


def test_timestamp_disorder_dropped(mapped_backend):
    backend, _, _ = mapped_backend
    n_before = backend.db.n_keyframes
    from lmsf_slam_tpu.common.pointcloud import PointBatch

    pb = PointBatch.from_points(np.zeros((4, 3)), capacity=4)
    out = backend.add_keyframe(-1.0, pb, pb, np.asarray(se3.pose_identity()))
    assert out.keyframe_id == -1
    assert backend.db.n_keyframes == n_before


def test_gnss_anchored_mapping(world):
    """Keyframes carrying GNSS observations anchor the graph absolutely:
    drifted odometry is pulled onto the surveyed positions at optimize()."""
    from lmsf_slam_tpu.backend import LifelongBackend, LifelongConfig, LoopConfig

    traj = make_trajectory(14, radius=8.0, loop=False)
    backend = LifelongBackend(
        config=LifelongConfig(optimize_batch=10**9, gnss_std=0.05,
                              pose_graph=__import__("lmsf_slam_tpu.backend.pose_graph",
                                                    fromlist=["PoseGraphParams"]
                                                    ).PoseGraphParams(gn_iters=20, kernel="none")),
        loop_config=LoopConfig(min_frame_interval=10**9),
    )
    drift = se3.se3_exp(jnp.asarray([0, 0, 0.004, 0.03, 0.01, 0.0], jnp.float32))
    pose_odom = traj[0]
    gt = np.asarray(traj)
    for i in range(14):
        if i > 0:
            inc = se3.pose_between(traj[i - 1], traj[i])
            pose_odom = se3.pose_compose(pose_odom, se3.pose_compose(inc, drift))
        edge, surf = _scan(world, traj[i], 500 + i)
        backend.add_keyframe(
            0.1 * i, edge, surf, np.asarray(pose_odom),
            gnss_pos=gt[i, 4:] if i % 3 == 0 else None,  # fix every 3rd KF
        )
    err_before = np.linalg.norm(backend.db.map_poses[13, 4:] - gt[13, 4:])
    backend.force_global_optimize()
    err_after = np.linalg.norm(backend.db.map_poses[13, 4:] - gt[13, 4:])
    assert err_after < 0.1, (err_before, err_after)
    assert err_after < 0.5 * err_before
