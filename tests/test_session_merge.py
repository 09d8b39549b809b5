"""Multi-session fusion: two mapping sessions of the same world, different
map frames, are aligned by appearance and merged into one optimizable graph
(the reference's README TODO #2, unimplemented there)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsf_slam_tpu.backend import (
    KeyframeDatabase,
    LifelongBackend,
    LifelongConfig,
    LoopConfig,
)
from lmsf_slam_tpu.backend.session_merge import align_sessions, merge_sessions
from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.datasets import make_trajectory, make_world, scan_at

KEY = jax.random.PRNGKey(7)


def _loop_cfg(**kw):
    d = dict(min_frame_interval=20, exclude_recent=20, detect_spacing=1,
             search_radius=6.0, adjacent_window=3,
             refine_score_thresh=0.3, reloc_score_thresh=0.3)
    d.update(kw)
    return LoopConfig(**d)


def _map_session(world, poses, frame_offset, seed0):
    """Run a mapping session whose MAP FRAME is anchored at its first pose
    composed with ``frame_offset`` (sessions must not share a gauge)."""
    backend = LifelongBackend(
        config=LifelongConfig(optimize_batch=10**9),
        loop_config=_loop_cfg(min_frame_interval=10**9),  # no intra loops
    )
    for i, pose in enumerate(poses):
        edge, surf = scan_at(world, pose, jax.random.fold_in(KEY, seed0 + i),
                             n_edge=256, n_surf=1024, noise=0.01, max_range=12.0)
        odom = se3.pose_compose(frame_offset, pose)
        backend.add_keyframe(0.1 * i, edge, surf, np.asarray(odom))
    return backend.db


@pytest.fixture(scope="module")
def two_sessions():
    world = make_world(KEY, extent=25.0, n_pillars=50, n_ground=5000,
                       n_wall=2500)
    traj = make_trajectory(36, radius=10.0, loop=True)
    # session A maps the first 2/3; session B maps the last 2/3 (overlap in
    # the middle third), in a different map frame
    off_b = se3.se3_exp(jnp.asarray([0, 0, 0.7, 12.0, -5.0, 0.0], jnp.float32))
    db_a = _map_session(world, [traj[i] for i in range(24)], se3.pose_identity(), 0)
    db_b = _map_session(world, [traj[i] for i in range(12, 36)], off_b, 1000)
    return db_a, db_b, off_b


@pytest.mark.slow
def test_align_and_merge(two_sessions):
    db_a, db_b, off_b = two_sessions
    res = align_sessions(db_a, db_b, _loop_cfg())
    assert res is not None, "no alignment found"
    # T_A←B must invert session B's frame offset
    t_err = se3.pose_between(jnp.asarray(res.transform),
                             se3.pose_inverse(off_b))
    assert float(jnp.linalg.norm(se3.pose_trans(t_err))) < 0.3, res.transform
    assert len(res.matches) >= 3

    n_a, e_a = db_a.n_keyframes, db_a.n_edges
    offset = merge_sessions(db_a, db_b, res)
    assert offset == n_a
    assert db_a.n_keyframes == n_a + db_b.n_keyframes
    assert db_a.n_edges == e_a + db_b.n_edges + len(res.matches)
    # merged B keyframes land on their true world positions
    traj = make_trajectory(36, radius=10.0, loop=True)
    gt_b = np.asarray(traj)[12:36, 4:]
    err = np.linalg.norm(db_a.map_poses[n_a:db_a.n_keyframes, 4:] - gt_b, axis=1)
    assert err.max() < 0.5, err.max()
    # the merged graph optimizes without blowing up
    merged = LifelongBackend(db=db_a, mode=None)
    stats = merged.force_global_optimize()
    assert float(stats.chi2_final) <= float(stats.chi2_initial) + 1e-3
    err2 = np.linalg.norm(db_a.map_poses[n_a:db_a.n_keyframes, 4:] - gt_b, axis=1)
    assert err2.max() < 0.6
