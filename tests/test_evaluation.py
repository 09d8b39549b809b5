"""ATE/RPE metrics + KITTI trajectory IO."""
import jax.numpy as jnp
import numpy as np

from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.datasets import make_trajectory
from lmsf_slam_tpu.evaluation import (
    ate_stats,
    load_kitti_trajectory,
    rpe_stats,
    save_kitti_trajectory,
    umeyama_alignment,
)


def test_umeyama_recovers_known_transform():
    rng = np.random.RandomState(0)
    pts = rng.randn(100, 3)
    R_true = np.asarray(se3.quat_to_matrix(se3.so3_exp_quat(jnp.asarray([0.3, -0.2, 0.5]))))
    t_true = np.array([1.0, -2.0, 3.0])
    moved = pts @ R_true.T + t_true
    R, t, s = umeyama_alignment(pts, moved)
    np.testing.assert_allclose(R, R_true, atol=1e-6)
    np.testing.assert_allclose(t, t_true, atol=1e-6)
    assert abs(s - 1.0) < 1e-9


def test_ate_zero_for_identical_and_gauge_invariant():
    traj = np.asarray(make_trajectory(50, radius=10.0))
    assert ate_stats(traj, traj).rmse < 1e-6
    # a rigidly transformed copy has zero ATE after alignment
    offset = se3.se3_exp(jnp.asarray([0.1, 0.2, -0.1, 5.0, -3.0, 1.0], jnp.float32))
    moved = np.asarray(se3.pose_compose(offset, jnp.asarray(traj)))
    s = ate_stats(moved, traj, align=True)
    assert s.rmse < 1e-4, s
    # without alignment the offset shows
    assert ate_stats(moved, traj, align=False).rmse > 1.0


def test_ate_measures_noise():
    traj = np.asarray(make_trajectory(100, radius=10.0))
    noisy = traj.copy()
    noisy[:, 4:] += np.random.RandomState(1).randn(100, 3) * 0.5
    s = ate_stats(noisy, traj)
    assert 0.3 < s.rmse < 1.2
    assert s.n == 100 and s.max >= s.median


def test_rpe_zero_for_identical():
    traj = np.asarray(make_trajectory(30, radius=5.0))
    assert rpe_stats(traj, traj, delta=1).rmse < 1e-5


def test_kitti_roundtrip(tmp_path):
    traj = np.asarray(make_trajectory(20, radius=7.0))
    path = str(tmp_path / "poses.txt")
    save_kitti_trajectory(traj, path)
    back = load_kitti_trajectory(path)
    np.testing.assert_allclose(back[:, 4:], traj[:, 4:], atol=1e-5)
    # quaternions equal up to sign (canonicalized)
    np.testing.assert_allclose(np.abs(back[:, 0]), np.abs(traj[:, 0]), atol=1e-5)
