"""Dual-LiDAR system: online extrinsic calibration FSM + fused tracking.

Reference behavior: ML_System's 3-phase calibration
(`ML_System.hpp:239-323`) — per-lidar odometry + hand-eye init, sub-to-
primary-localmap refinement, then fused tracking. The reference has no test
for any of it (SURVEY §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsf_slam_tpu.backend import LoopConfig
from lmsf_slam_tpu.calibration import HandEyeConfig
from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.datasets import make_sim_world, simulate_scan
from lmsf_slam_tpu.evaluation import ate_stats
from lmsf_slam_tpu.ops.registration import RegistrationParams
from lmsf_slam_tpu.system import FeatureParams, MultiLidarSystem, SystemConfig

KEY = jax.random.PRNGKey(33)

# true extrinsic: sub lidar 0.6 m right, 0.3 m up, yawed 30°
X_TRUE = np.asarray(
    se3.make_pose(
        se3.so3_exp_quat(jnp.asarray([0.0, 0.0, np.deg2rad(30.0)])),
        jnp.asarray([0.0, -0.6, 0.3]),
    )
)


def wavy_trajectory(n, key):
    """A trajectory with genuine 3-axis rotation so hand-eye is observable:
    slow sinusoidal roll/pitch riding on a yawing arc (axis diversity is what
    lifts the 2nd-smallest singular value past the degeneracy gate)."""
    del key
    poses = [se3.pose_identity()]
    for i in range(1, n):
        w = jnp.asarray([
            0.10 * np.sin(0.7 * i),
            0.10 * np.cos(1.1 * i),
            0.12,
        ])
        xi = jnp.concatenate([w, jnp.asarray([0.3, 0.0, 0.0])])
        poses.append(se3.pose_compose(poses[-1], se3.se3_exp(xi)))
    base = se3.make_pose(se3.quat_identity(), jnp.asarray([0.0, 0.0, 1.4]))
    return jnp.stack([se3.pose_compose(base, p) for p in poses])


def dual_config(**kw):
    d = dict(
        n_lidars=2,
        feature=FeatureParams(rings=16, width=360, edges_per_sector=4,
                              surfs_per_sector=12),
        tracker_window=8,
        registration=RegistrationParams(max_iters=8, max_corr_dist=2.0),
        map_update_trans=0.15,
        keyframe_trans=0.6,
        handeye=HandEyeConfig(min_pairs=6, min_rot_angle=0.06,
                              screw_rot_tol=0.05, screw_trans_tol=0.1),
        calib_refine_frames=12,
        loop=LoopConfig(min_frame_interval=10**9),
    )
    d.update(kw)
    return SystemConfig(**d)


@pytest.fixture(scope="module")
def dual_run():
    world = make_sim_world(KEY, extent=22.0, n_boxes=10, n_cylinders=18)
    traj = wavy_trajectory(40, jax.random.fold_in(KEY, 99))
    x = jnp.asarray(X_TRUE)
    system = MultiLidarSystem(dual_config())
    for i in range(40):
        p0 = traj[i]
        p1 = se3.pose_compose(p0, x)  # sub sensor pose in world
        s0 = simulate_scan(world, p0, jax.random.fold_in(KEY, 2 * i),
                           rings=16, width=360, max_range=40.0, noise=0.01)
        s1 = simulate_scan(world, p1, jax.random.fold_in(KEY, 2 * i + 1),
                           rings=16, width=360, max_range=40.0, noise=0.01)
        system.process([s0, s1], 0.1 * i)
    return system, traj


def test_calibration_reaches_fused_phase(dual_run):
    system, _ = dual_run
    assert system.calib_status == 2, (
        f"stuck in phase {system.calib_status}; "
        f"extrinsics={system.extrinsics}"
    )


def test_extrinsic_accuracy(dual_run):
    system, _ = dual_run
    err = se3.pose_between(jnp.asarray(system.extrinsics[0]), jnp.asarray(X_TRUE))
    te = float(jnp.linalg.norm(se3.pose_trans(err)))
    re = float(jnp.linalg.norm(se3.so3_log(se3.pose_quat(err))))
    assert te < 0.05, f"extrinsic translation error {te:.3f} m"
    assert re < np.deg2rad(2.0), f"extrinsic rotation error {np.rad2deg(re):.2f} deg"


def test_fused_tracking_quality(dual_run):
    system, traj = dual_run
    est = system.trajectory()
    gt = np.asarray(se3.pose_between(traj[0], traj))
    # trajectory during phases 0/1 is primary-odometry too, so the whole run
    # should track ground truth
    s = ate_stats(est, gt)
    assert s.rmse < 0.3, s


def test_wrong_scan_count_rejected(dual_run):
    system, _ = dual_run
    from lmsf_slam_tpu.common.pointcloud import PointBatch

    with pytest.raises(AssertionError):
        system.process(PointBatch.empty(8), 100.0)
