"""LIO: IMU preintegration correctness + IMU-aided tracking beating
lidar-only on aggressive motion with real scan skew."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.datasets import make_sim_world, simulate_scan_moving
from lmsf_slam_tpu.estimator import eskf_init_state
from lmsf_slam_tpu.estimator.preintegration import (
    correct_bias,
    predict_pose,
    preintegrate,
)
from lmsf_slam_tpu.lio import LioConfig, LioTracker
from lmsf_slam_tpu.ops import features as F
from lmsf_slam_tpu.ops.registration import RegistrationParams
from lmsf_slam_tpu.tracker import TrackerConfig, tracker_init, tracker_step

KEY = jax.random.PRNGKey(55)
G = 9.81
IMU_HZ = 100.0
SCAN_HZ = 10.0


T_RAMP = 0.4  # start from rest (stationary init, as LIO-SAM assumes)


def analytic_state(t):
    """C² trajectory: circle + yaw wobble, speed ramping from zero.
    Returns position, velocity, acceleration (world), yaw, yaw rate."""
    r = 6.0
    w = 1.2
    # time warp s(t): s' = 1-exp(-t/T) (0 at start), s'' = exp(-t/T)/T
    s = t - T_RAMP * (1.0 - np.exp(-t / T_RAMP))
    s1 = 1.0 - np.exp(-t / T_RAMP)
    s2 = np.exp(-t / T_RAMP) / T_RAMP
    th = w * s
    f = np.array([r * np.cos(th), r * np.sin(th), 1.4])
    df = np.array([-r * w * np.sin(th), r * w * np.cos(th), 0.0])
    d2f = np.array([-r * w * w * np.cos(th), -r * w * w * np.sin(th), 0.0])
    p = f
    v = df * s1
    a = d2f * s1 * s1 + df * s2
    yaw = th + 0.5 * np.pi + 0.35 * np.sin(2.8 * s)
    dyaw = (w + 0.35 * 2.8 * np.cos(2.8 * s)) * s1
    return p, v, a, yaw, dyaw


def make_streams(n_scans):
    """Scan poses at 10 Hz + IMU (gyro, acc) at 100 Hz in between."""
    sub = int(IMU_HZ / SCAN_HZ)
    dt = 1.0 / IMU_HZ
    scan_poses = []
    imu = []  # per scan interval: (gyro (sub,3), acc (sub,3), dts)
    for i in range(n_scans):
        t0 = i / SCAN_HZ
        p, v, a, yaw, dyaw = analytic_state(t0)
        q = np.array([np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)])
        scan_poses.append(np.concatenate([q, p]).astype(np.float32))
        gy, ac = [], []
        for k in range(sub):
            t = t0 + k * dt
            pp, vv, aa, yy, dy = analytic_state(t)
            Rz = np.array([[np.cos(yy), -np.sin(yy), 0],
                           [np.sin(yy), np.cos(yy), 0], [0, 0, 1.0]])
            gy.append(Rz.T @ np.array([0, 0, dy]))
            ac.append(Rz.T @ (aa + np.array([0, 0, G])))
        imu.append((np.asarray(gy, np.float32), np.asarray(ac, np.float32),
                    np.full(sub, dt, np.float32)))
    return np.stack(scan_poses), imu


def test_preintegration_matches_ground_truth():
    poses, imu = make_streams(5)
    gy, ac, dts = imu[1]  # interval between scan 1 and 2
    pre = preintegrate(
        jnp.asarray(gy), jnp.asarray(ac), jnp.asarray(dts),
        jnp.ones(len(gy), bool), jnp.zeros(3), jnp.zeros(3),
    )
    p0, v0, _, _, _ = analytic_state(1 / SCAN_HZ)
    pose0 = jnp.asarray(poses[1])
    pose1_pred, v1_pred = predict_pose(pose0, jnp.asarray(v0, jnp.float32), pre)
    err = se3.pose_between(pose1_pred, jnp.asarray(poses[2]))
    assert float(jnp.linalg.norm(se3.pose_trans(err))) < 0.01
    assert float(jnp.linalg.norm(se3.so3_log(se3.pose_quat(err)))) < 3e-3
    _, v1, _, _, _ = analytic_state(2 / SCAN_HZ)
    assert float(jnp.linalg.norm(v1_pred - jnp.asarray(v1, jnp.float32))) < 0.02


def test_preintegration_bias_correction():
    poses, imu = make_streams(3)
    gy, ac, dts = imu[1]
    bg_true = np.array([0.02, -0.01, 0.03], np.float32)
    pre_biased = preintegrate(
        jnp.asarray(gy + bg_true), jnp.asarray(ac), jnp.asarray(dts),
        jnp.ones(len(gy), bool), jnp.zeros(3), jnp.zeros(3),
    )
    pre_clean = preintegrate(
        jnp.asarray(gy), jnp.asarray(ac), jnp.asarray(dts),
        jnp.ones(len(gy), bool), jnp.zeros(3), jnp.zeros(3),
    )
    # first-order re-linearization at the true bias ≈ clean delta
    fixed = correct_bias(pre_biased, jnp.asarray(bg_true), jnp.zeros(3))
    rot_err_raw = float(jnp.linalg.norm(se3.so3_log(
        se3.quat_mul(se3.quat_conj(pre_biased.dq), pre_clean.dq))))
    rot_err_fix = float(jnp.linalg.norm(se3.so3_log(
        se3.quat_mul(se3.quat_conj(fixed.dq), pre_clean.dq))))
    assert rot_err_fix < 0.1 * rot_err_raw
    assert float(jnp.linalg.norm(fixed.dp - pre_clean.dp)) < 0.5 * float(
        jnp.linalg.norm(pre_biased.dp - pre_clean.dp)
    )


@pytest.fixture(scope="module")
def skewed_scans():
    n = 25
    world = make_sim_world(KEY, extent=20.0, n_boxes=10, n_cylinders=16)
    poses, imu = make_streams(n + 1)
    scans = []
    for i in range(n):
        # sweep runs from scan i's pose to scan i+1's pose
        pb = simulate_scan_moving(
            world, jnp.asarray(poses[i]), jnp.asarray(poses[i + 1]),
            jax.random.fold_in(KEY, i), rings=16, width=360,
            max_range=40.0, noise=0.01,
        )
        scans.append(pb)
    return world, poses, imu, scans


def _featurize(pb):
    grid = F.organize_scan(pb, rings=16, width=360)
    return F.extract_loam_features(grid, edges_per_sector=4, surfs_per_sector=12)


def _tracker_cfg():
    return TrackerConfig(
        window=8, edge_capacity=384, surf_capacity=1152,
        map_update_trans=0.15,
        registration=RegistrationParams(max_iters=8, max_corr_dist=2.0),
    )


@pytest.mark.slow
def test_imu_aided_beats_lidar_only(skewed_scans):
    world, poses, imu, scans = skewed_scans
    n = len(scans)
    # ground truth at the scan END (deskew target frame)
    gt = np.stack([poses[i + 1] for i in range(n)])
    gt_rel = np.asarray(se3.pose_between(jnp.asarray(gt[0]), jnp.asarray(gt)))

    # --- lidar-only: cv-prediction, no deskew
    cfg = _tracker_cfg()
    state = tracker_init(cfg)
    errs_lidar = []
    for i in range(n):
        feats = _featurize(scans[i])
        state, out = tracker_step(state, feats.edge, feats.surf,
                                  jnp.float32(i / SCAN_HZ), cfg)
        err = se3.pose_between(jnp.asarray(gt_rel[i]), out.pose)
        errs_lidar.append(float(jnp.linalg.norm(se3.pose_trans(err))))

    # --- LIO: IMU prediction + deskew. The ESKF lives in the tracker's
    # odometry frame (anchored at the first scan's END pose = gt[0]): the
    # anchor attitude is identity by construction, and the anchor velocity
    # is the world velocity rotated into that frame.
    _, v1, _, _, _ = analytic_state(1 / SCAN_HZ)
    v_anchor = se3.quat_rotate(
        se3.quat_conj(jnp.asarray(gt[0][:4])), jnp.asarray(v1, jnp.float32)
    )
    lio = LioTracker(LioConfig(tracker=cfg))
    lio.eskf = eskf_init_state()._replace(v=v_anchor)
    errs_lio = []
    for i in range(n):
        feats = _featurize(scans[i])
        # scan i's sweep (and the step from scan i-1's end to scan i's end)
        # covers t ∈ [i, i+1]/SCAN_HZ = IMU window i
        gy, ac, dts = imu[i]
        pose, out = lio.process_scan(
            feats.edge, feats.surf, i / SCAN_HZ,
            gyro=gy if i > 0 else None, acc=ac if i > 0 else None,
            imu_dts=dts if i > 0 else None,
        )
        err = se3.pose_between(jnp.asarray(gt_rel[i]), jnp.asarray(pose))
        errs_lio.append(float(jnp.linalg.norm(se3.pose_trans(err))))

    m_lidar = max(errs_lidar[2:])
    m_lio = max(errs_lio[2:])
    # IMU aid + deskew must beat lidar-only measurably on aggressive motion
    assert m_lio < 0.6 * m_lidar, (m_lio, m_lidar)
    assert m_lio < 0.25, errs_lio


def test_system_with_imu(skewed_scans):
    """The System's use_imu mode (the LIG capability the reference stubs):
    IMU windows flow through process(); tracking stays tight on the
    aggressive sequence; a GNSS fix updates the filter without breaking."""
    from lmsf_slam_tpu.backend import LoopConfig
    from lmsf_slam_tpu.estimator import eskf_init_state
    from lmsf_slam_tpu.system import FeatureParams, MultiLidarSystem, SystemConfig

    world, poses, imu, scans = skewed_scans
    n = len(scans)
    gt = np.stack([poses[i + 1] for i in range(n)])
    gt_rel = np.asarray(se3.pose_between(jnp.asarray(gt[0]), jnp.asarray(gt)))

    cfg = SystemConfig(
        feature=FeatureParams(rings=16, width=360, edges_per_sector=4,
                              surfs_per_sector=12),
        tracker_window=8,
        registration=RegistrationParams(max_iters=8, max_corr_dist=2.0),
        map_update_trans=0.15,
        keyframe_trans=0.5,
        use_imu=True,
        loop=LoopConfig(min_frame_interval=10**9),
    )
    system = MultiLidarSystem(cfg)
    # anchor velocity in the tracker frame (see test_imu_aided_beats_lidar_only)
    _, v1, _, _, _ = analytic_state(1 / SCAN_HZ)
    system._lio.eskf = eskf_init_state()._replace(
        v=se3.quat_rotate(se3.quat_conj(jnp.asarray(gt[0][:4])),
                          jnp.asarray(v1, jnp.float32))
    )
    errs = []
    for i in range(n):
        gy, ac, dts = imu[i]
        r = system.process(
            scans[i], i / SCAN_HZ,
            gyro=gy if i > 0 else None, acc=ac if i > 0 else None,
            imu_dts=dts if i > 0 else None,
        )
        err = se3.pose_between(jnp.asarray(gt_rel[i]), jnp.asarray(r.odom_pose))
        errs.append(float(jnp.linalg.norm(se3.pose_trans(err))))
    assert max(errs[2:]) < 0.25, errs
    assert system.backend.db.n_keyframes > 3
    # GNSS fix at the current position (ENU anchor = first fix) doesn't break
    system.process_gnss(np.array([48.0, 11.0, 500.0]))
    assert np.isfinite(np.asarray(system._lio.eskf.p)).all()


def test_wheel_update_bounds_drift_and_rejects_slip():
    """LWIO wheel leg (reference TODO #1, `simple_lwio_node.cpp` /
    `wheels_predictor.hpp` stubs): encoder speed + non-holonomic constraints
    bound the velocity drift an uncompensated IMU bias causes, and the χ²
    gate rejects wheel-slip samples instead of dragging the state."""
    from lmsf_slam_tpu.estimator import eskf_init_state, eskf_run

    n, dt = 1000, 0.01  # 10 s of straight driving at 2 m/s along +x
    gyro = np.tile(np.array([0, 0, 0.002], np.float32), (n, 1))  # gyro bias
    acc = np.tile(np.array([0.15, 0, G + 0.05], np.float32), (n, 1))  # acc bias
    dts = np.full(n, dt, np.float32)
    no_gnss = (jnp.zeros((n, 3)), jnp.zeros(n, bool))
    init = eskf_init_state()._replace(v=jnp.asarray([2.0, 0.0, 0.0]))
    true_p = np.array([2.0 * n * dt, 0.0, 0.0])

    f_imu, _ = eskf_run(init, jnp.asarray(gyro), jnp.asarray(acc),
                        jnp.asarray(dts), *no_gnss)
    err_imu = float(np.linalg.norm(np.asarray(f_imu.p) - true_p))

    ws = jnp.full(n, 2.0)
    f_w, _ = eskf_run(init, jnp.asarray(gyro), jnp.asarray(acc),
                      jnp.asarray(dts), *no_gnss,
                      wheel_speed=ws, wheel_valid=jnp.ones(n, bool),
                      wheel_std=0.05)
    err_w = float(np.linalg.norm(np.asarray(f_w.p) - true_p))
    assert err_w < 0.3 * err_imu, (err_w, err_imu)

    # wheel slip: every 10th sample reads an absurd 15 m/s — the gate must
    # reject them (final state ≈ the clean-wheel run)
    ws_slip = np.full(n, 2.0, np.float32)
    ws_slip[::10] = 15.0
    f_s, _ = eskf_run(init, jnp.asarray(gyro), jnp.asarray(acc),
                      jnp.asarray(dts), *no_gnss,
                      wheel_speed=jnp.asarray(ws_slip),
                      wheel_valid=jnp.ones(n, bool), wheel_std=0.05)
    assert float(np.linalg.norm(np.asarray(f_s.p) - np.asarray(f_w.p))) < 0.3

    # plumbing: the LioTracker accepts wheel samples end to end
    lio = LioTracker(LioConfig(tracker=_tracker_cfg()))
    from lmsf_slam_tpu.common.pointcloud import PointBatch
    e = PointBatch.empty(384)
    s = PointBatch.empty(1152)
    lio.process_scan(e, s, 0.0)
    lio.process_scan(e, s, 0.1, gyro=gyro[:10], acc=acc[:10],
                     imu_dts=dts[:10], wheel_speeds=2.0)
    assert np.isfinite(np.asarray(lio.eskf.p)).all()


def test_system_gnss_prior_reaches_keyframe(skewed_scans):
    """A GNSS fix via process_gnss() lands on the next keyframe as a graph
    prior (LIG end-to-end: sensor fix → ESKF + absolute anchor)."""
    from lmsf_slam_tpu.backend import LoopConfig
    from lmsf_slam_tpu.system import FeatureParams, MultiLidarSystem, SystemConfig

    world, poses, imu, scans = skewed_scans
    cfg = SystemConfig(
        feature=FeatureParams(rings=16, width=360, edges_per_sector=4,
                              surfs_per_sector=12),
        tracker_window=8,
        registration=RegistrationParams(max_iters=8, max_corr_dist=2.0),
        keyframe_trans=0.01,  # every frame is a keyframe
        use_imu=True,
        loop=LoopConfig(min_frame_interval=10**9),
    )
    system = MultiLidarSystem(cfg)
    system.process(scans[0], 0.0)
    system.process_gnss(np.array([48.0, 11.0, 500.0]))
    gy, ac, dts = imu[1]
    system.process(scans[1], 0.1, gyro=gy, acc=ac, imu_dts=dts)
    db = system.backend.db
    assert db.n_keyframes == 2
    assert bool(db.gnss_valid[1]) and not bool(db.gnss_valid[0])
    # the anchor is the ENU origin (first fix): position ~0
    assert np.linalg.norm(db.gnss_pos[1]) < 1e-3
