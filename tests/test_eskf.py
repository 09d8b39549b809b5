"""ESKF INS: synthetic IMU+GNSS tracking, bias convergence, static init,
GNSS LLA→ENU math. The reference's ins_node has no tests (SURVEY §4)."""
import jax
import jax.numpy as jnp
import numpy as np

from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.estimator import (
    EskfConfig,
    eskf_init_state,
    eskf_run,
    lla_to_ecef,
    lla_to_enu,
    make_enu_frame,
    static_initialize,
)

G = 9.81


def simulate_imu(n, hz=100.0, ba=None, bg=None, noise_acc=0.0, noise_gyro=0.0,
                 seed=0):
    """Planar figure-eight with yaw following heading; returns ground truth
    (p, v, q) and IMU measurements with optional bias + noise."""
    rng = np.random.RandomState(seed)
    dt = 1.0 / hz
    t = np.arange(n) * dt
    # smooth trajectory: lissajous in xy
    p = np.stack([10 * np.sin(0.2 * t), 6 * np.sin(0.4 * t), np.zeros_like(t)], 1)
    v = np.gradient(p, dt, axis=0)
    a_w = np.gradient(v, dt, axis=0)
    yaw = 0.3 * np.sin(0.25 * t)
    dyaw = np.gradient(yaw, dt)
    q = np.stack([np.cos(yaw / 2), 0 * yaw, 0 * yaw, np.sin(yaw / 2)], 1)
    ba = np.zeros(3) if ba is None else np.asarray(ba)
    bg = np.zeros(3) if bg is None else np.asarray(bg)
    acc_b = np.zeros((n, 3))
    gyro_b = np.zeros((n, 3))
    for i in range(n):
        R = np.asarray(se3.quat_to_matrix(jnp.asarray(q[i])))
        acc_b[i] = R.T @ (a_w[i] + np.array([0, 0, G])) + ba
        gyro_b[i] = R.T @ np.array([0, 0, dyaw[i]]) + bg
    acc_b += noise_acc * rng.randn(n, 3)
    gyro_b += noise_gyro * rng.randn(n, 3)
    return (p, v, q), (gyro_b.astype(np.float32), acc_b.astype(np.float32), dt)


def test_pure_imu_short_horizon():
    """Noise-free, bias-free IMU dead-reckoning stays tight over 2 s."""
    (p, v, q), (gyro, acc, dt) = simulate_imu(200)
    init = eskf_init_state()._replace(
        p=jnp.asarray(p[0]), v=jnp.asarray(v[0]), q=jnp.asarray(q[0])
    )
    dts = jnp.full(200, dt)
    final, traj = eskf_run(
        init, jnp.asarray(gyro), jnp.asarray(acc), dts,
        jnp.zeros((200, 3)), jnp.zeros(200, bool),
    )
    err = np.linalg.norm(np.asarray(traj[0]) - p, axis=1)
    assert err[-1] < 0.05, err[-1]


def test_gnss_fused_tracking_and_bias_convergence():
    ba = [0.05, -0.03, 0.02]
    bg = [0.002, 0.001, -0.003]
    n = 4000  # 40 s @ 100 Hz
    (p, v, q), (gyro, acc, dt) = simulate_imu(
        n, ba=ba, bg=bg, noise_acc=0.02, noise_gyro=0.002
    )
    rng = np.random.RandomState(1)
    gnss_valid = np.zeros(n, bool)
    gnss_valid[::100] = True  # 1 Hz fixes
    gnss = p + 0.03 * rng.randn(n, 3)
    init = eskf_init_state()._replace(
        p=jnp.asarray(p[0]), v=jnp.asarray(v[0]), q=jnp.asarray(q[0])
    )
    final, traj = eskf_run(
        init, jnp.asarray(gyro), jnp.asarray(acc), jnp.full(n, dt),
        jnp.asarray(gnss), jnp.asarray(gnss_valid), gnss_std=0.05,
        config=EskfConfig(acc_noise=0.02, gyro_noise=0.002),
    )
    perr = np.linalg.norm(np.asarray(traj[0]) - p, axis=1)
    assert perr[n // 2:].max() < 0.25, perr[n // 2:].max()
    # biases converge toward the injected values
    # accel bias is weakly observable under mild planar excitation —
    # require convergence toward truth, tight gyro bias
    assert np.linalg.norm(np.asarray(final.ba) - ba) < 0.6 * np.linalg.norm(ba)
    assert np.linalg.norm(np.asarray(final.bg) - bg) < 0.002
    # covariance stays positive and bounded
    cov_d = np.asarray(traj[2])
    assert (cov_d > 0).all() and cov_d[-1, :3].max() < 0.1


def test_static_initialization():
    rng = np.random.RandomState(2)
    # body tilted 10° about x: gravity reads along the tilted axis
    q_true = se3.so3_exp_quat(jnp.asarray([np.deg2rad(10.0), 0.0, 0.0]))
    R = np.asarray(se3.quat_to_matrix(q_true))
    bg = np.array([0.01, -0.005, 0.002])
    acc = (R.T @ np.array([0, 0, G]))[None, :] + 0.01 * rng.randn(200, 3)
    gyro = bg[None, :] + 0.001 * rng.randn(200, 3)
    state, still = static_initialize(jnp.asarray(acc, jnp.float32),
                                     jnp.asarray(gyro, jnp.float32))
    assert bool(still)
    np.testing.assert_allclose(np.asarray(state.bg), bg, atol=2e-3)
    # initialized attitude maps measured gravity to nav +z
    g_n = se3.quat_rotate(state.q, jnp.asarray(acc.mean(0), jnp.float32))
    assert float(jnp.linalg.norm(g_n[:2])) < 0.05
    assert float(g_n[2]) > 9.5
    # moving IMU is rejected
    acc_moving = acc + np.linspace(0, 5, 200)[:, None]
    _, still2 = static_initialize(jnp.asarray(acc_moving, jnp.float32),
                                  jnp.asarray(gyro, jnp.float32))
    assert not bool(still2)


def test_lla_enu_roundtrip_scale():
    ref = np.array([48.0, 11.0, 500.0])
    frame = make_enu_frame(ref)
    # meridian arc: 1e-3 deg lat at 48 deg = (M(48)+alt)*1.745e-5 = 111.20 m
    north = lla_to_enu(frame, np.array([48.001, 11.0, 500.0]))
    assert abs(float(north[1]) - 111.20) < 0.05 and abs(float(north[0])) < 0.01
    up = lla_to_enu(frame, np.array([48.0, 11.0, 510.0]))
    assert abs(float(up[2]) - 10.0) < 0.01
    # ECEF magnitude sanity
    assert 6.3e6 < float(np.linalg.norm(lla_to_ecef(ref))) < 6.4e6
    # origin maps to ~0
    zero = lla_to_enu(frame, ref)
    assert float(np.linalg.norm(zero)) < 1e-6
    # centimeter-scale resolution survives (the reason this math is f64 host)
    cm = lla_to_enu(frame, np.array([48.0, 11.0 + 1.5e-7, 500.0]))
    assert 0.005 < float(cm[0]) < 0.02
