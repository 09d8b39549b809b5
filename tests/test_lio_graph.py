"""LIO factor graph: preintegration factors + lidar pose priors over a
pose/velocity/bias window (imuPreintegration_node.cpp semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsf_slam_tpu.backend.lio_graph import FactorGraphLio, LioGraphParams
from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.estimator.preintegration import preintegrate
from tests.test_lio import SCAN_HZ, analytic_state, make_streams


def _preintegrated(imu_window, bias_g=None, bias_a=None):
    gy, ac, dts = imu_window
    if bias_g is not None:
        gy = gy + np.asarray(bias_g, np.float32)
    if bias_a is not None:
        ac = ac + np.asarray(bias_a, np.float32)
    return preintegrate(
        jnp.asarray(gy), jnp.asarray(ac), jnp.asarray(dts),
        jnp.ones(len(gy), bool), jnp.zeros(3), jnp.zeros(3),
    )


@pytest.mark.slow
def test_clean_imu_exact_priors_stay_put():
    """Noise-free factors: the solution must sit at ground truth (chi2≈0)."""
    n = 10
    poses, imu = make_streams(n + 1)
    fg = FactorGraphLio(window=16)
    # anchor at the true first state
    fg.poses[0] = poses[0]
    _, v0, _, _, _ = analytic_state(0.0)
    fg.vels[0] = v0
    fg.priors = [(0, poses[0].copy())]
    for i in range(n):
        pre = _preintegrated(imu[i])
        pose, vel = fg.add_scan(pre, poses[i + 1])
        err = np.linalg.norm(pose[4:] - poses[i + 1][4:])
        assert err < 0.02, (i, err)
    _, v_end, _, _, _ = analytic_state(n / SCAN_HZ)
    assert np.linalg.norm(fg.vels[fg.n - 1] - v_end) < 0.05
    assert float(fg.last_stats.chi2_final) < float(fg.last_stats.chi2_initial) + 1e-3


def test_bias_estimation_from_graph():
    """A constant gyro bias in the IMU stream is recovered by the graph from
    the disagreement between preintegration factors and lidar priors."""
    n = 14
    poses, imu = make_streams(n + 1)
    bg_true = np.array([0.02, -0.015, 0.03], np.float32)
    fg = FactorGraphLio(window=16)
    fg.poses[0] = poses[0]
    _, v0, _, _, _ = analytic_state(0.0)
    fg.vels[0] = v0
    fg.priors = [(0, poses[0].copy())]
    rng = np.random.RandomState(0)
    for i in range(n):
        pre = _preintegrated(imu[i], bias_g=bg_true)
        # mm/mrad-class prior noise (what scan-to-map registration actually
        # delivers); a 0.1 s window carries only bg*dt ≈ 2-3 mrad of bias
        # signal, so cm-class prior noise would be beyond observability
        noisy_prior = np.asarray(
            se3.pose_retract(jnp.asarray(poses[i + 1]),
                             jnp.asarray(rng.randn(6) * 0.001, jnp.float32))
        )
        fg.add_scan(pre, noisy_prior)
    bg_est = fg.bgs[fg.n - 1]
    assert np.linalg.norm(bg_est - bg_true) < 0.15 * np.linalg.norm(bg_true), (
        bg_est, bg_true
    )


@pytest.mark.slow
def test_window_reset_keeps_tracking():
    """Filling the window triggers the periodic re-anchor (ref :380-408)
    without breaking the trajectory estimate."""
    n = 14
    poses, imu = make_streams(n + 1)
    fg = FactorGraphLio(window=8)
    fg.poses[0] = poses[0]
    _, v0, _, _, _ = analytic_state(0.0)
    fg.vels[0] = v0
    fg.priors = [(0, poses[0].copy())]
    for i in range(n):
        pre = _preintegrated(imu[i])
        pose, _ = fg.add_scan(pre, poses[i + 1])
        assert np.linalg.norm(pose[4:] - poses[i + 1][4:]) < 0.05
    assert fg.n <= 8  # at least one reset happened


def test_failure_detection_resets():
    n = 3
    poses, imu = make_streams(n + 1)
    fg = FactorGraphLio(window=8, max_velocity=0.01)  # absurdly tight gate
    fg.priors = [(0, poses[0].copy())]
    pre = _preintegrated(imu[1])
    fg.add_scan(pre, poses[2])
    assert fg.resets >= 1
