"""Hand-eye calibration: recover a known lidar-lidar extrinsic from motion.

The reference's only calibration 'test' prints screw angles for hand
inspection (`src/test/handeye_calib_test.cpp`, SURVEY §4); these are the
asserting replacements.
"""
import jax
import jax.numpy as jnp
import numpy as np

from lmsf_slam_tpu.calibration import (
    HandEyeConfig,
    handeye_add_pair,
    handeye_init,
    handeye_solve,
)
from lmsf_slam_tpu.common import se3

KEY = jax.random.PRNGKey(21)


def make_motion_pairs(extrinsic, n, key, noise=0.0, planar=False):
    """Primary increments A_i and sub increments B_i = X⁻¹ A_i X."""
    inv_x = se3.pose_inverse(extrinsic)
    pairs = []
    for i in range(n):
        k = jax.random.fold_in(key, i)
        w = jax.random.uniform(k, (3,), minval=-0.3, maxval=0.3)
        if planar:
            w = w.at[:2].set(0.0)  # yaw-only rotation
        v = jax.random.uniform(jax.random.fold_in(k, 1), (3,), minval=-0.5, maxval=0.5)
        a = se3.se3_exp(jnp.concatenate([w, v]))
        b = se3.pose_compose(inv_x, se3.pose_compose(a, extrinsic))
        if noise > 0:
            kb = jax.random.fold_in(k, 2)
            b = se3.pose_retract(b, noise * jax.random.normal(kb, (6,)))
        pairs.append((a, b))
    return pairs


def run_calib(pairs, cfg=HandEyeConfig()):
    state = handeye_init(cfg)
    for a, b in pairs:
        state = handeye_add_pair(state, a, b, cfg)
    return handeye_solve(state, cfg), state


def test_recovers_known_extrinsic_exact():
    x_true = se3.make_pose(
        se3.so3_exp_quat(jnp.asarray([0.1, -0.2, 0.8])), jnp.asarray([0.5, -1.2, 0.3])
    )
    res, state = run_calib(make_motion_pairs(x_true, 40, KEY))
    assert bool(res.ok)
    err = se3.pose_between(res.extrinsic, x_true)
    assert float(jnp.linalg.norm(se3.pose_trans(err))) < 1e-4
    assert float(jnp.linalg.norm(se3.so3_log(se3.pose_quat(err)))) < 1e-5


def test_recovers_extrinsic_under_noise():
    x_true = se3.make_pose(
        se3.so3_exp_quat(jnp.asarray([0.0, 0.0, 1.57])), jnp.asarray([1.0, 0.0, 0.2])
    )
    cfg = HandEyeConfig(screw_rot_tol=0.05, screw_trans_tol=0.1)
    res, _ = run_calib(make_motion_pairs(x_true, 120, KEY, noise=3e-3), cfg)
    assert bool(res.ok)
    err = se3.pose_between(res.extrinsic, x_true)
    # VERDICT target: < 1 cm translation, < 0.5° rotation
    assert float(jnp.linalg.norm(se3.pose_trans(err))) < 0.01
    assert float(jnp.linalg.norm(se3.so3_log(se3.pose_quat(err)))) < np.deg2rad(0.5)


def test_planar_motion_is_degenerate():
    """Yaw-only rotations leave the z-component unobservable — the
    degeneracy gate must refuse (`handeye_calibration_base.hpp:113-148`)."""
    x_true = se3.make_pose(
        se3.so3_exp_quat(jnp.asarray([0.05, 0.1, 0.3])), jnp.asarray([0.4, 0.1, 0.7])
    )
    res, _ = run_calib(make_motion_pairs(x_true, 60, KEY, planar=True))
    assert not bool(res.ok)
    assert float(res.quality) < 0.25


def test_screw_check_rejects_mismatched_pairs():
    x_true = se3.make_pose(se3.quat_identity(), jnp.asarray([0.5, 0.0, 0.0]))
    cfg = HandEyeConfig()
    state = handeye_init(cfg)
    # a pair whose rotations disagree: not a rigid-link motion
    a = se3.se3_exp(jnp.asarray([0.0, 0.0, 0.3, 0.5, 0.0, 0.0], jnp.float32))
    b = se3.se3_exp(jnp.asarray([0.0, 0.0, 0.1, 0.5, 0.0, 0.0], jnp.float32))
    state = handeye_add_pair(state, a, b, cfg)
    assert int(jnp.sum(state.mask)) == 0
    # and a tiny-rotation pair is rejected too (no signal)
    a2 = se3.se3_exp(jnp.asarray([0, 0, 0.001, 0.5, 0, 0], jnp.float32))
    state = handeye_add_pair(state, a2, a2, cfg)
    assert int(jnp.sum(state.mask)) == 0
