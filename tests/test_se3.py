import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsf_slam_tpu.common import se3


def rand_pose(key, scale_rot=1.0, scale_t=1.0):
    k1, k2 = jax.random.split(key)
    w = jax.random.normal(k1, (3,)) * scale_rot
    t = jax.random.normal(k2, (3,)) * scale_t
    return se3.make_pose(se3.so3_exp_quat(w), t)


def test_quat_rotate_matches_matrix():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (17, 3))
    q = se3.so3_exp_quat(w)
    R = se3.quat_to_matrix(q)
    v = jax.random.normal(jax.random.PRNGKey(1), (17, 3))
    np.testing.assert_allclose(
        se3.quat_rotate(q, v), jnp.einsum("bij,bj->bi", R, v), atol=1e-5
    )


def test_matrix_quat_roundtrip():
    key = jax.random.PRNGKey(2)
    # include near-pi rotations (hard case for Shepperd)
    w = jax.random.normal(key, (64, 3))
    w = w / jnp.linalg.norm(w, axis=-1, keepdims=True) * jnp.linspace(0.01, 3.1, 64)[:, None]
    q = se3.so3_exp_quat(w)
    q2 = se3.matrix_to_quat(se3.quat_to_matrix(q))
    np.testing.assert_allclose(np.abs(np.sum(np.asarray(q * q2), -1)), 1.0, atol=1e-5)


def test_so3_exp_log_roundtrip():
    key = jax.random.PRNGKey(3)
    w = jax.random.normal(key, (32, 3))
    w = w / jnp.linalg.norm(w, axis=-1, keepdims=True) * jnp.linspace(1e-6, 3.0, 32)[:, None]
    np.testing.assert_allclose(se3.so3_log(se3.so3_exp_quat(w)), w, atol=1e-5)


def test_se3_exp_log_roundtrip():
    key = jax.random.PRNGKey(4)
    xi = jax.random.normal(key, (32, 6))
    # keep rotation below pi so log is the exact inverse
    w = xi[:, :3]
    w = w / jnp.linalg.norm(w, axis=-1, keepdims=True) * jnp.linspace(1e-4, 2.9, 32)[:, None]
    xi = xi.at[:, :3].set(w)
    np.testing.assert_allclose(se3.pose_log(se3.se3_exp(xi)), xi, atol=3e-5)


def test_se3_exp_small_angle():
    xi = jnp.array([1e-9, 0, 0, 1.0, 2.0, 3.0])
    p = se3.se3_exp(xi)
    np.testing.assert_allclose(se3.pose_trans(p), [1.0, 2.0, 3.0], atol=1e-6)


def test_compose_inverse_identity():
    p = rand_pose(jax.random.PRNGKey(5))
    ident = se3.pose_compose(p, se3.pose_inverse(p))
    np.testing.assert_allclose(ident, se3.pose_identity(), atol=1e-5)


def test_pose_apply_compose_consistency():
    a = rand_pose(jax.random.PRNGKey(6))
    b = rand_pose(jax.random.PRNGKey(7))
    pts = jax.random.normal(jax.random.PRNGKey(8), (10, 3))
    ab = se3.pose_compose(a, b)
    np.testing.assert_allclose(
        se3.pose_apply(ab, pts), se3.pose_apply(a, se3.pose_apply(b, pts)), atol=1e-5
    )


def test_between():
    a = rand_pose(jax.random.PRNGKey(9))
    b = rand_pose(jax.random.PRNGKey(10))
    d = se3.pose_between(a, b)
    np.testing.assert_allclose(se3.pose_compose(a, d), b, atol=1e-5)


def test_retract_zero():
    p = rand_pose(jax.random.PRNGKey(11))
    np.testing.assert_allclose(se3.pose_retract(p, jnp.zeros(6)), p, atol=1e-6)


def test_pose_matrix_roundtrip():
    p = rand_pose(jax.random.PRNGKey(12))
    p2 = se3.matrix_to_pose(se3.pose_to_matrix(p))
    np.testing.assert_allclose(p, p2, atol=1e-5)


def test_pose_interp_endpoints():
    a = rand_pose(jax.random.PRNGKey(13))
    b = rand_pose(jax.random.PRNGKey(14))
    np.testing.assert_allclose(se3.pose_interp(a, b, 0.0), a, atol=1e-5)
    np.testing.assert_allclose(se3.pose_interp(a, b, 1.0), b, atol=1e-4)


def test_jit_and_vmap():
    keys = jax.random.split(jax.random.PRNGKey(15), 8)
    poses = jax.vmap(rand_pose)(keys)
    f = jax.jit(jax.vmap(se3.pose_inverse))
    inv = f(poses)
    ident = jax.vmap(se3.pose_compose)(poses, inv)
    np.testing.assert_allclose(ident, np.tile(se3.pose_identity(), (8, 1)), atol=1e-5)
