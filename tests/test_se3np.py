"""Host numpy se3 mirror must agree with the device se3 implementation."""
import jax.numpy as jnp
import numpy as np

from lmsf_slam_tpu.common import se3, se3np

RNG = np.random.default_rng(3)


def _rand_pose():
    q = RNG.normal(size=4)
    q /= np.linalg.norm(q)
    return np.concatenate([q, RNG.normal(scale=5.0, size=3)]).astype(np.float32)


def _q_close(a, b, atol=1e-5):
    a, b = np.asarray(a), np.asarray(b)
    if np.dot(a[:4], b[:4]) < 0:
        b = np.concatenate([-b[:4], b[4:]])
    np.testing.assert_allclose(a, b, atol=atol)


def test_compose_between_inverse_match_device():
    for _ in range(10):
        a, b = _rand_pose(), _rand_pose()
        _q_close(
            se3np.pose_compose(a, b), se3.pose_compose(jnp.asarray(a), jnp.asarray(b))
        )
        _q_close(
            se3np.pose_between(a, b), se3.pose_between(jnp.asarray(a), jnp.asarray(b))
        )
        _q_close(se3np.pose_inverse(a), se3.pose_inverse(jnp.asarray(a)))


def test_exp_log_match_device():
    for scale in (1e-6, 1e-3, 0.5):
        xi = RNG.normal(scale=scale, size=6).astype(np.float32)
        _q_close(se3np.se3_exp(xi), se3.se3_exp(jnp.asarray(xi)), atol=1e-5)
        p = _rand_pose()
        np.testing.assert_allclose(
            se3np.pose_log(p), np.asarray(se3.pose_log(jnp.asarray(p))), atol=2e-4
        )
        _q_close(
            se3np.pose_retract(p, xi),
            se3.pose_retract(jnp.asarray(p), jnp.asarray(xi)),
            atol=1e-4,
        )


def test_so3_roundtrip():
    w = RNG.normal(scale=0.7, size=3)
    np.testing.assert_allclose(
        se3np.so3_log(se3np.so3_exp_quat(w)).ravel(), w, atol=1e-10
    )
