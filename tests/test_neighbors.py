import jax
import jax.numpy as jnp
import numpy as np

from lmsf_slam_tpu.common.pointcloud import PointBatch
from lmsf_slam_tpu.ops import neighbors


def brute_knn_np(q, ref, k):
    d = ((q[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=1)[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def test_knn_matches_numpy():
    rng = np.random.RandomState(0)
    q = rng.randn(37, 3).astype(np.float32) * 5
    ref = rng.randn(513, 3).astype(np.float32) * 5
    d, i = neighbors.knn(
        jnp.asarray(q), jnp.ones(37, bool), jnp.asarray(ref), jnp.ones(513, bool),
        k=5, tile=128,
    )
    dn, _ = brute_knn_np(q, ref, 5)
    np.testing.assert_allclose(np.sort(np.asarray(d), 1), np.sort(dn, 1), atol=1e-3)
    # indices give the same distances
    gd = ((q[:, None] - ref[np.asarray(i)]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d), gd, atol=1e-3)


def test_knn_respects_masks():
    q = jnp.zeros((4, 3))
    ref = jnp.array([[0.1, 0, 0], [100, 0, 0], [0.2, 0, 0]])
    ref_mask = jnp.array([False, True, True])
    d, i = neighbors.knn(q, jnp.ones(4, bool), ref, ref_mask, k=2, tile=2)
    # nearest valid is index 2 (0.2), then index 1 (100)
    assert np.all(np.asarray(i[:, 0]) == 2)
    np.testing.assert_allclose(np.asarray(d[:, 0]), 0.04, atol=1e-5)
    # masked query rows get INF
    d2, _ = neighbors.knn(q, jnp.zeros(4, bool), ref, ref_mask, k=2, tile=2)
    assert np.all(np.asarray(d2) > 1e30)


def test_nn1_and_radius_count():
    ref = jnp.array([[0.0, 0, 0], [1, 0, 0], [2, 0, 0], [10, 0, 0]])
    q = jnp.array([[0.9, 0, 0]])
    d, i = neighbors.nn1(q, jnp.ones(1, bool), ref, jnp.ones(4, bool))
    assert int(i[0]) == 1
    np.testing.assert_allclose(float(d[0]), 0.01, atol=1e-6)
    c = neighbors.radius_count(q, jnp.ones(1, bool), ref, jnp.ones(4, bool), 1.5)
    assert int(c[0]) == 3
