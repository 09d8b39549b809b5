"""Pallas fused k-NN: exact agreement with the XLA path (interpret mode on
CPU; the on-chip run is covered by tests/test_tpu.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from lmsf_slam_tpu.ops import neighbors
from lmsf_slam_tpu.ops.pallas_knn import knn_pallas

KEY = jax.random.PRNGKey(4)


def _case(Q=100, N=700, q_invalid=7, r_invalid=13, seed=0):
    kq, kr = jax.random.split(jax.random.fold_in(KEY, seed))
    q = jax.random.normal(kq, (Q, 3)) * 15.0
    r = jax.random.normal(kr, (N, 3)) * 15.0
    qm = jnp.arange(Q) >= q_invalid
    rm = jnp.arange(N) >= r_invalid
    return q, qm, r, rm


def test_matches_exact_reference():
    q, qm, r, rm = _case()
    d_ref, i_ref = neighbors.knn(q, qm, r, rm, k=5)
    d_p, i_p = knn_pallas(q, qm, r, rm, k=5, tq=32, tn=128, interpret=True)
    # identical candidate sets → identical sorted exact distances
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-5)
    # indices agree wherever distances are distinct
    dd = np.asarray(d_ref)
    distinct = np.diff(dd, axis=1, prepend=-1) > 1e-9
    np.testing.assert_array_equal(
        np.asarray(i_p)[distinct & (dd < 1e30)],
        np.asarray(i_ref)[distinct & (dd < 1e30)],
    )


def test_invalid_handling():
    q, qm, r, rm = _case(Q=40, N=300, q_invalid=5, r_invalid=295)
    # only 5 valid reference points < k=8 → padded slots must be INF
    d_p, i_p = knn_pallas(q, qm, r, rm, k=8, tq=32, tn=128, interpret=True)
    d_p = np.asarray(d_p)
    assert np.all(d_p[:5] >= neighbors.INF * 0.9)  # invalid queries
    valid_rows = d_p[5:]
    assert np.all(valid_rows[:, :5] < 1e6)
    assert np.all(valid_rows[:, 5:] >= neighbors.INF * 0.9)


def test_nonmultiple_shapes():
    q, qm, r, rm = _case(Q=77, N=333, q_invalid=0, r_invalid=0, seed=3)
    d_ref, i_ref = neighbors.knn(q, qm, r, rm, k=5)
    d_p, _ = knn_pallas(q, qm, r, rm, k=5, tq=32, tn=128, interpret=True)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-5)
