"""Analytic 3×3 symmetric eigendecomposition vs jnp.linalg.eigh."""
import jax
import jax.numpy as jnp
import numpy as np

from lmsf_slam_tpu.ops import mat3


def _random_spd(key, n):
    a = jax.random.normal(key, (n, 3, 3))
    return a @ a.transpose(0, 2, 1) + 1e-3 * jnp.eye(3)


def test_eigvals_match_lapack():
    A = _random_spd(jax.random.PRNGKey(0), 512)
    w = mat3.sym_eigvals3(A)
    w_ref = jnp.linalg.eigvalsh(A)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), rtol=2e-4, atol=2e-4)


def test_eigvecs_are_eigvecs():
    A = _random_spd(jax.random.PRNGKey(1), 512)
    w, V = mat3.sym_eigh3(A)
    # A v = λ v for each column
    Av = jnp.einsum("nij,njk->nik", A, V)
    lV = w[:, None, :] * V
    np.testing.assert_allclose(np.asarray(Av), np.asarray(lV), atol=5e-3)
    # orthonormal columns
    VtV = jnp.einsum("nij,nik->njk", V, V)
    np.testing.assert_allclose(
        np.asarray(VtV), np.tile(np.eye(3), (512, 1, 1)), atol=1e-4
    )


def test_degenerate_line_covariance():
    """Rank-1 covariance (all points on a line) — the edge-feature case."""
    d = jnp.asarray([1.0, 2.0, -0.5])
    d = d / jnp.linalg.norm(d)
    A = jnp.outer(d, d)[None] * 4.0
    w, V = mat3.sym_eigh3(A)
    np.testing.assert_allclose(np.asarray(w[0]), [0.0, 0.0, 4.0], atol=1e-5)
    # largest eigenvector is the line direction (up to sign)
    v = np.asarray(V[0, :, 2])
    assert abs(abs(v @ np.asarray(d)) - 1.0) < 1e-4


def test_isotropic():
    A = jnp.tile(2.5 * jnp.eye(3), (4, 1, 1))
    w, V = mat3.sym_eigh3(A)
    np.testing.assert_allclose(np.asarray(w), 2.5, atol=1e-5)
    assert np.isfinite(np.asarray(V)).all()


def test_plane_covariance():
    """Rank-2 covariance (points on a plane) — smallest eigvec is the normal."""
    key = jax.random.PRNGKey(2)
    pts = jax.random.normal(key, (256, 3)) * jnp.asarray([3.0, 2.0, 0.0])
    n_true = jnp.asarray([0.0, 0.0, 1.0])
    cov = (pts.T @ pts / 256)[None]
    w, V = mat3.sym_eigh3(cov)
    v = np.asarray(V[0, :, 0])
    assert abs(abs(v @ np.asarray(n_true)) - 1.0) < 1e-4
