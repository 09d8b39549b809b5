"""Closed-form batched 3×3 symmetric eigendecomposition.

``jnp.linalg.eigh`` lowers to an iterative (while-loop) routine that XLA
cannot fuse; measured on one v5e chip, inserting it into the fused
association pipeline costs +25 ms per 8k-point batch even though the
standalone op is ~0.04 ms. The registration hot path only ever needs
eigenpairs of tiny symmetric PSD matrices (5-NN covariances, NDT voxel
covariances), so we use the analytic trigonometric solution (Smith 1961) —
branch-free elementwise VPU ops that fuse into the surrounding kernel.

Convention matches ``jnp.linalg.eigh``: eigenvalues ascending, eigenvectors
in the *columns* of the returned matrix.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def sym_eigvals3(A: jax.Array) -> jax.Array:
    """Eigenvalues (ascending) of symmetric (..., 3, 3) matrices."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, _EPS))
    # det(B)/2 where B = (A - qI)/p
    detB = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    ) / (p * p * p)
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    # p2 ≈ 0 → matrix is (numerically) q·I
    iso = p2 < 1e-12
    e = jnp.stack([e_lo, e_mid, e_hi], axis=-1)
    return jnp.where(iso[..., None], jnp.stack([q, q, q], -1), e)


def _eigvec_for(A: jax.Array, lam: jax.Array) -> jax.Array:
    """Unit eigenvector of symmetric (...,3,3) A for eigenvalue lam (...,).

    Rows of (A − λI) span the orthogonal complement of the eigenspace; the
    eigenvector is the largest cross product of row pairs. Branch-free: pick
    by norm, with a deterministic fallback axis when all crosses vanish
    (isotropic / repeated-eigenvalue case — callers gate those out).
    """
    B = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = B[..., 0, :], B[..., 1, :], B[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    ns = jnp.stack([n01, n02, n12], axis=-1)
    cs = jnp.stack([c01, c02, c12], axis=-2)
    best = jnp.argmax(ns, axis=-1)
    v = jnp.take_along_axis(cs, best[..., None, None].repeat(3, -1), axis=-2)[
        ..., 0, :
    ]
    nrm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    fallback = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0], A.dtype), v.shape
    )
    return jnp.where(nrm > 1e-10, v / jnp.maximum(nrm, _EPS), fallback)


def _any_orthogonal(v: jax.Array) -> jax.Array:
    """A unit vector orthogonal to v (branch-free axis choice)."""
    ez = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], v.dtype), v.shape)
    ey = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], v.dtype), v.shape)
    a = jnp.cross(v, ez)
    an = jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = jnp.cross(v, ey)
    bn = jnp.linalg.norm(b, axis=-1, keepdims=True)
    return jnp.where(
        an > 1e-6, a / jnp.maximum(an, _EPS), b / jnp.maximum(bn, _EPS)
    )


def sym_eigh3(A: jax.Array):
    """(eigvals ascending (...,3), eigvecs (...,3,3) column-major).

    The extremal eigenvector with the larger eigen-gap is the reliable one
    (cross-product extraction degrades as its eigenvalue clusters with a
    neighbor), so it anchors the frame; the other extremal vector is
    Gram-Schmidt'ed against it, and the middle eigenvector closes the
    orthonormal triad. This keeps the rank-1 (edge/line) and rank-2 (plane)
    covariance cases — exactly the SLAM association workloads — correct.
    """
    w = sym_eigvals3(A)
    v_lo_raw = _eigvec_for(A, w[..., 0])
    v_hi_raw = _eigvec_for(A, w[..., 2])
    hi_primary = (w[..., 2] - w[..., 1]) >= (w[..., 1] - w[..., 0])
    hp = hi_primary[..., None]
    prim = jnp.where(hp, v_hi_raw, v_lo_raw)
    sec = jnp.where(hp, v_lo_raw, v_hi_raw)
    sec = sec - jnp.sum(sec * prim, -1, keepdims=True) * prim
    nrm = jnp.linalg.norm(sec, axis=-1, keepdims=True)
    sec = jnp.where(
        nrm > 1e-6, sec / jnp.maximum(nrm, _EPS), _any_orthogonal(prim)
    )
    v_lo = jnp.where(hp, sec, prim)
    v_hi = jnp.where(hp, prim, sec)
    v_mid = jnp.cross(v_hi, v_lo)
    V = jnp.stack([v_lo, v_mid, v_hi], axis=-1)  # columns
    return w, V


def chol_solve6(H: jax.Array, b: jax.Array) -> jax.Array:
    """Solve the SPD 6×6 system H x = b by fully unrolled Cholesky.

    ``jnp.linalg.eigh``/``solve`` on a single 6×6 dispatch XLA's generic
    decomposition paths, which cost ~0.6 ms on a TPU chip — longer than an
    entire k-NN association sweep. Unrolling the 6×6 factorization into
    scalar graph ops lets XLA fuse it into the surrounding program for
    effectively zero cost. Used by every GN iteration of the registration
    solvers (one 6×6 solve per iteration).
    """
    n = 6
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = H[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution Lᵀ x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)
