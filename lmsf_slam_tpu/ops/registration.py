"""Scan-to-map registration as fused Gauss-Newton loops on TPU.

Covers all three registration methods of the reference factory
(`inc/factory/System/ML_SystemFactory.hpp:151-191`:
``feature_based`` / ``sparse_point_plane_icp`` / ``ndt``):

- edge/surf feature GN (`edgeSurfFeatureRegistration.hpp`,
  `ceres_edgeSurfFeatureRegistration.hpp`): 5-NN PCA line fit + point-to-line
  residual (`EdgeFeatureMatch.hpp:33-87`), 5-NN LSQ plane fit +
  point-to-plane residual (`surfFeatureMatch.hpp:32-88`), degeneracy
  detection via eigen-decomposition of JᵀJ with sub-100-eigenvalue direction
  removal (`edgeSurfFeatureRegistration.hpp:280-308`);
- point-to-plane ICP: the surf path applied to an unstructured map;
- NDT: per-voxel Gaussian Mahalanobis residuals (replaces ndt_omp).

TPU design: association is MXU brute-force k-NN (ops.neighbors); line/plane
fits are closed-form batched 3×3 eigen/solves; each GN iteration reduces a
(N,6) Jacobian into 6×6 normal equations with one einsum; the whole
iterate-associate-solve loop is a single ``lax.scan`` — one XLA program per
registration call, no host round-trips.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..common import se3
from ..common.pointcloud import PointBatch
from . import mat3, neighbors, voxel  # noqa: F401 (voxel: NDT gaussians)


class RegistrationParams(NamedTuple):
    max_iters: int = 10
    k_neighbors: int = 5
    max_corr_dist: float = 1.0  # association gate (m)
    edge_eig_ratio: float = 3.0  # line validity: λ_max > ratio·λ_mid
    plane_tol: float = 0.2  # plane validity: all fit pts within (m)
    huber_delta: float = 0.5  # robust loss scale (m)
    # adaptive trimming: zero out residuals beyond trim_rel × median |r|
    # (re-evaluated per GN iteration; see the trimmed-GN block in
    # register_edge_surf). 0 disables. trim_floor bounds the cut from
    # below so a converged noise-level median never trims inliers.
    trim_rel: float = 0.0
    trim_floor: float = 0.5
    # first GN iteration at which trimming applies: early iterations have
    # legitimately large residuals (convergence transient — trimming them
    # destroys the solve); a mover's residuals are IRREDUCIBLE, still
    # standing out once the static majority has settled
    trim_after: int = 4
    degen_thresh: float = 100.0  # eigenvalue floor of JᵀJ (ref: 100)
    # match-count-normalized degeneracy floor: when > 0 the eigenvalue floor
    # becomes ``degen_rel · n_matches`` instead of the absolute
    # ``degen_thresh``. The reference's 100 is calibrated to its raw dense
    # scans (tens of thousands of residuals); eigenvalues of JᵀJ scale
    # linearly with match count (a well-constrained direction contributes
    # ~0.3 per match), so at down-selected feature density an absolute
    # floor misreads marginal-but-real constraints as degenerate (measured:
    # loop verification at sim density reports 4-5/6 constrained under
    # floor 100 with ~900 matches — eigenvalues ~100-300 — where 0.01/match
    # → floor 9 correctly reports 6/6). Density-independent, so it is the
    # DEFAULT (round-5: a 16×360 scan at default params froze translation —
    # nc=3 at ~340 matches — and the tracker held identity forever; the
    # absolute floor is kept only as the explicit opt-out ``degen_rel=0``
    # for reference-density raw-scan regimes).
    degen_rel: float = 0.01
    damping: float = 1e-4  # LM-style diagonal damping
    trans_converged: float = 5e-4  # m   (ref: 0.05 cm)
    rot_converged: float = 1e-3  # rad (ref: 0.05°)
    # association cadence: correspondences are rebuilt every this many GN
    # iterations and reused in between (the reference's Ceres solver runs 4
    # inner iterations per association, `ceres_edgeSurfFeatureRegistration
    # .hpp:96-130`); k-NN association is the HBM-bound hot stage, so cadence
    # 2 halves its cost at no measured accuracy loss.
    reassociate_every: int = 2


class RegistrationResult(NamedTuple):
    pose: jax.Array  # (7,)
    converged: jax.Array  # bool
    iterations: jax.Array  # int32 — iterations until convergence
    num_matches: jax.Array  # int32 — valid correspondences at final iter
    final_cost: jax.Array  # mean robust cost
    n_constrained: jax.Array  # int32 — eigendirections of JᵀJ above the
    # degeneracy floor at the last active iteration; < 6 means the solution
    # is unconstrained along some motion (e.g. ground-plane-only match:
    # x/y/yaw free). Loop-closure verification requires 6.


# ---------------------------------------------------------------------------
# Correspondence builders → per-point (normal, offset, valid)
# residual model: r_i = n_i · p_world_i + d_i
# ---------------------------------------------------------------------------


def _edge_correspondences(p_world, q_mask, map_pb: PointBatch, params):
    """Point-to-line: 5-NN PCA; returns unit normal toward the line and
    offset so that r = n·p + d is the point-line distance."""
    dists, idx = neighbors.knn(
        p_world, q_mask, map_pb.xyz, map_pb.mask, k=params.k_neighbors
    )
    nbr = map_pb.xyz[idx]  # (N,k,3)
    nvalid = dists < neighbors.INF
    k = params.k_neighbors
    wsum = jnp.maximum(jnp.sum(nvalid, axis=1, keepdims=True), 1)
    centroid = jnp.sum(jnp.where(nvalid[..., None], nbr, 0), axis=1) / wsum
    diff = jnp.where(nvalid[..., None], nbr - centroid[:, None, :], 0)
    cov = jnp.einsum("nki,nkj->nij", diff, diff) / wsum[..., None]
    eigval, eigvec = mat3.sym_eigh3(cov)  # ascending, fused analytic
    direction = eigvec[..., 2]  # largest
    line_ok = eigval[:, 2] > params.edge_eig_ratio * jnp.maximum(eigval[:, 1], 1e-9)
    # perpendicular residual direction
    pc = p_world - centroid
    along = jnp.sum(pc * direction, axis=-1, keepdims=True)
    perp = pc - along * direction
    dist_line = jnp.linalg.norm(perp, axis=-1)
    n = perp / jnp.maximum(dist_line[:, None], 1e-9)
    d = -jnp.sum(n * (p_world - perp), axis=-1)  # foot point on the line
    valid = (
        q_mask
        & line_ok
        & (jnp.sum(nvalid, axis=1) >= k)
        & (dists[:, k - 1] < params.max_corr_dist**2)
    )
    # zero invalid lanes so padded/degenerate fits cannot poison reductions
    n = jnp.where(valid[:, None], jnp.nan_to_num(n), 0.0)
    d = jnp.where(valid, jnp.nan_to_num(d), 0.0)
    return n, d, valid


def _surf_correspondences(p_world, q_mask, map_pb: PointBatch, params):
    """Point-to-plane via PCA plane fit of the 5-NN.

    The reference fits A·n = −1 (`surfFeatureMatch.hpp:32-88`), a
    parametrization that cannot represent planes through the origin; the PCA
    fit (centroid + smallest-eigenvector normal) covers all planes and shares
    the eigh machinery of the edge path.
    """
    dists, idx = neighbors.knn(
        p_world, q_mask, map_pb.xyz, map_pb.mask, k=params.k_neighbors
    )
    nbr = map_pb.xyz[idx]
    nvalid = dists < neighbors.INF
    k = params.k_neighbors
    w = nvalid.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
    centroid = jnp.sum(nbr * w[..., None], axis=1) / wsum
    diff = (nbr - centroid[:, None, :]) * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", diff, diff) / wsum[..., None]
    eigval, eigvec = mat3.sym_eigh3(cov)
    n = eigvec[..., 0]  # smallest eigenvalue direction = plane normal
    d = -jnp.sum(n * centroid, axis=-1)
    # planarity: every neighbor within plane_tol of the plane
    pd = jnp.abs(jnp.einsum("nki,ni->nk", nbr, n) + d[:, None])
    plane_ok = jnp.all(jnp.where(nvalid, pd < params.plane_tol, True), axis=1)
    valid = (
        q_mask
        & plane_ok
        & (jnp.sum(nvalid, axis=1) >= k)
        & (dists[:, k - 1] < params.max_corr_dist**2)
    )
    n = jnp.where(valid[:, None], jnp.nan_to_num(n), 0.0)
    d = jnp.where(valid, jnp.nan_to_num(d), 0.0)
    return n, d, valid


def _gn_normal_equations(p_src, n, r, w, R):
    """Accumulate H (6,6), g (6,) for residuals r = n·(R p + t) + d under the
    right perturbation T·exp(ξ): δr = ω·(p × Rᵀn) + (Rᵀn)·v, so the row is
    J = [p × Rᵀn, Rᵀn]."""
    nR = jnp.einsum("ni,ij->nj", n, R)  # (Rᵀn)ᵀ per point
    Jrot = jnp.cross(p_src, nR)
    J = jnp.concatenate([Jrot, nR], axis=-1)  # (N,6)
    H = jnp.einsum("ni,nj,n->ij", J, J, w)
    g = jnp.einsum("ni,n->i", J, r * w)
    return H, g


def _huber_w(r, delta):
    a = jnp.abs(r)
    return jnp.where(a <= delta, 1.0, delta / jnp.maximum(a, 1e-12))


def _solve_degenerate(H, g, params):
    """Solve H x = -g, zeroing update components along degenerate directions
    (eigenvalue < degen_thresh), per `edgeSurfFeatureRegistration.hpp:280-308`."""
    eigval, eigvec = jnp.linalg.eigh(H + params.damping * jnp.eye(6))
    ok = eigval > params.degen_thresh
    inv = jnp.where(ok, 1.0 / jnp.maximum(eigval, 1e-9), 0.0)
    x = -eigvec @ (inv * (eigvec.T @ g))
    return x, jnp.sum(ok)


def _degeneracy_projector(H, params, nmatch=None):
    """Eigen-analysis of JᵀJ → (projector onto well-constrained directions,
    count of constrained directions). Computed ONCE at the first iteration
    and frozen — matching LOAM/the reference's degeneracy handling, which
    eigendecomposes only on iterCount==0 (`mapOptmization_node.cpp:1433+`;
    `edgeSurfFeatureRegistration.hpp:280-308`). Later iterations solve the
    damped normal equations by a fused 6×6 Cholesky with a large penalty on
    the degenerate subspace, avoiding the ~0.6 ms per-iteration XLA eigh.

    Floor: ``degen_rel·nmatch`` when configured (density-independent),
    else the absolute ``degen_thresh``."""
    eigval, eigvec = jnp.linalg.eigh(H + params.damping * jnp.eye(6))
    thresh = jnp.float32(params.degen_thresh)
    if params.degen_rel > 0.0 and nmatch is not None:
        thresh = params.degen_rel * nmatch.astype(jnp.float32)
    ok = eigval > thresh
    P = (eigvec * ok[None, :].astype(eigvec.dtype)) @ eigvec.T
    return P, jnp.sum(ok).astype(jnp.int32)


@partial(jax.jit, static_argnames=("params",))
def register_edge_surf(
    src_edge: PointBatch,
    src_surf: PointBatch,
    map_edge: PointBatch,
    map_surf: PointBatch,
    init_pose: jax.Array,
    params: RegistrationParams = RegistrationParams(),
) -> RegistrationResult:
    """Edge+surf feature Gauss-Newton registration (scan-to-map).

    Either feature set may be empty (all-False mask) — with empty edges this
    is exactly sparse point-to-plane ICP.
    """
    # real lidar scans contain NaN returns; sanitize so masked-out lanes
    # cannot poison reductions through 0·NaN
    src_edge = PointBatch(jnp.nan_to_num(src_edge.xyz), src_edge.mask, src_edge.attr)
    src_surf = PointBatch(jnp.nan_to_num(src_surf.xyz), src_surf.mask, src_surf.attr)
    Ne, Ns = src_edge.capacity, src_surf.capacity

    def step(carry, i):
        pose, done, iters, n_con, P, corr = carry
        pe_w = se3.pose_apply(pose, src_edge.xyz)
        ps_w = se3.pose_apply(pose, src_surf.xyz)

        def associate(_):
            ne, de, ve = _edge_correspondences(pe_w, src_edge.mask, map_edge, params)
            ns, ds, vs = _surf_correspondences(ps_w, src_surf.mask, map_surf, params)
            return ne, de, ve, ns, ds, vs

        do_assoc = ((i % params.reassociate_every) == 0) & ~done
        corr = jax.lax.cond(do_assoc, associate, lambda _: corr, None)
        ne, de, ve, ns, ds, vs = corr

        R = se3.quat_to_matrix(se3.pose_quat(pose))
        re = jnp.sum(ne * pe_w, axis=-1) + de
        rs = jnp.sum(ns * ps_w, axis=-1) + ds
        we = _huber_w(re, params.huber_delta) * ve
        ws = _huber_w(rs, params.huber_delta) * vs
        if params.trim_rel > 0.0:
            # adaptive trimmed-GN (trimmed-ICP): residuals beyond
            # trim_rel × median(|r|) get ZERO weight, re-evaluated every
            # iteration. Unlike huber (which only tempers), this fully
            # rejects a coherently-moving cluster — a head-on vehicle whose
            # points agree with each other but not with the static world —
            # and self-sharpens: as the solve locks onto the static
            # majority the median falls and the mover is trimmed harder.
            # The floor keeps noise-level residuals from trimming anything.
            av = jnp.concatenate([
                jnp.where(ve > 0, jnp.abs(re), jnp.inf),
                jnp.where(vs > 0, jnp.abs(rs), jnp.inf),
            ])
            n_v = jnp.sum(ve) + jnp.sum(vs)
            med = jnp.sort(av)[jnp.maximum(n_v - 1, 0).astype(jnp.int32) // 2]
            med = jnp.where(n_v > 0, med, 0.0)
            cut = jnp.maximum(params.trim_rel * med, params.trim_floor)
            cut = jnp.where(i >= params.trim_after, cut, jnp.inf)
            we = we * (jnp.abs(re) <= cut)
            ws = ws * (jnp.abs(rs) <= cut)

        He, ge = _gn_normal_equations(src_edge.xyz, ne, re, we, R)
        Hs, gs = _gn_normal_equations(src_surf.xyz, ns, rs, ws, R)
        H, g = He + Hs, ge + gs

        # degeneracy projector recomputed at association iterations only —
        # H's structure changes with the correspondences, not the inner GN
        # steps (LOAM freezes it at iter 0; with sparse feature clouds the
        # iter-0 H underestimates constraint, so refresh per association)
        nmatch = jnp.sum(ve) + jnp.sum(vs)
        P, n_con = jax.lax.cond(
            do_assoc,
            lambda _: _degeneracy_projector(H, params, nmatch),
            lambda _: (P, n_con),
            None,
        )
        # fused Cholesky solve with the degenerate subspace penalized out:
        # (H + λI + κ(I−P)) x = −g drives the solution to ~0 along degenerate
        # directions; the explicit projection then removes the residue.
        kappa = jnp.float32(1e7)
        Hs_ = H + params.damping * jnp.eye(6) + kappa * (jnp.eye(6) - P)
        xi = P @ mat3.chol_solve6(Hs_, -g)
        new_pose = se3.pose_retract(pose, xi)

        small = (jnp.linalg.norm(xi[:3]) < params.rot_converged) & (
            jnp.linalg.norm(xi[3:]) < params.trans_converged
        )
        pose = jnp.where(done, pose, new_pose)
        cost = (jnp.sum(we * re * re) + jnp.sum(ws * rs * rs)) / jnp.maximum(nmatch, 1)
        iters = iters + jnp.where(done, 0, 1)
        return (pose, done | small, iters, n_con, P, corr), (nmatch, cost)

    # carried initializers derive from the CLOUD inputs (not fresh constants
    # or the init pose) so that under shard_map they inherit the sharded
    # inputs' varying axes — a replicated constant meeting a sharded value
    # in a cond branch or scan carry is a type error (scan-vma rules)
    corr0 = (
        src_edge.xyz * 0.0, src_edge.xyz[:, 0] * 0.0, src_edge.mask & False,
        src_surf.xyz * 0.0, src_surf.xyz[:, 0] * 0.0, src_surf.mask & False,
    )
    zero = 0.0 * (src_edge.xyz[0, 0] + src_surf.xyz[0, 0]) + 0.0 * map_surf.xyz[0, 0]
    izero = zero.astype(jnp.int32)
    init = (
        init_pose + zero,
        zero > 1.0,  # False, varying
        izero,
        izero,
        jnp.eye(6) + zero,
        corr0,
    )
    (pose, done, iters, n_con, _, _), (nmatches, costs) = jax.lax.scan(
        step, init, jnp.arange(params.max_iters), length=params.max_iters
    )
    return RegistrationResult(
        pose=pose,
        converged=done,
        iterations=iters,
        num_matches=nmatches[-1],
        final_cost=costs[-1],
        n_constrained=n_con,
    )


def register_point_to_plane(
    src: PointBatch, map_pb: PointBatch, init_pose, params=RegistrationParams()
) -> RegistrationResult:
    """sparse_point_plane_icp: surf-only registration against a raw map."""
    empty = PointBatch.empty(8)
    return register_edge_surf(empty, src, empty, map_pb, init_pose, params)


@partial(jax.jit, static_argnames=("params",))
def register_and_score(
    src_edge: PointBatch,
    src_surf: PointBatch,
    map_edge: PointBatch,
    map_surf: PointBatch,
    init_pose: jax.Array,
    params: RegistrationParams = RegistrationParams(),
    min_overlap=0.2,
):
    """Registration + alignment evaluation fused into ONE device program —
    the localization cycle (`backend_lifelong.hpp:283-323`) costs a single
    dispatch and a single scalar transfer instead of two of each (RPC-bound
    on remote TPUs). Returns (RegistrationResult, score, overlap)."""
    reg = register_edge_surf(
        src_edge, src_surf, map_edge, map_surf, init_pose, params
    )
    score, overlap = evaluate_alignment(
        src_surf, map_surf, reg.pose, min_overlap=min_overlap
    )
    return reg, score, overlap


# ---------------------------------------------------------------------------
# NDT (point-to-distribution) — replaces ndt_omp
# ---------------------------------------------------------------------------


def _ndt_projector(H, params):
    """NDT flavor of the degeneracy projector (threshold from NdtParams)."""
    eigval, eigvec = jnp.linalg.eigh(H + params.damping * jnp.eye(6))
    ok = eigval > params.degen_thresh
    P = (eigvec * ok[None, :].astype(eigvec.dtype)) @ eigvec.T
    return P, jnp.sum(ok).astype(jnp.int32)


class NdtParams(NamedTuple):
    max_iters: int = 16
    resolution: float = 1.0
    max_voxels: int = 16384
    degen_thresh: float = 10.0
    damping: float = 1e-3
    trans_converged: float = 5e-4
    rot_converged: float = 1e-3
    # trust region: the quadratic model is only valid within a voxel, so the
    # per-iteration step is clamped (standard NDT practice)
    max_step_trans: float = 0.5
    max_step_rot: float = 0.15


@partial(jax.jit, static_argnames=("params",))
def register_ndt(
    src: PointBatch,
    gaussians,
    init_pose: jax.Array,
    params: NdtParams = NdtParams(),
) -> RegistrationResult:
    """NDT-style GN: residual rᵢ = L_vᵀ (p_world − μ_v) with Σ_v = L L ᵀ.

    ``gaussians`` comes from ``voxel.voxel_gaussians`` on the map cloud.
    Three 1-D residual rows per point (whitened coordinates).
    """
    src = PointBatch(jnp.nan_to_num(src.xyz), src.mask, src.attr)
    # precompute whitening factors per voxel: Σ^{-1} = U diag(1/λ) Uᵀ
    eigval, eigvec = mat3.sym_eigh3(gaussians["covs"])
    inv_sqrt = eigvec * jax.lax.rsqrt(jnp.maximum(eigval, 1e-6))[:, None, :]
    # W_v = inv_sqrt @ eigvecᵀ  → Σ^{-1/2}
    W_all = jnp.einsum("vik,vjk->vij", inv_sqrt, eigvec)

    def step(carry, i):
        pose, done, iters, n_con_prev, P = carry
        R = se3.quat_to_matrix(se3.pose_quat(pose))
        p_w = se3.pose_apply(pose, src.xyz)
        # DIRECT7: smooth residual field across voxel boundaries, each
        # neighbor weighted by its Gaussian likelihood (IRLS, weights frozen
        # per iteration)
        slot, found = voxel.voxel_lookup7(gaussians, p_w)  # (N,7)
        mu = gaussians["means"][slot]  # (N,7,3)
        Wv = W_all[slot]  # (N,7,3,3)
        valid = src.mask[:, None] & found

        r3 = jnp.einsum("nvij,nvj->nvi", Wv, p_w[:, None, :] - mu)  # (N,7,3)
        lik = jnp.exp(-0.5 * jnp.sum(r3 * r3, axis=-1))  # (N,7)
        w = valid.astype(jnp.float32) * lik
        # right perturbation: δr3 row i = ω·(p × (WR)ᵢ) + (WR)ᵢ·v
        WR = jnp.einsum("nvij,jk->nvik", Wv, R)
        Jrot = jnp.cross(
            jnp.broadcast_to(src.xyz[:, None, None, :], WR.shape), WR, axis=-1
        )
        J = jnp.concatenate([Jrot, WR], axis=-1)  # (N,7,3,6)
        H = jnp.einsum("nvri,nvrj,nv->ij", J, J, w)
        g = jnp.einsum("nvri,nvr,nv->i", J, r3, w)
        # degeneracy projector refreshed every other iteration (the voxel
        # association drifts slowly); in between, the fused 6×6 Cholesky
        # with a degenerate-subspace penalty replaces the costly XLA eigh
        P, n_con_prev = jax.lax.cond(
            ((i % 2) == 0) & ~done,
            lambda _: _ndt_projector(H, params),
            lambda _: (P, n_con_prev),
            None,
        )
        Hd = (
            H + params.damping * jnp.eye(6)
            + jnp.float32(1e7) * (jnp.eye(6) - P)
        )
        xi = P @ mat3.chol_solve6(Hd, -g)
        rot_n = jnp.linalg.norm(xi[:3])
        trn_n = jnp.linalg.norm(xi[3:])
        scale = jnp.minimum(
            1.0,
            jnp.minimum(
                params.max_step_rot / jnp.maximum(rot_n, 1e-9),
                params.max_step_trans / jnp.maximum(trn_n, 1e-9),
            ),
        )
        xi = xi * scale
        new_pose = se3.pose_retract(pose, xi)
        small = (jnp.linalg.norm(xi[:3]) < params.rot_converged) & (
            jnp.linalg.norm(xi[3:]) < params.trans_converged
        )
        pose = jnp.where(done, pose, new_pose)
        nmatch = jnp.sum(jnp.any(valid, axis=1)).astype(jnp.int32)
        cost = jnp.sum(jnp.sum(r3 * r3, -1) * w) / jnp.maximum(nmatch, 1)
        iters = iters + jnp.where(done, 0, 1)
        return (pose, done | small, iters, n_con_prev, P), (nmatch, cost)

    # varying-safe initializers (see register_edge_surf)
    zero = 0.0 * (src.xyz[0, 0] + gaussians["means"][0, 0])
    izero = zero.astype(jnp.int32)
    init = (
        init_pose + zero,
        zero > 1.0,
        izero,
        izero,
        jnp.eye(6) + zero,
    )
    (pose, done, iters, n_con, _), (nm, costs) = jax.lax.scan(
        step, init, jnp.arange(params.max_iters), length=params.max_iters
    )
    return RegistrationResult(pose, done, iters, nm[-1], costs[-1], n_con)


# ---------------------------------------------------------------------------
# Alignment evaluation (reference alignEvaluate.hpp:55-87)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=())
def evaluate_alignment(
    src: PointBatch,
    map_pb: PointBatch,
    pose: jax.Array,
    inlier_dist: float = 1.0,
    min_overlap: float = 0.2,
    score_dist: float = 0.5,
):
    """Score = mean squared surface distance over inliers; overlap = 1-NN
    inlier ratio.

    Score and overlap answer different questions and use different radii:
    ``overlap`` measures COVERAGE (fraction of the scan within
    ``inlier_dist`` of the map — the reference's 1 m), while ``score``
    measures ALIGNMENT of the covered region, over the tighter
    ``score_dist`` ring. At a map BOUNDARY a well-aligned scan contains
    frontier points 0.5–1 m from the last mapped features; under a single
    radius those inflate the score past the map-update gate (0.04) exactly
    while overlap passes through its window — the lifelong map-extension
    gate then never fires (observed at city scale: score 0.06→0.13 as
    overlap fell 0.93→0.49). Genuinely misaligned scans still score high:
    beyond ~``score_dist`` misalignment the scored set empties and the
    score falls back to the full coverage ring.

    The reference scores mean squared 1-NN POINT distance against its dense
    per-keyframe clouds (`alignEvaluate.hpp:55-87`), where the sampling floor
    (~1-2 cm) is far below its gates (0.04/0.05/1.0). Our database stores
    down-selected features, whose 1-NN spacing alone (~0.15-0.25 m at HDL-64
    city density) would pin the score near 0.04 even at perfect alignment —
    the gates would measure map sparsity, not alignment. The density-
    independent equivalent is point-to-PLANE: fit a local plane through the
    k-NN (the surf-match PCA fit) and score the perpendicular distance,
    falling back to the point distance where the neighborhood isn't planar
    (edges, poles). Inliers/overlap keep the reference's 1-NN semantics.

    Returns (score, overlap); score is huge when overlap < min_overlap —
    matching the reference's (maxdouble, ratio) sentinel.
    """
    p_w = se3.pose_apply(pose, src.xyz)
    d, idx = neighbors.knn(p_w, src.mask, map_pb.xyz, map_pb.mask, k=5)
    d1 = d[:, 0]  # squared 1-NN point distance
    # plane support is bounded to the correspondence radius: a neighbor
    # farther than inlier_dist must not lend its plane to the query (a point
    # on the EXTENSION of a distant planar patch would otherwise score ~0);
    # with <3 in-radius neighbors the score falls back to the point distance
    nvalid = d < inlier_dist * inlier_dist
    nbr = map_pb.xyz[idx]
    w = nvalid.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
    centroid = jnp.sum(nbr * w[..., None], axis=1) / wsum
    diff = (nbr - centroid[:, None, :]) * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", diff, diff) / wsum[..., None]
    n = mat3.sym_eigh3(cov)[1][..., 0]  # smallest-eigval dir = plane normal
    # planar neighborhood: enough support and thin out-of-plane extent
    pd = jnp.abs(jnp.sum(nbr * n[:, None, :], axis=-1)
                 - jnp.sum(n * centroid, axis=-1)[:, None])
    plane_ok = (
        (jnp.sum(w, axis=1) >= 3.0)
        & jnp.all(jnp.where(nvalid, pd < 0.2, True), axis=1)
    )
    d_plane = jnp.square(jnp.sum((p_w - centroid) * n, axis=-1))
    d_surf = jnp.where(plane_ok, d_plane, d1)

    inlier = src.mask & (d1 < inlier_dist * inlier_dist)
    n_src = jnp.maximum(jnp.sum(src.mask), 1)
    n_in = jnp.sum(inlier)
    overlap = n_in / n_src
    # alignment score over the tight ring; coverage-ring fallback when the
    # tight ring is (nearly) empty — i.e. gross misalignment
    s_in = src.mask & (d1 < score_dist * score_dist)
    n_s = jnp.sum(s_in)
    score_tight = jnp.sum(jnp.where(s_in, d_surf, 0.0)) / jnp.maximum(n_s, 1)
    score_cover = jnp.sum(jnp.where(inlier, d_surf, 0.0)) / jnp.maximum(n_in, 1)
    score = jnp.where(n_s > 0.05 * n_in, score_tight, score_cover)
    score = jnp.where(overlap < min_overlap, jnp.float32(1e9), score)
    return score, overlap
