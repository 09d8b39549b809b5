"""SE(3) pose-graph optimization: Gauss-Newton + block-Jacobi PCG on TPU.

Replaces the reference's g2o / GTSAM backends wholesale
(`inc/BackEnd/GraphOptimization/graph_optimization.hpp` interface;
`graph_optimization_g2o.cpp:33-183` — SE3 nodes, between edges with diagonal
information = 1/noise, robust Huber kernel, first-node gauge fix;
`graph_optimization_gtsam.cpp:42-120` ISAM2 variant). The reference solves
with sparse LM (≤512 iterations) on the CPU; here the normal equations are
never materialized — each Gauss-Newton step runs matrix-free preconditioned
conjugate gradients where the Hessian-vector product is two batched (E,6,6)
einsums plus segment-sum scatters, and the preconditioner is the inverted
per-vertex 6×6 diagonal block. Everything is static-shape (padded vertex /
edge capacity) and runs as one jitted program; per-edge Jacobians come from
forward-mode autodiff of the boxplus residual, so they are exact for any
retraction.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..common import se3


class PoseGraphParams(NamedTuple):
    gn_iters: int = 12
    pcg_iters: int = 64
    damping: float = 1e-3  # LM diagonal damping added to H
    # Robust kernel policy. The reference applies kernels selectively PER
    # EDGE (`graph_optimization.hpp:19-47` SetEdgeRobustKernel; factory
    # `graph_optimization_g2o.cpp:158-174`) — odometry edges stay
    # un-robustified and only loop closures get a kernel. The solver mirrors
    # that: the kernel below applies only to edges flagged in
    # ``edges_robust`` (all edges if the caller passes none).
    #
    # ``huber`` is the default (the reference's own loop-edge kernel,
    # `graph_optimization_g2o.cpp:158-174`): its influence does NOT
    # redescend, so a loop closure at meters of whitened drift keeps
    # pulling with constant force instead of being switched off. Measured
    # on a 480-vertex drifted ring (18 m accumulated drift, 3 loops): the
    # old global-DCS default left chi2 at 96% of initial and the drift
    # uncorrected; huber10 on loop edges collapses chi2 1.5e5 → 321 (the
    # kernel-free floor is 231) and absorbs a plausibility-gate-scale
    # (8 m) bad loop with no measurable ATE damage. For regimes where
    # gross outlier edges can enter the graph (no upstream verification),
    # use ``tls`` + ``gnc_iters>0``: annealed truncation that cuts any
    # edge standing out from the consensus of its peers (it is the only
    # policy that fully rejects a 40 m outlier edge — ATE 0.25 vs 11.5
    # for huber on the 24-vertex outlier benchmark in test_pose_graph).
    kernel: str = "huber"  # "none" | "huber" | "cauchy" | "dcs" | "tls"
    # kernel scale on the whitened edge error norm: a converged, correctly
    # whitened 6-dof edge has ‖r‖ ≈ √6 ≈ 2.45; 10.0 (≈1 m at the default
    # loop-edge σ=0.1 m) keeps every plausible converged loop at full
    # weight and only tempers edges the solved graph still contradicts
    kernel_delta: float = 10.0
    # graduated non-convexity (for the redescending kernels): for the
    # first ``gnc_iters`` GN iterations the kernel scale decays
    # geometrically from ``gnc_mu0``·delta to delta, so everything pulls
    # while the graph is far from converged. 0 disables.
    gnc_iters: int = 0
    gnc_mu0: float = 1e3
    # per-vertex trust clamp on each GN increment: an outlier edge (or the
    # GNC convex phase) must bend the graph gradually, not tear it apart in
    # one unclamped 40 m Newton step it can never recover from (same policy
    # as the registration solver's max_step_rot/trans)
    max_step_rot: float = 0.5  # rad per vertex per GN iteration
    max_step_trans: float = 5.0  # m per vertex per GN iteration
    converged_dx: float = 1e-5
    pcg_tol: float = 1e-8


class PoseGraphStats(NamedTuple):
    chi2_initial: jax.Array
    chi2_final: jax.Array
    iterations: jax.Array


def edge_residual(pose_i, pose_j, z):
    """Whitened-free between residual r = log(z⁻¹ ∘ (xᵢ⁻¹ ∘ xⱼ)) ∈ ℝ⁶."""
    return se3.pose_log(se3.pose_between(z, se3.pose_between(pose_i, pose_j)))


def _edge_res_jac(pose_i, pose_j, z):
    """Residual and Jacobians wrt right-perturbations of both endpoints."""

    def f(x):
        return edge_residual(
            se3.pose_retract(pose_i, x[:6]), se3.pose_retract(pose_j, x[6:]), z
        )

    r = f(jnp.zeros(12))
    J = jax.jacfwd(f)(jnp.zeros(12))  # (6, 12)
    return r, J[:, :6], J[:, 6:]


def _robust_weight(r2, kernel: str, delta):
    """IRLS weight as a function of squared whitened edge error norm.

    Counterpart of the reference's robust-kernel factory
    (`graph_optimization_g2o.cpp:158-174` — g2o kernels chosen by string).
    ``huber`` keeps a non-redescending influence (outliers are tempered,
    never switched off); ``dcs`` (dynamic covariance scaling) redescends and
    should be paired with the GNC schedule when initial drift is large.
    ``delta`` may be a traced scalar (the GNC schedule anneals it).
    """
    if kernel == "none":
        return jnp.ones_like(r2)
    if kernel == "huber":
        a = jnp.sqrt(jnp.maximum(r2, 1e-12))
        return jnp.where(a <= delta, 1.0, delta / a)
    if kernel == "cauchy":
        return 1.0 / (1.0 + r2 / (delta * delta))
    if kernel == "dcs":
        phi = delta * delta
        return jnp.minimum(1.0, 2.0 * phi / (phi + r2))
    if kernel == "tls":
        # truncated least squares: full weight inside the (annealed)
        # threshold, zero outside — pair with gnc_iters > 0 so the
        # threshold starts far beyond any plausible drift
        return (r2 <= delta * delta).astype(r2.dtype)
    raise ValueError(f"unknown robust kernel: {kernel}")


def _gnc_delta(params: "PoseGraphParams", t):
    """Annealed kernel scale at GN iteration ``t`` (traced int).

    delta_t = delta · mu0^(max(0, 1 − t/gnc_iters)) — near-quadratic at
    t=0, the true kernel from t = gnc_iters on. Identity when disabled.
    """
    if params.gnc_iters <= 0:
        return jnp.float32(params.kernel_delta)
    frac = jnp.maximum(0.0, 1.0 - t.astype(jnp.float32) / params.gnc_iters)
    return params.kernel_delta * jnp.power(jnp.float32(params.gnc_mu0), frac)


def _clamp_step(dx, params: "PoseGraphParams"):
    """Per-vertex trust clamp of a (V, 6) GN increment [rot, trans]."""
    rot_n = jnp.linalg.norm(dx[:, :3], axis=-1)
    trn_n = jnp.linalg.norm(dx[:, 3:], axis=-1)
    scale = jnp.minimum(
        1.0,
        jnp.minimum(
            params.max_step_rot / jnp.maximum(rot_n, 1e-9),
            params.max_step_trans / jnp.maximum(trn_n, 1e-9),
        ),
    )
    return dx * scale[:, None]


def _edge_weights(r2, erobust, emask, params: "PoseGraphParams", t):
    """Per-edge IRLS weight: robust kernel only where ``erobust`` is set
    (loop edges); odometry edges keep weight 1 — the reference's per-edge
    kernel policy (`graph_optimization.hpp:19-47`).

    The effective kernel scale is the GNC-annealed delta, floored by 3× the
    (lower) median residual norm of the robust edges: while the whole edge
    population is still far from convergence (trust-clamped graph mid-bend)
    nothing is truncated; an edge is only cut once it stands out from the
    consensus of its peers.
    """
    delta = _gnc_delta(params, t)
    if params.kernel in ("tls", "dcs", "cauchy"):
        valid = erobust & emask
        rn = jnp.sqrt(jnp.maximum(r2, 0.0))
        n_valid = jnp.sum(valid)
        srt = jnp.sort(jnp.where(valid, rn, jnp.inf))
        med = srt[jnp.maximum(n_valid - 1, 0) // 2]
        med = jnp.where(n_valid > 0, med, 0.0)
        delta = jnp.maximum(delta, 3.0 * med)
    wk = _robust_weight(r2, params.kernel, delta)
    return jnp.where(erobust, wk, 1.0)


@partial(jax.jit, static_argnames=("params",))
def optimize_pose_graph(
    poses: jax.Array,  # (V, 7)
    vmask: jax.Array,  # (V,) bool — vertex exists
    edges_ij: jax.Array,  # (E, 2) int32
    edges_z: jax.Array,  # (E, 7) measured relative pose i→j
    edges_sqrtw: jax.Array,  # (E, 6) per-dim sqrt information (1/σ)
    emask: jax.Array,  # (E,) bool — edge exists
    fixed: jax.Array | None = None,  # (V,) bool — gauge-fixed vertices
    edges_robust: jax.Array | None = None,  # (E,) bool — kernel applies
    prior_xyz: jax.Array | None = None,  # (K,3) absolute position priors
    prior_idx: jax.Array | None = None,  # (K,) vertex ids
    prior_sqrtw: jax.Array | None = None,  # (K,3)
    prior_mask: jax.Array | None = None,  # (K,)
    qprior_quat: jax.Array | None = None,  # (K,4) absolute orientation priors
    qprior_idx: jax.Array | None = None,  # (K,) vertex ids
    qprior_sqrtw: jax.Array | None = None,  # (K,3)
    qprior_mask: jax.Array | None = None,  # (K,)
    plane_idx: jax.Array | None = None,  # (K,) vertex ids on the floor plane
    plane_z: jax.Array | None = None,  # (K,) plane height per constraint
    plane_sqrtw: jax.Array | None = None,  # (K,3) [z, roll-pitch, roll-pitch]
    plane_mask: jax.Array | None = None,  # (K,)
    params: PoseGraphParams = PoseGraphParams(),
):
    """Batch GN/LM solve. Returns (optimized_poses, PoseGraphStats).

    Unary factors (all optional, padded + masked):

    - ``prior_*``: absolute-position priors — the reference's
      `AddSe3PriorXYZEdge` (GNSS constraints, `graph_optimization.hpp:19-47`,
      g2o edge `inc/g2o/edge_se3_priorxyz.hpp`).
    - ``qprior_*``: absolute-orientation priors — the reference's
      `AddSe3PriorQuaternionEdge` (`graph_optimization.hpp:39-41`, g2o edge
      `edge_se3_priorquat.hpp`); residual = log(q_meas⁻¹ ⊗ q).
    - ``plane_*``: floor/plane factors — the reference's plane-constraint
      cadence (`backend_lifelong.hpp:513-521`, g2o plane-prior edges);
      residual = [p_z − z_ref, a_x, a_y] with a = R·e_z, i.e. height above
      the plane plus roll/pitch deviation from plane-normal alignment.

    With any absolute factor the graph is anchored, so pass ``fixed`` of
    all-False to let every vertex move (the default still gauge-fixes
    vertex 0 for odometry-only graphs).
    """
    V = poses.shape[0]
    if fixed is None:
        fixed = jnp.zeros(V, bool).at[0].set(True)
    free = vmask & ~fixed
    erobust = (
        jnp.ones_like(emask) if edges_robust is None else edges_robust
    )
    i_idx = edges_ij[:, 0]
    j_idx = edges_ij[:, 1]

    def xyz_res(pose, z, sqrtw, x):
        return (se3.pose_retract(pose, x)[4:] - z) * sqrtw

    def quat_res(pose, z, sqrtw, x):
        q = se3.pose_quat(se3.pose_retract(pose, x))
        return se3.so3_log(se3.quat_mul(se3.quat_conj(z), q)) * sqrtw

    def plane_res(pose, z, sqrtw, x):
        p = se3.pose_retract(pose, x)
        a = se3.quat_rotate(se3.pose_quat(p), jnp.asarray([0.0, 0.0, 1.0]))
        return jnp.stack([p[6] - z, a[0], a[1]]) * sqrtw

    # unary factor groups: (residual fn, measurement, sqrtw, idx, mask)
    unary = []
    if prior_xyz is not None:
        unary.append((xyz_res, prior_xyz, prior_sqrtw, prior_idx, prior_mask))
    if qprior_quat is not None:
        unary.append((quat_res, qprior_quat, qprior_sqrtw, qprior_idx, qprior_mask))
    if plane_idx is not None:
        unary.append((plane_res, plane_z, plane_sqrtw, plane_idx, plane_mask))

    def unary_res_jac(fn, pose, z, sqrtw):
        r = fn(pose, z, sqrtw, jnp.zeros(6))
        J = jax.jacfwd(lambda x: fn(pose, z, sqrtw, x))(jnp.zeros(6))
        return r, J  # (3,), (3,6)

    def chi2_of(p):
        r = jax.vmap(edge_residual)(p[i_idx], p[j_idx], edges_z) * edges_sqrtw
        c = jnp.sum(jnp.where(emask, jnp.sum(r * r, -1), 0.0))
        for fn, z, sw, idx, msk in unary:
            ru = jax.vmap(lambda pp, zz, ss: fn(pp, zz, ss, jnp.zeros(6)))(
                p[idx], z, sw
            )
            c = c + jnp.sum(jnp.where(msk, jnp.sum(ru * ru, -1), 0.0))
        return c

    def gn_step(carry):
        p, done, iters = carry
        r, Ji, Jj = jax.vmap(_edge_res_jac)(p[i_idx], p[j_idx], edges_z)
        # whiten rows
        r = r * edges_sqrtw
        Ji = Ji * edges_sqrtw[:, :, None]
        Jj = Jj * edges_sqrtw[:, :, None]
        r2 = jnp.sum(r * r, axis=-1)
        w = _edge_weights(r2, erobust, emask, params, iters) * emask  # (E,)

        # unary factor linearizations: [(r (K,3), J (K,3,6), idx (K,))]
        lin = []
        for fn, z, sw, idx, msk in unary:
            ru, Ju = jax.vmap(lambda pp, zz, ss: unary_res_jac(fn, pp, zz, ss))(
                p[idx], z, sw
            )
            lin.append((ru * msk[:, None], Ju * msk[:, None, None], idx))

        def matvec(x):  # x: (V, 6)
            y = jnp.einsum("eab,eb->ea", Ji, x[i_idx]) + jnp.einsum(
                "eab,eb->ea", Jj, x[j_idx]
            )
            y = y * w[:, None]
            gi = jnp.einsum("eab,ea->eb", Ji, y)
            gj = jnp.einsum("eab,ea->eb", Jj, y)
            out = jax.ops.segment_sum(gi, i_idx, num_segments=V) + jax.ops.segment_sum(
                gj, j_idx, num_segments=V
            )
            for ru, Ju, idx in lin:
                yu = jnp.einsum("kab,kb->ka", Ju, x[idx])
                out = out + jax.ops.segment_sum(
                    jnp.einsum("kab,ka->kb", Ju, yu), idx, num_segments=V
                )
            out = out + params.damping * x
            return jnp.where(free[:, None], out, 0.0)

        # gradient g = Jᵀ W r  (we solve H dx = -g)
        wr = r * w[:, None]
        g = jax.ops.segment_sum(
            jnp.einsum("eab,ea->eb", Ji, wr), i_idx, num_segments=V
        ) + jax.ops.segment_sum(jnp.einsum("eab,ea->eb", Jj, wr), j_idx, num_segments=V)
        for ru, Ju, idx in lin:
            g = g + jax.ops.segment_sum(
                jnp.einsum("kab,ka->kb", Ju, ru), idx, num_segments=V
            )
        g = jnp.where(free[:, None], g, 0.0)

        # block-Jacobi preconditioner: per-vertex 6×6 diagonal blocks of H
        Bi = jnp.einsum("eab,eac,e->ebc", Ji, Ji, w)
        Bj = jnp.einsum("eab,eac,e->ebc", Jj, Jj, w)
        M = jax.ops.segment_sum(Bi, i_idx, num_segments=V) + jax.ops.segment_sum(
            Bj, j_idx, num_segments=V
        )
        for ru, Ju, idx in lin:
            M = M + jax.ops.segment_sum(
                jnp.einsum("kab,kac->kbc", Ju, Ju), idx, num_segments=V
            )
        M = M + (params.damping + 1e-6) * jnp.eye(6)
        Minv = jnp.linalg.inv(M)

        def precond(x):
            return jnp.where(
                free[:, None], jnp.einsum("vab,vb->va", Minv, x), 0.0
            )

        # PCG for H dx = -g
        b = -g
        x0 = jnp.zeros_like(b)
        r0 = b  # since x0 = 0
        z0 = precond(r0)
        p0 = z0
        rz0 = jnp.sum(r0 * z0)

        def pcg_body(c):
            x, rr, zz, pp, rz, it = c
            Ap = matvec(pp)
            pAp = jnp.sum(pp * Ap)
            alpha = rz / jnp.where(jnp.abs(pAp) > 1e-20, pAp, 1e-20)
            x = x + alpha * pp
            rr = rr - alpha * Ap
            zz = precond(rr)
            rz_new = jnp.sum(rr * zz)
            beta = rz_new / jnp.where(jnp.abs(rz) > 1e-20, rz, 1e-20)
            pp = zz + beta * pp
            return (x, rr, zz, pp, rz_new, it + 1)

        # early-exit PCG: residual-energy convergence relative to the
        # initial preconditioned residual (well-conditioned windowed graphs
        # converge in a handful of iterations — no reason to burn the cap)
        (dx, _, _, _, _, _) = jax.lax.while_loop(
            lambda c: (jnp.abs(c[4]) > params.pcg_tol * jnp.abs(rz0))
            & (c[5] < params.pcg_iters),
            pcg_body,
            (x0, r0, z0, p0, rz0, jnp.array(0, jnp.int32)),
        )
        dx = _clamp_step(dx, params)

        new_p = jnp.where(
            free[:, None], jax.vmap(se3.pose_retract)(p, dx), p
        )
        dx_norm = jnp.sqrt(jnp.sum(dx * dx) / jnp.maximum(jnp.sum(free), 1))
        # a small step during the GNC anneal is not convergence — the
        # surrogate is still changing under the iterate
        small = (dx_norm < params.converged_dx) & (iters >= params.gnc_iters)
        p = jnp.where(done, p, new_p)
        iters = iters + jnp.where(done, 0, 1)
        return (p, done | small, iters)

    chi2_0 = chi2_of(poses)
    init = (poses, jnp.array(False), jnp.array(0, jnp.int32))
    # while_loop, not scan: a converged solve exits instead of burning the
    # remaining gn_iters as frozen no-op iterations — the windowed per-batch
    # re-solves in the lifelong backend typically converge in a fraction of
    # the budget (the reference's g2o LM also iterates only until done,
    # `graph_optimization_g2o.cpp:52-80`)
    (poses_out, _, iters) = jax.lax.while_loop(
        lambda c: (~c[1]) & (c[2] < params.gn_iters), gn_step, init
    )
    return poses_out, PoseGraphStats(
        chi2_initial=chi2_0, chi2_final=chi2_of(poses_out), iterations=iters
    )
