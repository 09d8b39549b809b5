"""Submap-partitioned pose-graph solve via Schur-complement elimination.

The edge-sharded PCG solve (`distributed.py`) replicates vertices and
iterates; past ~10⁴ vertices the O(V) replicated state per PCG step and the
global synchronization per iteration dominate. This module is the scale-out
answer SURVEY §2.9/§5 calls for (the reference's counterpart is its
multi-node ROS graph, `launch/FactorGraphFusionSLAM.launch`, which has no
numerical distribution at all):

- vertices are partitioned into ``S`` contiguous **submaps** (contiguous =
  keyframe order, so odometry edges stay internal);
- a vertex is a **separator** iff some edge couples it across submaps
  (submap boundaries + loop-closure endpoints — a tiny fraction in SLAM
  graphs);
- each Gauss-Newton step eliminates every submap's interior exactly with a
  batched dense Cholesky (one (S, 6m, 6m) factorization — MXU work, no
  sparse bookkeeping), reduces onto the separator system with one
  ``psum``-style scatter, solves the small dense separator system
  replicated, and back-substitutes locally.

Compared to the PCG path this is an *exact* Newton step (no inner-iteration
truncation), communication is O(separators²) instead of O(V·pcg_iters), and
all the heavy lifting is batched dense linear algebra — the shape TPUs are
built for. Robust kernels (DCS/Huber/Cauchy) are re-evaluated per GN
iteration exactly as in `backend.pose_graph`.

Sharding: the submap axis is sharded over the mesh; separator reductions are
``psum``; the separator solve is replicated (it is tiny). On one device the
collectives are no-ops and the result matches `optimize_pose_graph` to
solver tolerance.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..common import se3
from ..backend.pose_graph import (
    PoseGraphParams,
    PoseGraphStats,
    _clamp_step,
    _edge_res_jac,
    _edge_weights,
    edge_residual,
)


# executable cache for the jitted Schur driver (see optimize_pose_graph_schur)
_RUN_CACHE: dict = {}


def _pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 0).bit_length()


class SubmapPartition(NamedTuple):
    """Host-precomputed static index plumbing for the Schur solve.

    All arrays are numpy (hashable shapes); the device solve treats them as
    constants of the compiled program.
    """

    n_submaps: int  # S (padded to a multiple of the mesh size)
    m: int  # interior variable slots per submap (padded)
    k: int  # separator slots adjacent to one submap (padded)
    n_sep: int  # global separator slots (padded)
    # per-(submap, edge-slot) edge gather list
    e_idx: np.ndarray  # (S, Emax) int32 — index into the global edge arrays
    e_mask: np.ndarray  # (S, Emax) bool
    # per-(submap, edge-slot, endpoint∈{i,j}) destination classes/slots
    cls: np.ndarray  # (S, Emax, 2) int8 — 0 interior, 1 separator, 2 fixed/drop
    loc: np.ndarray  # (S, Emax, 2) int32 — interior slot a / LOCAL separator slot
    # separator plumbing
    sep_ids: np.ndarray  # (n_sep,) int32 — global vertex id per sep slot (-1 pad)
    sep_local2global: np.ndarray  # (S, k) int32 — local sep slot → global sep slot
    sep_l2g_mask: np.ndarray  # (S, k) bool
    # interior scatter-back
    int_ids: np.ndarray  # (S, m) int32 — global vertex id per interior slot (-1)
    int_mask: np.ndarray  # (S, m) bool
    # unary factor plumbing (empty second dim when there are no unaries):
    # each factor is owned by the submap containing its vertex; interior
    # targets scatter into that submap's A/g, separator targets scatter into
    # the GLOBAL separator system (pre-psum)
    u_idx: np.ndarray  # (S, Umax) int32 — index into the packed unary arrays
    u_mask: np.ndarray  # (S, Umax) bool
    u_cls: np.ndarray  # (S, Umax) int8 — 0 interior, 1 separator, 2 drop
    u_loc: np.ndarray  # (S, Umax) int32 — interior slot (cls 0)
    u_gsep: np.ndarray  # (S, Umax) int32 — global separator slot (cls 1)


def partition_graph(
    edges_ij: np.ndarray,
    emask: np.ndarray,
    V: int,
    n_submaps: int,
    fixed: np.ndarray | None = None,
    unary_vid: np.ndarray | None = None,
) -> SubmapPartition:
    """Contiguous-range partition + separator classification (host side).

    ``fixed`` vertices are excluded from the variable set entirely (their
    increment is identically zero — the exact analog of removing the gauge
    row/column from the normal equations).

    ``unary_vid``: (K,) vertex id per packed unary factor (GNSS/orientation/
    plane priors); each factor is routed to the submap owning its vertex.
    """
    edges_ij = np.asarray(edges_ij)
    emask = np.asarray(emask, bool)
    fixed = (
        np.zeros(V, bool) if fixed is None else np.asarray(fixed, bool).copy()
    )
    S = int(n_submaps)
    bound = np.linspace(0, V, S + 1).astype(np.int64)
    v_sub = np.zeros(V, np.int64)
    for s in range(S):
        v_sub[bound[s]: bound[s + 1]] = s

    ii = edges_ij[emask, 0].astype(np.int64)
    jj = edges_ij[emask, 1].astype(np.int64)
    is_sep = np.zeros(V, bool)
    cross = v_sub[ii] != v_sub[jj]
    is_sep[ii[cross]] = True
    is_sep[jj[cross]] = True
    is_sep &= ~fixed

    INT, SEP, DROP = 0, 1, 2
    v_cls = np.where(fixed, DROP, np.where(is_sep, SEP, INT)).astype(np.int8)

    # interior slots per submap
    m = 0
    int_slot = np.full(V, -1, np.int64)
    int_lists = []
    for s in range(S):
        vs = np.arange(bound[s], bound[s + 1])
        vs = vs[v_cls[vs] == INT]
        int_slot[vs] = np.arange(len(vs))
        int_lists.append(vs)
        m = max(m, len(vs))
    m = max(_pow2(m), 1)
    int_ids = np.full((S, m), -1, np.int64)
    for s, vs in enumerate(int_lists):
        int_ids[s, : len(vs)] = vs

    # global separator slots
    sep_vs = np.nonzero(v_cls == SEP)[0]
    n_sep = max(_pow2(len(sep_vs)), 1)
    sep_slot = np.full(V, -1, np.int64)
    sep_slot[sep_vs] = np.arange(len(sep_vs))
    sep_ids = np.full(n_sep, -1, np.int64)
    sep_ids[: len(sep_vs)] = sep_vs

    # edge ownership: the submap of an interior endpoint (edges between two
    # interiors are always same-submap by construction); otherwise submap of i
    E = edges_ij.shape[0]
    own = np.where(
        v_cls[edges_ij[:, 0]] == INT,
        v_sub[edges_ij[:, 0]],
        np.where(
            v_cls[edges_ij[:, 1]] == INT,
            v_sub[edges_ij[:, 1]],
            v_sub[edges_ij[:, 0]],
        ),
    )
    own = np.where(emask, own, -1)

    Emax = 1
    per_sub_edges = []
    for s in range(S):
        es = np.nonzero(own == s)[0]
        per_sub_edges.append(es)
        Emax = max(Emax, len(es))
    Emax = _pow2(Emax)
    e_idx = np.zeros((S, Emax), np.int64)
    e_mask = np.zeros((S, Emax), bool)
    for s, es in enumerate(per_sub_edges):
        e_idx[s, : len(es)] = es
        e_mask[s, : len(es)] = True

    # local separator lists per submap (separators its edges touch)
    k = 1
    sep_loc_maps = []
    for s, es in enumerate(per_sub_edges):
        vs = np.unique(edges_ij[es].ravel()) if len(es) else np.zeros(0, np.int64)
        vs = vs[v_cls[vs] == SEP]
        sep_loc_maps.append(vs)
        k = max(k, len(vs))
    k = _pow2(k)
    sep_l2g = np.zeros((S, k), np.int64)
    sep_l2g_mask = np.zeros((S, k), bool)
    v_seploc = np.full((S, V), -1, np.int64)  # per-submap local slot of vertex
    for s, vs in enumerate(sep_loc_maps):
        sep_l2g[s, : len(vs)] = sep_slot[vs]
        sep_l2g_mask[s, : len(vs)] = True
        v_seploc[s, vs] = np.arange(len(vs))

    # per-(submap, edge-slot, endpoint) class + local slot
    cls = np.full((S, Emax, 2), DROP, np.int8)
    loc = np.zeros((S, Emax, 2), np.int64)
    for s in range(S):
        es = e_idx[s]
        for side in (0, 1):
            v = edges_ij[es, side]
            c = np.where(e_mask[s], v_cls[v], DROP)
            cls[s, :, side] = c
            loc[s, :, side] = np.where(
                c == INT, int_slot[v], np.where(c == SEP, v_seploc[s, v], 0)
            )

    # unary factor routing
    if unary_vid is not None and len(unary_vid) > 0:
        uv = np.asarray(unary_vid, np.int64)
        u_own = v_sub[uv]
        Umax = 1
        per_sub_u = []
        for s in range(S):
            us = np.nonzero(u_own == s)[0]
            per_sub_u.append(us)
            Umax = max(Umax, len(us))
        Umax = _pow2(Umax)
        u_idx = np.zeros((S, Umax), np.int64)
        u_mask = np.zeros((S, Umax), bool)
        for s, us in enumerate(per_sub_u):
            u_idx[s, : len(us)] = us
            u_mask[s, : len(us)] = True
        uc = np.where(u_mask, v_cls[uv[u_idx]], DROP).astype(np.int8)
        u_loc = np.where(uc == INT, int_slot[uv[u_idx]], 0).astype(np.int64)
        u_gsep = np.where(uc == SEP, sep_slot[uv[u_idx]], 0).astype(np.int64)
    else:
        u_idx = np.zeros((S, 0), np.int64)
        u_mask = np.zeros((S, 0), bool)
        uc = np.zeros((S, 0), np.int8)
        u_loc = np.zeros((S, 0), np.int64)
        u_gsep = np.zeros((S, 0), np.int64)

    return SubmapPartition(
        n_submaps=S, m=m, k=k, n_sep=n_sep,
        e_idx=e_idx.astype(np.int32), e_mask=e_mask,
        cls=cls, loc=loc.astype(np.int32),
        sep_ids=sep_ids.astype(np.int32),
        sep_local2global=sep_l2g.astype(np.int32),
        sep_l2g_mask=sep_l2g_mask,
        int_ids=int_ids.astype(np.int32), int_mask=int_ids >= 0,
        u_idx=u_idx.astype(np.int32), u_mask=u_mask, u_cls=uc,
        u_loc=u_loc.astype(np.int32), u_gsep=u_gsep.astype(np.int32),
    )


# ---------------------------------------------------------------------------
# Device-side solve
# ---------------------------------------------------------------------------


def _spd_solve(chol, b):
    """Solve A x = b given chol(A) for batched b (..., n, r)."""
    y = jax.scipy.linalg.solve_triangular(chol, b, lower=True)
    return jax.scipy.linalg.solve_triangular(
        chol.swapaxes(-1, -2), y, lower=False
    )


def _unary_residual(pose, z, sw, typ):
    """Unary prior residual, type-dispatched (same factors as
    `optimize_pose_graph`'s prior_*/qprior_*/plane_* groups).

    ``z`` is packed pose-layout (7,): [:4] quaternion measurement (identity
    for non-quat factors), [4:] xyz measurement / plane height in z[6].
    typ: 0 = absolute position, 1 = absolute orientation, 2 = plane.
    """
    r_xyz = pose[4:] - z[4:]
    q = se3.pose_quat(pose)
    r_quat = se3.so3_log(se3.quat_mul(se3.quat_conj(z[:4]), q))
    a = se3.quat_rotate(q, jnp.asarray([0.0, 0.0, 1.0]))
    r_plane = jnp.stack([pose[6] - z[6], a[0], a[1]])
    r = jnp.where(typ == 0, r_xyz, jnp.where(typ == 1, r_quat, r_plane))
    return r * sw


def _unary_res_jac(pose, z, sw, typ):
    def f(x):
        return _unary_residual(se3.pose_retract(pose, x), z, sw, typ)

    return f(jnp.zeros(6)), jax.jacfwd(f)(jnp.zeros(6))


def _schur_gn_body(part: SubmapPartition, params: PoseGraphParams, axis):
    """Returns gn_step(poses) -> (new_poses, dx_norm) for one shard of
    submaps. Shard-local shapes: S_l = submaps on this device."""
    INT, SEP = 0, 1
    m6, k6, n6 = 6 * part.m, 6 * part.k, 6 * part.n_sep

    def allreduce(x):
        return jax.lax.psum(x, axis) if axis is not None else x

    def step(poses, t, sep_ids, e_idx, e_mask, cls, loc, l2g, l2g_mask,
             int_ids, int_mask, u_idx, u_mask, u_cls, u_loc, u_gsep,
             edges_ij, edges_z, edges_sqrtw, edges_robust,
             u_vid, u_z, u_sw, u_typ):
        S_l = e_idx.shape[0]
        # gather this shard's edges: (S_l, Emax, ...)
        eij = edges_ij[e_idx]
        z = edges_z[e_idx]
        sqrtw = edges_sqrtw[e_idx] * e_mask[..., None]
        erob = edges_robust[e_idx]
        pi = poses[eij[..., 0]]
        pj = poses[eij[..., 1]]

        r, Ji, Jj = jax.vmap(jax.vmap(_edge_res_jac))(pi, pj, z)
        r = r * sqrtw
        Ji = Ji * sqrtw[..., None]
        Jj = Jj * sqrtw[..., None]
        # per-edge kernel policy + GNC schedule, identical to
        # `optimize_pose_graph` (robust weight only on loop edges); the
        # median floor of the truncation threshold is computed over this
        # DEVICE's edges (each edge is owned by exactly one submap, so
        # every edge is weighted once — the consensus estimate is local
        # but consistent)
        r2 = jnp.sum(r * r, -1)
        w = _edge_weights(
            r2.reshape(-1), erob.reshape(-1), e_mask.reshape(-1), params, t
        ).reshape(r2.shape) * e_mask

        J = jnp.stack([Ji, Jj], axis=2)  # (S_l, E, 2, 6, 6)
        wr = r * w[..., None]
        # all four ordered endpoint pairs (p, q): C_pq = Jpᵀ W Jq
        C = jnp.einsum("sepab,se,seqac->sepqbc", J, w, J)  # (S_l,E,2,2,6,6)
        g_blk = jnp.einsum("sepab,sea->sepb", J, wr)  # (S_l,E,2,6)

        cp = cls[:, :, :, None]  # p class (S_l,E,2,1)
        cq = cls[:, :, None, :]
        lp = loc[:, :, :, None]
        lq = loc[:, :, None, :]
        sub = jnp.arange(S_l)[:, None, None, None]

        def scat(dest_idx, mask, blocks, size):
            idx = jnp.where(mask, dest_idx, size)
            return jax.ops.segment_sum(
                (blocks * mask[..., None, None]).reshape(-1, 6, 6),
                idx.reshape(-1),
                num_segments=size + 1,
            )[:size]

        # A: interior×interior, per submap
        mA = (cp == INT) & (cq == INT)
        A = scat(
            (sub * part.m + lp) * part.m + lq, mA, C,
            S_l * part.m * part.m,
        ).reshape(S_l, part.m, part.m, 6, 6)
        # B: interior×separator(local)
        mB = (cp == INT) & (cq == SEP)
        B = scat(
            (sub * part.m + lp) * part.k + lq, mB, C,
            S_l * part.m * part.k,
        ).reshape(S_l, part.m, part.k, 6, 6)
        # separator×separator → GLOBAL sep matrix (local slots → global)
        gp = jnp.take_along_axis(
            l2g, loc.reshape(S_l, -1), axis=1
        ).reshape(loc.shape)
        gpp = gp[:, :, :, None]
        gqq = gp[:, :, None, :]
        mS = (cp == SEP) & (cq == SEP)
        Hs = scat(
            gpp * part.n_sep + gqq, mS, C, part.n_sep * part.n_sep
        ).reshape(part.n_sep, part.n_sep, 6, 6)

        # gradients
        def scat_g(dest_idx, mask, blocks, size):
            idx = jnp.where(mask, dest_idx, size)
            return jax.ops.segment_sum(
                (blocks * mask[..., None]).reshape(-1, 6),
                idx.reshape(-1),
                num_segments=size + 1,
            )[:size]

        mgi = cls == INT
        g_int = scat_g(
            jnp.arange(S_l)[:, None, None] * part.m + loc, mgi, g_blk,
            S_l * part.m,
        ).reshape(S_l, part.m, 6)
        mgs = cls == SEP
        g_sep = scat_g(gp, mgs, g_blk, part.n_sep)  # (n_sep, 6)

        # unary priors (GNSS xyz / orientation / plane): diagonal 6×6 block
        # + gradient on the factor's vertex — interior targets into this
        # shard's A/g, separator targets into the global (pre-psum) system
        if u_idx.shape[1] > 0:
            vid_u = u_vid[u_idx]  # (S_l, U)
            p_u = poses[vid_u]
            r_u, J_u = jax.vmap(jax.vmap(_unary_res_jac))(
                p_u, u_z[u_idx], u_sw[u_idx], u_typ[u_idx]
            )  # (S_l,U,3), (S_l,U,3,6)
            C_u = jnp.einsum("suab,suac->subc", J_u, J_u)  # (S_l,U,6,6)
            g_u = jnp.einsum("suab,sua->sub", J_u, r_u)  # (S_l,U,6)
            sub_u = jnp.arange(S_l)[:, None]
            mUi = u_mask & (u_cls == INT)
            A = A + scat(
                (sub_u * part.m + u_loc) * part.m + u_loc, mUi, C_u,
                S_l * part.m * part.m,
            ).reshape(S_l, part.m, part.m, 6, 6)
            g_int = g_int + scat_g(
                sub_u * part.m + u_loc, mUi, g_u, S_l * part.m
            ).reshape(S_l, part.m, 6)
            mUs = u_mask & (u_cls == SEP)
            Hs = Hs + scat(
                u_gsep * part.n_sep + u_gsep, mUs, C_u,
                part.n_sep * part.n_sep,
            ).reshape(part.n_sep, part.n_sep, 6, 6)
            g_sep = g_sep + scat_g(u_gsep, mUs, g_u, part.n_sep)

        # dense per-submap interior system (S_l, 6m, 6m); padded interior
        # slots carry an identity diagonal so the factorization stays SPD
        Ad = A.transpose(0, 1, 3, 2, 4).reshape(S_l, m6, m6)
        dmask = jnp.repeat(~int_mask, 6, axis=1).astype(Ad.dtype)  # (S_l, 6m)
        Ad = Ad + jax.vmap(jnp.diag)(dmask) + jnp.eye(m6)[None] * params.damping
        chol = jnp.linalg.cholesky(Ad)

        Bd = B.transpose(0, 1, 3, 2, 4).reshape(S_l, m6, k6)
        gi = g_int.reshape(S_l, m6)

        Y = _spd_solve(chol, Bd)  # (S_l, 6m, 6k)
        xg = _spd_solve(chol, gi[..., None])[..., 0]  # (S_l, 6m)

        dH = jnp.einsum("smk,sml->skl", Bd, Y)  # (S_l, 6k, 6k)
        dg = jnp.einsum("smk,sm->sk", Bd, xg)  # (S_l, 6k)

        # scatter local (6k) blocks into the global separator system
        l2g_safe = jnp.where(l2g_mask, l2g, part.n_sep)
        rowg = (
            l2g_safe[:, :, None] * 6 + jnp.arange(6)[None, None, :]
        ).reshape(S_l, k6)
        flat = rowg[:, :, None] * (n6 + 6) + rowg[:, None, :]
        Hs_corr = jax.ops.segment_sum(
            dH.reshape(-1), flat.reshape(-1),
            num_segments=(n6 + 6) * (n6 + 6),
        ).reshape(n6 + 6, n6 + 6)[:n6, :n6]
        gs_corr = jax.ops.segment_sum(
            dg.reshape(-1), rowg.reshape(-1), num_segments=n6 + 6
        )[:n6]

        Hsep = Hs.transpose(0, 2, 1, 3).reshape(n6, n6)
        Hsep = allreduce(Hsep - Hs_corr)
        gsep = allreduce(g_sep.reshape(n6) - gs_corr)

        # sep_ids is a TRACED input, never a baked constant: the jitted
        # driver is memoized on shapes, and a later graph with the same
        # padded sizes has a different separator set — baking the first
        # call's ids would scatter separator increments to wrong vertices
        sep_pad = jnp.repeat((sep_ids < 0), 6).astype(Hsep.dtype)
        Hsep = Hsep + jnp.diag(sep_pad) + jnp.eye(n6) * params.damping
        chol_s = jnp.linalg.cholesky(Hsep)
        dx_sep = _spd_solve(chol_s, (-gsep)[:, None])[:, 0]  # (6·n_sep,)

        # back-substitution: dx_int = A⁻¹(−g_i − B dx_sep_local)
        dxs_local = dx_sep.reshape(part.n_sep, 6)[l2g_safe.clip(0, part.n_sep - 1)]
        dxs_local = dxs_local * l2g_mask[..., None]
        rhs = -gi - jnp.einsum("smk,sk->sm", Bd, dxs_local.reshape(S_l, k6))
        dx_int = _spd_solve(chol, rhs[..., None])[..., 0]  # (S_l, 6m)

        # scatter into (V, 6): interiors (shard-local) + separators (replicated)
        V = poses.shape[0]
        ids = jnp.where(int_mask, int_ids, V)
        dxv = jax.ops.segment_sum(
            (dx_int.reshape(S_l, part.m, 6) * int_mask[..., None]).reshape(-1, 6),
            ids.reshape(-1),
            num_segments=V + 1,
        )[:V]
        dxv = allreduce(dxv)
        sep_ids_safe = jnp.where(sep_ids >= 0, sep_ids, V)
        # dx_sep is replicated (each device solved the same psum'd system),
        # so it is added locally, NOT summed across devices
        dxv = dxv + jax.ops.segment_sum(
            dx_sep.reshape(part.n_sep, 6) * (sep_ids >= 0)[:, None],
            sep_ids_safe,
            num_segments=V + 1,
        )[:V]

        dxv = _clamp_step(dxv, params)
        new_poses = jax.vmap(se3.pose_retract)(poses, dxv)
        dxn = jnp.sqrt(jnp.sum(dxv * dxv) / V)
        return new_poses, dxn

    return step


def _pack_unaries(
    prior_xyz, prior_idx, prior_sqrtw, prior_mask,
    qprior_quat, qprior_idx, qprior_sqrtw, qprior_mask,
    plane_idx, plane_z, plane_sqrtw, plane_mask,
):
    """Pack the three prior groups into one typed list (host side).

    Packed measurement layout is pose-shaped (7,): [:4] quaternion (identity
    unless an orientation prior), [4:] xyz (plane height in slot 6).
    """
    vids, zs, sws, typs = [], [], [], []

    def take(idx, mask):
        idx = np.asarray(idx, np.int64)
        m = np.ones(idx.shape, bool) if mask is None else np.asarray(mask, bool)
        return idx[m], m

    if prior_idx is not None:
        idx, m = take(prior_idx, prior_mask)
        z = np.zeros((idx.size, 7), np.float32)
        z[:, 0] = 1.0
        z[:, 4:] = np.asarray(prior_xyz, np.float32)[m]
        vids.append(idx)
        zs.append(z)
        sws.append(np.asarray(prior_sqrtw, np.float32)[m])
        typs.append(np.zeros(idx.size, np.int32))
    if qprior_idx is not None:
        idx, m = take(qprior_idx, qprior_mask)
        z = np.zeros((idx.size, 7), np.float32)
        z[:, :4] = np.asarray(qprior_quat, np.float32)[m]
        vids.append(idx)
        zs.append(z)
        sws.append(np.asarray(qprior_sqrtw, np.float32)[m])
        typs.append(np.ones(idx.size, np.int32))
    if plane_idx is not None:
        idx, m = take(plane_idx, plane_mask)
        z = np.zeros((idx.size, 7), np.float32)
        z[:, 0] = 1.0
        z[:, 6] = np.asarray(plane_z, np.float32)[m]
        vids.append(idx)
        zs.append(z)
        sws.append(np.asarray(plane_sqrtw, np.float32)[m])
        typs.append(np.full(idx.size, 2, np.int32))

    if not vids:
        return (np.zeros(0, np.int64), np.zeros((0, 7), np.float32),
                np.zeros((0, 3), np.float32), np.zeros(0, np.int32))
    return (np.concatenate(vids), np.concatenate(zs),
            np.concatenate(sws), np.concatenate(typs))


def optimize_pose_graph_schur(
    poses,
    edges_ij,
    edges_z,
    edges_sqrtw,
    emask,
    n_submaps: int = 16,
    fixed=None,
    mesh: Mesh | None = None,
    edges_robust=None,
    prior_xyz=None, prior_idx=None, prior_sqrtw=None, prior_mask=None,
    qprior_quat=None, qprior_idx=None, qprior_sqrtw=None, qprior_mask=None,
    plane_idx=None, plane_z=None, plane_sqrtw=None, plane_mask=None,
    params: PoseGraphParams = PoseGraphParams(),
):
    """Schur-complement submap solve. Interface mirrors
    ``optimize_pose_graph`` (vmask implicit: all vertices real; pad the graph
    before calling; unary prior groups identical, masks must be concrete
    host values). Returns (poses, PoseGraphStats)."""
    V = poses.shape[0]
    if fixed is None:
        fixed_np = np.zeros(V, bool)
        fixed_np[0] = True
    else:
        fixed_np = np.asarray(fixed, bool)

    u_vid, u_z, u_sw, u_typ = _pack_unaries(
        prior_xyz, prior_idx, prior_sqrtw, prior_mask,
        qprior_quat, qprior_idx, qprior_sqrtw, qprior_mask,
        plane_idx, plane_z, plane_sqrtw, plane_mask,
    )

    n_dev = 1 if mesh is None else int(mesh.devices.size)
    S = max(n_submaps, n_dev)
    S = ((S + n_dev - 1) // n_dev) * n_dev  # multiple of mesh size
    part = partition_graph(
        np.asarray(edges_ij), np.asarray(emask), V, S, fixed_np,
        unary_vid=u_vid,
    )
    axis = None if mesh is None else mesh.axis_names[0]

    step = _schur_gn_body(part, params, axis)

    e_z = jnp.asarray(edges_z)
    e_ij = jnp.asarray(edges_ij)
    e_sw = jnp.asarray(edges_sqrtw) * jnp.asarray(emask)[:, None]
    e_rob = (
        jnp.ones(e_ij.shape[0], bool)
        if edges_robust is None
        else jnp.asarray(edges_robust, bool)
    )
    u_vid_d = jnp.asarray(u_vid, jnp.int32)
    u_z_d = jnp.asarray(u_z)
    u_sw_d = jnp.asarray(u_sw)
    u_typ_d = jnp.asarray(u_typ)

    has_unaries = bool(u_vid.size)

    consts = (
        jnp.asarray(part.e_idx), jnp.asarray(part.e_mask),
        jnp.asarray(part.cls), jnp.asarray(part.loc),
        jnp.asarray(part.sep_local2global), jnp.asarray(part.sep_l2g_mask),
        jnp.asarray(part.int_ids), jnp.asarray(part.int_mask),
        jnp.asarray(part.u_idx), jnp.asarray(part.u_mask),
        jnp.asarray(part.u_cls), jnp.asarray(part.u_loc),
        jnp.asarray(part.u_gsep),
    )
    repl = (
        jnp.asarray(part.sep_ids, jnp.int32),
        e_ij, e_z, e_sw, e_rob, u_vid_d, u_z_d, u_sw_d, u_typ_d,
    )

    # the jitted driver is memoized on (static partition geometry, params,
    # mesh, input shapes): `step` reads the partition arrays as traced
    # inputs and closes over `part` only through its padded sizes, so two
    # calls with equal key share one executable — without this every solve
    # re-traces + re-lowers a 12-iteration scan (≈2 s host work per call at
    # city scale, 80× the actual device solve time)
    key = (
        params, None if mesh is None else id(mesh),
        part.n_submaps, part.m, part.k, part.n_sep,
        tuple((tuple(a.shape), str(a.dtype)) for a in (jnp.asarray(poses), *repl)),
        tuple((tuple(c.shape), str(c.dtype)) for c in consts),
    )
    run_jit = _RUN_CACHE.get(key)
    if run_jit is None:

        def run(p0, sep_ids, e_ij, e_z, e_sw, e_rob, u_vid, u_z, u_sw,
                u_typ, *consts_dev):
            def body(carry, _):
                p, done, iters = carry
                new_p, dxn = step(
                    p, iters, sep_ids, *consts_dev, e_ij, e_z, e_sw, e_rob,
                    u_vid, u_z, u_sw, u_typ,
                )
                # no convergence mid-GNC-anneal (surrogate still changing)
                small = (
                    (dxn < params.converged_dx) & (iters >= params.gnc_iters)
                )
                p = jnp.where(done, p, new_p)
                return (p, done | small, iters + jnp.where(done, 0, 1)), None

            init = (p0, jnp.array(False), jnp.array(0, jnp.int32))
            (out, _, iters), _ = jax.lax.scan(
                body, init, None, length=params.gn_iters
            )

            # chi2 before/after inside the same executable: an eager
            # (unjitted) vmap evaluation here costs hundreds of ms of
            # op-by-op dispatch per solve
            def chi2_of(p):
                r = jax.vmap(edge_residual)(
                    p[e_ij[:, 0]], p[e_ij[:, 1]], e_z
                ) * e_sw
                c = jnp.sum(r * r)
                if has_unaries:
                    ru = jax.vmap(_unary_residual)(p[u_vid], u_z, u_sw, u_typ)
                    c = c + jnp.sum(ru * ru)
                return c

            return out, iters, chi2_of(p0), chi2_of(out)

        if mesh is None:
            run_jit = jax.jit(run)
        else:
            axis_n = mesh.axis_names[0]
            in_specs = (
                (P(),) * (1 + len(repl)) + (P(axis_n),) * len(consts)
            )
            run_jit = jax.jit(jax.shard_map(
                run, mesh=mesh, in_specs=in_specs,
                out_specs=(P(), P(), P(), P()),
                check_vma=False,
            ))
        _RUN_CACHE[key] = run_jit
    out, iters, chi2_0, chi2_1 = run_jit(jnp.asarray(poses), *repl, *consts)
    return out, PoseGraphStats(chi2_0, chi2_1, iters)
