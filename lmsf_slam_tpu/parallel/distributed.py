"""Multi-chip scale-out: sharded frontend + distributed pose-graph solve.

The reference's entire parallel surface is OpenMP threads and a multi-node
ROS graph (SURVEY.md §2.9 — `ML_System.hpp:130,137,248` omp-over-lidars;
`launch/FactorGraphFusionSLAM.launch` process-level pipeline). The TPU-native
replacement is a `jax.sharding.Mesh` with two axes:

- ``data``: frames (scans) are embarrassingly parallel in the frontend —
  batched registration is vmapped and sharded over this axis (the analog of
  data parallelism / the reference's omp-over-lidars and offline bag replay);
- ``graph``: pose-graph *edges* are sharded over this axis. Each Gauss-Newton
  step runs matrix-free PCG where every Hessian-vector product is computed
  from local edges and reduced with one ``psum`` over ICI — the distributed
  equivalent of a Schur/normal-equation reduction. Vertex state stays
  replicated (poses are tiny: V×7 floats), so no all-gather is needed.

Everything works identically on 1 device (collectives become no-ops), on the
8-device virtual CPU mesh used in tests, and on a real pod slice.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..common import se3
from ..common.pointcloud import PointBatch
from ..backend.pose_graph import (
    PoseGraphParams,
    PoseGraphStats,
    _edge_res_jac,
    _robust_weight,
    edge_residual,
)
from ..ops.registration import RegistrationParams, register_edge_surf


def make_mesh(
    n_devices: int | None = None,
    axis: str = "graph",
    backend: str | None = None,
    allow_cpu_fallback: bool = True,
) -> Mesh:
    """1-D device mesh over the first ``n_devices`` local devices.

    When the default backend has too few devices (the single-chip dev box)
    and ``allow_cpu_fallback`` is True, the mesh is built on the virtual CPU
    backend instead — how the multi-chip path is exercised without a pod
    slice (SURVEY.md §4 test strategy). The fallback is LOUD (a warning
    names the substituted backend) because a CPU mesh silently standing in
    for TPUs is a production-performance footgun; pass
    ``allow_cpu_fallback=False`` (or an explicit ``backend``) to make it a
    hard error instead.
    """
    devs = jax.devices(backend) if backend else jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if len(devs) < n_devices and backend is None:
        if not allow_cpu_fallback:
            raise ValueError(
                f"need {n_devices} {devs[0].platform} devices, have "
                f"{len(devs)} (CPU fallback disabled)"
            )
        import warnings

        warnings.warn(
            f"make_mesh: only {len(devs)} {devs[0].platform} device(s) "
            f"available; building the {n_devices}-device mesh on the virtual "
            "CPU backend — fine for tests, wrong for production perf",
            stacklevel=2,
        )
        devs = jax.devices("cpu")
    if len(devs) < n_devices:
        raise ValueError(f"need {n_devices} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n_devices]), (axis,))


# ---------------------------------------------------------------------------
# Data-parallel frontend: batched registration sharded over frames
# ---------------------------------------------------------------------------


def register_frames_batched(
    src_edge: PointBatch,  # leading frame axis (F, N, 3) / (F, N)
    src_surf: PointBatch,
    map_edge: PointBatch,  # (F, M, 3) per-frame maps (e.g. previous scans)
    map_surf: PointBatch,
    init_poses: jax.Array,  # (F, 7)
    mesh: Mesh | None = None,
    params: RegistrationParams = RegistrationParams(),
):
    """Register F frames in parallel; frames sharded over the mesh axis.

    The per-frame program is the same fused GN loop as the single-frame path;
    sharding the leading axis makes XLA run F/n independent registrations per
    chip with zero communication (the frontend has no cross-frame coupling).
    """
    fn = jax.vmap(lambda e, s, me, ms, p: register_edge_surf(e, s, me, ms, p, params))
    args = (src_edge, src_surf, map_edge, map_surf, init_poses)
    if mesh is not None:
        shard = NamedSharding(mesh, P(mesh.axis_names[0]))
        args = jax.tree.map(lambda x: jax.device_put(x, shard), args)
    return jax.jit(fn)(*args)


# ---------------------------------------------------------------------------
# Distributed pose-graph Gauss-Newton (edges sharded, psum reduction)
# ---------------------------------------------------------------------------


def _gn_solve_replicated(poses, free, i_idx, j_idx, edges_z, edges_sqrtw, emask,
                         params: PoseGraphParams, axis: str | None):
    """GN + block-Jacobi PCG where edge arrays are the *local shard* and every
    edge-reduction is followed by ``psum`` over ``axis`` (no-op when None).

    Poses/free are replicated; the result is replicated. This is the inner
    body shared by the single-device and shard_map paths — the only
    difference collectives make is summing partial segment-sums over chips.
    """
    V = poses.shape[0]

    def allreduce(x):
        return jax.lax.psum(x, axis) if axis is not None else x

    def chi2_of(p):
        r = jax.vmap(edge_residual)(p[i_idx], p[j_idx], edges_z) * edges_sqrtw
        return allreduce(jnp.sum(jnp.where(emask, jnp.sum(r * r, -1), 0.0)))

    def gn_step(carry, _):
        p, done, iters = carry
        r, Ji, Jj = jax.vmap(_edge_res_jac)(p[i_idx], p[j_idx], edges_z)
        r = r * edges_sqrtw
        Ji = Ji * edges_sqrtw[:, :, None]
        Jj = Jj * edges_sqrtw[:, :, None]
        r2 = jnp.sum(r * r, axis=-1)
        w = _robust_weight(r2, params.kernel, params.kernel_delta) * emask

        def matvec(x):
            y = jnp.einsum("eab,eb->ea", Ji, x[i_idx]) + jnp.einsum(
                "eab,eb->ea", Jj, x[j_idx]
            )
            y = y * w[:, None]
            out = jax.ops.segment_sum(
                jnp.einsum("eab,ea->eb", Ji, y), i_idx, num_segments=V
            ) + jax.ops.segment_sum(
                jnp.einsum("eab,ea->eb", Jj, y), j_idx, num_segments=V
            )
            out = allreduce(out)
            return jnp.where(free[:, None], out + params.damping * x, 0.0)

        wr = r * w[:, None]
        g = jax.ops.segment_sum(
            jnp.einsum("eab,ea->eb", Ji, wr), i_idx, num_segments=V
        ) + jax.ops.segment_sum(jnp.einsum("eab,ea->eb", Jj, wr), j_idx, num_segments=V)
        g = jnp.where(free[:, None], allreduce(g), 0.0)

        Bi = jnp.einsum("eab,eac,e->ebc", Ji, Ji, w)
        Bj = jnp.einsum("eab,eac,e->ebc", Jj, Jj, w)
        M = allreduce(
            jax.ops.segment_sum(Bi, i_idx, num_segments=V)
            + jax.ops.segment_sum(Bj, j_idx, num_segments=V)
        )
        Minv = jnp.linalg.inv(M + (params.damping + 1e-6) * jnp.eye(6))

        def precond(x):
            return jnp.where(free[:, None], jnp.einsum("vab,vb->va", Minv, x), 0.0)

        b = -g
        x0 = jnp.zeros_like(b)
        z0 = precond(b)
        rz0 = jnp.sum(b * z0)

        def pcg_body(c, _):
            x, rr, zz, pp, rz = c
            Ap = matvec(pp)
            pAp = jnp.sum(pp * Ap)
            alpha = rz / jnp.where(jnp.abs(pAp) > 1e-20, pAp, 1e-20)
            x = x + alpha * pp
            rr = rr - alpha * Ap
            zz = precond(rr)
            rz_new = jnp.sum(rr * zz)
            beta = rz_new / jnp.where(jnp.abs(rz) > 1e-20, rz, 1e-20)
            return (x, rr, zz, zz + beta * pp, rz_new), None

        (dx, _, _, _, _), _ = jax.lax.scan(
            pcg_body, (x0, b, z0, z0, rz0), None, length=params.pcg_iters
        )

        new_p = jnp.where(free[:, None], jax.vmap(se3.pose_retract)(p, dx), p)
        dx_norm = jnp.sqrt(jnp.sum(dx * dx) / jnp.maximum(jnp.sum(free), 1))
        small = dx_norm < params.converged_dx
        p = jnp.where(done, p, new_p)
        iters = iters + jnp.where(done, 0, 1)
        return (p, done | small, iters), None

    chi2_0 = chi2_of(poses)
    init = (poses, jnp.array(False), jnp.array(0, jnp.int32))
    (out, _, iters), _ = jax.lax.scan(gn_step, init, None, length=params.gn_iters)
    return out, PoseGraphStats(chi2_0, chi2_of(out), iters)


def optimize_pose_graph_sharded(
    poses: jax.Array,  # (V, 7) replicated
    vmask: jax.Array,
    edges_ij: jax.Array,  # (E, 2) — E must be divisible by mesh size (pad!)
    edges_z: jax.Array,
    edges_sqrtw: jax.Array,
    emask: jax.Array,
    mesh: Mesh,
    fixed: jax.Array | None = None,
    params: PoseGraphParams = PoseGraphParams(),
):
    """Distributed GN/PCG pose-graph solve: edges sharded over the mesh axis,
    vertices replicated, one psum per edge-reduction. Matches
    ``optimize_pose_graph`` bit-for-bit up to reduction order."""
    V = poses.shape[0]
    if fixed is None:
        fixed = jnp.zeros(V, bool).at[0].set(True)
    free = vmask & ~fixed
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    E = edges_ij.shape[0]
    pad = (-E) % n
    if pad:
        edges_ij = jnp.pad(edges_ij, ((0, pad), (0, 0)))
        edges_z = jnp.pad(edges_z, ((0, pad), (0, 0)), constant_values=0.0)
        edges_z = edges_z.at[E:, 0].set(1.0)  # identity quats on padding
        edges_sqrtw = jnp.pad(edges_sqrtw, ((0, pad), (0, 0)))
        emask = jnp.pad(emask, (0, pad))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), (P(), P(), P())),
    )
    def run(p, fr, eij, ez, esw, em):
        out, stats = _gn_solve_replicated(
            p, fr, eij[:, 0], eij[:, 1], ez, esw, em, params, axis
        )
        return out, tuple(stats)

    out, stats = jax.jit(run)(poses, free, edges_ij, edges_z, edges_sqrtw, emask)
    return out, PoseGraphStats(*stats)


# ---------------------------------------------------------------------------
# Full multi-chip SLAM step (frontend + backend) — the "training step"
# ---------------------------------------------------------------------------


def slam_training_step(mesh: Mesh, frames, graph, reg_params=None, pg_params=None):
    """One full sharded SLAM iteration: data-parallel frame registration over
    the ``data``/first mesh axis + edge-sharded pose-graph optimization.

    ``frames``: dict with PointBatch pytrees ``src_edge, src_surf, map_edge,
    map_surf`` (leading frame axis) and ``init_poses`` (F, 7).
    ``graph``: dict with ``poses, vmask, edges_ij, edges_z, edges_sqrtw,
    emask``.

    Returns (per-frame RegistrationResult, optimized poses, stats). This is
    the function the driver's multi-chip dry-run compiles.
    """
    reg_params = reg_params or RegistrationParams(max_iters=2)
    pg_params = pg_params or PoseGraphParams(gn_iters=2, pcg_iters=8)
    axis = mesh.axis_names[0]

    reg_fn = jax.vmap(
        lambda e, s, me, ms, p: register_edge_surf(e, s, me, ms, p, reg_params)
    )
    frame_args = (
        frames["src_edge"],
        frames["src_surf"],
        frames["map_edge"],
        frames["map_surf"],
        frames["init_poses"],
    )
    shard = NamedSharding(mesh, P(axis))
    frame_args = jax.tree.map(lambda x: jax.device_put(x, shard), frame_args)
    reg_out = jax.jit(reg_fn)(*frame_args)

    poses_opt, stats = optimize_pose_graph_sharded(
        graph["poses"],
        graph["vmask"],
        graph["edges_ij"],
        graph["edges_z"],
        graph["edges_sqrtw"],
        graph["emask"],
        mesh,
        params=pg_params,
    )
    return reg_out, poses_opt, stats
