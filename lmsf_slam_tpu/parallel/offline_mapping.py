"""Sequence-sharded offline mapping: map a long trajectory across a mesh.

SURVEY §7.2 step 9 / §2.9: where the reference scales by running more ROS
nodes on more machines, the TPU-native answer shards the SEQUENCE — each
device tracks a contiguous chunk of scans independently (pure per-device
compute, zero collectives), chunk boundaries are stitched by registering the
first scan of each chunk against the previous chunk's final local map (one
batched registration), and the composed trajectory can then be refined by
the edge-sharded pose-graph solve (`optimize_pose_graph_sharded`).

Wall-clock: tracking is embarrassingly parallel over chunks — an F-frame
sequence costs F/C sequential tracker steps instead of F, plus one batched
stitch registration and one graph solve.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..common import se3
from ..common.pointcloud import PointBatch
from ..ops.registration import RegistrationParams, register_edge_surf
from ..tracker.tracker import TrackerConfig, tracker_init, tracker_step


class OfflineMapResult(NamedTuple):
    poses: np.ndarray  # (F, 7) stitched global trajectory
    chunk_poses: np.ndarray  # (C, F/C, 7) per-chunk local trajectories
    stitch_converged: np.ndarray  # (C-1,) bool


def _make_varying(tree, zero):
    """Mix a varying zero into every leaf of a replicated pytree so that,
    under shard_map, downstream cond/scan carries have consistent varying
    axes (scan-vma rules: a replicated constant meeting a sharded value in
    a branch/carry is a type error)."""
    izero = zero.astype(jnp.int32)

    def fix(a):
        if a.dtype == jnp.bool_:
            return a ^ (zero > 1.0)
        if jnp.issubdtype(a.dtype, jnp.integer):
            return a + izero.astype(a.dtype)
        return a + zero.astype(a.dtype)

    return jax.tree_util.tree_map(fix, tree)


def _track_chunk(edge_xyz, edge_mask, surf_xyz, surf_mask, ts, init_motion, config):
    """Sequential tracking of one chunk; returns (poses, final flat maps).

    ``init_motion``: (7,) inter-frame motion prior for the chunk's cold
    start (identity when none). A chunk's first scan pair has only a
    single-scan map and no velocity history — in self-similar geometry the
    registration is degenerate exactly along the travel direction, so real
    deployments seed this from IMU/wheel odometry or a coarse pre-pass."""
    state = _make_varying(tracker_init(config), 0.0 * edge_xyz[0, 0, 0])
    state = state._replace(motion=init_motion)

    def step(state, inp):
        exyz, emask, sxyz, smask, t = inp
        state, out = tracker_step(
            state, PointBatch(exyz, emask), PointBatch(sxyz, smask), t, config
        )
        return state, out.pose

    state, poses = jax.lax.scan(
        step, state, (edge_xyz, edge_mask, surf_xyz, surf_mask, ts)
    )
    return (
        poses,
        state.edge_flat.xyz, state.edge_flat.mask,
        state.surf_flat.xyz, state.surf_flat.mask,
        state.pose, state.motion,
    )


@partial(jax.jit, static_argnames=("config", "mesh"))
def _track_all_chunks(
    mesh, edge_xyz, edge_mask, surf_xyz, surf_mask, ts, init_motion, config
):
    """shard_map over the chunk axis: each device tracks its chunk."""
    from jax.experimental.shard_map import shard_map

    def body(e, em, s, sm, t, im):
        out = _track_chunk(e[0], em[0], s[0], sm[0], t[0], im[0], config)
        return tuple(x[None] for x in out)

    spec = P("data")
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec,) * 6,
        out_specs=(spec,) * 7,
    )
    return fn(edge_xyz, edge_mask, surf_xyz, surf_mask, ts, init_motion)


def offline_map_sequence(
    mesh: Mesh,
    edge: PointBatch,  # (F, Ne, 3) feature scans (sensor frame)
    surf: PointBatch,  # (F, Ns, 3)
    timestamps: jax.Array,  # (F,)
    config: TrackerConfig,
    stitch_params: RegistrationParams | None = None,
    init_motions: jax.Array | None = None,  # (C,7) cold-start motion priors
) -> OfflineMapResult:
    """Track an F-frame sequence sharded over ``mesh``'s 'data' axis."""
    C = mesh.devices.size
    F = edge.xyz.shape[0]
    assert F % C == 0, f"frames ({F}) must divide into {C} chunks"
    L = F // C

    def chunked(x):
        return x.reshape((C, L) + x.shape[1:])

    sharding = NamedSharding(mesh, P("data"))
    args = [
        jax.device_put(chunked(a), sharding)
        for a in (edge.xyz, edge.mask, surf.xyz, surf.mask)
    ]
    ts = jax.device_put(chunked(timestamps), sharding)
    if init_motions is None:
        init_motions = jnp.tile(se3.pose_identity(), (C, 1))
    init_motions = jax.device_put(init_motions, sharding)
    (
        chunk_poses, ef_xyz, ef_mask, sf_xyz, sf_mask, last_pose, last_motion
    ) = _track_all_chunks(mesh, *args, ts, init_motions, config)

    # -- stitch: first scan of chunk c+1 vs final map of chunk c (batched) --
    if stitch_params is None:
        stitch_params = config.registration._replace(
            max_corr_dist=2.0, max_iters=16
        )
    e_first = PointBatch(chunked(edge.xyz)[1:, 0], chunked(edge.mask)[1:, 0])
    s_first = PointBatch(chunked(surf.xyz)[1:, 0], chunked(surf.mask)[1:, 0])
    init = jax.vmap(se3.pose_compose)(last_pose[:-1], last_motion[:-1])
    reg = jax.vmap(
        lambda ee, em, ss, sm, me, mem, ms, msm, ip: register_edge_surf(
            PointBatch(ee, em), PointBatch(ss, sm),
            PointBatch(me, mem), PointBatch(ms, msm), ip, stitch_params,
        )
    )(
        e_first.xyz, e_first.mask, s_first.xyz, s_first.mask,
        ef_xyz[:-1], ef_mask[:-1], sf_xyz[:-1], sf_mask[:-1], init,
    )

    # -- compose chunk offsets: O_{c+1} = O_c ∘ stitch_pose_c ----------------
    chunk_poses_np = np.asarray(chunk_poses)
    stitch = np.asarray(reg.pose)  # pose of scan (c+1, 0) in chunk-c frame
    offsets = [np.asarray(se3.pose_identity())]
    for c in range(C - 1):
        offsets.append(
            np.asarray(
                se3.pose_compose(jnp.asarray(offsets[-1]), jnp.asarray(stitch[c]))
            )
        )
    offsets = np.stack(offsets)  # (C, 7)

    # global pose of frame (c, i): chunk frame i=0 pose is identity, and the
    # stitch directly measured frame (c,0) in chunk c−1's frame — so
    # global = O_c ∘ (traj[c,0]⁻¹ ∘ traj[c,i]) with traj[c,0] == identity
    out = np.asarray(
        jax.vmap(
            lambda off, tr: jax.vmap(lambda p: se3.pose_compose(off, p))(tr)
        )(jnp.asarray(offsets), jnp.asarray(chunk_poses_np))
    )
    return OfflineMapResult(
        poses=out.reshape(F, 7),
        chunk_poses=chunk_poses_np,
        stitch_converged=np.asarray(reg.converged),
    )
