"""Sliding-window local map — fixed-capacity scan ring buffer.

The reference's tracker depends on a local-map container whose header is
missing from the snapshot (`LidarTrackerLocalMap.hpp:15,40,84` references
`PointCloudLocalMapBase` / `make_localMap`); SURVEY.md §2.4 specifies the
implied interface: ``AddFrameForMotion`` / ``AddFrameForTime`` (insert a new
scan, evicting the oldest when full), ``GetLocalMap`` (the union cloud), and
``is_full``. TPU-native design: the window is a static ``(S, P, 3)`` array +
mask; insertion is a ring-buffer row write (pure ``dynamic_update_slice``);
the union map is a zero-copy reshape — so the whole tracker step stays inside
one jitted program with no host round-trips.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..common.pointcloud import PointBatch


class LocalMapState(NamedTuple):
    xyz: jax.Array  # (S, P, 3) scans in odom frame
    mask: jax.Array  # (S, P) bool
    write_idx: jax.Array  # int32: next ring slot
    count: jax.Array  # int32: filled slots (≤ S)


def localmap_empty(window: int, points_per_scan: int) -> LocalMapState:
    return LocalMapState(
        xyz=jnp.zeros((window, points_per_scan, 3), jnp.float32),
        mask=jnp.zeros((window, points_per_scan), bool),
        write_idx=jnp.array(0, jnp.int32),
        count=jnp.array(0, jnp.int32),
    )


def localmap_add(state: LocalMapState, pb: PointBatch) -> LocalMapState:
    """Insert one scan (already in odom frame), evicting the oldest when full.

    ``pb`` must have capacity == points_per_scan; truncates otherwise.
    """
    P = state.xyz.shape[1]
    xyz = pb.xyz[:P]
    mask = pb.mask[:P]
    if xyz.shape[0] < P:
        xyz = jnp.pad(xyz, ((0, P - xyz.shape[0]), (0, 0)))
        mask = jnp.pad(mask, (0, P - mask.shape[0]))
    S = state.xyz.shape[0]
    slot = state.write_idx
    new_xyz = jax.lax.dynamic_update_slice(state.xyz, xyz[None], (slot, 0, 0))
    new_mask = jax.lax.dynamic_update_slice(state.mask, mask[None], (slot, 0))
    return LocalMapState(
        xyz=new_xyz,
        mask=new_mask,
        write_idx=(slot + 1) % S,
        count=jnp.minimum(state.count + 1, S),
    )


def localmap_add_if(state: LocalMapState, pb: PointBatch, pred) -> LocalMapState:
    """Conditionally insert (static-shape branchless update)."""
    updated = localmap_add(state, pb)
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(
            jnp.reshape(pred, (1,) * a.ndim) if a.ndim else pred, a, b
        ),
        updated,
        state,
    )


def localmap_flatten(state: LocalMapState) -> PointBatch:
    """The union local map as one padded PointBatch (zero-copy reshape)."""
    S, P, _ = state.xyz.shape
    return PointBatch(state.xyz.reshape(S * P, 3), state.mask.reshape(S * P))


def localmap_is_full(state: LocalMapState) -> jax.Array:
    return state.count >= state.xyz.shape[0]
