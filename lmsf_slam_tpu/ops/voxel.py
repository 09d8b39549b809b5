"""Voxel-grid operations: downsampling and voxel Gaussian statistics.

Replaces the reference's PCL voxel filter (`Filter/voxel_grid.hpp`, factory
`filter_factory.hpp:36-47`) and the voxel statistics inside NDT
(`ndt_omp` external lib). XLA-native formulation: integer voxel keys →
``sort`` → segment boundaries → ``segment_sum`` scatter-mean. Everything is
static-shaped; the number of occupied voxels is bounded by a fixed output
capacity.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..common.pointcloud import PointBatch

# grid is G³ cells, centered on the centroid of the valid points.
_G = 1024  # 2^30 linear ids < int32 max


def _snap_origin(xyz, mask, voxel_size):
    """Grid origin: cloud centroid snapped to the global voxel lattice, so
    cell boundaries are identical across clouds (deterministic binning)."""
    cnt = jnp.maximum(jnp.sum(mask), 1)
    centroid = jnp.sum(jnp.where(mask[:, None], xyz, 0.0), axis=0) / cnt
    return jnp.floor(centroid / voxel_size) * voxel_size


def _voxel_keys(xyz, mask, voxel_size, origin):
    ci = jnp.floor((xyz - origin) / voxel_size).astype(jnp.int32) + _G // 2
    ci = jnp.clip(ci, 0, _G - 1)
    key = (ci[:, 0] * _G + ci[:, 1]) * _G + ci[:, 2]
    return jnp.where(mask, key, jnp.int32(2**31 - 1))


@partial(jax.jit, static_argnames=("out_capacity",))
def voxel_downsample(pb: PointBatch, voxel_size: float, out_capacity: int) -> PointBatch:
    """Scatter-mean voxel downsample to a fixed-capacity PointBatch."""
    mask = pb.mask
    origin = _snap_origin(pb.xyz, mask, voxel_size)
    keys = _voxel_keys(pb.xyz, mask, voxel_size, origin)
    order = jnp.argsort(keys)
    skeys = keys[order]
    sxyz = pb.xyz[order]
    smask = mask[order]
    sattr = pb.attr[order]
    is_start = jnp.concatenate([jnp.array([True]), skeys[1:] != skeys[:-1]])
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    # drop invalid points into an out-of-range segment
    seg = jnp.where(smask, seg, out_capacity)
    ones = smask.astype(jnp.float32)
    sums = jax.ops.segment_sum(sxyz * ones[:, None], seg, num_segments=out_capacity)
    asum = jax.ops.segment_sum(sattr * ones[:, None], seg, num_segments=out_capacity)
    counts = jax.ops.segment_sum(ones, seg, num_segments=out_capacity)
    denom = jnp.maximum(counts, 1.0)[:, None]
    return PointBatch(sums / denom, counts > 0, asum / denom)


@partial(jax.jit, static_argnames=("max_voxels",))
def voxel_gaussians(pb: PointBatch, voxel_size: float, max_voxels: int):
    """Per-voxel Gaussian statistics (mean, covariance, count) for NDT-style
    registration. Returns a dict of padded arrays:

      means: (V, 3), covs: (V, 3, 3), counts: (V,), keys: (V,) sorted int32,
      origin: (3,), valid: (V,) bool (count >= 3, as NDT requires).

    ``keys`` is ascending so point→voxel lookup is a ``searchsorted``.
    """
    mask = pb.mask
    origin = _snap_origin(pb.xyz, mask, voxel_size)
    keys = _voxel_keys(pb.xyz, mask, voxel_size, origin)
    order = jnp.argsort(keys)
    skeys = keys[order]
    sxyz = pb.xyz[order]
    smask = mask[order]
    is_start = jnp.concatenate([jnp.array([True]), skeys[1:] != skeys[:-1]])
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    seg = jnp.where(smask, seg, max_voxels)
    w = smask.astype(jnp.float32)
    s1 = jax.ops.segment_sum(w, seg, num_segments=max_voxels)
    sx = jax.ops.segment_sum(sxyz * w[:, None], seg, num_segments=max_voxels)
    sxx = jax.ops.segment_sum(
        (sxyz[:, :, None] * sxyz[:, None, :]) * w[:, None, None],
        seg,
        num_segments=max_voxels,
    )
    n = jnp.maximum(s1, 1.0)
    mean = sx / n[:, None]
    cov = sxx / n[:, None, None] - mean[:, :, None] * mean[:, None, :]
    # regularize (NDT epsilon-inflation of near-singular covariances)
    cov = cov + 1e-3 * voxel_size * voxel_size * jnp.eye(3)
    # segment key per output slot: first key of each segment
    first_idx = jax.ops.segment_min(
        jnp.arange(skeys.shape[0], dtype=jnp.int32), seg, num_segments=max_voxels
    )
    slot_key = jnp.where(
        s1 > 0, skeys[jnp.clip(first_idx, 0, skeys.shape[0] - 1)], jnp.int32(2**31 - 1)
    )
    return {
        "means": mean,
        "covs": cov,
        "counts": s1,
        "keys": slot_key,
        "origin": origin,
        "valid": s1 >= 3.0,
        "voxel_size": jnp.float32(voxel_size),
    }


@jax.jit
def voxel_lookup(gaussians, query_xyz: jax.Array):
    """Map each query point to its voxel slot via binary search on sorted keys.

    Returns (slot_idx, found) — found=False when the voxel is unoccupied.
    """
    vs = gaussians["voxel_size"]
    ci = jnp.floor((query_xyz - gaussians["origin"]) / vs).astype(jnp.int32) + _G // 2
    ci = jnp.clip(ci, 0, _G - 1)
    qkey = (ci[:, 0] * _G + ci[:, 1]) * _G + ci[:, 2]
    slot = jnp.searchsorted(gaussians["keys"], qkey)
    slot = jnp.clip(slot, 0, gaussians["keys"].shape[0] - 1)
    found = (gaussians["keys"][slot] == qkey) & gaussians["valid"][slot]
    return slot.astype(jnp.int32), found


# DIRECT7 neighborhood (ndt_omp's default): center + 6 face neighbors.
_OFFSETS7 = jnp.array(
    [[0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
    jnp.int32,
)


@jax.jit
def voxel_lookup7(gaussians, query_xyz: jax.Array):
    """DIRECT7 lookup: each query maps to its own voxel plus the 6 face
    neighbors, so residuals stay smooth across cell boundaries.

    Returns (slots (N,7), found (N,7)).
    """
    vs = gaussians["voxel_size"]
    ci = jnp.floor((query_xyz - gaussians["origin"]) / vs).astype(jnp.int32) + _G // 2
    ci = jnp.clip(ci[:, None, :] + _OFFSETS7[None, :, :], 0, _G - 1)  # (N,7,3)
    qkey = (ci[..., 0] * _G + ci[..., 1]) * _G + ci[..., 2]
    slot = jnp.searchsorted(gaussians["keys"], qkey.reshape(-1)).reshape(qkey.shape)
    slot = jnp.clip(slot, 0, gaussians["keys"].shape[0] - 1)
    found = (gaussians["keys"][slot] == qkey) & gaussians["valid"][slot]
    return slot.astype(jnp.int32), found
