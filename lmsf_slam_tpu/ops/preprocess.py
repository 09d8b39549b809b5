"""Point-cloud preprocessing: distance/voxel/outlier chain, sweep timing, deskew.

Capability parity with the reference's preprocessing layer:

- common processing chain — NaN removal → voxel downsample → outlier removal
  → distance filter, emitting the canonical "processed" cloud
  (`Algorithm/PointClouds/processing/common_processing.hpp:87-112`);
- rotary-sweep relative time per point from azimuth
  (`Preprocess/RotaryLidar_preprocessing.hpp:77-104` — findStartEndAngle +
  rel_time);
- motion deskew using the per-point relative time (the reference's deskew
  base is a stub, `processing/deskew/deskew_base.hpp`; LIO-SAM's
  imageProjection defines the behavior: undistort into a single scan frame).

TPU-first: every stage is masked static-shape array math; the chain composes
into one jitted program. NaN handling is a mask update, never a compaction.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..common import se3
from ..common.pointcloud import PointBatch
from . import neighbors, voxel


class PreprocessParams(NamedTuple):
    min_range: float = 1.0  # distance filter (m)
    max_range: float = 60.0
    voxel_size: float = 0.0  # 0 disables downsampling
    outlier_radius: float = 0.0  # 0 disables radius outlier removal
    outlier_min_neighbors: int = 3


@partial(jax.jit, static_argnames=("params", "out_capacity"))
def preprocess(
    pb: PointBatch,
    params: PreprocessParams = PreprocessParams(),
    out_capacity: int | None = None,
) -> PointBatch:
    """NaN → distance → voxel → outlier chain producing the "processed" cloud.

    ``out_capacity`` fixes the output size when voxel downsampling (defaults
    to the input capacity).
    """
    finite = jnp.isfinite(pb.xyz).all(axis=-1)
    xyz = jnp.nan_to_num(pb.xyz)
    r = jnp.linalg.norm(xyz, axis=-1)
    mask = pb.mask & finite & (r > params.min_range) & (r < params.max_range)
    out = PointBatch(jnp.where(mask[:, None], xyz, 0.0), mask, pb.attr)
    if params.voxel_size > 0:
        cap = out_capacity if out_capacity is not None else pb.capacity
        out = voxel.voxel_downsample(out, params.voxel_size, cap)
    if params.outlier_radius > 0:
        counts = neighbors.radius_count(
            out.xyz, out.mask, out.xyz, out.mask, params.outlier_radius
        )
        # each point counts itself
        keep = counts >= params.outlier_min_neighbors + 1
        out = PointBatch(out.xyz, out.mask & keep, out.attr)
    return out


@jax.jit
def sweep_relative_times(pb: PointBatch, clockwise: bool = True) -> jax.Array:
    """Per-point relative time in [0, 1) from the rotary azimuth sweep.

    The reference anchors the sweep at the azimuth of the first valid point
    and unwinds one full revolution (`RotaryLidar_preprocessing.hpp:77-91`);
    here the anchor is the first valid point's azimuth and the sweep
    direction is a flag (most mechanical lidars spin clockwise when viewed
    from above, i.e. azimuth decreases).
    """
    az = jnp.arctan2(pb.xyz[:, 1], pb.xyz[:, 0])
    first = jnp.argmax(pb.mask)  # first True index
    start = az[first]
    delta = jnp.where(clockwise, start - az, az - start)
    rel = jnp.mod(delta, 2 * jnp.pi) / (2 * jnp.pi)
    return jnp.where(pb.mask, rel, 0.0)


@jax.jit
def deskew(pb: PointBatch, rel_time: jax.Array, motion: jax.Array) -> PointBatch:
    """Undistort a sweep into the END-of-scan frame.

    ``motion`` is the sensor pose increment over the scan period (start→end,
    in the start frame — e.g. the tracker's constant-velocity increment or an
    IMU-propagated delta). A point captured at relative time ``s`` sits in the
    frame exp(s·ξ) (ξ = log motion); re-expressing it at the end frame applies
    exp((s−1)·ξ).
    """
    xi = se3.pose_log(motion)  # (6,)
    scale = (rel_time - 1.0)[:, None]  # (N,1)
    per_point = se3.se3_exp(scale * xi[None, :])  # (N,7)
    moved = se3.quat_rotate(per_point[:, :4], pb.xyz) + per_point[:, 4:]
    return PointBatch(
        jnp.where(pb.mask[:, None], moved, pb.xyz), pb.mask, pb.attr
    )
