"""Ray-cast LiDAR simulator: structured, organized scans of a geometric world.

The reference is only ever validated live on rosbags (SURVEY.md §4). The
point-sampled worlds in ``synthetic.py`` exercise registration/backends with
pre-split edge/surf sets; this module exercises the FULL front end (range
image → curvature → feature extraction → tracking) by simulating what a
rotary LiDAR actually measures: one range return per (ring, azimuth) beam,
computed by analytic ray casting against ground plane + boxes (buildings)
+ vertical cylinders (pillars, tree trunks).

TPU-first: all rays of a scan are cast as one vmapped program —
ray-plane, ray-box (slab test) and ray-cylinder (quadratic) intersections
are closed-form and branch-free, so a (rings·width) scan is a single fused
XLA kernel, fast enough to generate benchmark-scale sequences on the fly.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..common import se3
from ..common.pointcloud import PointBatch

_BIG = jnp.float32(1e9)


class SimWorld(NamedTuple):
    boxes_min: jax.Array  # (B, 3) axis-aligned box min corners
    boxes_max: jax.Array  # (B, 3)
    cylinders: jax.Array  # (C, 4) [cx, cy, radius, height] vertical cylinders
    ground_z: jax.Array  # () ground plane height


def make_sim_world(
    key,
    extent: float = 30.0,
    n_boxes: int = 12,
    n_cylinders: int = 24,
    box_size: tuple = (2.0, 6.0),
    box_height: tuple = (2.0, 6.0),
    cyl_radius: tuple = (0.15, 0.5),
    cyl_height: float = 5.0,
    clear_radius: float = 4.0,
) -> SimWorld:
    """A random 'campus': ground plane + boxes + pillars inside ±extent.

    ``clear_radius`` keeps a disc at the origin free of obstacles so
    trajectories through the middle don't start inside geometry.
    """
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    def place(k, n, margin):
        xy = jax.random.uniform(k, (n, 2), minval=-extent, maxval=extent)
        # push anything inside the clear disc radially outward
        r = jnp.linalg.norm(xy, axis=1, keepdims=True)
        lo = clear_radius + margin
        scale = jnp.where(r < lo, lo / jnp.maximum(r, 1e-3), 1.0)
        return xy * scale

    bxy = place(k1, n_boxes, margin=4.0)
    bwh = jax.random.uniform(
        k2, (n_boxes, 2), minval=box_size[0], maxval=box_size[1]
    )
    bh = jax.random.uniform(
        k3, (n_boxes, 1), minval=box_height[0], maxval=box_height[1]
    )
    boxes_min = jnp.concatenate([bxy - bwh / 2, jnp.zeros((n_boxes, 1))], axis=1)
    boxes_max = jnp.concatenate([bxy + bwh / 2, bh], axis=1)

    cxy = place(k4, n_cylinders, margin=1.0)
    cr = jax.random.uniform(
        k5, (n_cylinders, 1), minval=cyl_radius[0], maxval=cyl_radius[1]
    )
    cylinders = jnp.concatenate(
        [cxy, cr, jnp.full((n_cylinders, 1), cyl_height)], axis=1
    )
    return SimWorld(boxes_min, boxes_max, cylinders, jnp.float32(0.0))


def _ray_ground(o, d, ground_z):
    """t of the ray-ground intersection (or _BIG)."""
    dz = d[2]
    t = (ground_z - o[2]) / jnp.where(jnp.abs(dz) > 1e-9, dz, 1e-9)
    return jnp.where((jnp.abs(dz) > 1e-9) & (t > 0), t, _BIG)


def _ray_boxes(o, d, bmin, bmax):
    """Min positive t over all boxes (slab test), or _BIG."""
    if bmin.shape[0] == 0:  # static shape: empty worlds short-circuit
        return _BIG
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-9, d, 1e-9)
    t1 = (bmin - o) * inv  # (B,3)
    t2 = (bmax - o) * inv
    tnear = jnp.max(jnp.minimum(t1, t2), axis=1)
    tfar = jnp.min(jnp.maximum(t1, t2), axis=1)
    hit = (tnear <= tfar) & (tfar > 0) & (tnear > 0)
    return jnp.min(jnp.where(hit, tnear, _BIG))


def _ray_cylinders(o, d, cyl):
    """Min positive t over all vertical cylinders, or _BIG."""
    if cyl.shape[0] == 0:  # static shape: empty worlds short-circuit
        return _BIG
    cx, cy, r, h = cyl[:, 0], cyl[:, 1], cyl[:, 2], cyl[:, 3]
    ox, oy = o[0] - cx, o[1] - cy
    a = d[0] * d[0] + d[1] * d[1]
    b = 2.0 * (ox * d[0] + oy * d[1])
    c = ox * ox + oy * oy - r * r
    a = jnp.maximum(a, 1e-9)
    disc = b * b - 4 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = (-b - sq) / (2 * a)
    z = o[2] + t * d[2]
    hit = (disc > 0) & (t > 0) & (z > 0) & (z < h)
    return jnp.min(jnp.where(hit, t, _BIG))


@partial(
    jax.jit,
    static_argnames=("rings", "width"),
)
def simulate_scan(
    world: SimWorld,
    pose: jax.Array,
    key,
    rings: int = 16,
    width: int = 900,
    elev_min: float = -0.26,  # ≈ VLP-16 −15°
    elev_max: float = 0.26,
    max_range: float = 50.0,
    min_range: float = 1.0,
    noise: float = 0.01,
) -> PointBatch:
    """One organized scan from ``pose``. Returns a (rings·width,) PointBatch
    in the SENSOR frame, row-major by (ring, azimuth), with a 1-dim attr =
    azimuth-derived relative time in [0, 1) (the rotary sweep model of
    `RotaryLidar_preprocessing.hpp:77-104`, for deskew)."""
    elev = jnp.linspace(elev_min, elev_max, rings)
    az = -jnp.pi + (jnp.arange(width) + 0.5) * (2 * jnp.pi / width)
    ce, se_ = jnp.cos(elev), jnp.sin(elev)
    ca, sa = jnp.cos(az), jnp.sin(az)
    # local ray directions (R, W, 3)
    d_local = jnp.stack(
        [
            ce[:, None] * ca[None, :],
            ce[:, None] * sa[None, :],
            jnp.broadcast_to(se_[:, None], (rings, width)),
        ],
        axis=-1,
    ).reshape(-1, 3)

    Rm = se3.quat_to_matrix(se3.pose_quat(pose))
    o = se3.pose_trans(pose)
    d_world = d_local @ Rm.T

    def cast(d):
        t = _ray_ground(o, d, world.ground_z)
        t = jnp.minimum(t, _ray_boxes(o, d, world.boxes_min, world.boxes_max))
        t = jnp.minimum(t, _ray_cylinders(o, d, world.cylinders))
        return t

    t = jax.vmap(cast)(d_world)
    t = t + noise * jax.random.normal(key, t.shape)
    ok = (t > min_range) & (t < max_range)
    pts = jnp.where(ok[:, None], t[:, None] * d_local, 0.0)
    rel_time = jnp.tile((jnp.arange(width) + 0.5) / width, rings)[:, None]
    return PointBatch(pts.astype(jnp.float32), ok, rel_time.astype(jnp.float32))


@partial(jax.jit, static_argnames=("rings", "width"))
def simulate_scan_moving(
    world: SimWorld,
    pose_start: jax.Array,
    pose_end: jax.Array,
    key,
    rings: int = 16,
    width: int = 900,
    elev_min: float = -0.26,
    elev_max: float = 0.26,
    max_range: float = 50.0,
    min_range: float = 1.0,
    noise: float = 0.01,
) -> PointBatch:
    """Motion-blurred scan: each azimuth column is cast from the sensor pose
    interpolated at its sweep time (constant-twist between ``pose_start`` and
    ``pose_end``), and the measured point is expressed in THAT pose's frame —
    exactly the distortion a spinning lidar on a moving platform produces,
    which deskew must undo. Returns the points as measured (start-to-end
    sweep, rel-time attr in [0,1))."""
    elev = jnp.linspace(elev_min, elev_max, rings)
    az = -jnp.pi + (jnp.arange(width) + 0.5) * (2 * jnp.pi / width)
    rel = (jnp.arange(width) + 0.5) / width  # (W,)
    xi = se3.pose_log(se3.pose_between(pose_start, pose_end))  # (6,)
    col_poses = jax.vmap(
        lambda s: se3.pose_compose(pose_start, se3.se3_exp(s * xi))
    )(rel)  # (W,7)

    ce, se_ = jnp.cos(elev), jnp.sin(elev)
    ca, sa = jnp.cos(az), jnp.sin(az)
    d_local = jnp.stack(
        [
            ce[:, None] * ca[None, :],
            ce[:, None] * sa[None, :],
            jnp.broadcast_to(se_[:, None], (rings, width)),
        ],
        axis=-1,
    )  # (R,W,3)

    Rm = se3.quat_to_matrix(col_poses[:, :4])  # (W,3,3)
    origins = col_poses[:, 4:]  # (W,3)
    d_world = jnp.einsum("wij,rwj->rwi", Rm, d_local)

    def cast(o, d):
        t = _ray_ground(o, d, world.ground_z)
        t = jnp.minimum(t, _ray_boxes(o, d, world.boxes_min, world.boxes_max))
        t = jnp.minimum(t, _ray_cylinders(o, d, world.cylinders))
        return t

    t = jax.vmap(
        jax.vmap(cast, in_axes=(None, 0)), in_axes=(0, 0)
    )(origins, d_world.transpose(1, 0, 2)).T  # (R,W)
    t = t + noise * jax.random.normal(key, t.shape)
    ok = (t > min_range) & (t < max_range)
    pts = jnp.where(ok[..., None], t[..., None] * d_local, 0.0)
    rel_attr = jnp.broadcast_to(rel[None, :], (rings, width))
    return PointBatch(
        pts.reshape(-1, 3).astype(jnp.float32),
        ok.reshape(-1),
        rel_attr.reshape(-1, 1).astype(jnp.float32),
    )
