"""Synthetic structured worlds for golden-trajectory tests and benchmarks.

The reference is only ever validated live on rosbags (SURVEY.md §4); this
module provides the deterministic substitute: a world of planes (ground +
walls) and vertical pillars (line features), a smooth trajectory generator,
and a scan simulator that samples sensor-frame edge/surf point sets with
noise — everything a front-end or full-SLAM test needs to compare an
estimated trajectory against ground truth.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..common import se3
from ..common.pointcloud import PointBatch


class SyntheticWorld(NamedTuple):
    edge_pts: jax.Array  # (Ne, 3) points on vertical lines (pillars)
    surf_pts: jax.Array  # (Ns, 3) points on planes (ground + walls)


def make_world(
    key,
    extent: float = 40.0,
    n_pillars: int = 60,
    pts_per_pillar: int = 64,
    n_ground: int = 8000,
    n_wall: int = 4000,
    height: float = 4.0,
) -> SyntheticWorld:
    """A courtyard: ground plane, 4 boundary walls, random vertical pillars."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    # pillars: vertical lines at random xy, sampled densely in z
    pxy = jax.random.uniform(k1, (n_pillars, 2), minval=-extent, maxval=extent)
    z = jnp.linspace(0.0, height, pts_per_pillar)
    edge = jnp.concatenate(
        [
            jnp.repeat(pxy, pts_per_pillar, axis=0),
            jnp.tile(z, n_pillars)[:, None],
        ],
        axis=1,
    )
    # ground plane
    gxy = jax.random.uniform(k2, (n_ground, 2), minval=-extent, maxval=extent)
    ground = jnp.concatenate([gxy, jnp.zeros((n_ground, 1))], axis=1)
    # 4 walls at ±extent
    nw = n_wall // 4
    wt = jax.random.uniform(k3, (nw * 4,), minval=-extent, maxval=extent)
    wz = jax.random.uniform(k4, (nw * 4,), minval=0.0, maxval=height)
    e = jnp.float32(extent)
    walls = jnp.stack(
        [
            jnp.concatenate(
                [wt[:nw], wt[nw : 2 * nw], jnp.full(nw, e), jnp.full(nw, -e)]
            ),
            jnp.concatenate(
                [jnp.full(nw, e), jnp.full(nw, -e), wt[2 * nw : 3 * nw], wt[3 * nw :]]
            ),
            wz,
        ],
        axis=1,
    )
    return SyntheticWorld(edge_pts=edge, surf_pts=jnp.concatenate([ground, walls]))


def make_trajectory(n_frames: int, radius: float = 15.0, loop: bool = True):
    """Smooth planar arc/loop of poses (yaw follows heading). Returns (n,7)."""
    if loop:
        theta = jnp.linspace(0.0, 2 * jnp.pi, n_frames)
    else:
        theta = jnp.linspace(0.0, jnp.pi, n_frames)
    x = radius * jnp.cos(theta)
    y = radius * jnp.sin(theta)
    zpos = 0.5 + 0.2 * jnp.sin(3 * theta)
    yaw = theta + jnp.pi / 2  # tangent heading
    q = jnp.stack(
        [jnp.cos(yaw / 2), jnp.zeros_like(yaw), jnp.zeros_like(yaw), jnp.sin(yaw / 2)],
        axis=-1,
    )
    t = jnp.stack([x, y, zpos], axis=-1)
    return se3.make_pose(q, t)


def scan_at(
    world: SyntheticWorld,
    pose: jax.Array,
    key,
    n_edge: int = 512,
    n_surf: int = 2048,
    max_range: float = 35.0,
    noise: float = 0.02,
) -> tuple[PointBatch, PointBatch]:
    """Simulate one scan: sample world points within range of ``pose``,
    express them in the sensor frame, add Gaussian noise. Returns
    (edge, surf) PointBatches with static capacities (n_edge, n_surf)."""
    inv = se3.pose_inverse(pose)

    def sample(pts, n, k):
        local = se3.pose_apply(inv, pts)
        r = jnp.linalg.norm(local, axis=-1)
        visible = (r < max_range) & (r > 1.0)
        # importance sample visible points (gumbel-top-k over the mask)
        gumbel = -jnp.log(-jnp.log(jax.random.uniform(k, (pts.shape[0],)) + 1e-12))
        score = jnp.where(visible, gumbel, -jnp.inf)
        _, idx = jax.lax.top_k(score, n)
        sel = local[idx]
        ok = visible[idx]
        kn = jax.random.fold_in(k, 1)
        sel = sel + noise * jax.random.normal(kn, sel.shape)
        return PointBatch(jnp.where(ok[:, None], sel, 0.0), ok)

    k1, k2 = jax.random.split(key)
    return sample(world.edge_pts, n_edge, k1), sample(world.surf_pts, n_surf, k2)
