"""LOAM-style edge/surface feature extraction, batched for TPU.

Capability parity with the reference's FLOAM-derived extractor
(`include/Algorithm/PointClouds/processing/FeatureExtract/LOAMFeatureProcessor_base.hpp`):
ring split by vertical angle (:290-343), 11-point curvature (:97-118),
per-sector edge selection with non-max suppression (:152-195), bad-point
rejection (occlusion / discontinuity, :216-282), surf = low-curvature rest
(:197-206).

TPU-first reformulation: the scan is organized into a fixed (RINGS, WIDTH)
range-image grid; curvature is a 1-D convolution along the azimuth axis; the
sequential non-max suppression becomes a parallel local-argmax test
(a point survives if it is the curvature maximum of its ±NMS window); edge /
surf selection is per-sector ``top_k``. The entire multi-ring frame is one
vectorized program — no per-ring loops.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..common.pointcloud import PointBatch


class ScanGrid(NamedTuple):
    """Organized scan: (R, W) range image with xyz per cell."""

    xyz: jax.Array  # (R, W, 3)
    rng: jax.Array  # (R, W) range (m)
    mask: jax.Array  # (R, W) bool
    flat_idx: jax.Array  # (R, W) int32 index into the source PointBatch
    attr: jax.Array  # (R, W, A) per-point attributes (rel-time, intensity…)


@partial(jax.jit, static_argnames=("rings", "width"))
def organize_scan(
    pb: PointBatch,
    rings: int = 64,
    width: int = 1800,
    ring_ids: jax.Array | None = None,
) -> ScanGrid:
    """Project a raw scan into a (rings, width) grid by (ring, azimuth).

    If ``ring_ids`` is None, rings are inferred from vertical angle by equal
    quantile binning over the valid elevation range (works for KITTI HDL-64
    and VLP-16 alike; mirrors splitScan's vertical-angle routing,
    `LOAMFeatureProcessor_base.hpp:290-343`).
    """
    xyz = pb.xyz
    mask = pb.mask
    rng = jnp.linalg.norm(xyz, axis=-1)
    horiz = jnp.linalg.norm(xyz[:, :2], axis=-1)
    elev = jnp.arctan2(xyz[:, 2], jnp.maximum(horiz, 1e-6))
    if ring_ids is None:
        lo = jnp.min(jnp.where(mask, elev, jnp.inf))
        hi = jnp.max(jnp.where(mask, elev, -jnp.inf))
        span = jnp.maximum(hi - lo, 1e-6)
        ring_ids = jnp.clip(
            ((elev - lo) / span * rings).astype(jnp.int32), 0, rings - 1
        )
    az = jnp.arctan2(xyz[:, 1], xyz[:, 0])  # [-pi, pi]
    col = jnp.clip(
        ((az + jnp.pi) / (2 * jnp.pi) * width).astype(jnp.int32), 0, width - 1
    )
    cell = ring_ids * width + col
    cell = jnp.where(mask, cell, rings * width)  # invalid → dropped slot

    # scatter-min by range: keep the closest return per cell
    n_cells = rings * width
    INF = jnp.float32(3.4e38)
    best_rng = jax.ops.segment_min(
        jnp.where(mask, rng, INF), cell, num_segments=n_cells + 1
    )[:-1]
    # representative point index per cell: argmin via segment_min over packed
    # (range-rank, idx). Pack as float32 rank*N + idx is lossy; instead use
    # segment_min over idx among points matching the winning range.
    src_idx = jnp.arange(xyz.shape[0], dtype=jnp.int32)
    is_winner = mask & (rng <= best_rng[jnp.clip(cell, 0, n_cells - 1)] + 1e-7)
    idx_for_min = jnp.where(is_winner, src_idx, jnp.int32(2**31 - 1))
    cell_idx = jax.ops.segment_min(idx_for_min, cell, num_segments=n_cells + 1)[:-1]
    occupied = cell_idx < jnp.int32(2**31 - 1)
    cell_idx = jnp.clip(cell_idx, 0, xyz.shape[0] - 1)

    g_xyz = xyz[cell_idx].reshape(rings, width, 3)
    g_rng = jnp.where(occupied, best_rng, 0.0).reshape(rings, width)
    g_mask = occupied.reshape(rings, width)
    g_attr = pb.attr[cell_idx].reshape(rings, width, pb.attr.shape[-1])
    return ScanGrid(g_xyz, g_rng, g_mask, cell_idx.reshape(rings, width), g_attr)


def _shift(x, s, axis=-1):
    return jnp.roll(x, s, axis=axis)


@partial(jax.jit, static_argnames=("half_window",))
def curvature(grid: ScanGrid, half_window: int = 5):
    """LOAM curvature c = |Σ_{j∈±w} (p_j − p_i)|², normalized by the expected
    azimuthal point spacing (r_i·Δθ·2w)² so that c is scale-invariant:
    ≈0 on planes (symmetric terms cancel), O(1) at corners, ≫1 at range
    discontinuities. Matches the 11-point window of
    `LOAMFeatureProcessor_base.hpp:97-118` with distance-invariant thresholds.
    Cells whose window crosses an invalid cell are masked.
    """
    W = grid.rng.shape[1]
    dtheta = 2.0 * jnp.pi / W
    acc = jnp.zeros_like(grid.xyz)
    valid = grid.mask
    for s in range(1, half_window + 1):
        for sg in (s, -s):
            acc = acc + (_shift(grid.xyz, sg, axis=1) - grid.xyz)
            valid = valid & _shift(grid.mask, sg, axis=1)
    spacing = jnp.maximum(grid.rng * dtheta, 1e-4)
    c = jnp.sum(acc * acc, axis=-1) / (2.0 * half_window * spacing) ** 2
    return c, valid


@partial(jax.jit, static_argnames=("one_sided_occlusion",))
def bad_point_mask(grid: ScanGrid, one_sided_occlusion: bool = False):
    """Reject occlusion edges and near-parallel surfaces.

    Reference: `checkBadEdgePoint` / occlusion logic
    (`LOAMFeatureProcessor_base.hpp:216-282`): (a) neighbors with a large
    range discontinuity (occluded background edges), (b) points whose beam is
    nearly parallel to the surface.

    ``one_sided_occlusion``: reject only when a neighbor is CLOSER by >2% of
    range — that point sits on the background side of a silhouette and its
    apparent position slides with viewpoint. The foreground side (neighbor
    farther) is kept: those points lie ON the occluding structure and at
    HDL-64 urban density they are exactly the stable pole/corner edge
    features. Default is the conservative two-sided test: in scenes where
    round objects (tree trunks, cylinders) dominate the edge budget the
    foreground silhouette ALSO slides with viewpoint (the limb of a cylinder
    is a different 3D point from each side), so both sides are dropped.
    """
    r = grid.rng
    r_prev = _shift(r, 1, axis=1)
    r_next = _shift(r, -1, axis=1)
    m_prev = _shift(grid.mask, 1, axis=1)
    m_next = _shift(grid.mask, -1, axis=1)
    if one_sided_occlusion:
        # (a) background side of a silhouette only
        occluded = ((r_prev - r) < -(0.02 * r + 0.1)) | (
            (r_next - r) < -(0.02 * r + 0.1)
        )
    else:
        # (a) any large neighbor discontinuity (both sides)
        occluded = jnp.maximum(jnp.abs(r - r_prev), jnp.abs(r - r_next)) > (
            0.02 * r + 0.1
        )
    # (b) parallel beam: both neighbors much further/closer in same direction
    parallel = (jnp.abs(r_next + r_prev - 2 * r) > 0.02 * r + 0.05) & (
        jnp.sign(r_next - r) == jnp.sign(r_prev - r)
    )
    ok = grid.mask & m_prev & m_next & ~(occluded & parallel)
    good = ok & ~occluded
    return good


@partial(jax.jit, static_argnames=("max_angle", "z_max"))
def ground_mask(grid: ScanGrid, max_angle: float = 0.175, z_max: float = -0.5):
    """LeGO-LOAM-style ground segmentation on the organized grid.

    A pair of vertically adjacent returns whose connecting segment is within
    ``max_angle`` of horizontal AND below the sensor (``z_max``, sensor
    frame) marks both cells as ground. Ground cells stay in the surf channel
    (the plane fit is exactly right there) but are barred from edge
    candidacy: ground gives no repeatable line structure, and at near range
    noise-peak "edges" on it sit at fixed (ring, azimuth) — i.e. fixed
    sensor-relative positions — so matching them drags registration against
    the motion. The reference's LOAM processor has no ground handling
    (`LOAMFeatureProcessor_base.hpp`); this is a capability the TPU grid
    layout makes one fused elementwise pass.
    """
    xyz = grid.xyz
    d = xyz[1:] - xyz[:-1]  # ring r → r+1, same azimuth column
    dxy = jnp.linalg.norm(d[..., :2], axis=-1)
    ang = jnp.arctan2(jnp.abs(d[..., 2]), jnp.maximum(dxy, 1e-6))
    low = (xyz[..., 2] < z_max) & grid.mask
    flat = (ang < max_angle) & low[1:] & low[:-1]
    R, W = grid.rng.shape
    g = jnp.zeros((R, W), bool)
    g = g.at[:-1].set(flat)
    g = g.at[1:].set(g[1:] | flat)
    return g


class LoamFeatures(NamedTuple):
    edge: PointBatch
    surf: PointBatch


@partial(
    jax.jit,
    static_argnames=(
        "sectors", "edges_per_sector", "surfs_per_sector", "nms_half",
        "range_noise", "exclude_ground_edges", "one_sided_occlusion",
    ),
)
def extract_loam_features(
    grid: ScanGrid,
    sectors: int = 6,
    edges_per_sector: int = 20,
    surfs_per_sector: int = 40,
    edge_thresh: float = 0.5,
    surf_thresh: float = 0.05,
    nms_half: int = 5,
    range_noise: float = 0.0,
    exclude_ground_edges: bool = False,
    one_sided_occlusion: bool = False,
) -> LoamFeatures:
    """Per-(ring, sector) edge/surf selection.

    Edges: curvature > edge_thresh AND local curvature argmax within ±nms_half
    (parallel replacement of the reference's sequential neighbor-suppression,
    `LOAMFeatureProcessor_base.hpp:152-195`); top ``edges_per_sector`` by
    curvature. Surfs: curvature < surf_thresh; lowest ``surfs_per_sector``.

    ``range_noise`` (σ, metres): the spacing-normalized curvature has an
    additive noise floor E[c_noise] ≈ (2w+1)/(2w) · σ²/spacing² that DIVERGES
    at near range (small azimuthal spacing) — without compensation, sensor
    noise manufactures phantom "edges" on smooth near-field ground, and those
    points ride at fixed (ring, azimuth) ⇒ fixed sensor-relative position, so
    matching them systematically drags registration against the motion (a
    measured −7%/frame translation bias at HDL-64 scale, σ=1 cm). Subtracting
    the analytic floor restores scale-invariant thresholds.
    """
    R, W = grid.rng.shape
    assert W % sectors == 0, "width must divide into sectors"
    c, cvalid = curvature(grid, nms_half)
    # edge selection uses the noise-compensated curvature; surf selection
    # keeps the raw value (subtracting there creates c≈0 ties that skew the
    # lowest-k pick toward sensor-locked near-field points)
    c_edge = c
    if range_noise > 0.0:
        spacing = jnp.maximum(grid.rng * (2.0 * jnp.pi / W), 1e-4)
        w2 = 2 * nms_half
        floor = (w2 + 1) / w2 * (range_noise / spacing) ** 2
        c_edge = c - 3.0 * floor  # 3× ⇒ noise fluctuations stay under
    good = bad_point_mask(grid, one_sided_occlusion) & cvalid
    if exclude_ground_edges:
        edge_ok = good & ~ground_mask(grid)
    else:
        edge_ok = good

    # parallel NMS: survives if it equals the max curvature in its ±nms_half window
    neg_inf = jnp.float32(-3.4e38)
    cm = jnp.where(edge_ok, c_edge, neg_inf)
    local_max = cm
    for s in range(1, nms_half + 1):
        local_max = jnp.maximum(local_max, _shift(cm, s, axis=1))
        local_max = jnp.maximum(local_max, _shift(cm, -s, axis=1))
    is_peak = (cm >= local_max) & edge_ok

    sw = W // sectors
    c_sec = c_edge.reshape(R, sectors, sw)
    edge_score = jnp.where(
        (c_sec > edge_thresh) & is_peak.reshape(R, sectors, sw), c_sec, neg_inf
    )
    c_sec = c.reshape(R, sectors, sw)
    surf_score = jnp.where(
        (c_sec < surf_thresh) & good.reshape(R, sectors, sw), -c_sec, neg_inf
    )

    e_val, e_idx = jax.lax.top_k(edge_score, edges_per_sector)  # (R,S,E)
    s_val, s_idx = jax.lax.top_k(surf_score, surfs_per_sector)

    col_base = jnp.arange(sectors, dtype=jnp.int32)[None, :, None] * sw
    e_col = e_idx.astype(jnp.int32) + col_base
    s_col = s_idx.astype(jnp.int32) + col_base
    ring = jnp.arange(R, dtype=jnp.int32)[:, None, None]

    def gather(cols, vals, rings_idx):
        pts = grid.xyz[rings_idx, cols]  # (R,S,K,3)
        att = grid.attr[rings_idx, cols]  # (R,S,K,A)
        m = vals > neg_inf / 2
        n_rows = att.shape[0] * att.shape[1] * att.shape[2]
        return PointBatch(
            pts.reshape(-1, 3), m.reshape(-1),
            att.reshape(n_rows, att.shape[-1]),  # explicit: A may be 0
        )

    edge = gather(e_col, e_val, jnp.broadcast_to(ring, e_col.shape))
    surf = gather(s_col, s_val, jnp.broadcast_to(ring, s_col.shape))
    return LoamFeatures(edge=edge, surf=surf)
