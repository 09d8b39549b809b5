"""Static-shape point-cloud containers.

TPU-native replacement for the reference's PCL cloud containers
(`include/Sensor/lidar_data_type.h:28-63` — ``LidarData``, ``CloudContainer``,
``FeaturePointCloudContainer`` keyed by feature name). XLA requires static
shapes, so every cloud is a fixed-capacity padded array plus a validity mask;
"feature containers" are plain dicts of PointBatch keyed by the same canonical
names the reference uses ("processed", "edge", "surf").
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

# Canonical feature names (reference: lidar_data_type.h:20-22 uses
# "processed" / "loam_edge" / "loam_surf").
PROCESSED = "processed"
EDGE = "edge"
SURF = "surf"

# Named per-point attribute slots (PointBatch.attr columns). Slot 0 is the
# relative sweep time in [0, 1) — the deskew input — and intensity lives in
# slot 1, so an ingest path can never hand intensity to the deskewer (the
# reference smuggles rel-time through the PCL intensity channel,
# `RotaryLidar_preprocessing.hpp:100-104`; here the slots are explicit).
ATTR_TIME = 0
ATTR_INTENSITY = 1


@jax.tree_util.register_pytree_node_class
class PointBatch:
    """Fixed-capacity padded point set.

    Attributes:
      xyz:  (N, 3) float32 — padded with zeros beyond ``count``.
      mask: (N,) bool — True for valid points.
      attr: (N, A) float32 — per-point attributes, A may be 0. Slots are
            NAMED (``ATTR_TIME``/``ATTR_INTENSITY``): slot 0 is always the
            relative sweep time, never intensity — consumers like the LIO
            deskew read attr[:, ATTR_TIME] and must not be fed intensity.
    """

    def __init__(self, xyz: jax.Array, mask: jax.Array, attr: jax.Array | None = None):
        self.xyz = xyz
        self.mask = mask
        if attr is None:
            attr = jnp.zeros(xyz.shape[:-1] + (0,), xyz.dtype)
        self.attr = attr

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.xyz, self.mask, self.attr), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_points(cls, pts, capacity: int, attr=None) -> "PointBatch":
        """Host-side: pad/truncate a (n,3) array to fixed capacity."""
        pts = jnp.asarray(pts, jnp.float32)
        n = min(pts.shape[0], capacity)
        xyz = jnp.zeros((capacity, 3), jnp.float32).at[:n].set(pts[:n])
        mask = jnp.zeros((capacity,), bool).at[:n].set(True)
        if attr is not None:
            attr = jnp.asarray(attr, jnp.float32)
            a = jnp.zeros((capacity,) + attr.shape[1:], jnp.float32).at[:n].set(attr[:n])
        else:
            a = None
        return cls(xyz, mask, a)

    @classmethod
    def empty(cls, capacity: int, attr_dim: int = 0) -> "PointBatch":
        return cls(
            jnp.zeros((capacity, 3), jnp.float32),
            jnp.zeros((capacity,), bool),
            jnp.zeros((capacity, attr_dim), jnp.float32),
        )

    # -- views --------------------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def count(self) -> jax.Array:
        return jnp.sum(self.mask.astype(jnp.int32))

    def masked_xyz(self, fill: float = 0.0) -> jax.Array:
        return jnp.where(self.mask[:, None], self.xyz, fill)

    def transform(self, pose: jax.Array) -> "PointBatch":
        from . import se3

        return PointBatch(se3.pose_apply(pose, self.xyz), self.mask, self.attr)

    def to_numpy(self):
        """Host-side: gather valid points into a compact (n,3) numpy array."""
        import numpy as np

        xyz = np.asarray(self.xyz)
        mask = np.asarray(self.mask)
        return xyz[mask]

    def __repr__(self):
        return f"PointBatch(capacity={self.capacity}, attr_dim={self.attr.shape[-1]})"


FeatureClouds = Dict[str, PointBatch]


def concat(batches, capacity: int | None = None) -> PointBatch:
    """Concatenate PointBatches (valid points keep their mask; padding stays
    masked out). Static output capacity = sum of inputs unless given."""
    xyz = jnp.concatenate([b.xyz for b in batches], axis=0)
    mask = jnp.concatenate([b.mask for b in batches], axis=0)
    adim = max(b.attr.shape[-1] for b in batches)
    attrs = []
    for b in batches:
        a = b.attr
        if a.shape[-1] < adim:
            a = jnp.pad(a, ((0, 0), (0, adim - a.shape[-1])))
        attrs.append(a)
    attr = jnp.concatenate(attrs, axis=0)
    if capacity is not None and capacity != xyz.shape[0]:
        n = xyz.shape[0]
        if capacity > n:
            xyz = jnp.pad(xyz, ((0, capacity - n), (0, 0)))
            mask = jnp.pad(mask, (0, capacity - n))
            attr = jnp.pad(attr, ((0, capacity - n), (0, 0)))
        else:
            # keep valid points first so truncation drops padding preferentially
            order = jnp.argsort(~mask, stable=True)
            xyz, mask, attr = xyz[order][:capacity], mask[order][:capacity], attr[order][:capacity]
    return PointBatch(xyz, mask, attr)
