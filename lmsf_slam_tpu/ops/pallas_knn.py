"""Fused k-NN Pallas kernel: distances + running top-k without HBM round-trips.

The XLA path (`ops.neighbors.knn`) computes the (Q, N) distance matrix with
an MXU matmul and selects with ``approx_max_k``; at the pre-downsample map
scale the matrix is materialized in HBM (measured: 3840×76800 ≈ 1.2 GB of
traffic, ~4 ms). This kernel keeps everything on-chip: the whole reference
cloud sits in VMEM (a 16k-point map is 512 KB), each query tile streams over
reference chunks, distances live only as (TQ, TN) VMEM tiles, and a running
best-k set is maintained with replace-the-worst insertion. Exactness:
candidates are the true top-k (ties broken by index); the caller's exact
rescore re-sorts.

STATUS — measured on one v5e chip at the production (post-map-downsample)
sizes and NOT wired into the hot path: 1920×8192 → Pallas 1.01 ms vs XLA
0.80 ms (and ~330 s Mosaic compile for the unrolled knockout rounds vs 24 s).
The k sequential min/knockout passes cost ~k× the distance work on the VPU,
while XLA's ``approx_max_k`` PartialReduce selects in a single pass — once
the local map is voxel-downsampled to ≤16k points the matrix fits cache-side
traffic and the XLA path wins. Kept as the exact-k alternative (this kernel
is exact; approx_max_k is 0.95-recall) and as the starting point if map
sizes ever grow past ~64k points, where HBM traffic again dominates.

Layout notes (guide: tiling constraints): points are padded to 8 lanes
(xyz + 5 zeros) so the distance matmul is a clean (TQ,8)×(8,TN) MXU op;
TQ is a multiple of 8 sublanes, TN a multiple of 128 lanes; invalid
reference points are pushed to +1e4 coordinates host-side so their
distances are astronomically large instead of needing a mask pass.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.4e38  # python literal: jnp scalars would be captured consts in the kernel
INF = jnp.float32(_INF)
_FAR = 1.0e4  # coordinate sentinel for invalid reference points


def _knn_kernel(q_ref, ref_ref, out_d_ref, out_i_ref, *, k, tn):
    q = q_ref[:]  # (TQ, 8)
    tq = q.shape[0]
    n = ref_ref.shape[0]
    qn = jnp.sum(q * q, axis=1, keepdims=True)  # (TQ, 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (tq, k), 1)

    best_d = jnp.full((tq, k), _INF, jnp.float32)
    best_i = jnp.zeros((tq, k), jnp.int32)
    for c in range(n // tn):
        p = ref_ref[c * tn:(c + 1) * tn, :]  # (TN, 8)
        pn = jnp.sum(p * p, axis=1)[None, :]  # (1, TN)
        d = qn + pn - 2.0 * jnp.dot(
            q, p.T, preferred_element_type=jnp.float32
        )  # (TQ, TN)
        col = jax.lax.broadcasted_iota(jnp.int32, (tq, tn), 1) + c * tn
        for _ in range(k):
            # chunk's current minimum (candidate), ties → lowest index
            m = jnp.min(d, axis=1, keepdims=True)  # (TQ,1)
            am = jnp.min(
                jnp.where(d == m, col, jnp.int32(2**31 - 1)),
                axis=1, keepdims=True,
            )
            # replace the worst of the running best where the candidate wins
            worst = jnp.max(best_d, axis=1, keepdims=True)
            wcol = jnp.min(
                jnp.where(best_d == worst, kcol, jnp.int32(2**31 - 1)),
                axis=1, keepdims=True,
            )
            take = (m < worst) & (kcol == wcol)
            best_d = jnp.where(take, m, best_d)
            best_i = jnp.where(take, am, best_i)
            # knock the candidate out of the chunk
            d = jnp.where(col == am, _INF, d)
    out_d_ref[:] = best_d
    out_i_ref[:] = best_i


@partial(jax.jit, static_argnames=("k", "tq", "tn", "interpret"))
def knn_pallas(
    query_xyz: jax.Array,  # (Q, 3)
    query_mask: jax.Array,  # (Q,)
    ref_xyz: jax.Array,  # (N, 3)
    ref_mask: jax.Array,  # (N,)
    k: int = 5,
    tq: int = 256,
    tn: int = 2048,
    interpret: bool = False,
):
    """Drop-in replacement for ``neighbors.knn`` (same contract: ascending
    exact squared distances after rescore, INF where no valid neighbor)."""
    Q = query_xyz.shape[0]
    N = ref_xyz.shape[0]
    # pad N to a chunk multiple with far-away sentinels; push invalid refs far
    n_pad = (-N) % tn
    ref = jnp.where(ref_mask[:, None], ref_xyz, _FAR)
    ref = jnp.pad(ref, ((0, n_pad), (0, 0)), constant_values=_FAR)
    ref8 = jnp.pad(ref, ((0, 0), (0, 5)))
    # pad Q to a tile multiple
    q_pad = (-Q) % tq
    q = jnp.pad(jnp.nan_to_num(query_xyz), ((0, q_pad), (0, 0)))
    q8 = jnp.pad(q, ((0, 0), (0, 5)))

    grid = (q8.shape[0] // tq,)
    out_d, out_i = pl.pallas_call(
        partial(_knn_kernel, k=k, tn=tn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (ref8.shape[0], 8), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((tq, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q8.shape[0], k), jnp.float32),
            jax.ShapeDtypeStruct((q8.shape[0], k), jnp.int32),
        ],
        interpret=interpret,
    )(q8, ref8)
    best_d = out_d[:Q]
    best_i = jnp.clip(out_i[:Q], 0, N - 1)

    # exact rescore + sort (identical tail to neighbors.knn): the kernel's
    # candidate set is exact; this fixes matmul cancellation and ordering.
    # Gather from the sentinel-pushed cloud so a masked-out reference point
    # can never re-enter with its original coordinates.
    nbr = ref[:N][best_i]
    diff = jnp.nan_to_num(query_xyz)[:, None, :] - nbr
    exact = jnp.sum(diff * diff, axis=-1)
    # sentinel refs sit at 1e4 m → squared distance ≥ ~9.6e7; real SLAM
    # distances are < ~1e5 m². Restore the INF contract for invalid slots.
    exact = jnp.where((best_d < INF) & (exact < 1e7), exact, INF)
    order = jnp.argsort(exact, axis=1)
    best_d = jnp.take_along_axis(exact, order, axis=1)
    best_i = jnp.take_along_axis(best_i, order, axis=1)
    best_d = jnp.where(query_mask[:, None], best_d, INF)
    return best_d, best_i
