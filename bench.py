"""Headline benchmark: scan-to-map registration frames/s on one chip.

Mirrors the reference's dominant cost — scan-to-map frontend matching, mean
105.9 ms/frame on its CPU (BASELINE.md, `slam_data/time/times_scan_map.csv`)
— at comparable workload: one full edge+surf Gauss-Newton registration
(association + line/plane fit + GN solve, 10 iterations) of a 2k-edge /
8k-surf feature scan against a 10k-edge / 40k-surf local map.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the speedup over the reference's 9.44 frames/s envelope.
"""
import json
import time

import jax
import jax.numpy as jnp

from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.common.pointcloud import PointBatch
from lmsf_slam_tpu.ops.registration import RegistrationParams, register_edge_surf

BASELINE_FPS = 1000.0 / 105.9  # reference scan-to-map mean latency


def _make_inputs(key):
    ks = jax.random.split(key, 4)
    src_edge = PointBatch(jax.random.normal(ks[0], (2048, 3)) * 20.0,
                          jnp.ones(2048, bool))
    src_surf = PointBatch(jax.random.normal(ks[1], (8192, 3)) * 20.0,
                          jnp.ones(8192, bool))
    # local map ≈ 5 scans' worth of features
    map_edge = PointBatch(jax.random.normal(ks[2], (10240, 3)) * 20.0,
                          jnp.ones(10240, bool))
    map_surf = PointBatch(jax.random.normal(ks[3], (40960, 3)) * 20.0,
                          jnp.ones(40960, bool))
    return src_edge, src_surf, map_edge, map_surf


def main():
    params = RegistrationParams(max_iters=10)
    args = _make_inputs(jax.random.PRNGKey(0))
    init = se3.pose_identity()

    def run(pose):
        return register_edge_surf(*args, pose, params).pose

    # warm-up / compile
    pose = jax.block_until_ready(run(init))

    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        pose = run(init)
    jax.block_until_ready(pose)
    dt = time.perf_counter() - t0

    fps = n / dt
    print(json.dumps({
        "metric": "scan_to_map_registration_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
