"""Headline benchmark: end-to-end SLAM frontend frames/s on one chip.

Measures the full per-frame hot path on structured, simulator-generated
scans (not random blobs): range-image organization → LOAM feature
extraction → constant-velocity predict → fused edge/surf Gauss-Newton
scan-to-local-map registration → branchless local-map update — i.e. the
work the reference's scan-to-map frontend does in mean 105.9 ms/frame on
its CPU (BASELINE.md, `slam_data/time/times_scan_map.csv`), at VLP-16
scale (16×1800 range image, 10 GN iterations, 20-scan local map).

The whole step is ONE jitted XLA program; scans are pre-generated on device
and excluded from timing. Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.datasets import make_sim_world, make_trajectory, simulate_scan
from lmsf_slam_tpu.ops import features as F
from lmsf_slam_tpu.ops.registration import RegistrationParams
from lmsf_slam_tpu.tracker.tracker import TrackerConfig, tracker_init, tracker_step

BASELINE_FPS = 1000.0 / 105.9  # reference scan-to-map mean latency

RINGS, WIDTH = 16, 1800  # VLP-16 @ 10 Hz
SECTORS, EDGES_PS, SURFS_PS = 6, 20, 40  # → 1920 edge / 3840 surf per scan
N_WARM = 3
N_FRAMES = 30


def make_step(config: TrackerConfig):
    @jax.jit
    def step(state, scan, t):
        grid = F.organize_scan(scan, rings=RINGS, width=WIDTH)
        feats = F.extract_loam_features(
            grid, sectors=SECTORS, edges_per_sector=EDGES_PS,
            surfs_per_sector=SURFS_PS,
        )
        state, out = tracker_step(state, feats.edge, feats.surf, t, config)
        return state, out.pose

    return step


def main():
    key = jax.random.PRNGKey(0)
    world = make_sim_world(key, extent=30.0, n_boxes=14, n_cylinders=24)
    traj = np.array(make_trajectory(N_FRAMES + N_WARM, radius=9.0, loop=False))
    traj[:, 6] = 1.4
    traj = jnp.asarray(traj)

    scans = [
        simulate_scan(world, traj[i], jax.random.fold_in(key, i),
                      rings=RINGS, width=WIDTH, max_range=60.0, noise=0.01)
        for i in range(N_WARM + N_FRAMES)
    ]
    jax.block_until_ready(scans[-1].xyz)

    config = TrackerConfig(
        window=20,
        edge_capacity=RINGS * SECTORS * EDGES_PS,
        surf_capacity=RINGS * SECTORS * SURFS_PS,
        registration=RegistrationParams(max_iters=10),
    )
    step = make_step(config)
    state = tracker_init(config)

    for i in range(N_WARM):  # compile + map warmup
        state, pose = step(state, scans[i], jnp.float32(0.1 * i))
    jax.block_until_ready(pose)

    t0 = time.perf_counter()
    for i in range(N_FRAMES):
        state, pose = step(
            state, scans[N_WARM + i], jnp.float32(0.1 * (N_WARM + i))
        )
    jax.block_until_ready(pose)
    dt = time.perf_counter() - t0

    fps = N_FRAMES / dt
    print(json.dumps({
        "metric": "frontend_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
