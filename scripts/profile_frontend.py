"""Per-stage frontend profile on the current device (TPU when available).

Breaks the bench.py workload into stages — scan simulation (excluded),
range-image organization, feature extraction, fused tracking step — and
reports aggregated timings plus an optional jax.profiler trace.

Usage: python scripts/profile_frontend.py [--frames 30] [--trace DIR]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lmsf_slam_tpu.datasets import make_sim_world, make_trajectory, simulate_scan
from lmsf_slam_tpu.ops import features as F
from lmsf_slam_tpu.ops.registration import RegistrationParams
from lmsf_slam_tpu.tracker.tracker import TrackerConfig, tracker_init, tracker_step
from lmsf_slam_tpu.utils import StageTimer, device_trace

RINGS, WIDTH = 16, 1800
SECTORS, EDGES_PS, SURFS_PS = 6, 20, 40


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    ap.add_argument("--json", default=None, help="write stage stats JSON")
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    world = make_sim_world(key, extent=30.0, n_boxes=14, n_cylinders=24)
    traj = np.array(make_trajectory(args.frames + 3, radius=9.0, loop=False))
    traj[:, 6] = 1.4
    traj = jnp.asarray(traj)
    scans = [
        simulate_scan(world, traj[i], jax.random.fold_in(key, i),
                      rings=RINGS, width=WIDTH, max_range=60.0, noise=0.01)
        for i in range(args.frames + 3)
    ]
    jax.block_until_ready(scans[-1].xyz)

    config = TrackerConfig(
        window=20,
        edge_capacity=RINGS * SECTORS * EDGES_PS,
        surf_capacity=RINGS * SECTORS * SURFS_PS,
        registration=RegistrationParams(max_iters=10),
    )
    organize = jax.jit(lambda s: F.organize_scan(s, rings=RINGS, width=WIDTH))
    extract = jax.jit(
        lambda g: F.extract_loam_features(
            g, sectors=SECTORS, edges_per_sector=EDGES_PS,
            surfs_per_sector=SURFS_PS,
        )
    )
    state = tracker_init(config)
    # warmup/compile
    for i in range(3):
        g = organize(scans[i])
        f = extract(g)
        state, out = tracker_step(state, f.edge, f.surf, jnp.float32(0.1 * i),
                                  config)
    jax.block_until_ready(out.pose)

    # Per-call host/device sync costs ~10 ms RTT on the tunneled platform, so
    # per-stage timing is AMORTIZED: dispatch the stage for every frame, sync
    # once, divide — the same pipelined regime the production loop runs in.
    timer = StageTimer()
    n = args.frames
    frame_scans = scans[3:3 + n]
    with device_trace(args.trace):
        import time as _time

        t0 = _time.perf_counter()
        grids = [organize(s) for s in frame_scans]
        jax.block_until_ready(grids[-1].xyz)
        for _ in range(n):
            timer.add("organize_scan", (_time.perf_counter() - t0) / n)

        t0 = _time.perf_counter()
        feats = [extract(g) for g in grids]
        jax.block_until_ready(feats[-1].surf.xyz)
        for _ in range(n):
            timer.add("extract_features", (_time.perf_counter() - t0) / n)

        t0 = _time.perf_counter()
        for i, f in enumerate(feats):
            state, out = tracker_step(
                state, f.edge, f.surf, jnp.float32(0.1 * (3 + i)), config
            )
        jax.block_until_ready(out.pose)
        for _ in range(n):
            timer.add("tracker_step(register+map)", (_time.perf_counter() - t0) / n)
        for _ in range(n):
            timer.add(
                "total_frame",
                timer.samples["organize_scan"][-1]
                + timer.samples["extract_features"][-1]
                + timer.samples["tracker_step(register+map)"][-1],
            )
    print(timer.report())
    s = timer.stats()["total_frame"]
    print(json.dumps({
        "frames": args.frames,
        "mean_frame_ms": round(s["mean_ms"], 2),
        "fps": round(1000.0 / s["mean_ms"], 2),
        "device": str(jax.devices()[0]),
    }))
    if args.json:
        timer.save_json(args.json)


if __name__ == "__main__":
    main()
