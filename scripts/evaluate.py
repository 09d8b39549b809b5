"""End-to-end SLAM evaluation: trajectory + ATE through the public System API.

Runs MultiLidarSystem over a dataset and reports evo-style ATE statistics
(the reference's benchmark protocol: KITTI-format trajectories +
rmse/mean/median/std/max table, `slam_data/trajectory/results/table.csv`;
reference ATE RMSE = 0.554 m, BASELINE.md).

Usage:
  python scripts/evaluate.py --dataset sim --frames 120        # simulator
  python scripts/evaluate.py --dataset kitti --root /data/kitti --seq 00
Outputs: JSON stats on stdout; trajectories written next to --out.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lmsf_slam_tpu.backend import LifelongConfig, LoopConfig
from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.datasets import make_sim_world, make_trajectory, simulate_scan
from lmsf_slam_tpu.evaluation import ate_stats, save_kitti_trajectory
from lmsf_slam_tpu.ops.registration import RegistrationParams
from lmsf_slam_tpu.system import FeatureParams, MultiLidarSystem, SystemConfig


def run_sim(args):
    key = jax.random.PRNGKey(args.seed)
    world = make_sim_world(key, extent=30.0, n_boxes=14, n_cylinders=24)
    traj = np.array(make_trajectory(args.frames, radius=9.0, loop=args.loop))
    traj[:, 6] = 1.4
    traj = jnp.asarray(traj)

    config = SystemConfig(
        feature=FeatureParams(rings=16, width=900),
        registration=RegistrationParams(max_iters=8, max_corr_dist=2.0),
        map_update_trans=0.2,
        keyframe_trans=0.8,
        # production pipeline: backend (loop detection + optimization) on a
        # worker thread, windowed re-solve between loop closures — the
        # reference's thread architecture (`backend_lifelong.hpp:86-87,211`)
        async_backend=not args.sync,
        lifelong=LifelongConfig(optimize_window=50),
        loop=LoopConfig(
            min_frame_interval=20, exclude_recent=10, detect_spacing=1,
            search_radius=6.0, adjacent_window=3, refine_score_thresh=0.3,
        ) if args.loop else LoopConfig(min_frame_interval=10**9),
    )
    system = MultiLidarSystem(config)
    lat = []
    t0 = time.perf_counter()
    for i in range(args.frames):
        scan = simulate_scan(
            world, traj[i], jax.random.fold_in(key, i), rings=16, width=900,
            max_range=60.0, noise=0.01,
        )
        tf = time.perf_counter()
        system.process(scan, 0.1 * i)
        lat.append(time.perf_counter() - tf)
    system.flush()
    wall = time.perf_counter() - t0
    est = system.trajectory()
    gt = np.asarray(se3.pose_between(traj[0], traj))
    return system, est, gt, wall, lat


def run_kitti(args):
    from lmsf_slam_tpu.datasets.kitti import KittiSequence

    seq = KittiSequence(args.root, args.seq)
    gt_all = seq.ground_truth()
    config = SystemConfig(
        feature=FeatureParams(rings=64, width=1800),
        registration=RegistrationParams(max_iters=8, max_corr_dist=2.0),
        keyframe_trans=1.0,
        async_backend=not args.sync,
        lifelong=LifelongConfig(optimize_window=50),
    )
    system = MultiLidarSystem(config)
    n = min(len(seq), args.frames) if args.frames else len(seq)
    lat = []
    t0 = time.perf_counter()
    for i, (stamp, scan) in enumerate(seq):
        if i >= n:
            break
        tf = time.perf_counter()
        system.process(scan, stamp)
        lat.append(time.perf_counter() - tf)
    system.flush()
    wall = time.perf_counter() - t0
    est = system.trajectory()
    gt = None
    if gt_all is not None:
        gt = np.asarray(
            se3.pose_between(jnp.asarray(gt_all[0]), jnp.asarray(gt_all[:n]))
        )
    return system, est, gt, wall, lat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["sim", "kitti"], default="sim")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--loop", action="store_true", help="sim: closed loop + loop closure")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--root", default=os.environ.get("KITTI_ROOT", ""))
    ap.add_argument("--seq", default="00")
    ap.add_argument("--out", default="eval_out")
    ap.add_argument("--sync", action="store_true",
                    help="run the backend inline instead of pipelined")
    args = ap.parse_args()

    if args.dataset == "sim":
        system, est, gt, wall, lat = run_sim(args)
    else:
        system, est, gt, wall, lat = run_kitti(args)

    os.makedirs(args.out, exist_ok=True)
    save_kitti_trajectory(est, os.path.join(args.out, "est_path.txt"))
    # steady-state latency: drop the first frames (compile)
    steady = np.asarray(lat[3:]) if len(lat) > 6 else np.asarray(lat)
    result = {
        "dataset": args.dataset,
        "frames": int(est.shape[0]),
        "fps": round(est.shape[0] / wall, 2),
        "frame_ms_p50": round(float(np.percentile(steady, 50)) * 1e3, 2),
        "frame_ms_p99": round(float(np.percentile(steady, 99)) * 1e3, 2),
        "backend": "sync" if args.sync else "async",
        "keyframes": int(system.backend.db.n_keyframes),
        "mode": system.backend.mode.name,
    }
    if gt is not None:
        save_kitti_trajectory(gt, os.path.join(args.out, "ground_truth.txt"))
        s = ate_stats(est, gt)
        result["ate"] = {
            "rmse": round(s.rmse, 4), "mean": round(s.mean, 4),
            "median": round(s.median, 4), "std": round(s.std, 4),
            "max": round(s.max, 4),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
