"""Render a saved lifelong database to a top-down map + pose-graph PNG.

Counterpart of the reference's committed map render
(`slam_data/trajectory/results/our_map.png`) and its MarkerArray graph
visualization (`MultiLidarSLAM_node.cpp:196-373`), as an offline CLI over
the database checkpoint:

  python scripts/render_map.py eval_out_city/city_db.npz --out map.png
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("database", help="saved KeyframeDatabase .npz checkpoint")
    ap.add_argument("--out", default="map.png")
    ap.add_argument("--est", default="", help="optional KITTI-format path file")
    ap.add_argument("--gt", default="", help="optional KITTI-format gt file")
    ap.add_argument("--max-points", type=int, default=400_000)
    args = ap.parse_args()

    from lmsf_slam_tpu.backend.keyframe_db import KeyframeDatabase
    from lmsf_slam_tpu.evaluation import load_kitti_trajectory, render_map

    db = KeyframeDatabase.load(args.database)
    est = load_kitti_trajectory(args.est) if args.est else None
    gt = load_kitti_trajectory(args.gt) if args.gt else None
    render_map(
        db, args.out, est=est, gt=gt, max_points=args.max_points,
        title=f"{os.path.basename(args.database)}: {db.n_keyframes} keyframes, "
        f"{db.n_edges} edges",
    )
    print(args.out)


if __name__ == "__main__":
    main()
