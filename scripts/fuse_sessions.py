"""Multi-session map fusion at city scale (reference README TODO #2).

Fuses two independently-mapped sessions (saved lifelong databases) into one
pose graph: appearance alignment (scan-context relocalization of B inside A)
→ merge with verified inter-session edges → global optimize → fused ATE vs
the course ground truth + fused map render.

Produce the inputs with two offset runs of the city driver, e.g.:

  python scripts/evaluate.py --dataset city --sync --frames 900 \
      --save-db /tmp/sess_a.npz --out eval_A
  python scripts/evaluate.py --dataset city --sync --start 800 \
      --save-db /tmp/sess_b.npz --out eval_B
  python scripts/fuse_sessions.py /tmp/sess_a.npz /tmp/sess_b.npz --out eval_fused
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("db_a")
    ap.add_argument("db_b")
    ap.add_argument("--out", default="eval_fused")
    ap.add_argument("--min-matches", type=int, default=3)
    args = ap.parse_args()

    from lmsf_slam_tpu.backend.keyframe_db import KeyframeDatabase
    from lmsf_slam_tpu.backend.lifelong import LifelongBackend, LifelongConfig
    from lmsf_slam_tpu.backend.loop_closure import LoopConfig
    from lmsf_slam_tpu.backend.session_merge import align_sessions, merge_sessions
    from lmsf_slam_tpu.common import se3np
    from lmsf_slam_tpu.datasets.city import make_city_course
    from lmsf_slam_tpu.evaluation import ate_stats, render_map

    db_a = KeyframeDatabase.load(args.db_a)
    db_b = KeyframeDatabase.load(args.db_b)
    n_a, n_b = db_a.n_keyframes, db_b.n_keyframes

    loop_cfg = LoopConfig(
        min_frame_interval=0, exclude_recent=0, search_radius=8.0,
        adjacent_window=4,
    )
    align = align_sessions(db_a, db_b, loop_cfg, min_matches=args.min_matches)
    if align is None:
        print(json.dumps({"fused": False, "reason": "alignment failed"}))
        return 1
    merge_sessions(db_a, db_b, align)  # appends B into A in place
    merged = db_a

    backend = LifelongBackend(
        db=merged,
        config=LifelongConfig(schur_submaps=16, schur_min_vertices=192),
    )
    stats = backend.optimize(full=True)

    # ground truth: keyframe stamps are on the absolute course clock
    # (frame = stamp / 0.1), in session A's map frame (= course[start_a])
    course = make_city_course()
    frames = np.clip(
        np.round(merged.stamps[: merged.n_keyframes] / 0.1).astype(int),
        0, course.shape[0] - 1,
    )
    frame_a0 = frames[0]
    gt = np.stack([
        np.asarray(se3np.pose_between(course[frame_a0], course[f]))
        for f in frames
    ])
    est = merged.map_poses[: merged.n_keyframes]
    s = ate_stats(est, gt)

    os.makedirs(args.out, exist_ok=True)
    render_map(
        merged, os.path.join(args.out, "fused_map.png"),
        title=f"fused sessions: {n_a}+{n_b} keyframes, "
        f"{len(align.matches)} inter-session edges",
    )
    merged.save(os.path.join(args.out, "fused_db.npz"))
    out = {
        "fused": True,
        "keyframes_a": int(n_a),
        "keyframes_b": int(n_b),
        "inter_session_edges": len(align.matches),
        "align_transform_trans_m": [
            round(float(x), 3) for x in align.transform[4:]
        ],
        "fused_ate": {
            "rmse": round(s.rmse, 4), "mean": round(s.mean, 4),
            "max": round(s.max, 4),
        },
        "chi2": [float(stats.chi2_initial), float(stats.chi2_final)]
        if stats else None,
        "solver_runs": backend.solver_runs,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
