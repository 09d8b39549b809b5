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
from lmsf_slam_tpu.evaluation import ate_stats, rpe_stats, save_kitti_trajectory
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


def run_city(args):
    """KITTI-00-class regime: HDL-64 scans, ≥1500-frame multi-loop urban
    course, the reference's OWN acceptance gates (refine/reloc score ≤ 0.05,
    `loopDetection.hpp:181,453`) at realistic point density — the scale the
    reference's published 0.554 m ATE lives at (BASELINE.md)."""
    from lmsf_slam_tpu.datasets.city import (
        HDL64, HDL64_SENSOR_Z, make_city_course, make_city_world,
    )

    key = jax.random.PRNGKey(args.seed)
    world = make_city_world(key)
    traj = jnp.asarray(make_city_course())
    # optional sub-course [start, start+frames) — e.g. the two half-course
    # sessions of the multi-session fusion artifact; timestamps stay on the
    # ABSOLUTE course clock so keyframe stamps identify course frames
    start = args.start or 0
    traj = traj[start:]
    n = min(args.frames, traj.shape[0]) if args.frames else traj.shape[0]

    movers = None
    extras_kw = {}
    if args.extras or args.movers:
        # dynamic movers in the world (--movers: world only, the ablation
        # baseline; --extras additionally turns on the reference-TODO
        # defense stack: carving + unsupported-point gating + synchronized
        # 2D occupancy grid, README TODOs #3/#4/#5)
        from lmsf_slam_tpu.datasets.city import make_movers, world_with_movers

        movers = make_movers(jax.random.fold_in(key, 999))
    imu_windows = None
    if args.imu:
        # LIO at city scale: 100 Hz IMU synthesized from the course
        # (datasets/city.py make_city_imu), scans rendered as TRUE moving
        # sweeps (simulate_scan_moving) so the LIO layer's IMU deskew has
        # real distortion to undo — the reference's FactorGraphLIO/eskf
        # capability (`imuPreintegration_node.cpp`) at validation scale
        from lmsf_slam_tpu.datasets.city import make_city_imu

        imu_windows = make_city_imu(np.asarray(make_city_course()))

    probation = False
    trim_kw = {}
    if args.extras:
        from lmsf_slam_tpu.mapping.occupancy import OccupancyConfig

        # frontend half of the defense: probation + free-space carving of
        # the odometry local map (SystemConfig.dynamic_probation) and
        # adaptive trimmed registration (coherently-moving clusters get
        # zero weight once the static majority has settled)
        probation = True
        trim_kw = dict(trim_rel=3.0)
        extras_kw = dict(
            dynamic_carve_knn=3,
            dynamic_gate_unsupported=True,
            occupancy=OccupancyConfig(size=1536, resolution=0.25),
        )

    config = SystemConfig(
        feature=FeatureParams(
            rings=HDL64["rings"], width=HDL64["width"],
            sectors=6, edges_per_sector=4, surfs_per_sector=8,
            range_noise=0.01, exclude_ground_edges=True,
            one_sided_occlusion=True,
        ),
        # match-count-normalized degeneracy floor (degen_rel): density-
        # independent — replaces the round-3 per-config magic 10 with the
        # same 0.01·n_matches rule everywhere the solver runs on
        # down-selected feature clouds
        registration=RegistrationParams(
            max_iters=8, max_corr_dist=2.0, degen_rel=0.01, **trim_kw
        ),
        map_update_trans=0.5,
        keyframe_trans=2.0,
        async_backend=not args.sync,
        dynamic_probation=probation,
        use_imu=args.imu,
        lifelong=LifelongConfig(
            optimize_window=100,
            # loop-closure (full) solves use the submap Schur elimination
            # once the graph passes 192 vertices — the full HDL-64 course
            # peaks at ~260 keyframes, so committed full solves actually
            # exercise the production scale-out path (solver_runs in the
            # output JSON proves it)
            schur_submaps=16,
            schur_min_vertices=192,
            localization_params=RegistrationParams(
                max_iters=8, max_corr_dist=2.0, degen_rel=0.01
            ),
            **extras_kw,
        ),
        loop=LoopConfig(  # reference score gates, unrelaxed
            min_frame_interval=30, exclude_recent=15, detect_spacing=2,
            search_radius=8.0, adjacent_window=4,
        ),
    )
    system = MultiLidarSystem(config)
    if args.imu:
        # anchor velocity: the ESKF lives in the tracker's odometry frame
        # (anchored at the first scan's pose) — seed it with the course
        # velocity rotated into that frame
        from lmsf_slam_tpu.estimator import eskf_init_state

        course = np.asarray(make_city_course())
        v0 = (course[start + 1, 4:7] - course[start, 4:7]) * 10.0
        va = se3.quat_rotate(
            se3.quat_conj(jnp.asarray(course[start, :4])),
            jnp.asarray(v0, jnp.float32),
        )
        system._lio.eskf = eskf_init_state()._replace(v=va)
    lat = []
    t0 = time.perf_counter()
    for i in range(n):
        fi = start + i  # absolute course frame
        w = world if movers is None else world_with_movers(world, movers, fi)
        if args.imu and fi > 0:
            from lmsf_slam_tpu.datasets import simulate_scan_moving

            scan = simulate_scan_moving(
                w, traj[i - 1] if i > 0 else traj[i], traj[i],
                jax.random.fold_in(key, fi),
                rings=HDL64["rings"], width=HDL64["width"],
                elev_min=HDL64["elev_min"], elev_max=HDL64["elev_max"],
                max_range=80.0, min_range=2.5, noise=0.01,
            )
        else:
            scan = simulate_scan(
                w, traj[i], jax.random.fold_in(key, fi),
                rings=HDL64["rings"], width=HDL64["width"],
                elev_min=HDL64["elev_min"], elev_max=HDL64["elev_max"],
                max_range=80.0, min_range=2.5, noise=0.01,
            )
        imu_kw = {}
        if imu_windows is not None and i > 0:
            gy, ac, dts = imu_windows[fi]
            imu_kw = dict(gyro=gy, acc=ac, imu_dts=dts)
        tf = time.perf_counter()
        system.process(scan, 0.1 * fi, **imu_kw)
        lat.append(time.perf_counter() - tf)
        if args.progress and i % 100 == 0:
            print(f"# frame {i}/{n} kf={system.backend.db.n_keyframes}",
                  file=sys.stderr)
    system.flush()
    wall = time.perf_counter() - t0
    est = system.trajectory()
    gt = np.asarray(se3.pose_between(traj[0], traj[:n]))
    return system, est, gt, wall, lat


def run_city_lifelong(args):
    """Lifelong phase at city scale: boot from the saved database of a prior
    `--dataset city --save-db` run, auto-relocalize (reference `SystemLoad` →
    RELOCALIZATION, `ML_System.hpp:202-206`, `backend_lifelong.hpp:97-118`),
    then localize through a revisited segment of the course. Estimates are in
    the ORIGINAL session's map frame, so ATE vs that frame proves the
    relocalization transform, not just local consistency."""
    from lmsf_slam_tpu.datasets.city import (
        HDL64, make_city_course, make_city_world,
    )

    key = jax.random.PRNGKey(args.seed)
    world = make_city_world(key)
    traj = jnp.asarray(make_city_course())
    start = args.start if args.start is not None else traj.shape[0] // 2
    n = args.frames or 150
    seg = traj[start:start + n]

    config = SystemConfig(
        feature=FeatureParams(
            rings=HDL64["rings"], width=HDL64["width"],
            sectors=6, edges_per_sector=4, surfs_per_sector=8,
            range_noise=0.01, exclude_ground_edges=True,
            one_sided_occlusion=True,
        ),
        registration=RegistrationParams(
            max_iters=8, max_corr_dist=2.0, degen_rel=0.01
        ),
        map_update_trans=0.5,
        keyframe_trans=2.0,
        # the reboot/localization phase runs pipelined too (round-4 weak #5:
        # it was hardcoded sync at 3.3 fps); --sync still forces inline
        async_backend=not args.sync,
        lifelong=LifelongConfig(
            optimize_window=100,
            localization_params=RegistrationParams(
                max_iters=8, max_corr_dist=2.0, degen_rel=0.01
            ),
        ),
        loop=LoopConfig(
            min_frame_interval=30, exclude_recent=15, detect_spacing=2,
            search_radius=8.0, adjacent_window=4,
        ),
    )
    system = MultiLidarSystem.load(args.boot_from, config=config)
    modes = []
    lat = []
    t0 = time.perf_counter()
    for i in range(seg.shape[0]):
        scan = simulate_scan(
            world, seg[i], jax.random.fold_in(key, 10_000 + i),
            rings=HDL64["rings"], width=HDL64["width"],
            elev_min=HDL64["elev_min"], elev_max=HDL64["elev_max"],
            max_range=80.0, min_range=2.5, noise=0.01,
        )
        tf = time.perf_counter()
        system.process(scan, 0.1 * i)
        lat.append(time.perf_counter() - tf)
        modes.append(system.backend.mode.name)
        if args.progress and i % 50 == 0:
            print(f"# frame {i}/{seg.shape[0]} mode={modes[-1]}",
                  file=sys.stderr)
    system.flush()
    wall = time.perf_counter() - t0
    est = system.trajectory()
    # ground truth in the original session's map frame (origin = course[0])
    gt = np.asarray(se3.pose_between(traj[0], seg))
    # frames before relocalization have no map pose — evaluate from the
    # first localized frame
    first = next(
        (i for i, m in enumerate(modes) if m != "RELOCALIZATION"), None)
    if first is not None:
        est, gt = est[first:], gt[first:]
    system._lifelong_modes = modes  # picked up by main() for reporting
    if args.ref_traj:
        # the claim-relevant reboot number: UNALIGNED map-frame RMSE of the
        # reboot trajectory vs the ORIGINAL session's estimate at the same
        # course frames — proves the relocalization transform landed in the
        # prior session's map frame (an aligned-vs-gt ATE cannot; it would
        # forgive an arbitrary rigid offset)
        ref = np.loadtxt(args.ref_traj).reshape(-1, 3, 4)
        lo = start + (first or 0)
        ref_t = ref[lo : lo + est.shape[0], :, 3]
        d = np.linalg.norm(est[: ref_t.shape[0], 4:] - ref_t, axis=1)
        system._map_frame_rmse = float(np.sqrt(np.mean(d**2)))
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
        # consume the azimuth-derived sweep times (datasets/kitti.py) with
        # the tracker's constant-velocity deskew — no IMU needed
        deskew=True,
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
    ap.add_argument("--dataset", choices=["sim", "city", "kitti"], default="sim")
    ap.add_argument("--progress", action="store_true")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--loop", action="store_true", help="sim: closed loop + loop closure")
    ap.add_argument("--extras", action="store_true",
                    help="city: movers in the world + dynamic carving + "
                    "unsupported-point gating + occupancy grid (TODO stack)")
    ap.add_argument("--movers", action="store_true",
                    help="city: movers in the world WITHOUT the defense "
                    "stack (ablation baseline for --extras)")
    ap.add_argument("--imu", action="store_true",
                    help="city: LIO — synthesized 100 Hz IMU + true moving-"
                    "sweep scans; ESKF prediction + IMU deskew")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--root", default=os.environ.get("KITTI_ROOT", ""))
    ap.add_argument("--seq", default="00")
    ap.add_argument("--out", default="eval_out")
    ap.add_argument("--sync", action="store_true",
                    help="run the backend inline instead of pipelined")
    ap.add_argument("--save-db", default="",
                    help="save the lifelong database here after the run")
    ap.add_argument("--boot-from", default="",
                    help="city: boot from a saved database and relocalize")
    ap.add_argument("--ref-traj", default="",
                    help="city lifelong: original session's est_path.txt — "
                    "report unaligned map-frame RMSE against it")
    ap.add_argument("--start", type=int, default=None,
                    help="city lifelong: course frame to start the reboot at"
                    " (default: course midpoint)")
    args = ap.parse_args()

    if args.dataset == "sim":
        system, est, gt, wall, lat = run_sim(args)
    elif args.dataset == "city":
        if args.boot_from:
            system, est, gt, wall, lat = run_city_lifelong(args)
        else:
            system, est, gt, wall, lat = run_city(args)
    else:
        system, est, gt, wall, lat = run_kitti(args)

    if args.save_db:
        system.save(args.save_db)

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
        "backend": "async" if system._async is not None else "sync",
        "keyframes": int(system.backend.db.n_keyframes),
        "mode": system.backend.mode.name,
    }
    if system._async is not None:
        result["dropped_keyframes"] = system._async.dropped
        result["coalesced_keyframes"] = system._async.coalesced
        result["async_policy"] = system._async.policy
    result["solver_runs"] = system.backend.solver_runs
    g = system.backend.db.graph_arrays()
    ij = np.asarray(g.edges_ij)[np.asarray(g.emask)]
    result["loop_edges"] = int(np.sum(np.abs(ij[:, 0] - ij[:, 1]) > 1))
    # backend stage profile (the reference's TicToc CSV statistics)
    result["backend_stage_ms"] = {
        k: {"n": v["n"], "mean": round(v["mean_ms"], 1)}
        for k, v in sorted(system.backend.timer.stats().items())
    }
    # per-keyframe decision log: gate behavior at scale, diagnosable
    # post-hoc (mode FSM, localization scores/overlaps, loop events)
    with open(os.path.join(args.out, "backend_history.csv"), "w") as f:
        f.write("mode,keyframe_id,score,overlap,loop_closed\n")
        for h in system.backend.history:
            f.write(
                f"{h.mode.name},{h.keyframe_id},{h.score:.5f},"
                f"{h.overlap:.4f},{int(h.loop_closed)}\n"
            )
    # inspectable map artifact: top-down global map + pose graph + paths
    # (reference `slam_data/trajectory/results/our_map.png` + the node's
    # MarkerArray graph renderer)
    from lmsf_slam_tpu.evaluation import render_map

    render_map(
        system.backend.db, os.path.join(args.out, "map.png"),
        est=est, gt=gt,
        title=f"{args.dataset}: {est.shape[0]} frames, "
        f"{system.backend.db.n_keyframes} keyframes",
    )
    hist_modes = [h.mode.name for h in system.backend.history]
    result["mode_counts"] = {
        m: hist_modes.count(m) for m in sorted(set(hist_modes))
    }
    occ = system.backend.occupancy_grid()
    if occ is not None:
        from lmsf_slam_tpu.evaluation.render import render_occupancy

        np.save(os.path.join(args.out, "occupancy.npy"), np.asarray(occ))
        render_occupancy(
            np.asarray(occ), system.backend.config.occupancy,
            os.path.join(args.out, "occupancy.png"),
        )
        result["occupancy_cells_occupied"] = int(np.sum(np.asarray(occ) > 1.0))
    modes = getattr(system, "_lifelong_modes", None)
    if modes is not None:
        result["reloc_frames"] = sum(m == "RELOCALIZATION" for m in modes)
        result["modes_seen"] = sorted(set(modes))
    mf = getattr(system, "_map_frame_rmse", None)
    if mf is not None:
        result["map_frame_rmse_vs_session"] = round(mf, 4)
    if gt is not None:
        save_kitti_trajectory(gt, os.path.join(args.out, "ground_truth.txt"))
        s = ate_stats(est, gt)
        result["ate"] = {
            "rmse": round(s.rmse, 4), "mean": round(s.mean, 4),
            "median": round(s.median, 4), "std": round(s.std, 4),
            "max": round(s.max, 4),
        }
        if est.shape[0] > 12:
            r = rpe_stats(est, gt, delta=10)
            result["rpe_d10"] = {
                "rmse": round(r.rmse, 4), "mean": round(r.mean, 4),
                "max": round(r.max, 4),
            }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
