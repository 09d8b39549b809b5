"""Scan-to-local-map LiDAR odometry tracker.

Capability parity with the reference's front-end tracker
(`inc/LidarTracker/LidarTrackerLocalMap.hpp:107-262`): constant-velocity
prediction, edge+surf Gauss-Newton registration against a sliding-window
local map, and a keyframe-style map-update policy (translation > 0.3 m ∨
rotation > 0.1 rad ∨ Δt > 10 s, `:239-262`).

TPU-first design: the tracker is a pure function ``tracker_step(state, ...)``
— state is a pytree, the whole predict→register→update-map step is one jitted
XLA program. Map insertion is branchless (masked ring-buffer write) so there
is no retrace on the update decision.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..common import se3
from ..common.pointcloud import PointBatch
from ..ops.registration import RegistrationParams, RegistrationResult, register_edge_surf
from ..ops.voxel import voxel_downsample
from .localmap import LocalMapState, localmap_add_if, localmap_empty, localmap_flatten


class TrackerConfig(NamedTuple):
    window: int = 20  # local-map scans
    edge_capacity: int = 2048  # per-scan edge points in the map
    surf_capacity: int = 8192  # per-scan surf points in the map
    map_update_trans: float = 0.3  # m   (ref :239-262)
    map_update_rot: float = 0.1  # rad
    map_update_dt: float = 10.0  # s
    # registration runs against a voxel-downsampled snapshot of the window
    # (rebuilt only on map updates, cached in state): k-NN association is
    # HBM-bound in the map size, and window scans overlap heavily, so the
    # downsampled map is ~5× smaller at no accuracy cost (the reference
    # voxel-filters its local map the same way, common_processing.hpp chain)
    map_voxel_size: float = 0.25  # m
    edge_map_capacity: int = 8192  # downsampled map capacities (static)
    surf_map_capacity: int = 16384
    registration: RegistrationParams = RegistrationParams()
    # odometry failure gate (the front-end analog of the reference LIO's
    # failureDetection |v|>30 m/s reset, `imuPreintegration_node.cpp:510`):
    # a single ill-conditioned solve must not poison the constant-velocity
    # model — an implausible increment is rejected (pose falls back to the
    # prediction) and, if the prediction itself is implausible, the velocity
    # resets to zero so the tracker re-anchors on its local map instead of
    # dead-reckoning to infinity.
    max_motion_trans: float = 10.0  # m/frame (100 m/s at 10 Hz — insanity ceiling)
    max_motion_rot: float = 1.5  # rad/frame
    # dynamic motion gate: the per-frame translation bound is
    # min(max_motion_trans, max(motion_floor, motion_gate_k · EMA speed)) —
    # a static 10 m ceiling lets one bad-but-"sane" solve poison the
    # constant-velocity state, after which dead-reckoning at up to
    # 10 m/frame passes the gate forever (observed: an HDL-64 city run
    # walking off at 6-8 m/frame from frame 323 on). Speed-relative
    # gating rejects such a solve AND the poisoned prediction, forcing the
    # velocity reset that re-anchors the tracker.
    motion_floor: float = 2.0  # m/frame always allowed (startup/acceleration)
    motion_gate_k: float = 3.0  # multiple of the smoothed speed allowed
    speed_ema_alpha: float = 0.3  # EMA update weight of the accepted speed
    # gate warm-start / re-acquire: the speed-relative bound only applies
    # once some non-trivial motion has been ACCEPTED (speed_ema > 0) —
    # otherwise a sequence starting above motion_floor (KITTI highway
    # ~2.5 m/frame, or rebooting mid-drive) would reject every solve forever
    # (speed_ema is an EMA of accepted speed, so it could never grow). After
    # ``gate_reopen_after`` consecutive rejections the bound also falls back
    # to max_motion_trans so the tracker can re-acquire instead of holding
    # position while the local map starves.
    gate_reopen_after: int = 3
    # prediction-trust gate (see the solve_ok block): reject solves
    # deviating from the constant-velocity prediction by more than
    # max(pred_trust_floor, pred_trust_k · speed_ema) and coast instead.
    # 0 disables.
    pred_trust_k: float = 0.0
    pred_trust_floor: float = 0.5
    # map-insertion health gate: a frame is inserted when its solve used at
    # least this many correspondences AND passed the motion gate. The
    # convergence flag is the WRONG gate here: at realistic noise the GN
    # loop frequently exhausts max_iters healthily (flag False), while a
    # scan that fell off the map entirely "converges" trivially with zero
    # matches (xi = 0) — gating on the flag starves the sliding window in
    # exactly the situations that need fresh scans, then inserts the
    # garbage (observed: city-run local map decayed 2395 → 0 matches over
    # 90 frames, after which the tracker dead-reckoned off the map).
    map_insert_min_matches: int = 32
    # IMU-free constant-velocity sweep deskew (reference intent:
    # `processing/deskew/deskew_base.hpp` + the rotary preprocessor's
    # per-point rel-time, `RotaryLidar_preprocessing.hpp:77-91`): when the
    # feature clouds carry a rel-time attribute (slot ATTR_TIME — e.g. the
    # KITTI azimuth-derived sweep times), each point is warped into the
    # end-of-scan frame using the tracker's own constant-velocity motion
    # before registration. No-op when the attr column is absent.
    deskew: bool = False
    # dynamic-object probation gate at map insert (reference README TODO
    # #4, the FRONTEND half — the backend carve/unsupported stack cannot
    # save odometry once movers are in the tracker's local map; measured on
    # the 600-frame city-with-movers course: ATE 1.88 m / RPE 0.91 without
    # this gate vs 0.25-class with it). A new scan point is admitted to the
    # local map iff it is SUPPORTED by the existing registration map
    # (1-NN within ``support_radius``) or TEMPORALLY CONSISTENT with the
    # previous update's unsupported points (1-NN within ``consist_radius``
    # in the world frame). Static new structure passes on the second sight
    # (one map-update delay); a mover displacing faster than
    # consist_radius per update interval never does. Two fixed-shape 1-NN
    # kernels per map update, zero cost on non-update frames.
    probation: bool = False
    support_radius: float = 0.6  # m — map-supported admission
    consist_radius: float = 0.3  # m — probation re-sighting admission
    # free-space carving of the registration map with the current scan
    # (requires scan_grid passed to tracker_step): probation alone cannot
    # stop an EXTENDED mover — a 4 m car advancing 0.8 m/update overlaps
    # its own previous footprint, so its points are "map-supported" by its
    # own ghost and chain-admit forever (measured: city-with-movers broke
    # at a tailing-car segment, 0.7 m/frame sustained odometry bias). The
    # carve erases any ghost the current scan sees through, breaking the
    # chain at its root. Same conservative test as the backend's
    # ``ops.dynamic.carve_dynamic``.
    carve_map: bool = False
    # ego-motion-compensated scene-flow gate BEFORE registration: each scan
    # point is placed at its predicted world position and matched 1-NN
    # against the previous scan (world frame); a displacement beyond
    # ``flow_gate + flow_rel·range`` is inconsistent with rigid ego motion
    # — the point is moving — and is excluded from BOTH registration and
    # map insert. This kills the failure the probation/carve pair cannot:
    # a head-on mover whose coherent point cluster DRAGS the GN solve
    # (huber only tempers it) — measured ±4-5 m yanks at the city course's
    # frame-614 head-on pass that no map hygiene can undo. The range term
    # absorbs constant-velocity yaw-prediction error on distant points
    # (1° at 40 m = 0.7 m). Fail-safe: if less than ``flow_floor`` of the
    # scan survives (jolted prediction, first frame), the gate stands down.
    flow_gate: float = 0.0  # m at zero range; 0 disables
    flow_rel: float = 0.02  # + this fraction of point range
    flow_floor: float = 0.3
    # sightings within ``consist_radius`` of the point's FIRST-SEEN anchor
    # before admission (anchors are never refreshed, so the test is on
    # CUMULATIVE displacement: a mover pacing the ego at 0.2 m/update —
    # under the per-interval radius — drifts 0.4 m from its anchor by the
    # third sighting and is rejected; static structure rides at noise
    # level). 2 = admit on first re-sighting (per-interval test only).
    probation_sightings: int = 3
    # starvation fail-safe: if the gate admits less than this fraction of
    # the scan's valid points, admit the whole scan for this update. A
    # mover is a few percent of a scan, so the gate never legitimately
    # rejects ~everything; when a pose jolt (e.g. a head-on mover dragging
    # one solve) makes world positions jitter past consist_radius, the
    # gate would otherwise reject ALL new structure, starve the map down
    # an unvisited street, and never re-anchor — a self-reinforcing
    # divergence (measured at the city course's frame-615 head-on pass).
    # Better a briefly polluted map (carve_map erases it) than none.
    probation_starvation_floor: float = 0.3
    # iterative re-deskew: registrations per frame (1 = deskew once with
    # the constant-velocity prior — the best measured default: sustained
    # distortion (corners) is where deskew pays, and there the lagged prior
    # is accurate; extra fixed-point passes help only when the prior is far
    # off, at a full registration each) and the damping of the sweep-motion
    # update between passes
    deskew_passes: int = 1
    deskew_gain: float = 1.0


class TrackerState(NamedTuple):
    pose: jax.Array  # (7,) current pose in odom frame
    motion: jax.Array  # (7,) last inter-frame increment (const-velocity)
    speed_ema: jax.Array  # f32 — smoothed accepted per-frame speed (m)
    reject_streak: jax.Array  # int32 — consecutive motion-gate rejections
    edge_map: LocalMapState
    surf_map: LocalMapState
    edge_flat: PointBatch  # cached voxel-downsampled union map (odom frame)
    surf_flat: PointBatch
    last_update_pose: jax.Array  # (7,) pose at last map insertion
    last_update_time: jax.Array  # f32
    frame_count: jax.Array  # int32
    # probation cloud (world frame): last update's unsupported points —
    # empty (0, 3) unless config.probation. prob_xyz holds each point's
    # FIRST-SEEN anchor; prob_count its consecutive in-radius sightings.
    prob_xyz: jax.Array
    prob_mask: jax.Array
    prob_count: jax.Array
    # previous raw scan in the world frame (scene-flow gate reference) —
    # empty (0, 3) unless config.flow_gate > 0
    flow_xyz: jax.Array
    flow_mask: jax.Array


class TrackerOutput(NamedTuple):
    pose: jax.Array  # (7,)
    motion: jax.Array  # (7,)
    registration: RegistrationResult
    map_updated: jax.Array  # bool
    solve_ok: jax.Array = True  # bool — False: pose fell back to prediction


def _fit_cap(x, m, cap):
    """Clip/pad a cloud to exactly ``cap`` rows (static-shape state slots)."""
    n = x.shape[0]
    if n >= cap:
        return x[:cap], m[:cap]
    return (
        jnp.concatenate([x, jnp.zeros((cap - n, 3), x.dtype)]),
        jnp.concatenate([m, jnp.zeros(cap - n, bool)]),
    )


def tracker_init(config: TrackerConfig) -> TrackerState:
    return TrackerState(
        pose=se3.pose_identity(),
        motion=se3.pose_identity(),
        speed_ema=jnp.float32(0.0),
        reject_streak=jnp.array(0, jnp.int32),
        edge_map=localmap_empty(config.window, config.edge_capacity),
        surf_map=localmap_empty(config.window, config.surf_capacity),
        edge_flat=PointBatch.empty(config.edge_map_capacity),
        surf_flat=PointBatch.empty(config.surf_map_capacity),
        last_update_pose=se3.pose_identity(),
        last_update_time=jnp.float32(-1e18),
        frame_count=jnp.array(0, jnp.int32),
        prob_xyz=jnp.zeros(
            (
                (config.edge_capacity + config.surf_capacity)
                if config.probation else 0,
                3,
            ),
            jnp.float32,
        ),
        prob_mask=jnp.zeros(
            (config.edge_capacity + config.surf_capacity)
            if config.probation else 0,
            bool,
        ),
        prob_count=jnp.zeros(
            (config.edge_capacity + config.surf_capacity)
            if config.probation else 0,
            jnp.int32,
        ),
        flow_xyz=jnp.zeros(
            (
                (config.edge_capacity + config.surf_capacity)
                if config.flow_gate > 0 else 0,
                3,
            ),
            jnp.float32,
        ),
        flow_mask=jnp.zeros(
            (config.edge_capacity + config.surf_capacity)
            if config.flow_gate > 0 else 0,
            bool,
        ),
    )


@partial(jax.jit, static_argnames=("config",))
def tracker_step(
    state: TrackerState,
    edge: PointBatch,
    surf: PointBatch,
    timestamp: jax.Array,
    config: TrackerConfig = TrackerConfig(),
    prediction: jax.Array | None = None,
    scan_grid=None,  # organized range image (sensor frame) for carve_map
) -> tuple[TrackerState, TrackerOutput]:
    """One odometry step: predict → register vs local map → maybe update map.

    ``prediction``: optional externally predicted pose (odom frame) — e.g.
    from an IMU; defaults to constant-velocity extrapolation
    (`LidarTrackerLocalMap.hpp:125-129`).
    """
    first = state.frame_count == 0
    if prediction is None:
        prediction = se3.pose_compose(state.pose, state.motion)

    # speed-relative translation bound (see motion_floor/motion_gate_k);
    # cold gate (no accepted motion yet) or a re-acquire after
    # gate_reopen_after straight rejections falls back to the insanity
    # ceiling so the tracker can lock on at any plausible speed
    gate_open = (state.speed_ema <= 0.0) | (
        state.reject_streak >= jnp.int32(config.gate_reopen_after)
    )
    trans_bound = jnp.where(
        gate_open,
        jnp.float32(config.max_motion_trans),
        jnp.minimum(
            jnp.float32(config.max_motion_trans),
            jnp.maximum(
                jnp.float32(config.motion_floor),
                config.motion_gate_k * state.speed_ema,
            ),
        ),
    )

    def _sane(p):
        d = se3.pose_between(state.pose, p)
        return (
            (jnp.linalg.norm(se3.pose_trans(d)) <= trans_bound)
            & (jnp.linalg.norm(se3.so3_log(se3.pose_quat(d)))
               <= config.max_motion_rot)
            & jnp.all(jnp.isfinite(p))
        )

    if config.deskew and edge.attr.shape[-1] > 0:
        from ..common.pointcloud import ATTR_TIME
        from ..ops.preprocess import deskew as _deskew

        # ITERATIVE re-deskew (the LOAM reprojection scheme): the sweep
        # motion is re-estimated from the registration itself — deskew with
        # the current sweep iterate, register, measure the solved motion,
        # repeat. A single pass with the lagged constant-velocity prior is
        # measurably WORSE than no deskew (its motion error feeds the
        # registration, whose error feeds the next frame's deskew); the
        # fixed-point iteration converges on the frame's own motion. See
        # tests/test_deskew.py for the system-level A/B.
        raw_edge, raw_surf = edge, surf
        sweep = jnp.where(first, se3.pose_identity(), state.motion)
        pred_i = prediction
        for _ in range(config.deskew_passes):
            edge = _deskew(raw_edge, raw_edge.attr[:, ATTR_TIME], sweep)
            surf = _deskew(raw_surf, raw_surf.attr[:, ATTR_TIME], sweep)
            reg_i = register_edge_surf(
                edge, surf, state.edge_flat, state.surf_flat, pred_i,
                config.registration,
            )
            ok_i = (
                _sane(reg_i.pose)
                & (reg_i.num_matches >= config.map_insert_min_matches)
                & ~first
            )
            measured = se3.pose_between(state.pose, reg_i.pose)
            # damped update of the sweep iterate (geodesic interpolation):
            # full trust in the measurement overshoots at motion changes
            a = jnp.where(ok_i, jnp.float32(config.deskew_gain), 0.0)
            sweep = se3.pose_retract(
                sweep, a * se3.pose_log(se3.pose_between(sweep, measured))
            )
            pred_i = jnp.where(ok_i, reg_i.pose, pred_i)
        edge = _deskew(raw_edge, raw_edge.attr[:, ATTR_TIME], sweep)
        surf = _deskew(raw_surf, raw_surf.attr[:, ATTR_TIME], sweep)
        prediction = pred_i

    raw_edge_in, raw_surf_in = edge, surf  # pre-flow-gate (flow reference)
    if config.flow_gate > 0:
        from ..ops.neighbors import nn1

        def _flow_static(pb):
            w = pb.transform(prediction)
            d, _ = nn1(w.xyz, w.mask, state.flow_xyz, state.flow_mask)
            rng = jnp.linalg.norm(pb.xyz, axis=-1)  # sensor-frame range
            thr = config.flow_gate + config.flow_rel * rng
            return d < thr * thr

        stat_e = _flow_static(edge)
        stat_s = _flow_static(surf)
        n_val = jnp.maximum(
            jnp.sum(edge.mask) + jnp.sum(surf.mask), 1
        )
        frac = (
            jnp.sum(stat_e & edge.mask) + jnp.sum(stat_s & surf.mask)
        ) / n_val
        stand_down = (frac < jnp.float32(config.flow_floor)) | first
        edge = PointBatch(edge.xyz, edge.mask & (stat_e | stand_down),
                          edge.attr)
        surf = PointBatch(surf.xyz, surf.mask & (stat_s | stand_down),
                          surf.attr)

    reg = register_edge_surf(
        edge, surf, state.edge_flat, state.surf_flat, prediction,
        config.registration,
    )
    # first frame: no map yet — stay at identity
    new_pose = jnp.where(first, se3.pose_identity(), reg.pose)

    # odometry failure gate: reject an implausible solve (fall back to the
    # prediction), and if even the prediction is implausible zero the
    # velocity — hold position and re-anchor on the local map next frame
    solve_ok = _sane(new_pose)
    if config.pred_trust_k > 0.0:
        # prediction-trust gate: a registration that lands far from the
        # constant-velocity prediction (relative to the smoothed speed) is
        # either dragged by a coherent mover or snapped to an aliased
        # corridor minimum — reject it and COAST on the prediction instead
        # of freezing in place (the city corridor-tailgating failure:
        # the solve pinned the pose to the map while the ego advanced
        # 0.9 m/frame). The cold/reopen fallback uses the same gate_open
        # as the speed gate so a genuinely wrong velocity re-acquires.
        dev = jnp.linalg.norm(
            se3.pose_trans(se3.pose_between(prediction, new_pose))
        )
        pred_bound = jnp.where(
            gate_open,
            jnp.float32(config.max_motion_trans),
            jnp.maximum(
                jnp.float32(config.pred_trust_floor),
                config.pred_trust_k * state.speed_ema,
            ),
        )
        solve_ok = solve_ok & (dev <= pred_bound)
    new_pose = jnp.where(solve_ok, new_pose, prediction)
    pred_ok = _sane(new_pose)
    new_pose = jnp.where(pred_ok, new_pose, state.pose)
    motion = se3.pose_between(state.pose, new_pose)

    # map-update decision (ref thresholds :239-262)
    delta = se3.pose_between(state.last_update_pose, new_pose)
    dx = jnp.linalg.norm(se3.pose_trans(delta))
    dr = jnp.linalg.norm(se3.so3_log(se3.pose_quat(delta)))
    need = (
        first
        | (dx > config.map_update_trans)
        | (dr > config.map_update_rot)
        | (timestamp - state.last_update_time > config.map_update_dt)
    )
    # registration health gate: a diverged solve must not pollute the local
    # map (the reference falls back on non-convergence at the backend,
    # `backend_lifelong.hpp:284-289`). Health = enough correspondences +
    # a speed-plausible increment — NOT the convergence flag (see
    # map_insert_min_matches above).
    healthy = solve_ok & (
        reg.num_matches >= config.map_insert_min_matches
    )
    need = need & (first | healthy)

    edge_w = edge.transform(new_pose)
    surf_w = surf.transform(new_pose)
    prob_xyz, prob_mask = state.prob_xyz, state.prob_mask
    prob_count = state.prob_count
    flow_xyz, flow_mask = state.flow_xyz, state.flow_mask
    if config.flow_gate > 0:
        # refresh the scene-flow reference EVERY frame (relative motion is
        # per frame, not per map update) with the UNGATED scan at the
        # solved pose
        rw_e = raw_edge_in.transform(new_pose)
        rw_s = raw_surf_in.transform(new_pose)
        fe_xyz, fe_mk = _fit_cap(rw_e.xyz, rw_e.mask, config.edge_capacity)
        fs_xyz, fs_mk = _fit_cap(rw_s.xyz, rw_s.mask, config.surf_capacity)
        flow_xyz = jnp.concatenate([fe_xyz, fs_xyz])
        flow_mask = jnp.concatenate([fe_mk, fs_mk])
    if config.probation:
        from ..ops.neighbors import nn1

        _fit = _fit_cap
        ne_cap, ns_cap = config.edge_capacity, config.surf_capacity
        pe_xyz, pe_mk = _fit(edge_w.xyz, edge_w.mask, ne_cap)
        ps_xyz, ps_mk = _fit(surf_w.xyz, surf_w.mask, ns_cap)
        new_xyz = jnp.concatenate([pe_xyz, ps_xyz])
        new_mk = jnp.concatenate([pe_mk, ps_mk])
        map_xyz = jnp.concatenate([state.edge_flat.xyz, state.surf_flat.xyz])
        map_mk = jnp.concatenate([state.edge_flat.mask, state.surf_flat.mask])
        d_map, _ = nn1(new_xyz, new_mk, map_xyz, map_mk)
        d_prob, p_idx = nn1(new_xyz, new_mk, prob_xyz, prob_mask)
        matched = d_prob < jnp.float32(config.consist_radius) ** 2
        # anchor-carrying re-sighting count: matched points inherit their
        # probation entry's ORIGINAL anchor and increment its count
        p_idx = jnp.where(matched, p_idx, 0)
        count = jnp.where(matched, state.prob_count[p_idx] + 1, 1)
        anchor = jnp.where(matched[:, None], prob_xyz[p_idx], new_xyz)
        admit = (
            (d_map < jnp.float32(config.support_radius) ** 2)
            | (matched & (count >= config.probation_sightings))
            | first
        )
        n_valid = jnp.maximum(jnp.sum(new_mk), 1)
        starved = (
            jnp.sum(admit & new_mk) / n_valid
            < jnp.float32(config.probation_starvation_floor)
        )
        admit = admit | starved

        def _apply(pb, adm, cap):
            n = pb.mask.shape[0]
            a = adm[:n] if n <= cap else jnp.concatenate(
                [adm, jnp.zeros(n - cap, bool)]
            )
            return PointBatch(pb.xyz, pb.mask & a, pb.attr)

        edge_w = _apply(edge_w, admit[:ne_cap], ne_cap)
        surf_w = _apply(surf_w, admit[ne_cap:], ns_cap)
        # next probation set: seen this update, admitted by neither rule
        prob_xyz = jnp.where(need, anchor, prob_xyz)
        prob_mask = jnp.where(need, new_mk & ~admit, prob_mask)
        prob_count = jnp.where(need, count, state.prob_count)
    new_edge_map = localmap_add_if(state.edge_map, edge_w, need)
    new_surf_map = localmap_add_if(state.surf_map, surf_w, need)

    # rebuild the downsampled registration map only when the window changed
    # (lax.cond: the sort/scatter cost is paid on map updates, not per frame)
    def _rebuild_maps():
        ef = voxel_downsample(
            localmap_flatten(new_edge_map), config.map_voxel_size,
            config.edge_map_capacity,
        )
        sf = voxel_downsample(
            localmap_flatten(new_surf_map), config.map_voxel_size,
            config.surf_map_capacity,
        )
        if config.carve_map and scan_grid is not None:
            from ..ops.dynamic import carve_dynamic

            gm = scan_grid.mask
            elev = jnp.arctan2(
                scan_grid.xyz[..., 2],
                jnp.linalg.norm(scan_grid.xyz[..., :2], axis=-1) + 1e-9,
            )
            elo = jnp.min(jnp.where(gm, elev, jnp.inf))
            ehi = jnp.max(jnp.where(gm, elev, -jnp.inf))
            ef = PointBatch(
                ef.xyz,
                ef.mask & carve_dynamic(
                    scan_grid, ef, new_pose, elev_min=elo, elev_max=ehi
                ),
                ef.attr,
            )
            sf = PointBatch(
                sf.xyz,
                sf.mask & carve_dynamic(
                    scan_grid, sf, new_pose, elev_min=elo, elev_max=ehi
                ),
                sf.attr,
            )
        return ef, sf

    edge_flat, surf_flat = jax.lax.cond(
        need,
        _rebuild_maps,
        lambda: (state.edge_flat, state.surf_flat),
    )

    speed = jnp.linalg.norm(se3.pose_trans(motion))
    a = jnp.float32(config.speed_ema_alpha)
    new_state = TrackerState(
        pose=new_pose,
        motion=jnp.where(first, se3.pose_identity(), motion),
        speed_ema=jnp.where(
            first, state.speed_ema,
            (1.0 - a) * state.speed_ema + a * speed,
        ),
        reject_streak=jnp.where(
            first | solve_ok, jnp.int32(0), state.reject_streak + 1
        ),
        edge_map=new_edge_map,
        surf_map=new_surf_map,
        edge_flat=edge_flat,
        surf_flat=surf_flat,
        last_update_pose=jnp.where(need, new_pose, state.last_update_pose),
        last_update_time=jnp.where(
            need, jnp.float32(timestamp), state.last_update_time
        ),
        frame_count=state.frame_count + 1,
        prob_xyz=prob_xyz,
        prob_mask=prob_mask,
        prob_count=prob_count,
        flow_xyz=flow_xyz,
        flow_mask=flow_mask,
    )
    return new_state, TrackerOutput(
        pose=new_pose, motion=motion, registration=reg, map_updated=need,
        solve_ok=solve_ok,
    )
