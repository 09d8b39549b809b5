"""Loop detection + appearance relocalization.

Capability parity with the reference's loop stack
(`inc/LoopDetection/loopDetection.hpp` + `SceneRecognitionScanContext.hpp`):

- two-stage candidate search: scan-context first, geometric position search
  as fallback (`loopDetection.hpp:301-342`);
- candidates must be old enough (≥ ``min_frame_interval`` keyframes,
  reference `MIN_LOOP_FRAME_INTERVAL_` `:38`) and, for the position
  fallback, within ``search_radius`` (≤10 m, `:304-342`);
- two-stage geometric verification: rough registration (coarse resolution)
  → alignment evaluation (gate ``rough_score_thresh``=1) → refined
  registration → alignment evaluation (gate ``refine_score_thresh``=0.05)
  (`:349-456`);
- relocalization: scan-context best match → rough+refine registration vs the
  ±``adjacent_window`` local map of the match → accept at score ≤ 0.05
  (`loopDetection.hpp:102-188`).

TPU-first design: the descriptor search is one batched device program over
the padded descriptor DB (no nanoflann ring-key kdtree, no candidate loop);
geometric verification is the fused edge/surf GN registration at two
correspondence gates instead of two NDT resolutions — same rough→refine
structure, same acceptance thresholds, one compiled program each.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import se3
from ..common.pointcloud import PointBatch
from ..ops import scancontext
from ..ops.registration import (
    RegistrationParams,
    evaluate_alignment,
    register_edge_surf,
)
from .keyframe_db import KeyframeDatabase


@partial(jax.jit, static_argnames=("rough_params", "refine_params"))
def _verify_fused(
    edge: PointBatch,
    surf: PointBatch,
    map_edge: PointBatch,
    map_surf: PointBatch,
    init_pose,
    rough_params: RegistrationParams,
    refine_params: RegistrationParams,
    rough_thresh,
    min_overlap,
):
    """The ENTIRE two-stage geometric verification — rough registration →
    alignment gate → refined registration → alignment — as ONE fused device
    program (`lax.cond` skips the refine work when the rough gate fails).
    The split path costs 4 dispatches + 4 result transfers per candidate;
    on a remote-TPU tunnel that RPC overhead dominated the round-4
    loop_detect profile. Returns (pose, score, overlap, converged,
    n_constrained, rough_score)."""
    rough = register_edge_surf(
        edge, surf, map_edge, map_surf, init_pose, rough_params
    )
    r_score, r_overlap = evaluate_alignment(
        surf, map_surf, rough.pose, min_overlap=min_overlap
    )

    def do_refine(_):
        refined = register_edge_surf(
            edge, surf, map_edge, map_surf, rough.pose, refine_params
        )
        s, o = evaluate_alignment(
            surf, map_surf, refined.pose, min_overlap=min_overlap
        )
        return refined.pose, s, o, refined.converged, refined.n_constrained

    def skip(_):
        return (
            rough.pose, jnp.float32(1e9), r_overlap,
            jnp.array(False), jnp.int32(0),
        )

    pose, score, overlap, conv, ncon = jax.lax.cond(
        r_score <= rough_thresh, do_refine, skip, None
    )
    return pose, score, overlap, conv, ncon, r_score


class LoopConfig(NamedTuple):
    sc_dist_thresh: float = 0.2  # SC_DIST_THRES (SceneRecognition...hpp:35)
    exclude_recent: int = 50  # newest KFs excluded from search (:30-33)
    min_frame_interval: int = 100  # candidate must be ≥ this much older (:38)
    detect_spacing: int = 3  # frames between detection attempts (:36-37)
    search_radius: float = 10.0  # position-fallback radius (:304-342)
    adjacent_window: int = 5  # ±KFs in the verification local map (:102-188)
    rough_score_thresh: float = 1.0  # (:413)
    refine_score_thresh: float = 0.05  # (:453)
    reloc_score_thresh: float = 0.05  # (:181-184)
    min_overlap: float = 0.5  # alignment evaluator overlap gate
    # odometry-plausibility gate: a verified loop implies a map-frame
    # correction of the query pose; reject corrections larger than this.
    # The reference bounds geometric candidates to a ≤10 m position search
    # (`loopDetection.hpp:304-342`); this extends the same bound to the
    # appearance path so a wrong-basin registration in a self-similar world
    # cannot rewrite the trajectory (set to inf for kidnapped-robot regimes).
    max_correction_trans: float = 10.0
    # loop-edge noise (σ²) [rot×3, trans×3] at the WORST accepted
    # verification score; the information matrix is scaled by the fitness
    # score (reference `information_matrix_calculator.hpp:43-52`: fitness →
    # interpolated information weight), so a tightly-verified loop carries a
    # stiffer edge than one that barely passed the gate. The σ scale factor
    # interpolates linearly in score from ``loop_info_best_scale`` (at
    # score ≤ loop_score_best) to 1.0 (at score = refine_score_thresh).
    loop_noise_rot: float = 0.0025
    loop_noise_trans: float = 0.01
    loop_score_best: float = 0.005  # scores at/below this get the stiffest edge
    loop_info_best_scale: float = 0.3  # σ multiplier at the best score
    # verification registrations use the match-count-normalized degeneracy
    # floor (0.01·n_matches): the 6/6-constraint accept gate must measure
    # geometry, not feature density (the reference's absolute floor of 100
    # is calibrated to its dense raw scans and mis-reads 4-5/6 at feature
    # counts — see RegistrationParams.degen_rel)
    rough_params: RegistrationParams = RegistrationParams(
        max_iters=8, max_corr_dist=4.0, huber_delta=2.0, degen_rel=0.01
    )
    refine_params: RegistrationParams = RegistrationParams(
        max_iters=10, max_corr_dist=1.0, degen_rel=0.01
    )


class LoopResult(NamedTuple):
    from_id: int  # historical keyframe
    to_id: int  # new keyframe
    z: np.ndarray  # (7,) relative pose from→to (in from's frame)
    noise: np.ndarray  # (6,) σ² [rot, trans]
    score: float
    overlap: float


class RelocResult(NamedTuple):
    pose: np.ndarray  # (7,) map-frame pose of the query scan
    matched_id: int
    score: float
    overlap: float


class LoopDetector:
    """Host-orchestrated loop detection over device search/verify kernels."""

    def __init__(self, config: LoopConfig = LoopConfig(), timer=None):
        from ..utils.profiling import StageTimer

        self.config = config
        self.timer = timer if timer is not None else StageTimer()
        self._last_attempt = -(10**9)

    # -- candidate search ---------------------------------------------------

    def _sc_candidate(self, db: KeyframeDatabase, query_id: int, newest_id: int):
        """Appearance candidate for keyframe ``query_id`` — the query
        descriptor is sliced from the device mirror inside the fused search
        (one dispatch, no upload)."""
        cfg = self.config
        sc_db, rk_db, valid = db.descriptor_arrays()
        cutoff = newest_id - max(cfg.exclude_recent, cfg.min_frame_interval)
        if cutoff <= 0:
            return None
        valid = valid & (jnp.arange(valid.shape[0]) < cutoff)
        best_id, dist, yaw = scancontext.sc_search_id(
            jnp.int32(query_id), sc_db, rk_db, valid
        )
        best_id, dist, yaw = int(best_id), float(dist), float(yaw)
        if best_id < 0 or dist > cfg.sc_dist_thresh:
            return None
        return best_id, yaw

    def _position_candidate(self, db: KeyframeDatabase, query_xyz, newest_id: int):
        cfg = self.config
        cutoff = newest_id - cfg.min_frame_interval
        if cutoff <= 0:
            return None
        ids, d = db.nearest_ids(np.asarray(query_xyz), 1, max_id=cutoff)
        if ids.size == 0 or d[0] > cfg.search_radius:
            return None
        return int(ids[0]), 0.0  # no yaw prior from geometry

    # -- two-stage geometric verification ------------------------------------

    def _verify(
        self,
        db: KeyframeDatabase,
        cand_id: int,
        edge_pb: PointBatch,
        surf_pb: PointBatch,
        init_pose,
    ):
        """rough → evaluate → refine → evaluate. Returns (pose, score,
        overlap) or None. ``init_pose`` is the map-frame initial guess of the
        query scan."""
        cfg = self.config
        with self.timer("loop_localmap"):
            # fixed-K device-resident assembly: one static-shape kernel, no
            # per-query cloud upload / shape-dependent recompile
            map_edge, map_surf = db.local_map_device(
                cand_id, cfg.adjacent_window
            )
        with self.timer("loop_verify"):
            # rough → gate → refine → evaluate, all in ONE fused dispatch
            out = _verify_fused(
                edge_pb, surf_pb, map_edge, map_surf,
                jnp.asarray(init_pose),
                cfg.rough_params, cfg.refine_params,
                jnp.float32(cfg.rough_score_thresh),
                jnp.float32(cfg.min_overlap),
            )
            pose, score, overlap, conv, ncon, rough_score = jax.device_get(out)
        if float(rough_score) > cfg.rough_score_thresh:
            return None
        # a loop edge must be fully constrained: 6/6 eigendirections of JᵀJ
        # above the degeneracy floor AND a converged solve — a ground-plane-
        # only or corridor match (x/y/yaw free) can score well yet fix
        # nothing (degeneracy spec: `edgeSurfFeatureRegistration.hpp:280-308`,
        # applied at accept time, not just solve time)
        if not bool(conv) or int(ncon) < 6:
            return None
        if float(score) > cfg.refine_score_thresh:
            return None
        return np.asarray(pose), float(score), float(overlap)

    # -- public API -----------------------------------------------------------

    def detect(
        self,
        db: KeyframeDatabase,
        new_id: int,
        edge_pb: PointBatch,
        surf_pb: PointBatch,
    ) -> Optional[LoopResult]:
        """Try to close a loop for keyframe ``new_id`` (clouds in sensor
        frame). Returns a verified loop edge or None."""
        cfg = self.config
        if new_id - self._last_attempt < cfg.detect_spacing:
            return None
        self._last_attempt = new_id

        with self.timer("loop_search"):
            cand = self._sc_candidate(db, new_id, new_id)
        if cand is not None:
            # appearance candidate: init at the candidate pose rotated by the
            # scan-context yaw alignment (the SC match carries no translation)
            cand_id, yaw = cand
            cand_pose = jnp.asarray(db.map_poses[cand_id])
            yaw_rot = se3.so3_exp_quat(jnp.asarray([0.0, 0.0, yaw], jnp.float32))
            init = se3.pose_compose(cand_pose, se3.make_pose(yaw_rot, jnp.zeros(3)))
        else:
            cand = self._position_candidate(db, db.map_poses[new_id, 4:], new_id)
            if cand is None:
                return None
            cand_id, _ = cand
            # geometric candidate: keep the query's own odometry estimate
            # (drift assumed small at ≤ search_radius), z snapped to the
            # historical candidate (reference snap, loopDetection:304-342)
            init_np = db.map_poses[new_id].copy()
            init_np[6] = db.map_poses[cand_id][6]
            init = jnp.asarray(init_np)

        ver = self._verify(db, cand_id, edge_pb, surf_pb, init)
        if ver is None:
            # second try from the drifted odometry pose (covers the case
            # where drift is small but the appearance yaw/position prior is
            # wrong — e.g. a symmetric world aliasing the scan context)
            ver = self._verify(
                db, cand_id, edge_pb, surf_pb, jnp.asarray(db.map_poses[new_id])
            )
        if ver is None:
            return None
        pose_new, score, overlap = ver
        # odometry-plausibility gate on the implied map-frame correction
        corr = np.linalg.norm(pose_new[4:] - db.map_poses[new_id][4:])
        if corr > cfg.max_correction_trans:
            return None
        z = np.asarray(
            se3.pose_between(jnp.asarray(db.map_poses[cand_id]), jnp.asarray(pose_new))
        )
        noise = self.edge_noise(score)
        return LoopResult(cand_id, new_id, z, noise, score, overlap)

    def edge_noise(self, score: float) -> np.ndarray:
        """Fitness-score → loop-edge noise (σ²), the reference's
        score-scaled information matrix (`information_matrix_calculator.hpp:
        43-52`): σ is interpolated from ``loop_info_best_scale``·σ_base at
        ``loop_score_best`` up to σ_base at the accept threshold."""
        cfg = self.config
        lo, hi = cfg.loop_score_best, max(cfg.refine_score_thresh, 1e-9)
        t = float(np.clip((score - lo) / max(hi - lo, 1e-9), 0.0, 1.0))
        s = cfg.loop_info_best_scale + t * (1.0 - cfg.loop_info_best_scale)
        base = np.array(
            [cfg.loop_noise_rot] * 3 + [cfg.loop_noise_trans] * 3
        )
        return base * (s * s)

    def relocalize(
        self,
        db: KeyframeDatabase,
        edge_pb: PointBatch,
        surf_pb: PointBatch,
    ) -> Optional[RelocResult]:
        """Appearance-based global relocalization of a scan against the whole
        database (`loopDetection.hpp:102-188`): SC best match → two-stage
        registration vs its local map → accept at score ≤ 0.05."""
        cfg = self.config
        if db.n_keyframes == 0:
            return None
        both = PointBatch(
            jnp.concatenate([edge_pb.xyz, surf_pb.xyz]),
            jnp.concatenate([edge_pb.mask, surf_pb.mask]),
        )
        query_sc = scancontext.make_scan_context(
            both, rings=db.sc_shape[0], sectors=db.sc_shape[1]
        )
        sc_db, rk_db, valid = db.descriptor_arrays()
        best_id, dist, yaw = scancontext.sc_search(query_sc, sc_db, rk_db, valid)
        best_id, dist, yaw = int(best_id), float(dist), float(yaw)
        if best_id < 0 or dist > cfg.sc_dist_thresh:
            return None
        cand_pose = jnp.asarray(db.map_poses[best_id])
        yaw_rot = se3.so3_exp_quat(jnp.asarray([0.0, 0.0, yaw], jnp.float32))
        init = se3.pose_compose(cand_pose, se3.make_pose(yaw_rot, jnp.zeros(3)))
        ver = self._verify(db, best_id, edge_pb, surf_pb, init)
        if ver is None:
            return None
        pose, score, overlap = ver
        if score > cfg.reloc_score_thresh:
            return None
        return RelocResult(pose, best_id, score, overlap)
