"""LiDAR-inertial factor graph: pose+velocity+bias states, preintegration
factors, lidar pose priors — batch GN with matrix-free PCG.

Capability parity with the reference's FactorGraphLIO sidecar
(`src/apps/src/LIO/FactorGraphLIO/imuPreintegration_node.cpp`):

- per-correction graph of gtsam ImuFactor + bias BetweenFactor + lidar pose
  PriorFactor (`:433-460`) → here ONE combined 15-dim between factor
  [r_θ r_v r_p r_ba r_bg] per consecutive state pair plus 6-dim unary pose
  priors from scan-to-map;
- first-state prior (`:345-365`);
- failure detection on absurd velocity/bias → reset (`:510-533`) and the
  periodic window reset at 100 keys (`:380-408`) live in the host wrapper
  (:class:`FactorGraphLio`).

TPU-first: the reference's iSAM2 incremental solver has no XLA analog
(SURVEY §7.3); the equivalent here is a fixed-size sliding window solved by
full batch GN each scan — states are a padded (N,16) pytree, per-factor
Jacobians come from forward-mode autodiff of the boxplus residual, the
normal equations are never materialized (PCG with 15×15 block-Jacobi
preconditioning), and the whole solve is one jitted program.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import se3
from ..estimator.preintegration import PreintegratedImu, preintegrate  # noqa: F401


class LioGraphParams(NamedTuple):
    gn_iters: int = 8
    pcg_iters: int = 48
    damping: float = 1e-2
    gravity: float = 9.81
    converged_dx: float = 1e-6


class LioStates(NamedTuple):
    """Padded window of states: pose (N,7), vel (N,3), ba (N,3), bg (N,3)."""

    pose: jax.Array
    vel: jax.Array
    ba: jax.Array
    bg: jax.Array

    @staticmethod
    def zeros(n: int) -> "LioStates":
        return LioStates(
            pose=jnp.tile(se3.pose_identity(), (n, 1)),
            vel=jnp.zeros((n, 3)),
            ba=jnp.zeros((n, 3)),
            bg=jnp.zeros((n, 3)),
        )


def _retract_one(pose, vel, ba, bg, dx):
    return (
        se3.pose_retract(pose, dx[:6]),
        vel + dx[6:9],
        ba + dx[9:12],
        bg + dx[12:15],
    )


def _imu_residual(
    pose_i, vel_i, ba_i, bg_i, pose_j, vel_j, ba_j, bg_j, f, gravity
):
    """15-dim combined IMU + bias-walk residual between states i, j.

    ``f`` carries the preintegrated delta (at linearization bias zero) plus
    its bias Jacobians; the delta is re-linearized at the CURRENT bias
    estimate (Forster first-order correction) inside the residual so bias
    states stay observable through the factor.
    """
    dq, dv, dp, dt = f["dq"], f["dv"], f["dp"], f["dt"]
    # first-order bias correction of the delta
    dq = se3.quat_mul(dq, se3.so3_exp_quat(f["dq_dbg"] @ bg_i))
    dv = dv + f["dv_dbg"] @ bg_i + f["dv_dba"] @ ba_i
    dp = dp + f["dp_dbg"] @ bg_i + f["dp_dba"] @ ba_i
    g = jnp.asarray([0.0, 0.0, -gravity])
    q_i = pose_i[:4]
    p_i, p_j = pose_i[4:], pose_j[4:]
    q_conj = se3.quat_conj(q_i)
    r_th = se3.so3_log(
        se3.quat_mul(se3.quat_conj(dq), se3.quat_mul(q_conj, pose_j[:4]))
    )
    r_v = se3.quat_rotate(q_conj, vel_j - vel_i - g * dt) - dv
    r_p = (
        se3.quat_rotate(q_conj, p_j - p_i - vel_i * dt - 0.5 * g * dt * dt) - dp
    )
    r_ba = ba_j - ba_i
    r_bg = bg_j - bg_i
    return jnp.concatenate([r_th, r_v, r_p, r_ba, r_bg])


def _prior_residual(pose, z):
    """6-dim pose-prior residual log(z⁻¹ ∘ pose)."""
    return se3.pose_log(se3.pose_between(z, pose))


@partial(jax.jit, static_argnames=("params",))
def optimize_lio_graph(
    states: LioStates,  # padded (N, ...)
    smask: jax.Array,  # (N,) bool — state exists
    imu_factors: dict,  # padded (M, ...): dq dv dp dt dq_dbg dv_dbg dv_dba dp_dbg dp_dba sqrtw(15)
    imu_ij: jax.Array,  # (M,2) int32 state indices
    imu_mask: jax.Array,  # (M,)
    prior_z: jax.Array,  # (K,7) measured poses
    prior_idx: jax.Array,  # (K,) state index
    prior_sqrtw: jax.Array,  # (K,6)
    prior_mask: jax.Array,  # (K,)
    fixed: jax.Array | None = None,  # (N,) gauge-fixed states
    params: LioGraphParams = LioGraphParams(),
):
    """Batch GN over the LIO window. Returns (states, chi2)."""
    N = states.pose.shape[0]
    if fixed is None:
        fixed = jnp.zeros(N, bool)
    free = smask & ~fixed
    i_idx, j_idx = imu_ij[:, 0], imu_ij[:, 1]

    def imu_res_jac(si, sj, f):
        def h(x):
            pi, vi, bai, bgi = _retract_one(si[0], si[1], si[2], si[3], x[:15])
            pj, vj, baj, bgj = _retract_one(sj[0], sj[1], sj[2], sj[3], x[15:])
            return _imu_residual(
                pi, vi, bai, bgi, pj, vj, baj, bgj, f, params.gravity
            ) * f["sqrtw"]

        r = h(jnp.zeros(30))
        J = jax.jacfwd(h)(jnp.zeros(30))
        return r, J[:, :15], J[:, 15:]

    def prior_res_jac(s, z, sqrtw):
        def h(x):
            p, _, _, _ = _retract_one(s[0], s[1], s[2], s[3], x)
            return _prior_residual(p, z) * sqrtw

        return h(jnp.zeros(15)), jax.jacfwd(h)(jnp.zeros(15))

    def gather(st, idx):
        return (st.pose[idx], st.vel[idx], st.ba[idx], st.bg[idx])

    def chi2_of(st):
        r_i, _, _ = jax.vmap(imu_res_jac)(
            gather(st, i_idx), gather(st, j_idx), imu_factors
        )
        r_p, _ = jax.vmap(prior_res_jac)(
            gather(st, prior_idx), prior_z, prior_sqrtw
        )
        return jnp.sum(jnp.where(imu_mask, jnp.sum(r_i * r_i, -1), 0.0)) + jnp.sum(
            jnp.where(prior_mask, jnp.sum(r_p * r_p, -1), 0.0)
        )

    def gn_step(carry, _):
        st, done, prev_chi2 = carry
        r_f, Ji, Jj = jax.vmap(imu_res_jac)(
            gather(st, i_idx), gather(st, j_idx), imu_factors
        )
        Ji = Ji * imu_mask[:, None, None]
        Jj = Jj * imu_mask[:, None, None]
        r_f = r_f * imu_mask[:, None]
        r_p, Jp = jax.vmap(prior_res_jac)(
            gather(st, prior_idx), prior_z, prior_sqrtw
        )
        Jp = Jp * prior_mask[:, None, None]
        r_p = r_p * prior_mask[:, None]

        def matvec(x):  # (N,15)
            y = jnp.einsum("mab,mb->ma", Ji, x[i_idx]) + jnp.einsum(
                "mab,mb->ma", Jj, x[j_idx]
            )
            out = jax.ops.segment_sum(
                jnp.einsum("mab,ma->mb", Ji, y), i_idx, num_segments=N
            ) + jax.ops.segment_sum(
                jnp.einsum("mab,ma->mb", Jj, y), j_idx, num_segments=N
            )
            yp = jnp.einsum("kab,kb->ka", Jp, x[prior_idx])
            out = out + jax.ops.segment_sum(
                jnp.einsum("kab,ka->kb", Jp, yp), prior_idx, num_segments=N
            )
            out = out + params.damping * x
            return jnp.where(free[:, None], out, 0.0)

        g = jax.ops.segment_sum(
            jnp.einsum("mab,ma->mb", Ji, r_f), i_idx, num_segments=N
        ) + jax.ops.segment_sum(
            jnp.einsum("mab,ma->mb", Jj, r_f), j_idx, num_segments=N
        ) + jax.ops.segment_sum(
            jnp.einsum("kab,ka->kb", Jp, r_p), prior_idx, num_segments=N
        )
        g = jnp.where(free[:, None], g, 0.0)

        # block-Jacobi preconditioner (15×15 per state)
        M = (
            jax.ops.segment_sum(
                jnp.einsum("mab,mac->mbc", Ji, Ji), i_idx, num_segments=N
            )
            + jax.ops.segment_sum(
                jnp.einsum("mab,mac->mbc", Jj, Jj), j_idx, num_segments=N
            )
            + jax.ops.segment_sum(
                jnp.einsum("kab,kac->kbc", Jp, Jp), prior_idx, num_segments=N
            )
            + (params.damping + 1e-6) * jnp.eye(15)
        )
        Minv = jnp.linalg.inv(M)

        def precond(x):
            return jnp.where(
                free[:, None], jnp.einsum("nab,nb->na", Minv, x), 0.0
            )

        b = -g
        x0 = jnp.zeros_like(b)
        r0 = b
        z0 = precond(r0)
        rz0 = jnp.sum(r0 * z0)

        def pcg_body(c, _):
            x, rr, zz, pp, rz = c
            Ap = matvec(pp)
            pAp = jnp.sum(pp * Ap)
            alpha = rz / jnp.where(jnp.abs(pAp) > 1e-20, pAp, 1e-20)
            x = x + alpha * pp
            rr = rr - alpha * Ap
            zz = precond(rr)
            rz_new = jnp.sum(rr * zz)
            beta = rz_new / jnp.where(jnp.abs(rz) > 1e-20, rz, 1e-20)
            return (x, rr, zz, zz + beta * pp, rz_new), None

        (dx, *_), _ = jax.lax.scan(
            pcg_body, (x0, r0, z0, z0, rz0), None, length=params.pcg_iters
        )
        pose, vel, ba, bg = jax.vmap(_retract_one)(
            st.pose, st.vel, st.ba, st.bg, dx
        )
        new = LioStates(
            pose=jnp.where(free[:, None], pose, st.pose),
            vel=jnp.where(free[:, None], vel, st.vel),
            ba=jnp.where(free[:, None], ba, st.ba),
            bg=jnp.where(free[:, None], bg, st.bg),
        )
        dxn = jnp.sqrt(jnp.sum(dx * dx) / jnp.maximum(jnp.sum(free), 1))
        small = dxn < params.converged_dx
        st = jax.tree_util.tree_map(
            lambda a, b_: jnp.where(done, b_, a), new, st
        )
        return (st, done | small, prev_chi2), None

    chi2_0 = chi2_of(states)
    (out, _, _), _ = jax.lax.scan(
        gn_step, (states, jnp.array(False), chi2_0), None,
        length=params.gn_iters,
    )
    return out, PoseLioStats(chi2_0, chi2_of(out))


class PoseLioStats(NamedTuple):
    chi2_initial: jax.Array
    chi2_final: jax.Array


class FactorGraphLio:
    """Host wrapper: sliding LIO window with periodic reset + failure guard
    (`imuPreintegration_node.cpp:380-408,510-533`)."""

    def __init__(
        self,
        window: int = 32,
        params: LioGraphParams = LioGraphParams(),
        imu_sqrtw: np.ndarray | None = None,
        prior_sqrtw: np.ndarray | None = None,
        max_velocity: float = 30.0,
        max_bias: float = 1.0,
    ):
        self.window = window
        self.params = params
        # whitening: [θ, v, p, ba, bg] and pose-prior [θ(3), t(3)]
        self.imu_sqrtw = (
            np.asarray(imu_sqrtw, np.float32)
            if imu_sqrtw is not None
            else np.concatenate([
                np.full(3, 1e2), np.full(3, 1e2), np.full(3, 1e2),
                np.full(3, 1e3), np.full(3, 1e3),
            ]).astype(np.float32)
        )
        self.prior_sqrtw = (
            np.asarray(prior_sqrtw, np.float32)
            if prior_sqrtw is not None
            else np.concatenate([np.full(3, 1e2), np.full(3, 1e2)]).astype(
                np.float32
            )
        )
        self.max_velocity = max_velocity
        self.max_bias = max_bias
        self.reset()

    def reset(self, keep_last: bool = False):
        if keep_last and getattr(self, "n", 0) > 0:
            pose0 = self.poses[self.n - 1].copy()
            vel0 = self.vels[self.n - 1].copy()
        else:
            pose0 = np.asarray(se3.pose_identity())
            vel0 = np.zeros(3, np.float32)
        self.n = 1
        self.poses = np.tile(pose0, (self.window, 1)).astype(np.float32)
        self.vels = np.tile(vel0, (self.window, 1)).astype(np.float32)
        self.bas = np.zeros((self.window, 3), np.float32)
        self.bgs = np.zeros((self.window, 3), np.float32)
        self.factors: list[dict] = []
        self.priors: list[tuple[int, np.ndarray]] = [(0, pose0)]
        self.resets = getattr(self, "resets", 0)

    def add_scan(self, pre: PreintegratedImu, lidar_pose: np.ndarray):
        """New state from a preintegrated IMU window + a lidar pose prior
        (the scan-to-map result). Solves the window; returns (pose, vel)."""
        if self.n >= self.window:
            # periodic reset, re-anchored at the latest state (ref :380-408)
            self.reset(keep_last=True)
        i = self.n - 1
        j = self.n
        # predicted init for the new state
        from ..estimator.preintegration import predict_pose

        pose_j, vel_j = predict_pose(
            jnp.asarray(self.poses[i]), jnp.asarray(self.vels[i]), pre,
            gravity=self.params.gravity,
        )
        self.poses[j] = np.asarray(pose_j)
        self.vels[j] = np.asarray(vel_j)
        self.bas[j] = self.bas[i]
        self.bgs[j] = self.bgs[i]
        self.n += 1
        self.factors.append(
            dict(
                ij=(i, j),
                dq=np.asarray(pre.dq), dv=np.asarray(pre.dv),
                dp=np.asarray(pre.dp), dt=float(pre.dt),
                dq_dbg=np.asarray(pre.dq_dbg), dv_dbg=np.asarray(pre.dv_dbg),
                dv_dba=np.asarray(pre.dv_dba), dp_dbg=np.asarray(pre.dp_dbg),
                dp_dba=np.asarray(pre.dp_dba),
            )
        )
        self.priors.append((j, np.asarray(lidar_pose, np.float32)))
        self._solve()
        if self._failed():
            self.resets += 1
            self.reset(keep_last=True)
        return self.poses[self.n - 1].copy(), self.vels[self.n - 1].copy()

    def _failed(self) -> bool:
        k = self.n - 1
        return bool(
            np.linalg.norm(self.vels[k]) > self.max_velocity
            or max(np.linalg.norm(self.bas[k]), np.linalg.norm(self.bgs[k]))
            > self.max_bias
        )

    def _solve(self):
        N = self.window
        M = max(len(self.factors), 1)
        K = max(len(self.priors), 1)
        # pad to power of two so the jit retraces only log(window) times
        Mp = 1 << (M - 1).bit_length()
        Kp = 1 << (K - 1).bit_length()

        def fpack(name, shape, dtype=np.float32):
            out = np.zeros((Mp,) + shape, dtype)
            for m, f in enumerate(self.factors):
                out[m] = f[name]
            return jnp.asarray(out)

        imu_factors = {
            "dq": fpack("dq", (4,)), "dv": fpack("dv", (3,)),
            "dp": fpack("dp", (3,)), "dt": fpack("dt", ()),
            "dq_dbg": fpack("dq_dbg", (3, 3)), "dv_dbg": fpack("dv_dbg", (3, 3)),
            "dv_dba": fpack("dv_dba", (3, 3)), "dp_dbg": fpack("dp_dbg", (3, 3)),
            "dp_dba": fpack("dp_dba", (3, 3)),
            "sqrtw": jnp.tile(jnp.asarray(self.imu_sqrtw), (Mp, 1)),
        }
        # identity delta for padded factors keeps their residuals harmless
        imu_factors["dq"] = imu_factors["dq"].at[len(self.factors):, 0].set(1.0)
        imu_ij = np.zeros((Mp, 2), np.int32)
        imu_mask = np.zeros(Mp, bool)
        for m, f in enumerate(self.factors):
            imu_ij[m] = f["ij"]
            imu_mask[m] = True
        prior_z = np.zeros((Kp, 7), np.float32)
        prior_z[:, 0] = 1.0
        prior_idx = np.zeros(Kp, np.int32)
        prior_mask = np.zeros(Kp, bool)
        for k, (idx, z) in enumerate(self.priors):
            prior_idx[k] = idx
            prior_z[k] = z
            prior_mask[k] = True
        smask = np.zeros(N, bool)
        smask[: self.n] = True
        states = LioStates(
            pose=jnp.asarray(self.poses), vel=jnp.asarray(self.vels),
            ba=jnp.asarray(self.bas), bg=jnp.asarray(self.bgs),
        )
        prior_sqrtw = jnp.tile(jnp.asarray(self.prior_sqrtw), (Kp, 1))
        out, stats = optimize_lio_graph(
            states, jnp.asarray(smask), imu_factors, jnp.asarray(imu_ij),
            jnp.asarray(imu_mask), jnp.asarray(prior_z),
            jnp.asarray(prior_idx), prior_sqrtw,
            jnp.asarray(prior_mask), params=self.params,
        )
        self.poses = np.array(out.pose)  # np.array: writable host copies
        self.vels = np.array(out.vel)
        self.bas = np.array(out.ba)
        self.bgs = np.array(out.bg)
        self.last_stats = stats
