"""Pose-graph GN/PCG solver: odometry-drift + loop-closure correction."""
import jax
import jax.numpy as jnp
import numpy as np

from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.backend import PoseGraphParams, optimize_pose_graph


def _ring_graph(n=24, drift=0.05, seed=0, cap_v=32, cap_e=64):
    """Ground truth: poses around a circle. Odometry edges have bias+noise;
    one loop-closure edge (last→first) is exact."""
    rng = np.random.RandomState(seed)
    theta = np.linspace(0, 2 * np.pi, n, endpoint=False)
    gt = []
    for th in theta:
        yaw = th + np.pi / 2
        q = np.array([np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)])
        t = np.array([10 * np.cos(th), 10 * np.sin(th), 0.0])
        gt.append(np.concatenate([q, t]))
    gt = jnp.asarray(np.stack(gt), jnp.float32)

    ij, z = [], []
    poses = [np.asarray(gt[0])]
    for k in range(n - 1):
        rel = se3.pose_between(gt[k], gt[k + 1])
        noise = jnp.asarray(
            np.concatenate([rng.randn(3) * drift * 0.2, rng.randn(3) * drift]),
            jnp.float32,
        )
        rel_noisy = se3.pose_retract(rel, noise)
        ij.append((k, k + 1))
        z.append(np.asarray(rel_noisy))
        poses.append(np.asarray(se3.pose_compose(jnp.asarray(poses[-1]), rel_noisy)))
    # exact loop closure last -> first
    ij.append((n - 1, 0))
    z.append(np.asarray(se3.pose_between(gt[n - 1], gt[0])))

    V, E = cap_v, cap_e
    poses_arr = np.zeros((V, 7), np.float32)
    poses_arr[:, 0] = 1
    poses_arr[:n] = np.stack(poses)
    vmask = np.zeros(V, bool)
    vmask[:n] = True
    ij_arr = np.zeros((E, 2), np.int32)
    z_arr = np.zeros((E, 7), np.float32)
    z_arr[:, 0] = 1
    sw = np.zeros((E, 6), np.float32)
    emask = np.zeros(E, bool)
    ne = len(ij)
    ij_arr[:ne] = np.asarray(ij)
    z_arr[:ne] = np.stack(z)
    sw[:ne] = 20.0  # odom noise
    sw[ne - 1] = 100.0  # loop closure: tight
    emask[:ne] = True
    return (
        jnp.asarray(poses_arr), jnp.asarray(vmask), jnp.asarray(ij_arr),
        jnp.asarray(z_arr), jnp.asarray(sw), jnp.asarray(emask), gt, n,
    )


def _ate(est, gt, n):
    d = est[:n, 4:] - gt[:n, 4:]
    return float(jnp.sqrt(jnp.mean(jnp.sum(d * d, -1))))


def test_pose_graph_closes_loop():
    poses, vmask, ij, z, sw, emask, gt, n = _ring_graph()
    ate_before = _ate(poses, gt, n)
    opt, stats = optimize_pose_graph(poses, vmask, ij, z, sw, emask)
    ate_after = _ate(opt, gt, n)
    assert float(stats.chi2_final) < float(stats.chi2_initial)
    assert ate_after < 0.5 * ate_before, (ate_before, ate_after)
    assert ate_after < 0.25, ate_after
    # gauge: vertex 0 untouched
    np.testing.assert_allclose(np.asarray(opt[0]), np.asarray(poses[0]), atol=1e-6)


def test_pose_graph_noop_on_consistent_graph():
    poses, vmask, ij, z, sw, emask, gt, n = _ring_graph(drift=0.0)
    opt, stats = optimize_pose_graph(poses, vmask, ij, z, sw, emask)
    assert float(stats.chi2_final) < 1e-4
    assert _ate(opt, gt, n) < 1e-3


def test_pose_graph_robust_to_outlier_edge():
    poses, vmask, ij, z, sw, emask, gt, n = _ring_graph()
    # add a wildly wrong extra edge between nodes 3 and 15
    ij = ij.at[30].set(jnp.array([3, 15]))
    bad = se3.make_pose(jnp.array([1.0, 0, 0, 0]), jnp.array([40.0, 0, 0]))
    z = z.at[30].set(bad)
    sw = sw.at[30].set(20.0)
    emask = emask.at[30].set(True)
    opt, _ = optimize_pose_graph(poses, vmask, ij, z, sw, emask)
    # Huber keeps the outlier from destroying the solution
    assert _ate(opt, gt, n) < 0.6


def test_gnss_position_priors_anchor_graph():
    """Absolute position priors (the reference's AddSe3PriorXYZEdge / GNSS
    constraints) pull a drifted chain onto the surveyed positions with NO
    gauge-fixed vertex."""
    import numpy as np

    V = 12
    step = se3.se3_exp(jnp.asarray([0, 0, 0.1, 1.0, 0, 0], jnp.float32))
    gt = [se3.pose_identity()]
    for _ in range(V - 1):
        gt.append(se3.pose_compose(gt[-1], step))
    gt = jnp.stack(gt)
    eij = jnp.asarray([(i, i + 1) for i in range(V - 1)], jnp.int32)
    ez = jax.vmap(lambda i, j: se3.pose_between(gt[i], gt[j]))(eij[:, 0], eij[:, 1])
    # start from a globally shifted + yawed initialization
    off = se3.se3_exp(jnp.asarray([0, 0, 0.4, 5.0, -3.0, 1.0], jnp.float32))
    init = jax.vmap(lambda p: se3.pose_compose(off, p))(gt)
    # GNSS fixes at 4 vertices
    pid = jnp.asarray([0, 4, 8, 11], jnp.int32)
    pxyz = gt[pid, 4:]
    poses, stats = optimize_pose_graph(
        init, jnp.ones(V, bool), eij, ez, jnp.ones((V - 1, 6)) * 20.0,
        jnp.ones(V - 1, bool),
        fixed=jnp.zeros(V, bool),  # priors anchor the gauge
        prior_xyz=pxyz, prior_idx=pid,
        prior_sqrtw=jnp.ones((4, 3)) * 10.0, prior_mask=jnp.ones(4, bool),
        params=PoseGraphParams(gn_iters=20, kernel="none"),
    )
    err = np.linalg.norm(np.asarray(poses)[:, 4:] - np.asarray(gt)[:, 4:], axis=1)
    assert err.max() < 0.05, err
    assert float(stats.chi2_final) < 1e-3
