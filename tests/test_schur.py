"""Submap/Schur-partitioned pose-graph solve vs the replicated solvers.

The Schur path (`parallel/schur.py`) is the scale-out answer for graphs past
~10⁴ vertices (SURVEY §2.9 / §5 long-context note); these tests pin (a) its
exactness against the dense replicated GN solve and (b) single- vs
multi-device equivalence on the virtual mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsf_slam_tpu.backend.pose_graph import PoseGraphParams, optimize_pose_graph
from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.parallel import make_mesh, optimize_pose_graph_schur
from lmsf_slam_tpu.parallel.schur import partition_graph


def _chain_graph(n=64, n_loops=6, noise=0.03, seed=0):
    """Noisy odometry chain + long-range loop edges (SLAM topology)."""
    rng = np.random.default_rng(seed)
    step = se3.se3_exp(jnp.asarray([0.0, 0.0, 0.08, 1.5, 0.0, 0.0], jnp.float32))
    gt = [se3.pose_identity()]
    for _ in range(n - 1):
        gt.append(se3.pose_compose(gt[-1], step))
    gt = jnp.stack(gt)

    edges_ij, edges_z = [], []
    for i in range(n - 1):
        z = se3.pose_between(gt[i], gt[i + 1])
        pert = jnp.asarray(rng.normal(0, noise, 6), jnp.float32)
        edges_ij.append((i, i + 1))
        edges_z.append(se3.pose_compose(z, se3.se3_exp(pert)))
    for k in range(n_loops):
        i = int(rng.integers(0, n // 3))
        j = int(rng.integers(2 * n // 3, n))
        edges_ij.append((i, j))
        edges_z.append(se3.pose_between(gt[i], gt[j]))  # exact loop edges
    init = [gt[0]]
    for e in range(n - 1):
        init.append(se3.pose_compose(init[-1], edges_z[e]))
    return (
        jnp.stack(init),
        jnp.asarray(edges_ij, jnp.int32),
        jnp.stack(edges_z),
        gt,
    )


def _geo_err(a, b):
    d = jax.vmap(lambda x, y: se3.pose_log(se3.pose_between(x, y)))(a, b)
    return float(jnp.max(jnp.abs(d)))


def test_schur_matches_replicated_single_device():
    """At tight convergence the Schur elimination and the replicated
    PCG solve reach the same optimum (the elimination is algebraically
    exact; PCG merely truncates the inner solve)."""
    poses, eij, ez, _ = _chain_graph(n=48, n_loops=4)
    V, E = poses.shape[0], eij.shape[0]
    sqrtw = jnp.ones((E, 6), jnp.float32) * 10.0
    emask = jnp.ones(E, bool)
    ref, ref_stats = optimize_pose_graph(
        poses, jnp.ones(V, bool), eij, ez, sqrtw, emask,
        params=PoseGraphParams(
            gn_iters=40, pcg_iters=256, kernel="none", converged_dx=1e-7
        ),
    )
    out, stats = optimize_pose_graph_schur(
        poses, eij, ez, sqrtw, emask, n_submaps=4,
        params=PoseGraphParams(gn_iters=40, kernel="none", converged_dx=1e-7),
    )
    assert float(stats.chi2_final) <= float(ref_stats.chi2_final) * 1.05 + 1e-4
    assert _geo_err(ref, out) < 5e-3


def test_schur_mesh_matches_single():
    """Same algorithm sharded over the 8-device mesh is bit-compatible with
    the single-device run (collectives are exact sums)."""
    poses, eij, ez, _ = _chain_graph(n=96, n_loops=8, seed=3)
    E = eij.shape[0]
    sqrtw = jnp.ones((E, 6), jnp.float32) * 10.0
    emask = jnp.ones(E, bool)
    params = PoseGraphParams(gn_iters=8, kernel="none")
    base, base_stats = optimize_pose_graph_schur(
        poses, eij, ez, sqrtw, emask, n_submaps=8, params=params
    )
    mesh = make_mesh(8, backend="cpu")
    out, stats = optimize_pose_graph_schur(
        poses, eij, ez, sqrtw, emask, n_submaps=8, mesh=mesh, params=params
    )
    # f32 psum reduction order differs from the local add order; 8 GN
    # iterations amplify that to ~4e-4 — equivalence, not bit-equality
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-3)
    assert abs(float(stats.chi2_final) - float(base_stats.chi2_final)) < 1e-2


def test_schur_respects_fixed_gauge():
    poses, eij, ez, _ = _chain_graph(n=48, n_loops=4, seed=5)
    E = eij.shape[0]
    sqrtw = jnp.ones((E, 6), jnp.float32) * 10.0
    out, _ = optimize_pose_graph_schur(
        poses, eij, ez, sqrtw, jnp.ones(E, bool), n_submaps=4,
        params=PoseGraphParams(gn_iters=8, kernel="none"),
    )
    # default gauge: vertex 0 fixed exactly
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(poses[0]), atol=1e-6
    )


def test_partition_classifies_separators():
    """Cross-submap edge endpoints (and only those) become separators."""
    eij = np.array([[0, 1], [1, 2], [2, 3], [0, 3]], np.int32)
    emask = np.ones(4, bool)
    part = partition_graph(eij, emask, V=4, n_submaps=2, fixed=None)
    sep = set(int(v) for v in part.sep_ids if v >= 0)
    # submaps are {0,1} and {2,3}; edges (1,2) and (0,3) cross, so every
    # vertex is a crossing-edge endpoint → all four are separators
    assert sep == {0, 1, 2, 3}
    fixed = np.zeros(4, bool)
    fixed[0] = True
    part = partition_graph(eij, emask, V=4, n_submaps=2, fixed=fixed)
    sep = set(int(v) for v in part.sep_ids if v >= 0)
    assert sep == {1, 2, 3}
    # fixed vertex is neither interior nor separator
    assert 0 not in set(int(v) for v in part.int_ids.ravel() if v >= 0)


@pytest.mark.slow
def test_schur_10k_vertices_mesh():
    """VERDICT #5 'done' criterion: ≥10k-vertex equivalence on the 8-device
    mesh, with a solve-time comparison against the edge-sharded PCG path."""
    import time

    from lmsf_slam_tpu.parallel import optimize_pose_graph_sharded

    poses, eij, ez, gt = _chain_graph(n=10240, n_loops=64, noise=0.01, seed=7)
    V, E = poses.shape[0], eij.shape[0]
    sqrtw = jnp.ones((E, 6), jnp.float32) * 10.0
    emask = jnp.ones(E, bool)
    mesh = make_mesh(8, backend="cpu")
    params = PoseGraphParams(gn_iters=6, pcg_iters=96, kernel="none")

    t0 = time.perf_counter()
    out_s, stats_s = optimize_pose_graph_schur(
        poses, eij, ez, sqrtw, emask, n_submaps=128, mesh=mesh, params=params
    )
    jax.block_until_ready(out_s)
    t_schur = time.perf_counter() - t0

    t0 = time.perf_counter()
    out_p, stats_p = optimize_pose_graph_sharded(
        poses, jnp.ones(V, bool), eij, ez, sqrtw, emask, mesh, params=params
    )
    jax.block_until_ready(out_p)
    t_pcg = time.perf_counter() - t0

    # same optimum: compare chi2 (pose-wise comparison is gauge-sensitive on
    # 10k-long chains; chi2 is the invariant)
    c_s, c_p = float(stats_s.chi2_final), float(stats_p.chi2_final)
    assert c_s <= c_p * 1.2 + 1e-3, (c_s, c_p)
    print(f"\nschur {t_schur:.1f}s chi2 {c_s:.4f} | pcg {t_pcg:.1f}s chi2 {c_p:.4f}")


def test_multihost_scaffolding_single_process():
    """Env-gated bootstrap is a no-op here; mesh/shard helpers still work."""
    from lmsf_slam_tpu.parallel import multihost

    assert multihost.initialize_from_env() is False  # no LMSF_COORDINATOR set
    mesh = multihost.global_mesh(backend="cpu")
    assert mesh.devices.size == len(jax.devices("cpu"))
    pid, pn = multihost.process_info()
    assert (pid, pn) == (0, 1)
    assert multihost.shard_bounds(100) == (0, 100)


def test_backend_schur_path_matches_replicated():
    """LifelongBackend full solve via the Schur path reaches the replicated
    solve's optimum (schur_min_vertices lowered to trigger on a small DB)."""
    from lmsf_slam_tpu.backend import LifelongBackend, LifelongConfig, LoopConfig
    from lmsf_slam_tpu.common.pointcloud import PointBatch

    def _pb(seed, n=32):
        rng = np.random.default_rng(seed)
        return PointBatch.from_points(
            rng.normal(size=(n, 3)).astype(np.float32) * 5, capacity=n
        )

    params = PoseGraphParams(gn_iters=20, pcg_iters=128, kernel="none",
                             converged_dx=1e-7)

    def drive(config):
        backend = LifelongBackend(
            config=config,
            loop_config=LoopConfig(min_frame_interval=10**9),
        )
        rng = np.random.default_rng(0)
        step = se3.se3_exp(jnp.asarray([0, 0, 0.07, 1.0, 0, 0], jnp.float32))
        pose = se3.pose_identity()
        for i in range(24):
            noisy = se3.pose_compose(
                pose, se3.se3_exp(jnp.asarray(rng.normal(0, 0.02, 6), jnp.float32))
            )
            backend.add_keyframe(0.1 * i, _pb(i), _pb(100 + i), np.asarray(noisy))
            pose = se3.pose_compose(pose, step)
        backend.optimize(full=True)
        return backend.db.map_poses[:24].copy()

    rep = drive(LifelongConfig(optimize_batch=10**9, pose_graph=params))
    sch = drive(LifelongConfig(optimize_batch=10**9, pose_graph=params,
                               schur_submaps=4, schur_min_vertices=8))
    err = _geo_err(jnp.asarray(rep), jnp.asarray(sch))
    assert err < 5e-3, err


def test_schur_unary_priors_match_replicated():
    """GNSS xyz + plane priors through the Schur path reach the same
    anchored optimum as the replicated solver (both with fixed=all-False so
    the priors provide the gauge)."""
    poses, eij, ez, gt = _chain_graph(n=48, n_loops=0, noise=0.02, seed=9)
    V, E = poses.shape[0], eij.shape[0]
    sqrtw = jnp.ones((E, 6), jnp.float32) * 10.0
    emask = jnp.ones(E, bool)
    # GNSS anchors every 8th vertex at its ground-truth position
    ids = np.arange(0, V, 8, dtype=np.int32)
    K = 8
    pidx = np.zeros(K, np.int32); pmask = np.zeros(K, bool)
    pxyz = np.zeros((K, 3), np.float32)
    pidx[: ids.size] = ids; pmask[: ids.size] = True
    pxyz[: ids.size] = np.asarray(gt)[ids, 4:]
    priors = dict(
        prior_xyz=jnp.asarray(pxyz), prior_idx=jnp.asarray(pidx),
        prior_sqrtw=jnp.full((K, 3), 10.0), prior_mask=jnp.asarray(pmask),
        plane_idx=jnp.asarray(pidx), plane_z=jnp.zeros(K, jnp.float32),
        plane_sqrtw=jnp.full((K, 3), 5.0), plane_mask=jnp.asarray(pmask),
    )
    free = jnp.zeros(V, bool)
    p_rep = PoseGraphParams(gn_iters=40, pcg_iters=256, kernel="none",
                            converged_dx=1e-7)
    ref, ref_stats = optimize_pose_graph(
        poses, jnp.ones(V, bool), eij, ez, sqrtw, emask, fixed=free,
        params=p_rep, **priors,
    )
    p_s = PoseGraphParams(gn_iters=40, kernel="none", converged_dx=1e-7)
    out, stats = optimize_pose_graph_schur(
        poses, eij, ez, sqrtw, emask, n_submaps=4,
        fixed=np.zeros(V, bool), params=p_s, **priors,
    )
    assert float(stats.chi2_final) <= float(ref_stats.chi2_final) * 1.05 + 1e-3
    assert _geo_err(ref, out) < 5e-3
    # priors actually anchor: anchored vertices end near their GNSS fixes
    err = np.linalg.norm(np.asarray(out)[ids, 4:] - pxyz[: ids.size], axis=1)
    assert err.max() < 0.15, err.max()


def test_schur_unary_priors_on_mesh():
    """Unary contributions shard correctly (interior into the owner shard,
    separator into the psum'd global system)."""
    poses, eij, ez, gt = _chain_graph(n=64, n_loops=6, noise=0.02, seed=11)
    V, E = poses.shape[0], eij.shape[0]
    sqrtw = jnp.ones((E, 6), jnp.float32) * 10.0
    emask = jnp.ones(E, bool)
    ids = np.arange(0, V, 6, dtype=np.int32)
    K = 16
    pidx = np.zeros(K, np.int32); pmask = np.zeros(K, bool)
    pxyz = np.zeros((K, 3), np.float32)
    pidx[: ids.size] = ids; pmask[: ids.size] = True
    pxyz[: ids.size] = np.asarray(gt)[ids, 4:]
    priors = dict(
        prior_xyz=pxyz, prior_idx=pidx,
        prior_sqrtw=np.full((K, 3), 10.0, np.float32), prior_mask=pmask,
    )
    params = PoseGraphParams(gn_iters=8, kernel="none")
    base, _ = optimize_pose_graph_schur(
        poses, eij, ez, sqrtw, emask, n_submaps=8,
        fixed=np.zeros(V, bool), params=params, **priors,
    )
    mesh = make_mesh(8, backend="cpu")
    out, _ = optimize_pose_graph_schur(
        poses, eij, ez, sqrtw, emask, n_submaps=8, mesh=mesh,
        fixed=np.zeros(V, bool), params=params, **priors,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-3)


def test_schur_executable_reuse_across_partitions():
    """Two graphs with IDENTICAL padded shapes but DIFFERENT separator sets,
    solved back-to-back: the memoized jitted driver must not bake the first
    call's partition (separator vertex ids) into the executable — the
    round-5 city-tail regression (ATE 0.25 → 3.1 m) was exactly this."""
    params = PoseGraphParams(gn_iters=20, kernel="none", converged_dx=1e-7)
    for seed in (3, 4):  # different loop edges → different separators
        poses, eij, ez, _ = _chain_graph(n=48, n_loops=4, seed=seed)
        V, E = poses.shape[0], eij.shape[0]
        sqrtw = jnp.ones((E, 6), jnp.float32) * 10.0
        emask = jnp.ones(E, bool)
        ref, _ = optimize_pose_graph(
            poses, jnp.ones(V, bool), eij, ez, sqrtw, emask,
            params=PoseGraphParams(
                gn_iters=40, pcg_iters=256, kernel="none", converged_dx=1e-7
            ),
        )
        out, _ = optimize_pose_graph_schur(
            poses, eij, ez, sqrtw, emask, n_submaps=4, params=params,
        )
        assert _geo_err(ref, out) < 5e-3, f"seed {seed}"
