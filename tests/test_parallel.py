"""Sharded paths must match single-device results (SURVEY.md §4 strategy)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsf_slam_tpu.backend.pose_graph import PoseGraphParams, optimize_pose_graph
from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.parallel import make_mesh, optimize_pose_graph_sharded


def _ring_graph(n=24, noise=0.05, seed=0):
    """Noisy ring with a loop closure — same construction as test_pose_graph."""
    rng = np.random.default_rng(seed)
    angle = 2 * np.pi / n
    step = se3.se3_exp(jnp.asarray([0.0, 0.0, angle, 2.0, 0.0, 0.0], jnp.float32))
    gt = [se3.pose_identity()]
    for _ in range(n - 1):
        gt.append(se3.pose_compose(gt[-1], step))
    gt = jnp.stack(gt)

    edges_ij, edges_z = [], []
    for i in range(n):
        j = (i + 1) % n
        z = se3.pose_between(gt[i], gt[j])
        pert = jnp.asarray(rng.normal(0, noise, 6), jnp.float32)
        edges_ij.append((i, j))
        edges_z.append(se3.pose_compose(z, se3.se3_exp(pert)))
    # odometry init: chain the noisy edges
    init = [gt[0]]
    for e in range(n - 1):
        init.append(se3.pose_compose(init[-1], edges_z[e]))
    return (
        jnp.stack(init),
        jnp.asarray(edges_ij, jnp.int32),
        jnp.stack(edges_z),
    )


@pytest.mark.parametrize("n_dev", [1, 8])
def test_sharded_matches_single(n_dev):
    poses, eij, ez = _ring_graph()
    V, E = poses.shape[0], eij.shape[0]
    vmask = jnp.ones(V, bool)
    sqrtw = jnp.ones((E, 6), jnp.float32) * 10.0
    emask = jnp.ones(E, bool)
    params = PoseGraphParams(gn_iters=8, pcg_iters=48)

    ref, ref_stats = optimize_pose_graph(poses, vmask, eij, ez, sqrtw, emask, params=params)

    mesh = make_mesh(n_dev, backend="cpu")
    out, stats = optimize_pose_graph_sharded(
        poses, vmask, eij, ez, sqrtw, emask, mesh, params=params
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)
    assert float(stats.chi2_final) <= float(ref_stats.chi2_initial)


def test_sharded_pads_uneven_edges():
    poses, eij, ez = _ring_graph(n=11)  # 11 edges, not divisible by 8
    V, E = poses.shape[0], eij.shape[0]
    mesh = make_mesh(8, backend="cpu")
    out, stats = optimize_pose_graph_sharded(
        poses,
        jnp.ones(V, bool),
        eij,
        ez,
        jnp.ones((E, 6), jnp.float32),
        jnp.ones(E, bool),
        mesh,
        params=PoseGraphParams(gn_iters=4, pcg_iters=32),
    )
    assert np.isfinite(np.asarray(out)).all()
    assert float(stats.chi2_final) <= float(stats.chi2_initial) + 1e-6


def test_make_mesh_fallback_is_loud():
    """CPU fallback warns (perf footgun); disabled fallback raises."""
    import warnings

    import pytest

    from lmsf_slam_tpu.parallel import make_mesh

    n = len(jax.devices("cpu")) + len(jax.devices())
    # requesting more than the default backend has → loud fallback or error
    if len(jax.devices()) < len(jax.devices("cpu")):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            make_mesh(len(jax.devices("cpu")), axis="data")
            assert any("CPU backend" in str(x.message) for x in w)
    with pytest.raises(ValueError):
        make_mesh(n + 1, axis="data")
