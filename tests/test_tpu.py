"""On-chip numerics tests (``pytest -m tpu``).

The unit suite pins everything to CPU (conftest) where ``approx_max_k``
lowers to exact top-k and matmuls are true f32 — these tests cover what the
CPU suite cannot: the TPU PartialReduce's actual recall, f32-on-MXU
registration accuracy, and the driver entry step on the chip.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.common.pointcloud import PointBatch
from lmsf_slam_tpu.datasets import make_sim_world, simulate_scan
from lmsf_slam_tpu.ops import features as F
from lmsf_slam_tpu.ops import neighbors
from lmsf_slam_tpu.ops.registration import register_edge_surf


def _tpu():
    try:
        devs = [d for d in jax.devices() if d.platform != "cpu"]
        return devs[0] if devs else None
    except RuntimeError:
        return None


TPU = _tpu()
pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(TPU is None, reason="no TPU device available"),
]


@pytest.fixture(scope="module")
def chip_scan():
    with jax.default_device(TPU):
        world = make_sim_world(jax.random.PRNGKey(9), extent=20.0,
                               n_boxes=10, n_cylinders=16)
        pose = se3.make_pose(se3.quat_identity(), jnp.asarray([0.0, 0.0, 1.5]))
        pb = simulate_scan(world, pose, jax.random.PRNGKey(1), rings=16,
                           width=900, max_range=40.0, noise=0.01)
        grid = F.organize_scan(pb, rings=16, width=900)
        feats = F.extract_loam_features(grid, edges_per_sector=4,
                                        surfs_per_sector=24)
        jax.block_until_ready(feats.surf.xyz)
    return feats


def test_approx_max_k_recall_on_chip(chip_scan):
    """approx_max_k's 0.95-recall PartialReduce on structured geometry:
    measure the ACTUAL recall of the k-NN the registration consumes."""
    feats = chip_scan
    with jax.default_device(TPU):
        q = feats.surf.xyz + 0.05  # small offset: realistic near-queries
        d_tpu, i_tpu = neighbors.knn(q, feats.surf.mask, feats.surf.xyz,
                                     feats.surf.mask, k=5)
        d_tpu, i_tpu = np.asarray(d_tpu), np.asarray(i_tpu)
    # exact reference on host
    qn = np.asarray(q)
    rn = np.asarray(feats.surf.xyz)
    mask = np.asarray(feats.surf.mask)
    d2 = ((qn[:, None, :] - rn[None, :, :]) ** 2).sum(-1)
    d2[:, ~mask] = np.inf
    exact = np.argsort(d2, axis=1)[:, :5]
    valid_q = mask
    hit = np.zeros(qn.shape[0])
    top1 = np.zeros(qn.shape[0], bool)
    for i in range(qn.shape[0]):
        hit[i] = len(set(exact[i]) & set(i_tpu[i])) / 5.0
        top1[i] = exact[i, 0] in set(i_tpu[i])
    assert hit[valid_q].mean() > 0.95, hit[valid_q].mean()
    assert top1[valid_q].mean() > 0.99, top1[valid_q].mean()


def test_registration_accuracy_on_chip(chip_scan):
    """Known-transform registration in f32 on the MXU: < 5 mm / 0.5 mrad."""
    feats = chip_scan
    true_pose = se3.make_pose(
        se3.so3_exp_quat(jnp.asarray([0.02, -0.01, 0.05])),
        jnp.asarray([0.3, -0.2, 0.1]),
    )
    with jax.default_device(TPU):
        inv = se3.pose_inverse(true_pose)
        res = register_edge_surf(
            feats.edge.transform(inv), feats.surf.transform(inv),
            feats.edge, feats.surf, se3.pose_identity(),
        )
        jax.block_until_ready(res.pose)
    err = se3.pose_between(res.pose, true_pose)
    te = float(jnp.linalg.norm(se3.pose_trans(err)))
    re = float(jnp.linalg.norm(se3.so3_log(se3.pose_quat(err))))
    assert te < 5e-3 and re < 5e-4, (te, re)
    assert bool(res.converged) and int(res.n_constrained) == 6


def test_entry_step_on_chip():
    """The driver's entry() compiles and runs on the chip with finite output."""
    import __graft_entry__ as ge

    fn, args = ge.entry()
    with jax.default_device(TPU):
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
    assert bool(jnp.isfinite(out[1]).all())
