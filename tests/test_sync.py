"""Streaming ingest: ApproximateTime matching + IMU window interpolation
(the reference's live-node layer, `MultiLidarSLAM_node.cpp:520-535` +
`sensor.hpp:101-117`) — jitter, drops, and end-to-end dual-lidar feed."""
import jax
import numpy as np

from lmsf_slam_tpu.common.sync import ApproxTimeSync, ImuWindowBuffer, StreamIngest


def test_approx_time_pairs_jittered_streams():
    sync = ApproxTimeSync(2, slop=0.02)
    rng = np.random.default_rng(0)
    matches = []
    for i in range(50):
        t = 0.1 * i
        matches += sync.push(0, t, ("a", i))
        matches += sync.push(1, t + rng.uniform(-0.008, 0.008), ("b", i))
    assert len(matches) >= 48
    for m in matches:
        # correctly paired (same frame index) and within slop
        assert m[0][1][1] == m[1][1][1]
        assert abs(m[0][0] - m[1][0]) <= 0.02


def test_approx_time_survives_drops_and_dead_stream():
    sync = ApproxTimeSync(2, slop=0.02, queue_size=5)
    matches = []
    for i in range(40):
        t = 0.1 * i
        matches += sync.push(0, t, i)
        if i % 4 != 3 and i < 30:  # stream 1 drops every 4th, dies at 30
            matches += sync.push(1, t + 0.004, i)
    # matched frames are exactly the ones stream 1 delivered (minus tail)
    assert len(matches) >= 20
    for m in matches:
        assert m[0][1] == m[1][1]
    # queues stayed bounded despite the dead stream
    assert all(len(q) <= 5 for q in sync._q)
    assert sync.dropped > 0


def test_approx_time_never_pairs_outside_slop():
    sync = ApproxTimeSync(2, slop=0.01)
    matches = []
    for i in range(20):
        matches += sync.push(0, 0.1 * i, i)
        matches += sync.push(1, 0.1 * i + 0.05, i)  # persistent 50 ms offset
    assert matches == []


def test_imu_window_interpolates_boundaries():
    buf = ImuWindowBuffer()
    for i in range(11):  # 100 Hz samples, gyro_z = t
        t = 0.01 * i
        buf.push(t, [0.0, 0.0, t], [0.0, 0.0, 9.81])
    w = buf.window(0.025, 0.085)
    assert w is not None
    gyro, acc, dts = w
    # boundary samples interpolated to the exact edges
    np.testing.assert_allclose(gyro[0, 2], 0.025, atol=1e-6)
    np.testing.assert_allclose(gyro[-1, 2], 0.085, atol=1e-6)
    np.testing.assert_allclose(float(dts.sum()), 0.06, atol=1e-6)
    assert dts[0] == 0.0
    # window not covered → None
    assert buf.window(-0.5, 0.05) is None
    buf.drop_before(0.05)
    assert buf.window(0.055, 0.085) is not None


def test_stream_ingest_dual_lidar_matches_synced(monkeypatch):
    """End-to-end: a dual-lidar system fed by UNSYNCED jittered streams must
    process the same matched frames as a pre-synced feed (round-4 missing
    #2). Uses a stub system so the test exercises the ingest layer, not the
    tracker."""

    class StubSystem:
        class config:
            n_lidars = 2
            use_imu = False

        def __init__(self):
            self.calls = []

        def process(self, scans, t, **kw):
            self.calls.append((round(t, 6), tuple(scans)))
            return len(self.calls) - 1

    rng = np.random.default_rng(1)
    stub = StubSystem()
    ingest = StreamIngest(stub, slop=0.02)
    order = []
    for i in range(30):
        t = 0.1 * i
        order.append((0, t, f"p{i}"))
        order.append((1, t + rng.uniform(-0.006, 0.006), f"s{i}"))
    # arrival jitter: occasionally the sub lidar's message arrives first
    for k in range(0, len(order) - 1, 2):
        if rng.uniform() < 0.3:
            order[k], order[k + 1] = order[k + 1], order[k]
    for stream, t, payload in order:
        ingest.push_scan(stream, t, payload)
    assert len(stub.calls) >= 28
    for t, (p, s) in stub.calls:
        assert p[1:] == s[1:]  # frame indices agree ("pN" with "sN")
        assert p[0] == "p" and s[0] == "s"  # primary first, its stamp used


def test_unsynced_dual_lidar_reproduces_synced():
    """End-to-end: the SAME dual-lidar course fed (a) pre-synced through
    ``process([s0, s1], t)`` and (b) as two UNSYNCED jittered streams through
    :class:`StreamIngest` produces the same trajectory — the reference's
    `message_filters::ApproximateTime` capability
    (`MultiLidarSLAM_node.cpp:520-535`) on the repo's own frontend."""
    import jax
    import jax.numpy as jnp

    from lmsf_slam_tpu.backend import LoopConfig
    from lmsf_slam_tpu.common import se3
    from lmsf_slam_tpu.datasets import make_sim_world, simulate_scan
    from lmsf_slam_tpu.ops.registration import RegistrationParams
    from lmsf_slam_tpu.system import (
        FeatureParams, MultiLidarSystem, SystemConfig,
    )

    key = jax.random.PRNGKey(7)
    world = make_sim_world(key, extent=22.0, n_boxes=10, n_cylinders=18)
    x_true = se3.make_pose(
        se3.so3_exp_quat(jnp.asarray([0.0, 0.0, np.deg2rad(25.0)])),
        jnp.asarray([0.0, -0.5, 0.2]),
    )
    n = 24
    pose = se3.make_pose(se3.quat_identity(), jnp.asarray([0.0, 0.0, 1.4]))
    step = se3.se3_exp(jnp.asarray([0, 0, 0.1, 0.35, 0, 0], jnp.float32))
    frames = []
    for i in range(n):
        s0 = simulate_scan(world, pose, jax.random.fold_in(key, 2 * i),
                           rings=16, width=360, max_range=40.0, noise=0.01)
        s1 = simulate_scan(
            world, se3.pose_compose(pose, x_true),
            jax.random.fold_in(key, 2 * i + 1),
            rings=16, width=360, max_range=40.0, noise=0.01,
        )
        frames.append((s0, s1))
        pose = se3.pose_compose(pose, step)

    def make_system():
        return MultiLidarSystem(SystemConfig(
            n_lidars=2,
            extrinsics=(np.asarray(x_true),),  # known → no calibration FSM
            feature=FeatureParams(rings=16, width=360, edges_per_sector=4,
                                  surfs_per_sector=12),
            registration=RegistrationParams(max_iters=8, max_corr_dist=2.0),
            map_update_trans=0.15, keyframe_trans=0.6,
            async_backend=False,
            loop=LoopConfig(min_frame_interval=10**9),
        ))

    sys_a = make_system()
    for i, (s0, s1) in enumerate(frames):
        sys_a.process([s0, s1], 0.1 * i)

    from lmsf_slam_tpu.common.sync import StreamIngest

    rng = np.random.default_rng(5)
    sys_b = make_system()
    ingest = StreamIngest(sys_b, slop=0.05)
    for i, (s0, s1) in enumerate(frames):
        jitter = float(rng.uniform(-0.02, 0.02))
        if i % 2:  # arrival order flips frame to frame
            ingest.push_scan(1, 0.1 * i + jitter, s1)
            ingest.push_scan(0, 0.1 * i, s0)
        else:
            ingest.push_scan(0, 0.1 * i, s0)
            ingest.push_scan(1, 0.1 * i + jitter, s1)

    est_a, est_b = sys_a.trajectory(), sys_b.trajectory()
    assert est_b.shape[0] == n  # every frame matched despite jitter/reorder
    d = np.linalg.norm(est_a[:, 4:] - est_b[:, 4:], axis=1)
    assert d.max() < 0.05, d.max()
