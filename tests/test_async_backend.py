"""Async backend: the frontend never blocks on optimization; a loop closes
while mapping continues (reference thread/queue semantics,
`backend_lifelong.hpp:211,390`, `loopDetection.hpp:193-200`)."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsf_slam_tpu.backend import LifelongBackend, LifelongConfig, WorkMode
from lmsf_slam_tpu.backend.async_backend import AsyncBackend
from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.datasets import make_trajectory, make_world, scan_at

KEY = jax.random.PRNGKey(7)
N = 36


def _loop_cfg():
    from lmsf_slam_tpu.backend import LoopConfig

    return LoopConfig(
        min_frame_interval=20, exclude_recent=20, detect_spacing=1,
        search_radius=6.0, adjacent_window=3,
        refine_score_thresh=0.3, reloc_score_thresh=0.3,
    )


@pytest.mark.slow
def test_async_matches_sync_and_closes_loop():
    world = make_world(KEY, extent=25.0, n_pillars=50, n_ground=5000,
                       n_wall=2500)
    traj = make_trajectory(N, radius=10.0, loop=True)
    drift = se3.se3_exp(jnp.asarray([0, 0, 0.002, 0.01, 0.004, 0.0], jnp.float32))

    def scans_and_odom():
        pose_odom = traj[0]
        for i in range(N):
            if i > 0:
                inc = se3.pose_between(traj[i - 1], traj[i])
                pose_odom = se3.pose_compose(pose_odom, se3.pose_compose(inc, drift))
            edge, surf = scan_at(world, traj[i], jax.random.fold_in(KEY, i),
                                 n_edge=256, n_surf=1024, noise=0.01,
                                 max_range=12.0)
            yield i * 0.1, edge, surf, np.asarray(pose_odom)

    backend = AsyncBackend(
        LifelongBackend(config=LifelongConfig(optimize_batch=100),
                        loop_config=_loop_cfg())
    )
    submit_times = []
    for stamp, edge, surf, odom in scans_and_odom():
        t0 = time.perf_counter()
        backend.submit(stamp, edge, surf, odom)
        submit_times.append(time.perf_counter() - t0)
    backend.flush()

    # the worker closed a loop (same data as the sync lifelong test)
    eij = backend.db.eij[: backend.db.n_edges]
    loop_edges = eij[np.abs(eij[:, 1] - eij[:, 0]) > 1]
    assert len(loop_edges) > 0
    assert backend.mode is WorkMode.LOCALIZATION
    assert len(backend.outputs()) == N
    # submits are enqueue-only: median far below a backend cycle (which
    # includes jitted loop detection + optimization, tens of ms on CPU)
    assert float(np.median(submit_times)) < 0.05
    backend.close()


def test_async_flush_and_save(tmp_path):
    world = make_world(KEY, extent=25.0, n_pillars=30, n_ground=3000,
                       n_wall=1500)
    traj = make_trajectory(10, radius=8.0, loop=False)
    backend = AsyncBackend(LifelongBackend(loop_config=_loop_cfg()))
    for i in range(10):
        edge, surf = scan_at(world, traj[i], jax.random.fold_in(KEY, 100 + i),
                             n_edge=128, n_surf=512, noise=0.01, max_range=12.0)
        # GNSS observations ride the queue with the keyframe (advisor r2:
        # the async path used to silently drop them)
        gnss = np.asarray(traj[i])[4:] if i % 3 == 0 else None
        backend.submit(0.1 * i, edge, surf, np.asarray(traj[i]), gnss_pos=gnss)
    path = str(tmp_path / "async.npz")
    backend.save(path)  # implies flush
    assert backend.db.n_keyframes == 10
    assert backend.db.gnss_valid[:10].sum() == 4  # i = 0,3,6,9
    loaded = LifelongBackend.load(path)
    assert loaded.db.n_keyframes == 10
    assert loaded.db.gnss_valid[:10].sum() == 4
    backend.close()


def test_async_worker_error_surfaces_no_deadlock():
    """A worker exception must not kill the thread silently: flush raises
    instead of deadlocking on Queue.join()."""

    backend = AsyncBackend(LifelongBackend(loop_config=_loop_cfg()))
    # poison: edge/surf of the wrong type blows up inside add_keyframe
    backend.submit(0.0, None, None, np.asarray(se3.pose_identity()))
    with pytest.raises(RuntimeError, match="async backend worker failed"):
        backend.flush()
    # the queue drained; the facade stays usable for shutdown
    backend.close()


def test_drop_when_full_sheds_instead_of_blocking():
    """Production load-shedding (the reference's capped data-manager
    deques): with drop_when_full the queue never blocks the frontend and
    dropped keyframes are counted; the stored chain stays consistent."""
    import threading

    backend = AsyncBackend(
        LifelongBackend(loop_config=_loop_cfg()), max_queue=2,
        drop_when_full=True,
    )
    # stall the worker so the queue certainly fills
    gate = threading.Event()
    orig = backend.backend.add_keyframe

    def slow_add(*a, **k):
        gate.wait(timeout=5.0)
        return orig(*a, **k)

    backend.backend.add_keyframe = slow_add
    world = make_world(KEY, extent=25.0, n_pillars=30, n_ground=3000,
                       n_wall=1500)
    traj = make_trajectory(8, radius=8.0, loop=False)
    for i in range(8):
        edge, surf = scan_at(world, traj[i], jax.random.fold_in(KEY, i),
                             n_edge=128, n_surf=512, noise=0.01,
                             max_range=12.0)
        backend.submit(0.1 * i, edge, surf, np.asarray(traj[i]))
    gate.set()
    backend.flush()
    assert backend.dropped > 0
    assert backend.db.n_keyframes + backend.dropped == 8
    backend.close()


def test_coalesce_supersedes_localization_refreshes():
    """Production backpressure: while LOCALIZING, a full queue supersedes the
    newest pending refresh instead of blocking or dropping — and an item
    carrying a GNSS fix is never the victim (round-4 weak #1)."""
    import threading

    backend = AsyncBackend(
        LifelongBackend(loop_config=_loop_cfg(),
                        mode=WorkMode.LOCALIZATION),
        max_queue=2, policy="coalesce",
    )
    gate = threading.Event()
    orig = backend.backend.add_keyframe
    processed_stamps = []

    def slow_add(stamp, *a, **k):
        gate.wait(timeout=5.0)
        processed_stamps.append(round(stamp, 3))
        return orig(stamp, *a, **k)

    backend.backend.add_keyframe = slow_add
    world = make_world(KEY, extent=25.0, n_pillars=30, n_ground=3000,
                       n_wall=1500)
    traj = make_trajectory(8, radius=8.0, loop=False)
    submit_times = []
    for i in range(8):
        edge, surf = scan_at(world, traj[i], jax.random.fold_in(KEY, i),
                             n_edge=128, n_surf=512, noise=0.01,
                             max_range=12.0)
        gnss = np.asarray(traj[i])[4:] if i == 2 else None
        t0 = time.perf_counter()
        _, _, enq = backend.submit(0.1 * i, edge, surf, np.asarray(traj[i]),
                                   gnss_pos=gnss)
        submit_times.append(time.perf_counter() - t0)
        assert enq  # coalesce never sheds the NEW item
    gate.set()
    backend.flush()
    # queue cap 2 + 1 in-flight: most refreshes were superseded, none dropped
    assert backend.coalesced > 0
    assert backend.dropped == 0
    assert len(processed_stamps) == 8 - backend.coalesced
    # the GNSS-carrying item (stamp 0.2) was never the coalesce victim
    assert 0.2 in processed_stamps
    # and the frontend never blocked on the stalled worker
    assert max(submit_times) < 0.5
    backend.close()


def test_coalesce_lossless_in_mapping():
    """In MAPPING mode the coalesce policy must behave lossless (never drop
    a mapping keyframe): every submitted keyframe is stored."""
    backend = AsyncBackend(
        LifelongBackend(loop_config=_loop_cfg()), max_queue=2,
        policy="coalesce",
    )
    orig = backend.backend.add_keyframe

    def slow_add(*a, **k):
        time.sleep(0.02)
        return orig(*a, **k)

    backend.backend.add_keyframe = slow_add
    world = make_world(KEY, extent=25.0, n_pillars=30, n_ground=3000,
                       n_wall=1500)
    traj = make_trajectory(8, radius=8.0, loop=False)
    for i in range(8):
        edge, surf = scan_at(world, traj[i], jax.random.fold_in(KEY, i),
                             n_edge=128, n_surf=512, noise=0.01,
                             max_range=12.0)
        backend.submit(0.1 * i, edge, surf, np.asarray(traj[i]))
    backend.flush()
    assert backend.dropped == 0
    assert backend.coalesced == 0
    assert backend.db.n_keyframes == 8
    backend.close()
