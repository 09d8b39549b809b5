"""Disk-backed keyframe store: bounded-RAM payloads + incremental checkpoint
(the reference keeps keyframe clouds out of RAM as per-keyframe PCDs,
`pose_graph_database.hpp:307-315`)."""
import os
import time

import numpy as np

from lmsf_slam_tpu.backend import KeyframeDatabase
from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.common.pointcloud import PointBatch


def _fill(db, n, seed=0):
    rng = np.random.default_rng(seed)
    for i in range(n):
        pb = PointBatch.from_points(
            rng.normal(size=(db.edge_capacity, 3)).astype(np.float32),
            capacity=db.edge_capacity,
        )
        sb = PointBatch.from_points(
            rng.normal(size=(db.surf_capacity, 3)).astype(np.float32),
            capacity=db.surf_capacity,
        )
        db.add_keyframe(0.1 * i, np.asarray(se3.pose_identity()),
                        np.asarray(se3.pose_identity()), pb, sb)
        if i > 0:
            db.add_edge(i - 1, i, np.asarray(se3.pose_identity()))


def test_memmap_roundtrip(tmp_path):
    store = str(tmp_path / "payload")
    db = KeyframeDatabase(edge_capacity=64, surf_capacity=128,
                          initial_keyframes=4, storage_dir=store)
    _fill(db, 50)  # forces several memmap growths (4 → 64)
    assert isinstance(db.edge_xyz, np.memmap)
    ckpt = str(tmp_path / "graph.npz")
    db.save(ckpt)
    # payload lives in the .dat files, not the npz
    assert os.path.getsize(ckpt) < 50_000
    assert os.path.getsize(os.path.join(store, "surf_xyz.dat")) > 90_000

    db2 = KeyframeDatabase.load(ckpt, storage_dir=store)
    assert db2.n_keyframes == 50 and db2.n_edges == 49
    np.testing.assert_array_equal(db2.edge_xyz[:50], db.edge_xyz[:50])
    np.testing.assert_array_equal(db2.sc[:50], db.sc[:50])
    np.testing.assert_array_equal(db2.eij[:49], db.eij[:49])
    # queries work transparently through the memmap
    e, s = db2.local_map(10, 2)
    assert int(np.asarray(e.mask).sum()) > 0


def test_incremental_checkpoint_is_payload_independent(tmp_path):
    store = str(tmp_path / "payload")
    db = KeyframeDatabase(edge_capacity=256, surf_capacity=1024,
                          initial_keyframes=8, storage_dir=store)
    _fill(db, 120)
    ckpt = str(tmp_path / "g.npz")
    t0 = time.perf_counter()
    db.save(ckpt)
    dt = time.perf_counter() - t0
    # npz excludes clouds entirely: far smaller than the payload
    payload = sum(
        os.path.getsize(os.path.join(store, f)) for f in os.listdir(store)
    )
    assert os.path.getsize(ckpt) < payload / 20
    assert dt < 5.0  # generous CI bound; the npz is tiny


def test_load_default_copies_payload(tmp_path):
    """Loading a disk-backed checkpoint with no storage_dir spawns a fresh
    session copy — later inserts never mutate the original payload files
    (advisor r2: load used to open the only copy r+)."""
    store = str(tmp_path / "payload")
    db = KeyframeDatabase(edge_capacity=32, surf_capacity=64,
                          initial_keyframes=4, storage_dir=store)
    _fill(db, 6)
    ckpt = str(tmp_path / "g.npz")
    db.save(ckpt)
    orig = np.array(np.memmap(os.path.join(store, "surf_xyz.dat"),
                              dtype=np.float32, mode="r"))

    db2 = KeyframeDatabase.load(ckpt)  # no storage_dir → session copy
    assert os.path.abspath(db2.storage_dir) != os.path.abspath(store)
    _fill(db2, 3, seed=9)  # mutates only the session copy
    db2.edge_xyz.flush(); db2.surf_xyz.flush()
    after = np.array(np.memmap(os.path.join(store, "surf_xyz.dat"),
                               dtype=np.float32, mode="r"))
    np.testing.assert_array_equal(orig, after)
    assert db2.n_keyframes == 9


def test_device_mirror_incremental():
    """descriptor_arrays/nearest_ids are served from a persistent device
    mirror: same values as a fresh rebuild, appended without re-upload."""
    rng = np.random.default_rng(0)

    def fill(db, n, seed=0):
        r = np.random.default_rng(seed)
        for _ in range(n):
            i = db.n_keyframes
            pb = PointBatch.from_points(
                r.normal(size=(db.edge_capacity, 3)).astype(np.float32),
                capacity=db.edge_capacity)
            sb = PointBatch.from_points(
                r.normal(size=(db.surf_capacity, 3)).astype(np.float32),
                capacity=db.surf_capacity)
            pose = np.asarray(se3.pose_identity()).copy()
            pose[4:] = rng.normal(size=3) * 10  # distinct positions
            db.add_keyframe(0.1 * i, pose, pose, pb, sb)

    db = KeyframeDatabase(edge_capacity=32, surf_capacity=64,
                          initial_keyframes=4)
    fill(db, 5)
    sc1, rk1, v1 = db.descriptor_arrays()
    assert int(np.asarray(v1).sum()) == 5
    np.testing.assert_allclose(np.asarray(sc1)[:5], db.sc[:5], rtol=1e-6)
    # append → delta path (no capacity change at 5→6 within cap 8)
    fill(db, 1, seed=3)
    sc2, rk2, v2 = db.descriptor_arrays()
    assert int(np.asarray(v2).sum()) == 6
    np.testing.assert_allclose(np.asarray(rk2)[:6], db.ring_keys[:6], rtol=1e-6)
    # kNN against numpy ground truth
    q = db.map_poses[2, 4:] + 0.01
    ids, d = db.nearest_ids(q, 3)
    ref = np.argsort(np.linalg.norm(db.map_poses[:6, 4:] - q, axis=1))[:3]
    np.testing.assert_array_equal(np.sort(ids), np.sort(ref))
    # update_poses refreshes the position mirror
    newp = db.map_poses[:6].copy()
    newp[:, 4] += 100.0
    db.update_poses(newp)
    ids2, d2 = db.nearest_ids(newp[4, 4:], 1)
    assert ids2[0] == 4 and d2[0] < 1e-3


def test_ram_mode_unchanged(tmp_path):
    db = KeyframeDatabase(edge_capacity=16, surf_capacity=16,
                          initial_keyframes=2)
    _fill(db, 5)
    path = str(tmp_path / "ram.npz")
    db.save(path)
    db2 = KeyframeDatabase.load(path)
    assert db2.n_keyframes == 5
    np.testing.assert_array_equal(db2.surf_xyz[:5], db.surf_xyz[:5])
