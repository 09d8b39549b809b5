"""Native data-plane library: builds with g++, matches numpy IO, ring + prefetch."""
import os

import numpy as np
import pytest

from lmsf_slam_tpu.native import (
    NativeRing,
    ScanPrefetcher,
    native_available,
    read_f32,
    read_pcd,
    write_pcd,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ unavailable / native build failed"
)


def test_read_f32_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(1000, 4)).astype(np.float32)
    path = str(tmp_path / "scan.bin")
    data.tofile(path)
    out = read_f32(path)
    np.testing.assert_array_equal(out, data.reshape(-1))


def test_pcd_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(257, 3)).astype(np.float32)
    path = str(tmp_path / "kf.pcd")
    write_pcd(path, xyz)
    back = read_pcd(path)
    np.testing.assert_array_equal(back, xyz)
    # header is real PCD
    with open(path, "rb") as f:
        head = f.read(64)
    assert head.startswith(b"# .PCD v0.7")


def test_ring_buffer_order_and_bounds():
    ring = NativeRing(slot_floats=16, n_slots=4)
    for i in range(4):
        assert ring.push(np.full(8, float(i), np.float32))
    assert not ring.push(np.zeros(8, np.float32))  # full
    assert len(ring) == 4
    for i in range(4):
        out = ring.pop()
        assert out.shape == (8,) and out[0] == float(i)
    assert ring.pop() is None  # empty
    with pytest.raises(ValueError):
        ring.push(np.zeros(32, np.float32))  # oversize payload


def test_prefetcher_streams_files_in_order(tmp_path):
    paths = []
    for i in range(10):
        arr = np.full(100 + i, float(i), np.float32)
        p = str(tmp_path / f"{i:06d}.bin")
        arr.tofile(p)
        paths.append(p)
    got = list(ScanPrefetcher(paths, slot_floats=256, n_slots=3))
    assert len(got) == 10
    for i, arr in enumerate(got):
        assert arr.shape == (100 + i,)
        assert (arr == float(i)).all()
