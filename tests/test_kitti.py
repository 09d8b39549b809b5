"""KITTI odometry ingest on a synthetic fixture in the real directory layout
(no dataset ships with CI; the reader/calib/pose math is what's under test)."""
import os

import jax.numpy as jnp
import numpy as np

from lmsf_slam_tpu.common import se3
from lmsf_slam_tpu.datasets.kitti import (
    KittiSequence,
    load_poses,
    read_calib,
    read_velodyne_bin,
)


def make_fixture(root, n_frames=4, n_pts=200):
    seq = os.path.join(root, "sequences", "00")
    velo = os.path.join(seq, "velodyne")
    os.makedirs(velo, exist_ok=True)
    os.makedirs(os.path.join(root, "poses"), exist_ok=True)
    rng = np.random.default_rng(0)
    scans = []
    for i in range(n_frames):
        pts = rng.normal(size=(n_pts, 4)).astype(np.float32) * 10
        pts.tofile(os.path.join(velo, f"{i:06d}.bin"))
        scans.append(pts)
    # calib: velodyne→cam0 = 90° about x plus an offset
    Tr = np.array(
        [[1, 0, 0, 0.3], [0, 0, -1, 0.1], [0, 1, 0, -0.2]], np.float64
    )
    with open(os.path.join(seq, "calib.txt"), "w") as f:
        f.write("P0: " + " ".join(["0"] * 12) + "\n")
        f.write("Tr: " + " ".join(str(v) for v in Tr.reshape(-1)) + "\n")
    # cam0 ground-truth poses: forward motion with yaw
    poses_cam = []
    T = np.eye(4)
    step = np.eye(4)
    step[:3, :3] = np.array(
        [[np.cos(0.1), 0, np.sin(0.1)], [0, 1, 0], [-np.sin(0.1), 0, np.cos(0.1)]]
    )
    step[:3, 3] = [0.1, 0.0, 1.0]
    rows = []
    for i in range(n_frames):
        rows.append(T[:3].reshape(-1))
        poses_cam.append(T.copy())
        T = T @ step
    np.savetxt(os.path.join(root, "poses", "00.txt"), np.array(rows))
    return scans, np.stack(poses_cam)


def test_velodyne_reader(tmp_path):
    root = str(tmp_path)
    scans, _ = make_fixture(root)
    pb = read_velodyne_bin(
        os.path.join(root, "sequences", "00", "velodyne", "000000.bin"),
        capacity=256,
    )
    assert int(pb.count()) == 200
    np.testing.assert_allclose(np.asarray(pb.xyz[:200]), scans[0][:, :3],
                               rtol=1e-6)
    # named attr schema: slot 0 = azimuth-derived relative sweep time,
    # slot 1 = intensity (deskew can never read intensity as time)
    from lmsf_slam_tpu.common.pointcloud import ATTR_INTENSITY, ATTR_TIME

    t = np.asarray(pb.attr[:200, ATTR_TIME])
    assert t.min() >= 0.0 and t.max() < 1.0 and t.std() > 0.05
    az = np.arctan2(scans[0][:, 1], scans[0][:, 0])
    expect = np.mod(az[0] - az, 2 * np.pi) / (2 * np.pi)
    np.testing.assert_allclose(t, expect, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pb.attr[:200, ATTR_INTENSITY]),
                               scans[0][:, 3], rtol=1e-6)


def test_sequence_iteration_and_gt(tmp_path):
    root = str(tmp_path)
    _, poses_cam = make_fixture(root)
    seq = KittiSequence(root, "00", capacity=256)
    assert len(seq) == 4
    stamps = [t for t, _ in seq]
    np.testing.assert_allclose(stamps, [0.0, 0.1, 0.2, 0.3], atol=1e-9)
    gt = seq.ground_truth()
    assert gt.shape == (4, 7)
    # conjugation: relative motion in the velodyne frame must equal
    # Tr⁻¹ · ΔT_cam · Tr
    Tr = read_calib(os.path.join(root, "sequences", "00", "calib.txt"))
    d_cam = np.linalg.inv(poses_cam[0]) @ poses_cam[1]
    d_velo_expect = np.linalg.inv(Tr) @ d_cam @ Tr
    d_velo = np.asarray(
        se3.pose_to_matrix(
            se3.pose_between(jnp.asarray(gt[0]), jnp.asarray(gt[1]))
        )
    )
    np.testing.assert_allclose(d_velo, d_velo_expect, atol=1e-5)
