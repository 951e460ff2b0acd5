"""Dataset-reader tests over synthetic on-disk trees (no real datasets)."""


import numpy as np
import pytest

from mola_lidar_odometry_tpu.apps import datasets as D


def make_kitti_tree(root, seq="00", n_frames=3, n_pts=50):
    rng = np.random.default_rng(0)
    seqd = root / "sequences" / seq
    (seqd / "velodyne").mkdir(parents=True)
    clouds = []
    for k in range(n_frames):
        pts = rng.uniform(-10, 10, (n_pts, 4)).astype(np.float32)
        pts.tofile(seqd / "velodyne" / f"{k:06d}.bin")
        clouds.append(pts)
    (seqd / "times.txt").write_text("".join(f"{0.1 * k:.6f}\n" for k in range(n_frames)))
    # calib with identity Tr
    tr = " ".join(str(v) for v in [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0])
    (seqd / "calib.txt").write_text(f"Tr: {tr}\n")
    # GT poses (cam0 == velodyne with identity Tr)
    poses = root / "poses"
    poses.mkdir()
    lines = []
    for k in range(n_frames):
        T = np.eye(4)
        T[0, 3] = k * 1.0
        lines.append(" ".join(f"{v:.6f}" for v in T[:3].reshape(-1)))
    (poses / f"{seq}.txt").write_text("\n".join(lines) + "\n")
    return clouds


class TestKitti:
    def test_reader_roundtrip(self, tmp_path):
        clouds = make_kitti_tree(tmp_path)
        ds = D.KittiOdometryDataset(
            "00", base_dir=str(tmp_path), vertical_angle_correction_deg=0.0
        )
        assert len(ds) == 3
        fr = ds.get(1)
        np.testing.assert_allclose(fr.xyz, clouds[1][:, :3], rtol=1e-6)
        np.testing.assert_allclose(fr.intensity, clouds[1][:, 3], rtol=1e-6)
        assert fr.stamp == pytest.approx(0.1)
        assert fr.times is not None and fr.times.shape == (50,)

    def test_vertical_correction_preserves_range(self, tmp_path):
        make_kitti_tree(tmp_path)
        ds0 = D.KittiOdometryDataset("00", base_dir=str(tmp_path),
                                     vertical_angle_correction_deg=0.0)
        ds1 = D.KittiOdometryDataset("00", base_dir=str(tmp_path),
                                     vertical_angle_correction_deg=0.205)
        r0 = np.linalg.norm(ds0.get(0).xyz, axis=1)
        r1 = np.linalg.norm(ds1.get(0).xyz, axis=1)
        np.testing.assert_allclose(r0, r1, rtol=1e-4)
        assert not np.allclose(ds0.get(0).xyz[:, 2], ds1.get(0).xyz[:, 2])

    def test_ground_truth_in_velodyne_frame(self, tmp_path):
        make_kitti_tree(tmp_path)
        ds = D.KittiOdometryDataset("00", base_dir=str(tmp_path))
        gt = ds.ground_truth()
        assert gt is not None and gt.t.shape == (3, 3)
        np.testing.assert_allclose(gt.t[:, 0], [0.0, 1.0, 2.0], atol=1e-6)

    def test_missing_base_dir(self):
        with pytest.raises(FileNotFoundError, match="KITTI_BASE_DIR"):
            D.KittiOdometryDataset("00", base_dir="/nonexistent/kitti")


class TestMulran:
    def test_reader(self, tmp_path):
        rng = np.random.default_rng(1)
        d = tmp_path / "KAIST01" / "Ouster"
        d.mkdir(parents=True)
        t0 = 1_500_000_000_000_000_000
        for k in range(2):
            pts = rng.uniform(-5, 5, (20, 4)).astype(np.float32)
            pts.tofile(d / f"{t0 + k * 100_000_000}.bin")
        ds = D.MulranDataset("KAIST01", base_dir=str(tmp_path))
        assert len(ds) == 2
        assert ds.get(1).stamp == pytest.approx(0.1)


class TestKitti360:
    def test_reader_and_gt(self, tmp_path):
        rng = np.random.default_rng(2)
        drive = "2013_05_28_drive_0000_sync"
        d = tmp_path / "data_3d_raw" / drive / "velodyne_points" / "data"
        d.mkdir(parents=True)
        for k in range(2):
            rng.uniform(-5, 5, (20, 4)).astype(np.float32).tofile(d / f"{k:010d}.bin")
        gtd = tmp_path / "data_poses" / drive
        gtd.mkdir(parents=True)
        T = np.eye(4)
        T[1, 3] = 2.5
        row = "1 " + " ".join(f"{v:.6f}" for v in T[:3].reshape(-1))
        (gtd / "poses.txt").write_text(row + "\n")
        ds = D.Kitti360Dataset("00", base_dir=str(tmp_path))
        assert len(ds) == 2
        gt = ds.ground_truth()
        assert gt is not None
        np.testing.assert_allclose(gt.t[0], [0.0, 2.5, 0.0], atol=1e-6)


class TestParisLuco:
    def test_binary_ply(self, tmp_path):
        d = tmp_path / "frames"
        d.mkdir()
        n = 10
        rng = np.random.default_rng(3)
        data = np.zeros(n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("timestamp", "<f4")])
        for f in ("x", "y", "z", "timestamp"):
            data[f] = rng.uniform(0, 1, n).astype(np.float32)
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {n}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property float timestamp\nend_header\n"
        )
        with open(d / "frame_0000.ply", "wb") as f:
            f.write(header.encode())
            f.write(data.tobytes())
        ds = D.ParisLucoDataset(base_dir=str(tmp_path))
        fr = ds.get(0)
        np.testing.assert_allclose(fr.xyz[:, 0], data["x"], rtol=1e-6)
        # timestamps centered (MiddleIsZero-style)
        assert abs(fr.times.min() + fr.times.max()) < 1e-5


class TestSim:
    def test_sim_dataset_gt(self):
        ds = D.SimDataset(3, n_rings=8, n_azimuth=64)
        assert len(ds) == 3
        gt = ds.ground_truth()
        assert gt.t.shape == (3, 3) and gt.quat_xyzw.shape == (3, 4)
