"""MRPT-binary interop: round-trip every container + e2e rawlog replay.

VERDICT round-2 item 8: the reference toolchain (mm-viewer, sm2mm, loop
closure) consumes MRPT-serialized .simplemap/.mm; these tests gate the
exporter/importer pair on exact round-trips (format contract in
docs/mrpt_format.md) and drive a generated .rawlog through the full
odometry CLI path.
"""

import os

import numpy as np
import pytest

from mola_lidar_odometry_tpu.utils import mrpt_io as M


def _rand_pose(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    return M.MrptPose3D(rng.normal(size=3) * 10.0, q)


class TestPrimitives:
    def test_pose_quat_conversions(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            p = _rand_pose(rng)
            R = p.R()
            q2 = M.rot_to_quat_wxyz(R)
            np.testing.assert_allclose(M.quat_wxyz_to_rot(q2), R, atol=1e-12)

    def test_timestamp_roundtrip(self):
        t = 1726590000.1234567
        assert abs(M.mrpt_timestamp_to_unix(M.unix_to_mrpt_timestamp(t)) - t) < 1e-6

    def test_framing_null_and_endflag(self, tmp_path):
        import io

        buf = io.BytesIO()
        w = M.ArchiveWriter(buf)
        w.null_object()
        w.begin_object("CPose3D", 2)
        w.f64_array(np.zeros(7))
        w.end_object()
        buf.seek(0)
        r = M.ArchiveReader(buf)
        assert r.begin_object() == (None, 0)
        name, ver = r.begin_object()
        assert (name, ver) == ("CPose3D", 2)


class TestSimpleMap:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        entries = []
        for i in range(4):
            obs = []
            if i != 2:  # one pose-only (non-KF) entry
                obs.append(
                    M.MrptObservation(
                        classname="CObservationPointCloud",
                        sensor_label="lidar",
                        stamp=100.0 + i * 0.1,
                        sensor_pose=_rand_pose(rng),
                        points=rng.normal(size=(50, 3)).astype(np.float32),
                        intensity=rng.uniform(size=50).astype(np.float32),
                    )
                )
            entries.append(
                M.MrptSimpleMapEntry(
                    pose=_rand_pose(rng),
                    cov=rng.normal(size=(6, 6)),
                    observations=obs,
                    twist=rng.normal(size=6),
                )
            )
        p = tmp_path / "t.simplemap"
        M.save_simplemap_mrpt(p, entries)
        back = M.load_simplemap_mrpt(p)
        assert len(back) == 4
        for a, b in zip(entries, back):
            np.testing.assert_allclose(a.pose.t, b.pose.t, atol=1e-12)
            np.testing.assert_allclose(a.pose.quat_wxyz, b.pose.quat_wxyz, atol=1e-12)
            np.testing.assert_allclose(a.cov, b.cov, atol=1e-12)
            np.testing.assert_allclose(a.twist, b.twist, atol=1e-12)
            assert len(a.observations) == len(b.observations)
            for oa, ob in zip(a.observations, b.observations):
                np.testing.assert_allclose(oa.points, ob.points, atol=0)
                np.testing.assert_allclose(oa.intensity, ob.intensity, atol=0)
                assert abs(oa.stamp - ob.stamp) < 1e-6
                assert oa.sensor_label == ob.sensor_label

    def test_is_gzip(self, tmp_path):
        p = tmp_path / "t.simplemap"
        M.save_simplemap_mrpt(p, [])
        assert open(p, "rb").read(2) == b"\x1f\x8b"

    def test_keyframe_bridge_roundtrip(self, tmp_path):
        """export_simplemap_mrpt -> import_simplemap_mrpt: identical KF
        poses and points (the VERDICT's done-criterion)."""
        from mola_lidar_odometry_tpu.models.odometry import SimpleMapKeyframe
        from mola_lidar_odometry_tpu.utils import serialization as S

        rng = np.random.default_rng(2)
        kfs = []
        for i in range(3):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            kfs.append(
                SimpleMapKeyframe(
                    stamp=10.0 + i,
                    t=rng.normal(size=3),
                    quat_xyzw=q,
                    twist=rng.normal(size=6),
                    scan_xyz=rng.normal(size=(30, 3)).astype(np.float32),
                )
            )
        p = tmp_path / "kf.simplemap"
        S.export_simplemap_mrpt(p, kfs)
        back = S.import_simplemap_mrpt(p)
        assert len(back) == 3
        for a, b in zip(kfs, back):
            np.testing.assert_allclose(a.t, b.t, atol=1e-12)
            qa, qb = a.quat_xyzw, b.quat_xyzw
            if np.dot(qa, qb) < 0:
                qb = -qb
            np.testing.assert_allclose(qa, qb, atol=1e-12)
            np.testing.assert_allclose(a.twist, b.twist, atol=1e-12)
            np.testing.assert_allclose(a.scan_xyz, b.scan_xyz, atol=0)


class TestMetricMap:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(3)
        layers = {
            "localmap": (rng.normal(size=(200, 3)).astype(np.float32), None),
            "edges": (
                rng.normal(size=(40, 3)).astype(np.float32),
                rng.uniform(size=40).astype(np.float32),
            ),
        }
        p = tmp_path / "t.mm"
        M.save_metric_map_mrpt(p, layers)
        back = M.load_metric_map_mrpt(p)
        assert set(back) == {"localmap", "edges"}
        np.testing.assert_allclose(back["localmap"][0], layers["localmap"][0])
        np.testing.assert_allclose(back["edges"][1], layers["edges"][1])

    def test_export_from_live_map(self, tmp_path):
        import jax.numpy as jnp

        from mola_lidar_odometry_tpu.ops import voxel_hash as vh
        from mola_lidar_odometry_tpu.ops.pointcloud import PointCloud
        from mola_lidar_odometry_tpu.utils import serialization as S

        m = vh.VoxelHashMap.create(1 << 10, 8, 0.5)
        pts = np.random.default_rng(4).normal(size=(100, 3)).astype(np.float32) * 5
        m = vh.insert(m, PointCloud.from_xyz(jnp.asarray(pts)))
        p = tmp_path / "live.mm"
        S.export_metric_map_mrpt(p, {"localmap": m}, capacity=512)
        back = S.import_metric_map_mrpt(p)
        assert len(back["localmap"]) == int(m.num_points())


class TestRawlog:
    def _make_rawlog(self, tmp_path, n=3):
        """Generate a rawlog from simulator scans."""
        from mola_lidar_odometry_tpu.utils import sim

        traj, scans = sim.simulate_sequence(n, n_rings=16, n_azimuth=256)
        frames = []
        for k, (xyz, times, rings, valid) in enumerate(scans):
            frames.append(
                [
                    M.MrptObservation(
                        classname="CObservationPointCloud",
                        sensor_label="lidar",
                        stamp=float(traj.stamps[k]),
                        sensor_pose=M.MrptPose3D(
                            np.zeros(3), np.array([1.0, 0, 0, 0])
                        ),
                        points=xyz[valid].astype(np.float32),
                    )
                ]
            )
        p = tmp_path / "seq.rawlog"
        M.write_rawlog(p, frames)
        return p, frames

    def test_roundtrip(self, tmp_path):
        p, frames = self._make_rawlog(tmp_path)
        back = M.read_rawlog(p)
        assert len(back) == len(frames)
        for a, b in zip(frames, back):
            np.testing.assert_allclose(a[0].points, b[0].points, atol=0)

    def test_2d_scan_entry(self, tmp_path):
        obs = M.MrptObservation(
            classname="CObservation2DRangeScan",
            sensor_label="scan2d",
            stamp=5.0,
            sensor_pose=M.MrptPose3D(np.zeros(3), np.array([1.0, 0, 0, 0])),
            aperture=np.pi,
            right_to_left=True,
            max_range=30.0,
            scan_ranges=np.linspace(1, 5, 64).astype(np.float32),
            scan_validity=np.ones(64, np.uint8),
        )
        p = tmp_path / "scan2d.rawlog"
        M.write_rawlog(p, [[obs]])
        back = M.read_rawlog(p)
        np.testing.assert_allclose(back[0][0].scan_ranges, obs.scan_ranges)
        assert back[0][0].aperture == pytest.approx(np.pi)

    def test_rawlog_dataset_e2e(self, tmp_path):
        """RawlogDataset drives the full odometry path (the reference's
        primary test fixture shape: rawlog -> poses,
        test/test_lidar_odometry_rawlog.cpp)."""
        from mola_lidar_odometry_tpu.apps.datasets import RawlogDataset
        from mola_lidar_odometry_tpu.models.odometry import LidarOdometry

        p, _ = self._make_rawlog(tmp_path, n=3)
        ds = RawlogDataset(str(p))
        assert len(ds) == 3
        lo = LidarOdometry.from_yaml_file(
            os.path.join(
                os.path.dirname(__file__), "..", "pipelines", "lidar3d-default.yaml"
            ),
            raw_capacity=1 << 13,
            map_slots=1 << 14,
            layer_capacities={
                "raw": 1 << 13,
                "decimated_for_map_raw": 4096,
                "decimated_for_icp_skewed": 2048,
                "decimated_for_icp": 2048,
                "decimated_for_map": 4096,
            },
        )
        for i in range(len(ds)):
            fr = ds.get(i)
            out = lo.on_lidar_scan(fr.xyz, fr.stamp)
            assert np.all(np.isfinite(np.asarray(out.pose_t)))
        assert len(lo.trajectory) == 3
