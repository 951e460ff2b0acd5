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


# ---------------------------------------------------------------------------
# Golden byte fixtures (round-4, VERDICT r03 item 8)
# ---------------------------------------------------------------------------


def _hdr(name: str, version: int) -> bytes:
    """CArchive object header, assembled with raw struct only."""
    import struct

    return bytes([0x80 | len(name)]) + name.encode("ascii") + struct.pack("<b", version)


_END = b"\x88"


def _f32vec(vals) -> bytes:
    import struct

    a = np.asarray(vals, "<f4").ravel()
    return struct.pack("<I", len(a)) + a.tobytes()


def _f64s(vals) -> bytes:
    return np.asarray(vals, "<f8").ravel().tobytes()


def _string(s: str) -> bytes:
    import struct

    b = s.encode("utf-8")
    return struct.pack("<I", len(b)) + b


def _u32(v) -> bytes:
    import struct

    return struct.pack("<I", v)


def _u64(v) -> bytes:
    import struct

    return struct.pack("<Q", v)


def _f64(v) -> bytes:
    import struct

    return struct.pack("<d", v)


# unix stamp 0.0 == FILETIME ticks of the unix epoch
_TS0 = 116444736000000000

_POSE_ID = _hdr("CPose3D", 2) + _f64s([0, 0, 0, 1, 0, 0, 0]) + _END


def _golden_mm() -> bytes:
    """metric_map_t v0, one 'localmap' CSimplePointsMap of 2 points."""
    pts = (
        _hdr("CSimplePointsMap", 0)
        + _f32vec([1.0, 4.0])  # x
        + _f32vec([2.0, 5.0])  # y
        + _f32vec([3.0, 6.0])  # z
        + _END
    )
    return _hdr("metric_map_t", 0) + _u32(1) + _string("localmap") + pts + _END


def _golden_simplemap() -> bytes:
    """CSimpleMap v1, one keyframe: pose PDF + 1-obs sensory frame + twist."""
    pose = _hdr("CPose3D", 2) + _f64s([1.0, 2.0, 3.0, 1.0, 0.0, 0.0, 0.0]) + _END
    cov = _f64s(0.01 * np.eye(6))
    pdf = _hdr("CPose3DPDFGaussian", 1) + pose + cov + _END
    cloud = (
        _hdr("CSimplePointsMap", 0)
        + _f32vec([7.0])
        + _f32vec([8.0])
        + _f32vec([9.0])
        + _END
    )
    obs = (
        _hdr("CObservationPointCloud", 0)
        + _string("lidar")
        + _u64(_TS0)
        + _POSE_ID
        + cloud
        + _END
    )
    sf = _hdr("CSensoryFrame", 2) + _u32(1) + obs + _END
    twist = _f64s([0.5, 0.0, 0.0, 0.0, 0.0, 0.1])
    return _hdr("CSimpleMap", 1) + _u32(1) + pdf + sf + twist + _END


def _golden_rawlog() -> bytes:
    """Observations-only rawlog: one 2D scan, then one point cloud."""
    scan = (
        _hdr("CObservation2DRangeScan", 0)
        + _string("laser")
        + _u64(_TS0)
        + _POSE_ID
        + _f64(np.pi)  # aperture
        + b"\x01"  # rightToLeft
        + _f64(30.0)  # maxRange
        + _f32vec([1.5, 2.5, 3.5])
        + _u32(3)
        + bytes([1, 0, 1])
        + _END
    )
    cloud = (
        _hdr("CObservationPointCloud", 0)
        + _string("lidar")
        + _u64(_TS0 + 10_000_000)  # +1 s
        + _POSE_ID
        + _hdr("CSimplePointsMap", 0)
        + _f32vec([1.0])
        + _f32vec([2.0])
        + _f32vec([3.0])
        + _END
        + _END
    )
    return scan + cloud


class TestGoldenBytes:
    """Frozen byte fixtures hand-assembled from docs/mrpt_format.md.

    The round-trip tests above only prove reader == inverse(writer); these
    pin the ACTUAL bytes, so a layout drift in mrpt_io.py (field order,
    width, endianness, version) fails here instead of producing artifacts
    no MRPT tool can read.  The sha256 pins freeze the hand-assembly too.
    """

    def test_fixture_hashes_pinned(self):
        import hashlib

        assert hashlib.sha256(_golden_mm()).hexdigest() == (
            "fa88e6342df31d2264f7bc509f9ae53d15df9a553621afaa94054bf9911c0dca"
        )
        assert hashlib.sha256(_golden_simplemap()).hexdigest() == (
            "d1d50bc109c2eac415b9f82fb5bc49a65e59e77a74a399cf423a8928ca18e868"
        )
        assert hashlib.sha256(_golden_rawlog()).hexdigest() == (
            "99c0859788b05a5bec07d563a6a7a5186c287357370e90e949e0d9ff0dd80a5c"
        )

    def test_mm_reader_parses_golden(self, tmp_path):
        p = tmp_path / "g.mm"
        p.write_bytes(_golden_mm())  # uncompressed: reader auto-detects
        layers = M.load_metric_map_mrpt(p)
        assert list(layers) == ["localmap"]
        pts, inten = layers["localmap"]
        np.testing.assert_allclose(pts, [[1, 2, 3], [4, 5, 6]])
        assert inten is None

    def test_mm_writer_emits_golden(self, tmp_path):
        import gzip

        p = tmp_path / "w.mm"
        M.save_metric_map_mrpt(
            p, {"localmap": (np.array([[1, 2, 3], [4, 5, 6]], np.float32), None)}
        )
        assert gzip.open(p).read() == _golden_mm()

    def test_simplemap_reader_parses_golden(self, tmp_path):
        p = tmp_path / "g.simplemap"
        p.write_bytes(_golden_simplemap())
        entries = M.load_simplemap_mrpt(p)
        assert len(entries) == 1
        e = entries[0]
        np.testing.assert_allclose(e.pose.t, [1, 2, 3])
        np.testing.assert_allclose(e.cov, 0.01 * np.eye(6))
        assert len(e.observations) == 1
        o = e.observations[0]
        assert o.sensor_label == "lidar" and o.stamp == 0.0
        np.testing.assert_allclose(o.points, [[7, 8, 9]])
        np.testing.assert_allclose(e.twist, [0.5, 0, 0, 0, 0, 0.1])

    def test_simplemap_writer_emits_golden(self, tmp_path):
        import gzip

        p = tmp_path / "w.simplemap"
        entry = M.MrptSimpleMapEntry(
            M.MrptPose3D(np.array([1.0, 2, 3]), np.array([1.0, 0, 0, 0])),
            0.01 * np.eye(6),
            [
                M.MrptObservation(
                    classname="CObservationPointCloud",
                    sensor_label="lidar",
                    stamp=0.0,
                    sensor_pose=M.MrptPose3D(np.zeros(3), np.array([1.0, 0, 0, 0])),
                    points=np.array([[7.0, 8, 9]], np.float32),
                )
            ],
            np.array([0.5, 0, 0, 0, 0, 0.1]),
        )
        M.save_simplemap_mrpt(p, [entry])
        assert gzip.open(p).read() == _golden_simplemap()

    def test_rawlog_reader_parses_golden(self, tmp_path):
        p = tmp_path / "g.rawlog"
        p.write_bytes(_golden_rawlog())
        frames = M.read_rawlog(p)
        assert len(frames) == 2
        s = frames[0][0]
        assert s.classname == "CObservation2DRangeScan"
        assert s.aperture == pytest.approx(np.pi) and s.max_range == 30.0
        assert s.right_to_left is True
        np.testing.assert_allclose(s.scan_ranges, [1.5, 2.5, 3.5])
        np.testing.assert_array_equal(s.scan_validity, [1, 0, 1])
        c = frames[1][0]
        assert c.stamp == pytest.approx(1.0)
        np.testing.assert_allclose(c.points, [[1, 2, 3]])

    def test_rawlog_writer_emits_golden(self, tmp_path):
        import gzip

        p = tmp_path / "w.rawlog"
        pose0 = M.MrptPose3D(np.zeros(3), np.array([1.0, 0, 0, 0]))
        frames = [
            [
                M.MrptObservation(
                    classname="CObservation2DRangeScan",
                    sensor_label="laser",
                    stamp=0.0,
                    sensor_pose=pose0,
                    aperture=float(np.pi),
                    right_to_left=True,
                    max_range=30.0,
                    scan_ranges=np.array([1.5, 2.5, 3.5], np.float32),
                    scan_validity=np.array([1, 0, 1], np.uint8),
                )
            ],
            [
                M.MrptObservation(
                    classname="CObservationPointCloud",
                    sensor_label="lidar",
                    stamp=1.0,
                    sensor_pose=pose0,
                    points=np.array([[1.0, 2, 3]], np.float32),
                )
            ],
        ]
        M.write_rawlog(p, frames)
        assert gzip.open(p).read() == _golden_rawlog()
