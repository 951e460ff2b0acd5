"""Native rosbag2 .db3 path: CDR round-trip + dataset + full odometry run.

The reference drives its pipeline from a recorded bag in
test/test_lidar_odometry_rosbag2.cpp; here the bag itself is produced by
the bundled simulator through the same CDR encoder the reader decodes
(utils/rosbag2.py), which also pins the rosbag2 on-disk format contract
(schema + XCDR alignment) without any ROS dependency."""

import os

import numpy as np
import pytest

from mola_lidar_odometry_tpu.apps.datasets import Rosbag2Dataset
from mola_lidar_odometry_tpu.utils import sim
from mola_lidar_odometry_tpu.utils.rosbag2 import (
    Db3Reader,
    encode_pointcloud2,
    parse_pointcloud2,
    write_pointcloud2_db3,
)

PIPELINE = os.path.join(
    os.path.dirname(__file__), "..", "pipelines", "lidar3d-default.yaml"
)


def test_cdr_roundtrip():
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-10, 10, (257, 3)).astype(np.float32)
    inten = rng.uniform(0, 100, 257).astype(np.float32)
    times = rng.uniform(0, 0.1, 257).astype(np.float32)
    ring = rng.integers(0, 64, 257).astype(np.uint16)
    blob = encode_pointcloud2(
        123.456789, xyz, intensity=inten, times=times, ring=ring,
        frame_id="velodyne",
    )
    msg = parse_pointcloud2(blob)
    assert msg.frame_id == "velodyne"
    assert abs(msg.stamp - 123.456789) < 1e-6
    ch = msg.records()
    np.testing.assert_array_equal(ch["x"], xyz[:, 0])
    np.testing.assert_array_equal(ch["z"], xyz[:, 2])
    np.testing.assert_array_equal(ch["intensity"], inten)
    np.testing.assert_array_equal(ch["t"], times)
    np.testing.assert_array_equal(ch["ring"], ring)


def test_bag_write_read(tmp_path):
    rng = np.random.default_rng(1)
    bag = tmp_path / "run.db3"
    frames = []
    for k in range(3):
        xyz = rng.uniform(-5, 5, (100 + k, 3)).astype(np.float32)
        frames.append((10.0 + 0.1 * k, xyz, dict(ring=np.arange(100 + k) % 8)))
    write_pointcloud2_db3(str(bag), frames)

    r = Db3Reader(str(bag))
    assert len(r) == 3 and r.topic == "/points"
    _, msg = r.message(1)
    assert msg.width == 101

    ds = Rosbag2Dataset(str(bag))
    assert len(ds) == 3
    fr = ds.get(2)
    assert fr.xyz.shape == (102, 3)
    assert fr.ring is not None and int(fr.ring.max()) == 7
    assert abs(fr.stamp - 10.2) < 1e-6

    with pytest.raises(ValueError):
        Rosbag2Dataset(str(bag), topic="/other")


def test_odometry_runs_from_bag(tmp_path):
    """Simulator -> bag -> dataset -> odometry: the reference's rosbag2
    e2e shape (test_lidar_odometry_rosbag2.cpp) without ROS."""
    from mola_lidar_odometry_tpu.models.odometry import LidarOdometry

    traj, scans = sim.simulate_sequence(3, n_rings=8, n_azimuth=128)
    bag = tmp_path / "sim.db3"
    frames = []
    for k, (xyz, times, rings, valid) in enumerate(scans):
        frames.append(
            (
                float(traj.stamps[k]) + 1.0,  # nonzero stamps
                xyz[valid],
                dict(times=times[valid], ring=rings[valid].astype(np.uint16)),
            )
        )
    write_pointcloud2_db3(str(bag), frames)

    ds = Rosbag2Dataset(str(bag))
    lo = LidarOdometry.from_yaml_file(
        PIPELINE, env={},
        raw_capacity=1 << 12, map_slots=1 << 13,
        layer_capacities={
            "raw": 1 << 12,
            **{n: 1024 for n in (
                "decimated_for_map_raw", "decimated_for_icp_skewed",
                "decimated_for_icp", "decimated_for_map",
            )},
        },
    )
    for i in range(len(ds)):
        fr = ds.get(i)
        out = lo.on_lidar_scan(
            fr.xyz, fr.stamp, times=fr.times, ring=fr.ring,
            intensity=fr.intensity,
        )
    assert bool(out.processed)
    assert np.all(np.isfinite(np.asarray(out.pose_t)))
