"""Native rosbag2 .mcap path: container round-trip + zstd chunks + an e2e
deskew run with a pose gate.

Mirrors the reference's mcap regression test
(test/test_lidar_odometry_rosbag2.cpp:113-143: XYZIRT per-point stamps ->
deskew path -> per-pose gate); the bag here is produced by the bundled
simulator through the same CDR encoder the reader decodes, which pins the
on-disk contract without ROS or the optional mcap package."""

import os
import struct

import numpy as np
import pytest

from mola_lidar_odometry_tpu.apps.datasets import Rosbag2Dataset
from mola_lidar_odometry_tpu.utils import mcap, sim
from mola_lidar_odometry_tpu.utils.rosbag2 import parse_pointcloud2

PIPELINE = os.path.join(
    os.path.dirname(__file__), "..", "pipelines", "lidar3d-default.yaml"
)


def _frames(n=3, rng=None):
    rng = rng or np.random.default_rng(1)
    frames = []
    for k in range(n):
        xyz = rng.uniform(-5, 5, (100 + k, 3)).astype(np.float32)
        frames.append(
            (10.0 + 0.1 * k, xyz, dict(ring=np.arange(100 + k) % 8))
        )
    return frames


def test_mcap_write_read(tmp_path):
    bag = tmp_path / "run.mcap"
    frames = _frames()
    mcap.write_pointcloud2_mcap(str(bag), frames)

    topics = mcap.list_topics(str(bag))
    assert topics == {"/points": "sensor_msgs/msg/PointCloud2"}

    r = mcap.McapReader(str(bag))
    assert len(r) == 3 and r.topic == "/points"
    stamp, msg = r.message(1)
    assert abs(stamp - 10.1) < 1e-6
    assert msg.width == 101
    ch = msg.records()
    np.testing.assert_array_equal(ch["x"], frames[1][1][:, 0])

    ds = Rosbag2Dataset(str(bag))
    assert len(ds) == 3
    fr = ds.get(2)
    assert fr.xyz.shape == (102, 3)
    assert fr.ring is not None and int(fr.ring.max()) == 7

    with pytest.raises(ValueError):
        Rosbag2Dataset(str(bag), topic="/other")


def test_mcap_zstd_chunked(tmp_path):
    """Real rosbag2 mcap writers chunk + zstd-compress; rebuild the bag with
    its Schema/Channel/Message records wrapped in one zstd Chunk and check
    the reader descends into it."""
    zstandard = pytest.importorskip("zstandard")
    plain = tmp_path / "plain.mcap"
    frames = _frames()
    mcap.write_pointcloud2_mcap(str(plain), frames)
    buf = plain.read_bytes()

    # collect the data-section records (between header record and DataEnd)
    inner = []
    off = 8
    while off < len(buf) - 8:
        op = buf[off]
        (length,) = struct.unpack_from("<Q", buf, off + 1)
        rec = buf[off : off + 9 + length]
        off += 9 + length
        if op in (mcap.OP_SCHEMA, mcap.OP_CHANNEL, mcap.OP_MESSAGE):
            inner.append(rec)
    records = b"".join(inner)
    comp = zstandard.ZstdCompressor().compress(records)
    chunk_body = (
        struct.pack("<QQQI", 0, 0, len(records), 0)
        + struct.pack("<I", 4)
        + b"zstd"
        + struct.pack("<Q", len(comp))
        + comp
    )
    chunked = (
        mcap.MAGIC
        + buf[8 : 8 + 9 + struct.unpack_from("<Q", buf, 9)[0]]  # Header record
        + struct.pack("<BQ", mcap.OP_CHUNK, len(chunk_body))
        + chunk_body
        + struct.pack("<BQI", mcap.OP_DATA_END, 4, 0)
        + struct.pack("<BQQQI", mcap.OP_FOOTER, 20, 0, 0, 0)
        + mcap.MAGIC
    )
    bag = tmp_path / "chunked.mcap"
    bag.write_bytes(chunked)

    r = mcap.McapReader(str(bag))
    assert len(r) == 3
    _, msg = r.message(2)
    ch = msg.records()
    np.testing.assert_array_equal(ch["y"], frames[2][1][:, 1])


def test_odometry_deskew_pose_gate_from_mcap(tmp_path):
    """Simulator (moving sensor, per-point XYZIRT stamps) -> mcap -> dataset
    -> odometry with the deskew path live -> per-pose gate vs GT: the shape
    of the reference's rosbag2 regression (pose tolerance there: 0.1 on a
    real RSLIDAR fragment; the tiny 16-ring synthetic world here is gated
    at 0.2 like the other CPU golden tests)."""
    from mola_lidar_odometry_tpu.models.odometry import LidarOdometry
    from mola_lidar_odometry_tpu.ops import se3
    import jax.numpy as jnp

    traj, scans = sim.simulate_sequence(n_frames=8, dt=0.1, speed=2.0, noise=0.01)
    bag = tmp_path / "sim.mcap"
    frames = []
    for k, (xyz, times, rings, valid) in enumerate(scans):
        frames.append(
            (
                float(traj.stamps[k]) + 1.0,
                xyz[valid],
                dict(times=times[valid], ring=rings[valid].astype(np.uint16)),
            )
        )
    mcap.write_pointcloud2_mcap(str(bag), frames)

    ds = Rosbag2Dataset(str(bag))
    lo = LidarOdometry.from_yaml_file(
        PIPELINE, env={},
        raw_capacity=1 << 15, map_slots=1 << 15,
        layer_capacities={
            "raw": 1 << 15,
            **{n: 8192 for n in (
                "decimated_for_map_raw", "decimated_for_icp_skewed",
                "decimated_for_icp", "decimated_for_map",
            )},
        },
    )
    for i in range(len(ds)):
        fr = ds.get(i)
        assert fr.times is not None  # the deskew path must actually engage
        lo.on_lidar_scan(
            fr.xyz, fr.stamp, times=fr.times, ring=fr.ring,
            intensity=fr.intensity,
        )
    tr = lo.estimated_trajectory()
    assert len(tr["stamps"]) == len(ds)
    R0, t0 = traj.R[0], traj.t[0]
    worst = 0.0
    for k in range(len(ds)):
        R_gt = R0.T @ traj.R[k]
        t_gt = R0.T @ (traj.t[k] - t0)
        est = se3.Pose(
            se3.quat_to_rot(jnp.asarray(tr["quat_xyzw"][k], jnp.float32)),
            jnp.asarray(tr["t"][k], jnp.float32),
        )
        gt = se3.Pose(jnp.asarray(R_gt, jnp.float32), jnp.asarray(t_gt, jnp.float32))
        worst = max(worst, float(jnp.linalg.norm(se3.se3_log(se3.relative(gt, est)))))
    assert worst < 0.2, f"worst SE(3) log-norm error {worst}"
