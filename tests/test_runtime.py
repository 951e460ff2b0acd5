"""Tests for the module runtime (worker pool, dispatch, backpressure) and
the auxiliary observation handlers (GNSS/IMU/wheel odometry, relocalize)."""

import threading
import time

import numpy as np
import pytest

from mola_lidar_odometry_tpu.utils.runtime import (
    AsyncLidarOdometry,
    Observation,
    WorkerThreadsPool,
)


class FakeSpec:
    lidar_sensor_labels = ("lidar", "/ouster/points")
    imu_sensor_label = "imu"
    gnss_sensor_label = "gps"
    wheel_odometry_sensor_label = "odometry"
    multiple_lidar_count = 1
    multiple_lidar_max_time_offset = 0.1


class FakeLO:
    def __init__(self):
        self.spec = FakeSpec()
        self.active = True
        self.calls = []

    def on_lidar_scan(self, xyz, stamp, times=None, intensity=None, ring=None):
        self.calls.append(("lidar", stamp, len(xyz)))

    def on_gnss(self, stamp, data):
        self.calls.append(("gnss", stamp))

    def on_imu(self, stamp, data):
        self.calls.append(("imu", stamp))

    def on_wheel_odometry(self, stamp, pose):
        self.calls.append(("odom", stamp))


class TestWorkerPool:
    def test_fifo_ordering(self):
        pool = WorkerThreadsPool(1)
        out = []
        for i in range(20):
            pool.enqueue(lambda i=i: out.append(i))
        pool.wait_all()
        assert out == list(range(20))
        pool.shutdown()

    def test_is_busy(self):
        pool = WorkerThreadsPool(1)
        pool.enqueue(lambda: time.sleep(0.15))
        time.sleep(0.03)
        assert pool.is_busy()
        pool.wait_all()
        assert not pool.is_busy()
        pool.shutdown()


class TestDispatch:
    def test_label_routing(self):
        lo = FakeLO()
        rt = AsyncLidarOdometry(lo)
        xyz = np.zeros((10, 3), np.float32)
        rt.on_new_observation(Observation("lidar", "lidar", 0.0, {"xyz": xyz}))
        rt.on_new_observation(Observation("lidar", "/ouster/points", 0.1, {"xyz": xyz}))
        rt.on_new_observation(Observation("gnss", "gps", 0.2, {}))
        rt.on_new_observation(Observation("imu", "imu", 0.3, {}))
        rt.on_new_observation(Observation("odometry", "odometry", 0.4, {"pose": None}))
        rt.on_new_observation(Observation("lidar", "unknown_sensor", 0.5, {"xyz": xyz}))
        rt.worker.wait_all()
        kinds = [c[0] for c in lo.calls]
        assert kinds == ["lidar", "lidar", "gnss", "imu", "odom"]
        rt.shutdown()

    def test_fatal_error_latch(self):
        lo = FakeLO()

        def boom(*a, **kw):
            raise RuntimeError("sensor exploded")

        lo.on_gnss = boom
        rt = AsyncLidarOdometry(lo)
        rt.on_new_observation(Observation("gnss", "gps", 0.0, {}))
        time.sleep(0.2)
        assert rt.fatal_error
        # further observations are discarded silently
        rt.on_new_observation(
            Observation("lidar", "lidar", 1.0, {"xyz": np.zeros((5, 3))})
        )
        time.sleep(0.1)
        assert lo.calls == []

    def test_worker_survives_handler_exception(self):
        # A raising handler latches fatal but must NOT kill the sole worker
        # thread: queued tasks drain and wait_all()/shutdown() terminate
        # (ADVICE round 1 — reference keeps its pool alive,
        # LidarOdometry.cpp:614-619).
        lo = FakeLO()

        def boom(*a, **kw):
            raise RuntimeError("sensor exploded")

        lo.on_gnss = boom
        rt = AsyncLidarOdometry(lo)
        # enqueue the bomb AND more work behind it in one burst
        rt.on_new_observation(Observation("gnss", "gps", 0.0, {}))
        rt.worker.enqueue(lambda: lo.calls.append(("after",)))
        done = threading.Event()

        def waiter():
            rt.worker.wait_all()
            done.set()

        threading.Thread(target=waiter, daemon=True).start()
        assert done.wait(timeout=5.0), "wait_all() deadlocked after exception"
        assert rt.fatal_error
        assert ("after",) in lo.calls  # queued task still executed
        assert not rt.worker.is_busy()
        rt.shutdown()  # terminates because the worker thread is alive

    def test_enqueue_request_runs_before_next_scan(self):
        lo = FakeLO()
        rt = AsyncLidarOdometry(lo)
        hits = []
        rt.enqueue_request(lambda: hits.append("req"))
        rt.on_new_observation(
            Observation("lidar", "lidar", 0.0, {"xyz": np.zeros((5, 3))})
        )
        rt.worker.wait_all()
        assert hits == ["req"] and lo.calls
        rt.shutdown()

    def test_multi_lidar_grouping(self):
        lo = FakeLO()
        lo.spec.multiple_lidar_count = 2
        rt = AsyncLidarOdometry(lo)
        xyz = np.zeros((10, 3), np.float32)
        rt.on_new_observation(Observation("lidar", "lidar", 0.00, {"xyz": xyz}))
        rt.worker.wait_all()
        assert lo.calls == []  # waiting for the second sensor
        rt.on_new_observation(Observation("lidar", "/ouster/points", 0.02, {"xyz": xyz}))
        rt.worker.wait_all()
        assert len(lo.calls) == 1
        assert lo.calls[0][2] == 20  # merged point count
        rt.shutdown()


@pytest.fixture(scope="module")
def tiny_lo():
    import os

    from mola_lidar_odometry_tpu.models.odometry import LidarOdometry

    path = os.path.join(os.path.dirname(__file__), "..", "pipelines", "lidar3d-default.yaml")
    return LidarOdometry.from_yaml_file(
        path,
        raw_capacity=1 << 10,
        map_slots=1 << 12,
        layer_capacities={"raw": 1 << 10, "decimated_for_map_raw": 512,
                          "decimated_for_icp_skewed": 512, "decimated_for_icp": 512,
                          "decimated_for_map": 512},
    )


class TestAuxHandlers:
    def test_wheel_odometry_feeds_navstate(self, tiny_lo):
        lo = tiny_lo
        lo.reset()
        T0 = np.eye(4)
        lo.on_wheel_odometry(0.0, T0)
        T1 = np.eye(4)
        T1[:3, 3] = [0.5, 0.0, 0.0]
        lo.on_wheel_odometry(0.1, T1)
        T2 = np.eye(4)
        T2[:3, 3] = [1.0, 0.0, 0.0]
        lo.on_wheel_odometry(0.2, T2)
        # odometry is velocity evidence ONLY: the navstate window advanced
        # but the pose estimate did not move (reference feeds fuse_odometry,
        # never writes the pose — LidarOdometry.cpp:1357-1373)
        assert abs(float(lo.carry.pose_t[0])) < 1e-6
        assert int(lo.carry.nav.head) >= 2
        # ...and the fused window carries the odometric velocity
        from mola_lidar_odometry_tpu.models import navstate as ns

        est = ns.estimate(lo.carry.nav, lo.spec.navstate, 0.25)
        assert bool(est.valid)
        assert abs(float(est.twist[0]) - 5.0) < 1.0  # ~0.5 m / 0.1 s

    def test_relocalize_near_pose(self, tiny_lo):
        lo = tiny_lo
        lo.reset()
        R = np.eye(3)
        t = np.asarray([10.0, -3.0, 1.0])
        lo.relocalize_near_pose_pdf(R, t)
        np.testing.assert_allclose(np.asarray(lo.carry.pose_t), t, atol=1e-6)

    def test_relocalize_from_gnss(self, tiny_lo):
        lo = tiny_lo
        lo.reset()
        assert not lo.relocalize_from_gnss()  # nothing buffered
        lo.on_gnss(1.0, {"enu": [5.0, 6.0, 0.0]})
        assert lo.relocalize_from_gnss()
        np.testing.assert_allclose(np.asarray(lo.carry.pose_t), [5.0, 6.0, 0.0])

    def test_imu_buffered(self, tiny_lo):
        lo = tiny_lo
        lo.reset()
        lo.on_imu(0.0, {"wx": 0.1})
        assert len(lo._imu_buffer) == 1


def test_icp_debug_logs(tmp_path, monkeypatch, tiny_lo):
    """MP2P_ICP_GENERATE_DEBUG_FILES=1 produces .icplog.npz files."""
    import os

    import numpy as np

    from mola_lidar_odometry_tpu.models.odometry import LidarOdometry
    from mola_lidar_odometry_tpu.utils import sim

    monkeypatch.setenv("MP2P_ICP_GENERATE_DEBUG_FILES", "1")
    monkeypatch.setenv("MP2P_ICP_LOG_FILES_DECIMATION", "1")
    monkeypatch.chdir(tmp_path)
    lo = LidarOdometry(tiny_lo.spec)  # same compiled spec, fresh instance
    assert lo._icp_log is not None
    traj, scans = sim.simulate_sequence(2, n_rings=8, n_azimuth=128)
    for k, (xyz, times, rings, valid) in enumerate(scans):
        lo.on_lidar_scan(xyz[valid], traj.stamps[k], times=times[valid])
    logs = sorted((tmp_path / "icp-logs").glob("*.icplog.npz"))
    assert len(logs) == 2
    d = np.load(logs[1])
    assert d["poses_t"].shape[1] == 3 and d["paired"].shape[0] == 30
    # full per-iteration pairing details (saveIterationDetails analogue):
    # [lx ly lz tx ty tz d2 valid] per local point, every 3rd iteration
    det = d["pair_details"]
    assert det.shape[0] == 10 and det.shape[2] == 8
    assert list(d["detail_iters"][:3]) == [0, 3, 6]
    v = det[0, :, 7] > 0
    assert v.any()
    # recorded d2 consistent with the recorded pair endpoints (local pts
    # are sensor-frame, targets map-frame: only the invariant that d2
    # matches what was paired at that iteration's pose is checked upstream;
    # here shape + validity + finite values)
    assert np.isfinite(det[0][v]).all()


def test_ros2_bridge_gated():
    """BridgeROS2 raises a clear error without the ROS 2 stack."""
    import pytest as _pytest

    from mola_lidar_odometry_tpu.apps.ros2_bridge import BridgeROS2

    with _pytest.raises(ImportError, match="rclpy"):
        BridgeROS2(runtime=None, config={})


def test_publisher_callbacks(tiny_lo):
    """advertiseUpdatedLocalization / advertiseUpdatedMap counterparts."""
    import numpy as np

    from mola_lidar_odometry_tpu.utils import sim

    lo = tiny_lo
    lo.reset()
    loc_updates, map_updates = [], []
    lo.subscribe_localization_updates(loc_updates.append)
    lo.subscribe_map_updates(map_updates.append)
    lo.publish_map_updates_every_n = 1
    traj, scans = sim.simulate_sequence(3, n_rings=8, n_azimuth=128)
    for k, (xyz, times, rings, valid) in enumerate(scans):
        lo.on_lidar_scan(xyz[valid], traj.stamps[k], times=times[valid])
    assert len(loc_updates) == 3
    assert "t" in loc_updates[0] and loc_updates[0]["t"].shape == (3,)
    assert len(map_updates) >= 1
    assert map_updates[0].ndim == 2 and map_updates[0].shape[1] == 3


def test_reset_clears_fatal_latch(tiny_lo):
    lo = tiny_lo
    lo.reset()
    lo._fatal_error = True
    assert lo.on_lidar_scan(np.zeros((10, 3), np.float32), 0.0) is None  # dead
    lo.reset()
    out = lo.on_lidar_scan(np.random.default_rng(0).uniform(-10, 10, (500, 3)).astype(np.float32), 0.0)
    assert out is not None and bool(out.processed)


def test_queue_overflow_drop():
    """Observations past max_worker_thread_queue_before_drop are dropped."""
    lo = FakeLO()
    lo.spec.max_worker_thread_queue_before_drop = 3

    import threading
    gate = threading.Event()
    slow_calls = []

    def slow(xyz, stamp, **kw):
        gate.wait(2.0)
        slow_calls.append(stamp)

    lo.on_lidar_scan = slow
    rt = AsyncLidarOdometry(lo)
    xyz = np.zeros((5, 3), np.float32)
    for k in range(10):
        rt.on_new_observation(Observation("lidar", "lidar", float(k), {"xyz": xyz}))
    assert rt.dropped_observations > 0
    gate.set()
    rt.worker.wait_all()
    assert len(slow_calls) < 10
    rt.shutdown()
