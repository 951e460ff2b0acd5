"""End-to-end golden test: synthetic LiDAR sequence -> trajectory vs GT.

Mirrors the reference's test strategy (test/test_lidar_odometry_rawlog.cpp:
94-106): run the full odometry on a short sequence and assert every accepted
pose is within 0.1 SE(3) log-norm of ground truth.  The dataset here is the
bundled ray-cast simulator (utils/sim.py) since the reference's recorded
fragments live in an unavailable external package.
"""

import os

import jax.numpy as jnp
import numpy as np
import jax
import pytest

from mola_lidar_odometry_tpu.models.odometry import LidarOdometry
from mola_lidar_odometry_tpu.ops import se3
from mola_lidar_odometry_tpu.utils import sim

PIPELINE = os.path.join(os.path.dirname(__file__), "..", "pipelines", "lidar3d-default.yaml")

# small capacities so the CPU test compiles/runs quickly
TEST_OVERRIDES = dict(
    raw_capacity=1 << 15,
    map_slots=1 << 16,
    layer_capacities={
        "raw": 1 << 15,
        "decimated_for_map_raw": 16384,
        "decimated_for_icp_skewed": 8192,
        "decimated_for_icp": 8192,
        "decimated_for_map": 16384,
    },
    kf_ring_capacity=128,
)


def se3_log_error(R_est, t_est, R_gt, t_gt):
    est = se3.Pose(jnp.asarray(R_est, jnp.float32), jnp.asarray(t_est, jnp.float32))
    gt = se3.Pose(jnp.asarray(R_gt, jnp.float32), jnp.asarray(t_gt, jnp.float32))
    return float(jnp.linalg.norm(se3.se3_log(se3.relative(gt, est))))


@pytest.fixture(scope="module")
def odometry_run():
    traj, scans = sim.simulate_sequence(n_frames=18, dt=0.1, speed=2.0, noise=0.01)
    lo = LidarOdometry.from_yaml_file(PIPELINE, env={}, **TEST_OVERRIDES)
    outs = []
    for k, (xyz, times, rings, valid) in enumerate(scans):
        out = lo.on_lidar_scan(
            xyz[valid], stamp=float(traj.stamps[k]), times=times[valid], ring=rings[valid]
        )
        outs.append(out)
    return traj, lo, outs


def test_every_pose_within_tolerance(odometry_run):
    traj, lo, outs = odometry_run
    tr = lo.estimated_trajectory()
    assert len(tr["stamps"]) == len(traj.stamps), "all scans should be accepted"
    # odometry reports poses relative to the first scan pose; express GT the
    # same way (the reference GT fragments are likewise origin-anchored)
    R0, t0 = traj.R[0], traj.t[0]
    worst = 0.0
    for k in range(len(traj.stamps)):
        R_gt = R0.T @ traj.R[k]
        t_gt = R0.T @ (traj.t[k] - t0)
        R_est = np.asarray(se3.quat_to_rot(jnp.asarray(tr["quat_xyzw"][k], jnp.float32)))
        err = se3_log_error(R_est, tr["t"][k], R_gt, t_gt)
        worst = max(worst, err)
    # The reference gates its recorded fragments at 0.1
    # (test/test_lidar_odometry_rawlog.cpp:101-106); measured head worst is
    # 0.0837 on this deterministic world, so gate exactly as tight as the
    # reference (tightened 0.2 -> 0.12 -> 0.10 across rounds).
    assert worst < 0.10, f"worst SE(3) log-norm error {worst}"


def test_quality_and_keyframes(odometry_run):
    traj, lo, outs = odometry_run
    for out in outs[1:]:
        assert float(out.quality) > 0.5
    # first frame creates the map; later KFs follow distance thresholds
    assert bool(outs[0].kf_local)
    assert lo.carry.maps["localmap"].num_points() > 0
    assert float(lo.carry.est_range) > 10.0


def test_sigma_adapts(odometry_run):
    _, lo, outs = odometry_run
    sig = [float(o.sigma) for o in outs[1:]]
    # sigma must move off the initial 2.0 and stay within configured clamp
    assert all(0.1 <= s <= 3.0 for s in sig)
    assert sig[-1] != pytest.approx(2.0)


def test_trajectory_tum_roundtrip(tmp_path, odometry_run):
    _, lo, _ = odometry_run
    from mola_lidar_odometry_tpu.utils.tum import load_tum

    p = tmp_path / "traj.tum"
    lo.save_trajectory_tum(p)
    stamps, t, q = load_tum(p)
    assert len(stamps) == len(lo.trajectory)
    np.testing.assert_allclose(t[0], lo.trajectory[0]["t"], atol=1e-5)


def test_long_horizon_drift():
    """Sustained tracking over 30 frames: drift rate stays bounded.

    The short golden test catches gross regressions; this one catches slow
    per-frame bias (e.g. systematic under-estimation of motion) that only
    shows over distance."""
    lo = LidarOdometry.from_yaml_file(PIPELINE, **TEST_OVERRIDES)
    traj, scans = sim.simulate_sequence(30, n_rings=24, n_azimuth=768, speed=6.0)
    G0 = se3.Pose(jnp.asarray(traj.R[0], jnp.float32), jnp.asarray(traj.t[0], jnp.float32))
    path_len = 0.0
    last_gt = None
    final_err = None
    for k, (xyz, times, rings, valid) in enumerate(scans):
        out = lo.on_lidar_scan(xyz[valid], traj.stamps[k], times=times[valid], ring=rings[valid])
        if last_gt is not None:
            path_len += float(np.linalg.norm(traj.t[k] - last_gt))
        last_gt = traj.t[k]
        Gk = se3.Pose(jnp.asarray(traj.R[k], jnp.float32), jnp.asarray(traj.t[k], jnp.float32))
        rel = se3.relative(se3.relative(G0, Gk), se3.Pose(out.pose_R, out.pose_t))
        final_err = float(jnp.linalg.norm(jnp.asarray(rel.t)))
    assert path_len > 8.0  # the trajectory actually moved
    drift_pct = 100.0 * final_err / path_len
    # KITTI-class LO achieves ~0.5-1%; measured here: 1.13% over 11 m at
    # 6 m/s on the sparse synthetic world (round 3).  Gate at 1.5% —
    # reference-class with margin (tightened from round-2's 5%).
    assert drift_pct < 1.5, f"drift {drift_pct:.2f}% over {path_len:.1f} m"


def test_large_absolute_timestamps():
    """Stamps far from zero (e.g. unix epoch seconds) must not degrade the
    estimate: the host rebases to f64 before the f32 device time axis."""
    lo = LidarOdometry.from_yaml_file(PIPELINE, **TEST_OVERRIDES)
    traj, scans = sim.simulate_sequence(5, n_rings=16, n_azimuth=512)
    base = 1.7e9  # unix-epoch-scale stamps: f32 ulp here is ~128 s!
    outs = []
    for k, (xyz, times, rings, valid) in enumerate(scans):
        outs.append(
            lo.on_lidar_scan(xyz[valid], base + traj.stamps[k], times=times[valid])
        )
    assert all(bool(o.accepted) for o in outs)
    assert all(bool(o.processed) for o in outs)
    # outputs carry the original absolute stamps
    tr = lo.estimated_trajectory()
    np.testing.assert_allclose(tr["stamps"], base + traj.stamps[:5], rtol=0, atol=1e-4)
    # and the twist estimate is sane (dt didn't collapse to f32 garbage)
    v = np.linalg.norm(np.asarray(outs[-1].twist[:3]))
    assert 0.0 <= v < 20.0


def test_gnss_before_first_scan_epoch_stamps():
    """A GNSS fix that arrives before the first scan (raw epoch stamps) must
    still pair with the first keyframe after rebasing."""
    from dataclasses import replace

    from mola_lidar_odometry_tpu.models.step import make_step

    lo = LidarOdometry.from_yaml_file(PIPELINE, **TEST_OVERRIDES)
    lo.spec = replace(lo.spec, simplemap=replace(lo.spec.simplemap, generate=True))
    lo._step = jax.jit(make_step(lo.spec))
    base = 1.7e9
    traj, scans = sim.simulate_sequence(3, n_rings=16, n_azimuth=512)
    lo.on_gnss(base - 0.02, {"lat": 40.0, "lon": -3.0, "alt": 600.0})
    for k, (xyz, times, rings, valid) in enumerate(scans):
        lo.on_lidar_scan(xyz[valid], base + traj.stamps[k], times=times[valid])
    kfs = [kf for kf in lo.simplemap if kf.scan_xyz is not None]
    assert kfs and kfs[0].gnss is not None
    assert abs(kfs[0].gnss["lat"] - 40.0) < 1e-9
    assert kfs[0].stamp == pytest.approx(base, abs=1e-3)


REF_TEST_DIR = "/root/reference/test"


def _run_on_recorded_gt(tum_name, *, n_rings=24, n_azimuth=1024, indoor=False):
    """Raycast the sim world along a RECORDED reference GT trajectory and
    run the full odometry — real motion dynamics, deterministic world.
    Returns (worst, final) gauge-aligned per-pose SE(3) log-norm error."""
    from mola_lidar_odometry_tpu.utils.sim import (
        make_indoor_world, make_world, simulate_scan, trajectory_from_tum,
    )

    traj = trajectory_from_tum(os.path.join(REF_TEST_DIR, tum_name))
    if indoor:
        # warehouse-scale: structure close to the sensor, like the recorded
        # scene — a street-style cleared corridor leaves a centimetres-per-
        # frame hand-held track looking at mostly ground rings, the
        # degenerate case for point-to-point matching
        world = make_indoor_world(0, extent=12.0)
    else:
        world = make_world(0, extent=45.0, n_boxes=80, n_plates=40)
    lo = LidarOdometry.from_yaml_file(PIPELINE, env={}, **TEST_OVERRIDES)
    G0 = se3.Pose(jnp.asarray(traj.R[0], jnp.float32), jnp.asarray(traj.t[0], jnp.float32))
    worst = final = 0.0
    for k in range(len(traj.stamps)):
        dt_k = (
            float(traj.stamps[min(k + 1, len(traj.stamps) - 1)] - traj.stamps[k])
            or 0.1
        )
        xyz, times, rings, valid = simulate_scan(
            world, traj.R[k], traj.t[k], traj.twists[k],
            n_rings=n_rings, n_azimuth=n_azimuth, spin_period=max(dt_k, 0.05),
            noise=0.01, max_range=60.0, fov_up_deg=15.0, fov_down_deg=-16.0,
            seed=500 + k,
        )
        out = lo.on_lidar_scan(
            xyz[valid], float(traj.stamps[k]), times=times[valid], ring=rings[valid]
        )
        Gk = se3.Pose(jnp.asarray(traj.R[k], jnp.float32), jnp.asarray(traj.t[k], jnp.float32))
        rel = se3.relative(se3.relative(G0, Gk), se3.Pose(out.pose_R, out.pose_t))
        final = float(jnp.linalg.norm(se3.se3_log(rel)))
        worst = max(worst, final)
    return worst, final


@pytest.mark.skipif(not os.path.isdir(REF_TEST_DIR), reason="reference GT absent")
def test_recorded_kitti00_fragment_trajectory():
    """Real KITTI-00 vehicle launch dynamics (reference GT fragment,
    test/kitti_00_fragment_gt.tum: ~6.7 m/s from the first frame) raycast
    through the sim world; per-pose gate 0.1 like the reference
    (test/test_lidar_odometry_rawlog.cpp:101-106)."""
    worst, _ = _run_on_recorded_gt("kitti_00_fragment_gt.tum")
    assert worst < 0.1, f"worst per-pose error {worst:.4f} on KITTI-00 GT motion"


@pytest.mark.skipif(not os.path.isdir(REF_TEST_DIR), reason="reference GT absent")
def test_recorded_rslidar_handheld_trajectory():
    """Real hand-held warehouse motion (reference GT, 23 poses with jerk —
    the deskew stressor, test/test_lidar_odometry_rosbag2.cpp:138-143)
    raycast through a cluttered indoor-scale world; per-pose gate 0.1."""
    worst, _ = _run_on_recorded_gt("rslidar_fragment_gt.tum", indoor=True)
    assert worst < 0.1, f"worst per-pose error {worst:.4f} on RSLIDAR GT motion"


def test_fast_probe_mode_tracks(monkeypatch):
    """8-probe capture (MOLA_TPU_NN_NEIGHBORS=8, the bench default): with
    top-2-per-voxel capture + the mid-align refresh, the 2x2x2 probe block
    must track as well as the full 3x3x3 (measured equal-or-better:
    worst 0.2833 vs 0.2847 on this sequence).  Guards the fast mode the
    throughput headline is measured in."""
    monkeypatch.setenv("MOLA_TPU_NN_NEIGHBORS", "8")
    traj, scans = sim.simulate_sequence(n_frames=12, dt=0.1, speed=2.0, noise=0.01)
    lo = LidarOdometry.from_yaml_file(PIPELINE, env={}, **TEST_OVERRIDES)
    assert lo.spec.icp_with_vel.nn_neighbors == 8
    G0 = se3.Pose(
        jnp.asarray(traj.R[0], jnp.float32), jnp.asarray(traj.t[0], jnp.float32)
    )
    worst = 0.0
    for k, (xyz, times, rings, valid) in enumerate(scans):
        out = lo.on_lidar_scan(
            xyz[valid], float(traj.stamps[k]), times=times[valid], ring=rings[valid]
        )
        Gk = se3.Pose(
            jnp.asarray(traj.R[k], jnp.float32), jnp.asarray(traj.t[k], jnp.float32)
        )
        rel = se3.relative(se3.relative(G0, Gk), se3.Pose(out.pose_R, out.pose_t))
        worst = max(worst, float(jnp.linalg.norm(se3.se3_log(rel))))
    assert worst < 0.3, f"8-probe mode tracking error {worst:.3f}"
