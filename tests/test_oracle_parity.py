"""TPU engine vs reference-exact float64 oracle — the BASELINE parity gate.

BASELINE.md demands "ATE/RPE within 1% of the C++ reference".  The C++
binaries are absent here, so ``mola_lidar_odometry_tpu.oracle`` implements
the reference's per-scan algorithm a second time with exact arithmetic
(f64, scipy cKDTree NN, unbounded voxel map, dense GN — see its module
docstring).  Both engines consume the SAME compiled OdometrySpec and the
SAME synthetic scans; this test gates:

  * per-pose: every TPU pose within 0.1 SE(3) log-norm of the oracle pose —
    the reference's own accuracy gate on its recorded fragments
    (/root/reference/test/test_lidar_odometry_rawlog.cpp:101-106);
  * trajectory: ATE-RMSE between the two engines < 1% of the path length.

A TPU-vs-oracle delta isolates exactly the TPU-imposed approximations
(f32, fixed hash capacities, 27-voxel probe footprint, capture-once
candidate caching) — the quantities the VERDICT asked to be measured.
"""

import os

import numpy as np
import pytest

from mola_lidar_odometry_tpu.models.odometry import LidarOdometry
from mola_lidar_odometry_tpu.models.spec import spec_from_yaml
from mola_lidar_odometry_tpu.oracle import OracleOdometry, relative, se3_log
from mola_lidar_odometry_tpu.utils import sim
from mola_lidar_odometry_tpu.utils.config import load_yaml_file

PIPELINE = os.path.join(os.path.dirname(__file__), "..", "pipelines", "lidar3d-default.yaml")

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

# long enough that the 1%-of-path ATE gate is meaningful (TPU-vs-oracle
# divergence saturates around 0.03 m — a map-composition offset, not drift)
N_FRAMES = 24


@pytest.fixture(scope="module")
def both_engines():
    traj, scans = sim.simulate_sequence(n_frames=N_FRAMES, dt=0.1, speed=2.0, noise=0.01)

    cfg = load_yaml_file(PIPELINE, env={})
    spec = spec_from_yaml(cfg, **TEST_OVERRIDES)

    oracle = OracleOdometry(spec)
    lo = LidarOdometry.from_yaml_file(PIPELINE, env={}, **TEST_OVERRIDES)
    tpu_poses, ora_poses = [], []
    for k, (xyz, times, rings, valid) in enumerate(scans):
        stamp = float(traj.stamps[k])
        out = lo.on_lidar_scan(xyz[valid], stamp=stamp, times=times[valid], ring=rings[valid])
        o = oracle.step(xyz[valid].astype(np.float64), times[valid].astype(np.float64), stamp)
        tpu_poses.append((np.asarray(out.pose_R, np.float64), np.asarray(out.pose_t, np.float64)))
        ora_poses.append((o.R, o.t))
        assert o.accepted, f"oracle rejected frame {k} (quality {o.quality})"
    return traj, tpu_poses, ora_poses


def test_per_pose_within_reference_gate(both_engines):
    _, tpu, ora = both_engines
    worst = 0.0
    for k, ((Rt, tt), (Ro, to)) in enumerate(zip(tpu, ora)):
        Rr, tr = relative(Ro, to, Rt, tt)
        err = float(np.linalg.norm(se3_log(Rr, tr)))
        worst = max(worst, err)
    assert worst < 0.1, f"worst TPU-vs-oracle SE(3) log-norm {worst:.4f}"


def test_ate_delta_below_1pct_of_path(both_engines):
    traj, tpu, ora = both_engines
    t_tpu = np.stack([t for _, t in tpu])
    t_ora = np.stack([t for _, t in ora])
    ate = float(np.sqrt(np.mean(np.sum((t_tpu - t_ora) ** 2, axis=1))))
    path = float(np.sum(np.linalg.norm(np.diff(traj.t, axis=0), axis=1)))
    assert ate < 0.01 * path, f"engine ATE-RMSE {ate:.4f} m vs 1% of path {0.01*path:.4f} m"


def test_oracle_tracks_ground_truth(both_engines):
    """Sanity: the oracle itself must track GT (otherwise parity is vacuous)."""
    traj, _, ora = both_engines
    R0, t0 = traj.R[0], traj.t[0]
    worst = 0.0
    for k, (Ro, to) in enumerate(ora):
        R_gt = R0.T @ traj.R[k]
        t_gt = R0.T @ (traj.t[k] - t0)
        Rr, tr = relative(R_gt, t_gt, Ro, to)
        worst = max(worst, float(np.linalg.norm(se3_log(Rr, tr))))
    assert worst < 0.25, f"oracle drifted from GT: {worst:.4f}"


@pytest.mark.slow
def test_high_speed_parity():
    """TPU vs oracle on a street-scale fast sequence (8 m/s target, the
    bench regime): the round-2 simulator realism work was validated by the
    two engines drifting IDENTICALLY on the old aliased world — this keeps
    that equivalence gated on the fixed world at speed."""
    n = 8
    world = sim.make_world(0, extent=60.0, n_boxes=60, n_plates=30)
    traj = sim.make_trajectory(n, dt=0.1, seed=1, speed=8.0)
    scans = [
        sim.simulate_scan(
            world, traj.R[k], traj.t[k], traj.twists[k],
            n_rings=32, n_azimuth=1024, fov_up_deg=10.0, fov_down_deg=-25.0,
            spin_period=0.1, noise=0.01, max_range=80.0, seed=100 + k,
        )
        for k in range(n)
    ]
    cfg = load_yaml_file(PIPELINE, env={})
    spec = spec_from_yaml(cfg, **TEST_OVERRIDES)
    oracle = OracleOdometry(spec)
    lo = LidarOdometry.from_yaml_file(PIPELINE, env={}, **TEST_OVERRIDES)
    worst = 0.0
    for k, (xyz, times, rings, valid) in enumerate(scans):
        stamp = float(traj.stamps[k])
        out = lo.on_lidar_scan(xyz[valid], stamp=stamp, times=times[valid], ring=rings[valid])
        o = oracle.step(xyz[valid].astype(np.float64), times[valid].astype(np.float64), stamp)
        Rr, tr = relative(o.R, o.t, np.asarray(out.pose_R, np.float64), np.asarray(out.pose_t, np.float64))
        worst = max(worst, float(np.linalg.norm(se3_log(Rr, tr))))
    assert worst < 0.1, f"high-speed TPU-vs-oracle divergence {worst:.4f}"
