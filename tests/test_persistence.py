"""YAML-driven session persistence: preload + exit-time auto-save.

Covers the reference's multi-session contract (LidarOdometry.cpp:465-476
preload of `load_existing_local_map` / `load_existing_simple_map`;
:84-111 exit-time save of trajectory / simplemap):

  * session 1 maps a synthetic sequence and saves its local map;
  * session 2 preloads that map via ``MOLA_LOAD_MM`` with
    ``MOLA_MAPPING_ENABLED=false`` and localizes against it — poses track
    ground truth while the map is never touched;
  * ``estimated_trajectory.save_to_file`` / ``simplemap.save_final_map_to_
    file`` are honored by ``close()`` without any explicit save calls.
"""

import os

import numpy as np

from mola_lidar_odometry_tpu.models.odometry import LidarOdometry
from mola_lidar_odometry_tpu.oracle import relative, se3_log
from mola_lidar_odometry_tpu.utils import sim

PIPELINE = os.path.join(os.path.dirname(__file__), "..", "pipelines", "lidar3d-default.yaml")

OVERRIDES = dict(
    raw_capacity=1 << 14,
    map_slots=1 << 16,
    layer_capacities={
        "raw": 1 << 14,
        "decimated_for_map_raw": 8192,
        "decimated_for_icp_skewed": 4096,
        "decimated_for_icp": 4096,
        "decimated_for_map": 8192,
    },
    kf_ring_capacity=64,
)

N1, N2 = 8, 4  # session-1 frames, session-2 frames


def _rot_to_ypr(R):
    yaw = np.arctan2(R[1, 0], R[0, 0])
    pitch = np.arcsin(np.clip(-R[2, 0], -1, 1))
    roll = np.arctan2(R[2, 1], R[2, 2])
    return yaw, pitch, roll


def test_two_session_mapping_then_localization(tmp_path):
    traj, scans = sim.simulate_sequence(n_frames=N1 + N2, dt=0.1, speed=2.0, noise=0.01)

    # ---- session 1: map the first N1 frames, save the local map ----
    lo1 = LidarOdometry.from_yaml_file(PIPELINE, env={}, **OVERRIDES)
    for k in range(N1):
        xyz, times, rings, valid = scans[k]
        lo1.on_lidar_scan(xyz[valid], stamp=float(traj.stamps[k]), times=times[valid], ring=rings[valid])
    mm_path = tmp_path / "session1.mm.npz"
    lo1.save_local_map(mm_path)
    final = lo1.trajectory[-1]
    R1 = np.asarray(lo1.carry.pose_R, np.float64)
    t1 = np.asarray(lo1.carry.pose_t, np.float64)
    map_pts_before = lo1.local_map_pointcloud()

    # ---- session 2: preload via MOLA_LOAD_MM, mapping disabled ----
    yaw, pitch, roll = _rot_to_ypr(R1)
    env = {
        "MOLA_LOAD_MM": str(mm_path),
        "MOLA_MAPPING_ENABLED": "false",
        "MOLA_INITIAL_LOCALIZATION_ENABLED": "true",
        "MOLA_INITIAL_X": str(t1[0]),
        "MOLA_INITIAL_Y": str(t1[1]),
        "MOLA_INITIAL_Z": str(t1[2]),
        "MOLA_INITIAL_YAW": str(yaw),
        "MOLA_INITIAL_PITCH": str(pitch),
        "MOLA_INITIAL_ROLL": str(roll),
    }
    lo2 = LidarOdometry.from_yaml_file(PIPELINE, env=env, **OVERRIDES)
    assert not bool(np.asarray(lo2.carry.maps["localmap"].is_empty())), "map preloaded"

    outs = []
    for k in range(N1, N1 + N2):
        xyz, times, rings, valid = scans[k]
        outs.append(
            lo2.on_lidar_scan(xyz[valid], stamp=float(traj.stamps[k]), times=times[valid], ring=rings[valid])
        )

    # localization-only: every scan accepted, none ever updates the map
    assert all(bool(o.accepted) for o in outs)
    assert not any(bool(o.kf_local) for o in outs)
    np.testing.assert_allclose(
        lo2.local_map_pointcloud(), map_pts_before, err_msg="map must stay frozen"
    )

    # poses continue session 1's trajectory: session 2 inherits session 1's
    # final-estimate drift, so compare against GT *increments* composed onto
    # that estimate: expected_k = est1_final o (GT_{N1-1}^-1 GT_k)
    for i, o in enumerate(outs):
        k = N1 + i
        Rg, tg = relative(traj.R[N1 - 1], traj.t[N1 - 1], traj.R[k], traj.t[k])
        R_exp = R1 @ Rg
        t_exp = R1 @ tg + t1
        Rr, tr = relative(R_exp, t_exp, np.asarray(o.pose_R, np.float64), np.asarray(o.pose_t, np.float64))
        err = float(np.linalg.norm(se3_log(Rr, tr)))
        assert err < 0.15, f"session-2 frame {i}: localization error {err:.3f}"


def test_exit_time_autosave(tmp_path):
    traj, scans = sim.simulate_sequence(n_frames=4, dt=0.1, speed=2.0, noise=0.01)
    tum_path = tmp_path / "traj.tum"
    sm_path = tmp_path / "final.simplemap"
    env = {
        "MOLA_SAVE_TRAJECTORY": "true",
        "MOLA_TUM_TRAJECTORY_OUTPUT": str(tum_path),
        "MOLA_GENERATE_SIMPLEMAP": "true",
        "MOLA_SIMPLEMAP_OUTPUT": str(sm_path),
    }
    lo = LidarOdometry.from_yaml_file(PIPELINE, env=env, **OVERRIDES)
    for k in range(4):
        xyz, times, rings, valid = scans[k]
        lo.on_lidar_scan(xyz[valid], stamp=float(traj.stamps[k]), times=times[valid], ring=rings[valid])
    lo.close()
    assert tum_path.exists() and len(tum_path.read_text().strip().splitlines()) == 4
    from mola_lidar_odometry_tpu.utils.serialization import load_simplemap

    kfs = load_simplemap(sm_path)
    assert len(kfs) >= 1
    lo.close()  # idempotent
