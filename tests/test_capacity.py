"""Capacity-pressure counters + accuracy-saturation sweep (SURVEY §7 #1).

The fixed-capacity hash maps silently dropped points in round 1; now every
insert reports ``collision_drops`` (slot contention — table undersized) and
``full_drops`` (per-voxel cap reached — benign saturation), surfaced in
``StepOutput`` and the debug-trace CSV.  The sweep shows accuracy saturates
at the shipped default ``map_slots`` — making fleet capacity tuning
evidence-based instead of hopeful.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from mola_lidar_odometry_tpu.models.odometry import LidarOdometry
from mola_lidar_odometry_tpu.ops import voxel_hash as vh
from mola_lidar_odometry_tpu.ops.pointcloud import PointCloud
from mola_lidar_odometry_tpu.utils import sim

PIPELINE = os.path.join(os.path.dirname(__file__), "..", "pipelines", "lidar3d-default.yaml")


class TestInsertStats:
    def test_no_pressure_counts_zero(self):
        m = vh.VoxelHashMap.create(256, 4, 1.0)
        pts = np.array([[0.5, 0.5, 0.5], [10.5, 0.5, 0.5], [20.5, 0.5, 0.5]], np.float32)
        m, st = vh.insert_stats(m, PointCloud.from_xyz(pts))
        assert int(st.collision_drops) == 0
        assert int(st.full_drops) == 0
        assert int(m.num_points()) == 3

    def test_full_voxel_counts_drops(self):
        m = vh.VoxelHashMap.create(256, 2, 1.0)  # cap K=2
        pts = np.stack([np.full(5, 0.2), np.linspace(0.1, 0.9, 5), np.full(5, 0.5)], 1).astype(np.float32)
        m, st = vh.insert_stats(m, PointCloud.from_xyz(pts))
        assert int(st.full_drops) == 3  # 5 points, cap 2
        assert int(st.collision_drops) == 0
        assert int(m.num_points()) == 2

    def test_slot_collision_counts_drops(self):
        # 1-slot table: every distinct voxel collides with the first
        m = vh.VoxelHashMap.create(1, 8, 1.0)
        pts = np.array([[0.5, 0.5, 0.5], [10.5, 0.5, 0.5], [20.5, 0.5, 0.5]], np.float32)
        m, st = vh.insert_stats(m, PointCloud.from_xyz(pts))
        assert int(st.collision_drops) == 2
        assert int(m.num_points()) == 1


OVERRIDES = dict(
    raw_capacity=1 << 14,
    layer_capacities={
        "raw": 1 << 14,
        "decimated_for_map_raw": 8192,
        "decimated_for_icp_skewed": 4096,
        "decimated_for_icp": 4096,
        "decimated_for_map": 8192,
    },
    kf_ring_capacity=64,
)


def _run(map_slots: int, traj, scans, n):
    lo = LidarOdometry.from_yaml_file(PIPELINE, env={}, map_slots=map_slots, **OVERRIDES)
    collisions, worst = 0, 0.0
    from mola_lidar_odometry_tpu.oracle import relative, se3_log

    R0, t0 = traj.R[0], traj.t[0]
    for k in range(n):
        xyz, times, rings, valid = scans[k]
        out = lo.on_lidar_scan(xyz[valid], stamp=float(traj.stamps[k]), times=times[valid], ring=rings[valid])
        collisions += int(out.map_collision_drops)
        R_gt, t_gt = R0.T @ traj.R[k], R0.T @ (traj.t[k] - t0)
        Rr, tr = relative(R_gt, t_gt, np.asarray(out.pose_R, np.float64), np.asarray(out.pose_t, np.float64))
        worst = max(worst, float(np.linalg.norm(se3_log(Rr, tr))))
    return collisions, worst


@pytest.mark.slow
def test_capacity_sweep_saturates():
    n = 8
    traj, scans = sim.simulate_sequence(n_frames=n, dt=0.1, speed=2.0, noise=0.01)
    col_tiny, worst_tiny = _run(1 << 10, traj, scans, n)  # starved table
    col_def, worst_def = _run(1 << 17, traj, scans, n)  # production default
    col_big, worst_big = _run(1 << 18, traj, scans, n)  # 2x headroom

    # a starved table must REPORT its pressure (the round-1 gap: no signal),
    # and pressure must fall monotonically as the table grows.  (Weak
    # inequality on the upper rungs: the round-4 packed-point layout made
    # every bucket row 4-way associative, which drives collision drops at
    # the production default all the way to zero on this world.)
    assert col_tiny > col_def >= col_big >= 0, (col_tiny, col_def, col_big)
    # accuracy has saturated at the production default (1<<17, what
    # bench.py ships): residual birthday-bound collisions there change
    # nothing measurable vs doubling the slots.  (The rough-ground world
    # carries ~2x the live voxels of the old flat one, which moved the
    # saturation point up from 1<<16.)
    assert abs(worst_def - worst_big) < 0.02, (worst_def, worst_big)
    assert worst_def <= worst_tiny + 0.02


class TestAutoCapacity:
    """VERDICT-7 sizing policy: zero-tuning runs stay under the 0.1% drop
    budget on a world that is NOT the bench world."""

    def test_zero_tuning_drops_below_budget(self):
        world = sim.make_world(7, extent=35.0, n_boxes=140, n_plates=60)
        traj = sim.make_trajectory(8, dt=0.1, seed=9, speed=3.0)
        scans = [
            sim.simulate_scan(
                world, traj.R[k], traj.t[k], traj.twists[k],
                n_rings=32, n_azimuth=512, fov_up_deg=12.0, fov_down_deg=-20.0,
                spin_period=0.1, noise=0.01, max_range=60.0, seed=77 + k,
            )
            for k in range(8)
        ]
        lo = LidarOdometry.from_yaml_file(PIPELINE)  # NO capacity overrides
        drops = inserts = 0
        for k, (xyz, times, rings, valid) in enumerate(scans):
            out = lo.on_lidar_scan(
                xyz[valid], float(traj.stamps[k]), times=times[valid], ring=rings[valid]
            )
            drops += int(out.map_collision_drops)
            inserts += int(out.n_map_layer)
        assert float(out.quality) > 0.9
        ratio = drops / max(inserts, 1)
        assert ratio < 0.001, f"collision drops {100*ratio:.3f}% of inserts"
        # the dry pass actually derived the sizes (not the env defaults);
        # raw gets 1.25x headroom over the first scan, rounded to 8k
        # (16384 pts -> 24576, round-4 policy: no pow2 doubling)
        assert lo.spec.raw_capacity == 24576
        # map table = next_pow2(first-scan voxel estimate * MAP_SLOTS_FACTOR);
        # assert the derived size tracks the policy factor (16 since round 5 —
        # factor 32 doubled gather cost for no drop-budget gain), not a
        # hard-coded round-4 literal.
        from mola_lidar_odometry_tpu.utils import capacity as cap
        assert lo.spec.map_layers[0].num_slots >= (1 << 16) * cap.MAP_SLOTS_FACTOR // 32

    def test_layer_capacities_not_saturated(self):
        traj, scans = sim.simulate_sequence(4, n_rings=16, n_azimuth=384)
        lo = LidarOdometry.from_yaml_file(PIPELINE, auto_capacity=True)
        for k, (xyz, times, rings, valid) in enumerate(scans):
            out = lo.on_lidar_scan(
                xyz[valid], float(traj.stamps[k]), times=times[valid], ring=rings[valid]
            )
            caps = lo.spec.layer_capacities
            assert int(out.n_icp_layer) < caps["decimated_for_icp"]
            assert int(out.n_map_layer) < caps["decimated_for_map"]

    def test_explicit_overrides_disable_auto(self):
        lo = LidarOdometry.from_yaml_file(PIPELINE, map_slots=1 << 14)
        assert getattr(lo, "_auto_cfg", None) is None
