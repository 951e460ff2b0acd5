"""Smoke tests: every bundled pipeline YAML builds and runs end-to-end.

Mirrors the reference's per-pipeline configuration coverage (SURVEY.md §2.2).
Each config is loaded through the full YAML -> spec -> jitted-step path and
driven for a few simulated frames; asserts the engine stays alive, produces
finite poses, and (where applicable) populates its map layers.
"""

import os

import numpy as np
import pytest

from mola_lidar_odometry_tpu.models.odometry import LidarOdometry
from mola_lidar_odometry_tpu.utils import sim

ROOT = os.path.join(os.path.dirname(__file__), "..", "pipelines")

TINY = dict(
    raw_capacity=1 << 13,
    map_slots=1 << 14,
    layer_capacities={
        "raw": 1 << 13,
        # generous defaults are overridden to keep CPU compiles fast
        **{
            name: 2048
            for name in (
                "decimated", "decimated_pre", "deskewed", "filtered",
                "decimated_for_map", "decimated_for_icp",
                "decimated_for_map_raw", "decimated_for_map_by_range",
                "decimated_for_map_skewed", "decimated_for_icp_skewed",
                "decimated_for_icp_near_skewed", "decimated_for_map_near_skewed",
                "decimated_for_map_far_skewed", "decimated_for_icp_far_skewed",
                "decimated_for_map_near", "decimated_for_icp_near",
                "decimated_for_map_far", "decimated_for_icp_far",
                "near", "far", "range_filtered",
                "large_curvature", "smaller_curvature",
                "decimated_for_map_large_curvature", "decimated_for_icp_large_curvature",
                "decimated_for_map_smaller_curvature", "decimated_for_icp_smaller_curvature",
                "decimated_for_map_bright",
                "edges", "planes", "edges_for_map", "edges_for_icp",
                "planes_for_map", "planes_for_icp",
            )
        },
    },
)

PIPELINES_3D = [
    "lidar3d-default.yaml",
    "lidar3d-ndt.yaml",
    os.path.join("extras", "lidar3d-kissicp-like.yaml"),
    os.path.join("extras", "lidar3d-dual-map.yaml"),
    os.path.join("extras", "lidar3d-near-far.yaml"),
    os.path.join("extras", "lidar3d-edges.yaml"),
    os.path.join("extras", "lidar3d-intensity.yaml"),
    "rgbd.yaml",
]


def drive(lo: LidarOdometry, scans, stamps, intensities=None):
    outs = []
    for k, (xyz, times, rings, valid) in enumerate(scans):
        inten = None if intensities is None else intensities[k][valid]
        outs.append(
            lo.on_lidar_scan(
                xyz[valid], stamps[k], times=times[valid], ring=rings[valid],
                intensity=inten,
            )
        )
    return outs


@pytest.fixture(scope="module")
def sim_seq():
    traj, scans = sim.simulate_sequence(3, n_rings=16, n_azimuth=256)
    return traj, scans


@pytest.mark.parametrize("name", PIPELINES_3D)
def test_pipeline_runs(name, sim_seq):
    traj, scans = sim_seq
    lo = LidarOdometry.from_yaml_file(os.path.join(ROOT, name), **TINY)
    rng = np.random.default_rng(0)
    intensities = [rng.uniform(0, 100, s[0].shape[0]).astype(np.float32) for s in scans]
    outs = drive(lo, scans, traj.stamps, intensities)
    for out in outs:
        assert np.all(np.isfinite(np.asarray(out.pose_t)))
    # first frame must have created the local map layers
    assert any(
        int(m.num_voxels()) > 0 for m in lo.carry.maps.values()
    ), f"{name}: no map content after 3 frames"


def test_lidar2d_pipeline_runs():
    # 2D scanner: single-ring horizontal scan, planar motion
    world = sim.make_world(3, extent=25.0, n_boxes=40, n_plates=30)
    traj = sim.make_trajectory(3, dt=0.1, seed=4, speed=1.0, z=0.3)
    scans = [
        sim.simulate_scan(
            world, traj.R[k], traj.t[k], traj.twists[k],
            n_rings=1, n_azimuth=720, fov_up_deg=0.0, fov_down_deg=0.0,
            spin_period=0.1, max_range=30.0, seed=50 + k,
        )
        for k in range(3)
    ]
    lo = LidarOdometry.from_yaml_file(os.path.join(ROOT, "lidar2d.yaml"), **TINY)
    assert lo.spec.pin_se2
    outs = drive(lo, scans, traj.stamps)
    for out in outs:
        t = np.asarray(out.pose_t)
        assert np.all(np.isfinite(t))
        assert abs(float(t[2])) < 0.2  # SE(2) pinning keeps z near 0
    assert int(lo.carry.maps["localmap"].num_voxels()) > 0


def test_no_motion_model_icp_block():
    """The Horn+GN ICP block plugs in as icp_settings_without_vel."""
    from mola_lidar_odometry_tpu.utils.config import load_yaml_file
    from mola_lidar_odometry_tpu.models.spec import spec_from_yaml

    cfg = load_yaml_file(os.path.join(ROOT, "lidar3d-default.yaml"), env={})
    icp_blk = load_yaml_file(
        os.path.join(ROOT, "extras", "icp-pipeline_no_motion_model.yaml"), env={}
    )
    cfg["icp_settings_without_vel"] = icp_blk
    spec = spec_from_yaml(cfg, **TINY)
    assert spec.icp_without_vel.horn is not None
    assert spec.icp_without_vel.matchers[0].threshold.const_value() == 4.0
