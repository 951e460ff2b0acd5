"""End-to-end test of the offline CLI app (sim dataset -> TUM + maps)."""

import os

import numpy as np
import pytest

PIPELINE = os.path.join(os.path.dirname(__file__), "..", "pipelines", "lidar3d-default.yaml")


def test_cli_sim_run(tmp_path):
    from mola_lidar_odometry_tpu.apps.cli import main

    out_tum = str(tmp_path / "out.tum")
    out_sm = str(tmp_path / "out.simplemap.npz")
    out_mm = str(tmp_path / "out.mm.npz")
    rc = main(
        [
            "-c", PIPELINE,
            "--input-sim", "6",
            "--raw-capacity", "16384",
            "--map-slots", "32768",
            "--output-tum-path", out_tum,
            "--output-simplemap", out_sm,
            "--output-local-map", out_mm,
            "-v", "ERROR",
        ]
    )
    assert rc == 0
    # TUM trajectory: 6 poses, 8 columns
    rows = np.loadtxt(out_tum)
    assert rows.shape == (6, 8)
    # GT exported next to it
    gt = np.loadtxt(out_tum + ".gt.tum")
    assert gt.shape[0] == 6

    # local map reloads with content
    from mola_lidar_odometry_tpu.utils.serialization import load_metric_map

    maps = load_metric_map(out_mm)
    assert "localmap" in maps and int(maps["localmap"].num_points()) > 0

    # simplemap reloads with at least the first keyframe + scan
    from mola_lidar_odometry_tpu.utils.serialization import load_simplemap

    kfs = load_simplemap(out_sm)
    assert len(kfs) >= 1
    assert kfs[0].scan_xyz is not None and kfs[0].scan_xyz.shape[1] == 3


def test_cli_rejects_multiple_inputs(tmp_path):
    from mola_lidar_odometry_tpu.apps.cli import main

    with pytest.raises(SystemExit):
        main(["-c", PIPELINE, "--input-sim", "2", "--input-paris-luco"])


def test_cli_requires_one_input():
    from mola_lidar_odometry_tpu.apps.cli import main

    with pytest.raises(SystemExit):
        main(["-c", PIPELINE])


def test_multisession_resume(tmp_path):
    """Save the local map, reload it into a fresh engine (multi-session)."""
    from mola_lidar_odometry_tpu.apps.cli import main

    out_mm = str(tmp_path / "session1.mm.npz")
    main(["-c", PIPELINE, "--input-sim", "3", "--raw-capacity", "16384",
          "--map-slots", "32768", "--output-local-map", out_mm, "-v", "ERROR"])

    from mola_lidar_odometry_tpu.models.odometry import LidarOdometry

    lo = LidarOdometry.from_yaml_file(
        PIPELINE, raw_capacity=16384, map_slots=32768
    )
    lo.load_local_map(out_mm)
    assert int(lo.carry.maps["localmap"].num_points()) > 0
