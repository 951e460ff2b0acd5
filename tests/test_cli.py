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


def test_metric_map_roundtrip_without_npz_extension(tmp_path):
    """save('map.mm') + load('map.mm') must agree even though np.savez
    appends '.npz' (ADVICE round 1)."""
    import jax.numpy as jnp

    from mola_lidar_odometry_tpu.ops.pointcloud import PointCloud
    from mola_lidar_odometry_tpu.ops.voxel_hash import VoxelHashMap, insert
    from mola_lidar_odometry_tpu.utils.serialization import (
        load_metric_map,
        save_metric_map,
    )

    m = VoxelHashMap.create(1 << 8, 4, 0.5)
    m = insert(m, PointCloud.from_xyz(jnp.asarray([[0.1, 0.2, 0.3], [5.0, 5.0, 5.0]])))
    path = str(tmp_path / "session.mm")  # no .npz
    save_metric_map(path, m)
    maps = load_metric_map(path)
    assert int(maps["localmap"].num_points()) == int(m.num_points())


def test_localization_only_mode(tmp_path):
    """Mapping disabled + preloaded map = localization-only session
    (reference MOLA_MAPPING_ENABLED / load_existing_local_map)."""

    from mola_lidar_odometry_tpu.models.odometry import LidarOdometry
    from mola_lidar_odometry_tpu.utils import sim

    overrides = dict(
        raw_capacity=16384, map_slots=32768,
        layer_capacities={"raw": 16384, "decimated_for_map_raw": 8192,
                          "decimated_for_icp_skewed": 4096, "decimated_for_icp": 4096,
                          "decimated_for_map": 8192},
    )
    traj, scans = sim.simulate_sequence(6, n_rings=16, n_azimuth=512)

    # session 1: build and save a map
    lo1 = LidarOdometry.from_yaml_file(PIPELINE, **overrides)
    for k, (xyz, times, rings, valid) in enumerate(scans[:4]):
        lo1.on_lidar_scan(xyz[valid], traj.stamps[k], times=times[valid])
    mm = str(tmp_path / "session.mm.npz")
    lo1.save_local_map(mm)

    # session 2: mapping off, localize against the loaded map
    import os
    os.environ["MOLA_MAPPING_ENABLED"] = "false"
    try:
        lo2 = LidarOdometry.from_yaml_file(PIPELINE, **overrides)
    finally:
        del os.environ["MOLA_MAPPING_ENABLED"]
    assert not lo2.spec.local_map_updates.enabled
    lo2.load_local_map(mm)
    n_before = int(lo2.carry.maps["localmap"].num_points())
    outs = []
    for k, (xyz, times, rings, valid) in enumerate(scans[4:6]):
        outs.append(lo2.on_lidar_scan(xyz[valid], traj.stamps[4 + k], times=times[valid]))
    # map unchanged (no inserts), poses still produced and accepted
    assert int(lo2.carry.maps["localmap"].num_points()) == n_before
    assert all(bool(o.accepted) for o in outs)


def test_icplog_viewer(tmp_path):
    import numpy as np

    from mola_lidar_odometry_tpu.apps.icplog_viewer import main as viewer_main
    from mola_lidar_odometry_tpu.utils.icp_log import IcpLogWriter

    w = IcpLogWriter(directory=str(tmp_path), decimation=1)
    assert w.want_frame()
    p = w.log(
        frame_idx=0, stamp=1.5,
        poses_R=np.broadcast_to(np.eye(3), (5, 3, 3)),
        poses_t=np.cumsum(np.full((5, 3), 0.1), axis=0),
        paired=np.asarray([100, 120, 130, 131, 131]),
        quality=0.9, iterations=5,
    )
    out = str(tmp_path / "view.png")
    rc = viewer_main([str(p), "-o", out])
    assert rc == 0 and (tmp_path / "view.png").exists()


def test_cli_kitti_layout_end_to_end(tmp_path, monkeypatch):
    """The full real-dataset flow: KITTI directory tree -> CLI -> TUM + GT,
    exercising the native decoder when built."""
    from tests.test_datasets import make_kitti_tree

    from mola_lidar_odometry_tpu.apps.cli import main

    # bigger synthetic frames so the pipeline has something to chew
    make_kitti_tree(tmp_path, n_frames=3, n_pts=3000)
    monkeypatch.setenv("KITTI_BASE_DIR", str(tmp_path))
    out_tum = str(tmp_path / "kitti.tum")
    rc = main([
        "-c", PIPELINE, "--input-kitti-seq", "00",
        "--raw-capacity", "8192", "--map-slots", "16384",
        "--output-tum-path", out_tum, "-v", "ERROR",
    ])
    assert rc == 0
    rows = np.loadtxt(out_tum)
    assert rows.shape == (3, 8)
    gt = np.loadtxt(out_tum + ".gt.tum")
    assert gt.shape == (3, 8)
