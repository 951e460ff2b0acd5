"""Live HTTP viewer (utils/live_viz.py): the reference GUI's surface —
stats block, map snapshot, pause/resume, save-map — served over HTTP
(reference module/src/LidarOdometry.cpp:1637-2077)."""

import json
import os
import urllib.request

import numpy as np

from mola_lidar_odometry_tpu.models.odometry import LidarOdometry
from mola_lidar_odometry_tpu.utils import sim
from mola_lidar_odometry_tpu.utils.live_viz import LiveViewer

PIPELINE = os.path.join(
    os.path.dirname(__file__), "..", "pipelines", "lidar3d-default.yaml"
)
TINY = dict(
    raw_capacity=1 << 12,
    map_slots=1 << 13,
    layer_capacities={
        "raw": 1 << 12,
        **{n: 1024 for n in (
            "decimated_for_map_raw", "decimated_for_icp_skewed",
            "decimated_for_icp", "decimated_for_map",
        )},
    },
)


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.status, r.read()


def test_live_viewer_serves_run(tmp_path):
    traj, scans = sim.simulate_sequence(3, n_rings=8, n_azimuth=128)
    lo = LidarOdometry.from_yaml_file(PIPELINE, env={}, **TINY)
    viewer = LiveViewer(lo, every_n=1)
    port = viewer.start(port=0)  # any free port
    try:
        # page + stats served before any frame
        code, body = _get(port, "/")
        assert code == 200 and b"live run" in body
        code, body = _get(port, "/stats.json")
        stats = json.loads(body)
        assert stats["frames"] == 0

        for k, (xyz, times, rings, valid) in enumerate(scans):
            lo.on_lidar_scan(
                xyz[valid], float(traj.stamps[k]),
                times=times[valid], ring=rings[valid],
            )
            viewer.on_frame()

        code, body = _get(port, "/snapshot.png")
        assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
        code, body = _get(port, "/stats.json")
        stats = json.loads(body)
        assert stats["frames"] == 3 and stats["icp_quality"] > 0

        # controls: pause flag + queued save executed on the next frame
        assert _get(port, "/pause")[0] == 200
        assert json.loads(_get(port, "/stats.json")[1])["paused"] is True
        assert _get(port, "/resume")[0] == 200
        save_path = tmp_path / "live.mm.npz"
        code, _ = _get(port, f"/save_map?path={save_path}")
        assert code == 200
        xyz, times, rings, valid = scans[0]
        lo.on_lidar_scan(
            xyz[valid], float(traj.stamps[-1]) + 0.1,
            times=times[valid], ring=rings[valid],
        )
        viewer.on_frame()
        assert save_path.exists()
    finally:
        viewer.stop()


def test_gui_toggles_and_save_roundtrip(tmp_path):
    """Reference GUI parity (VERDICT-10): active & mapping toggles + save
    buttons wired through the enqueue_request path, with a save round-trip."""
    traj, scans = sim.simulate_sequence(6, n_rings=8, n_azimuth=128)
    lo = LidarOdometry.from_yaml_file(PIPELINE, env={}, **TINY)
    viewer = LiveViewer(lo, every_n=100)
    port = viewer.start(port=0)

    def feed(k):
        xyz, times, rings, valid = scans[k]
        out = lo.on_lidar_scan(
            xyz[valid], float(traj.stamps[k]), times=times[valid], ring=rings[valid]
        )
        viewer.on_frame()
        return out

    try:
        feed(0)
        feed(1)
        stats = json.loads(_get(port, "/stats.json")[1])
        assert stats["active"] is True and stats["mapping"] is True
        assert "speed_mps" in stats and "hz" in stats

        # mapping toggle: queued, applied on the next frame boundary
        assert _get(port, "/toggle_mapping")[0] == 200
        feed(2)
        assert lo.mapping_enabled is False
        pts_before = int(lo.carry.maps["localmap"].num_points())
        out = feed(3)
        assert bool(out.kf_local) is False  # localization-only: no map update
        assert int(lo.carry.maps["localmap"].num_points()) == pts_before
        assert _get(port, "/toggle_mapping")[0] == 200
        feed(4)
        assert lo.mapping_enabled is True

        # active toggle: observations discarded at the module
        assert _get(port, "/toggle_active")[0] == 200
        assert lo.active is False
        xyz, times, rings, valid = scans[5]
        assert lo.on_lidar_scan(xyz[valid], float(traj.stamps[5])) is None
        assert _get(port, "/toggle_active")[0] == 200
        assert lo.active is True

        # save-trajectory round-trip through the queue
        tum = tmp_path / "live.tum"
        assert _get(port, f"/save_trajectory?path={tum}")[0] == 200
        feed(5)
        assert tum.exists()
        lines = tum.read_text().strip().splitlines()
        assert len([l for l in lines if l and not l.startswith("#")]) >= 4
    finally:
        viewer.stop()


def test_3d_view_endpoints():
    """/view3d (self-contained WebGL scene) + /points.json payload."""
    traj, scans = sim.simulate_sequence(2, n_rings=8, n_azimuth=128)
    lo = LidarOdometry.from_yaml_file(PIPELINE, env={}, **TINY)
    viewer = LiveViewer(lo, every_n=100)
    port = viewer.start(port=0)
    try:
        for k, (xyz, times, rings, valid) in enumerate(scans):
            lo.on_lidar_scan(
                xyz[valid], float(traj.stamps[k]), times=times[valid], ring=rings[valid]
            )
            viewer.on_frame()
        code, body = _get(port, "/view3d")
        assert code == 200 and b"webgl" in body.lower()
        assert b"http://" not in body and b"https://" not in body  # no external assets
        code, body = _get(port, "/points.json")
        d = json.loads(body)
        assert len(d["map"]) % 3 == 0 and len(d["map"]) > 0
        assert len(d["traj"]) == 3 * len(lo.trajectory)
        assert len(d["pose"]) == 3 and d["zmax"] >= d["zmin"]
    finally:
        viewer.stop()
