"""Cross-pipeline accuracy table on a shared street-scale simulated sequence.

Drives every bundled pipeline configuration over the SAME simulated
sequence and reports the worst gauge-aligned SE(3) log-norm error per
pipeline (the table in docs/benchmarks.md).

The world/sensor are street-scale on purpose: the extras configs carry the
reference's real-street constants (5 m minimum range, +-5 m bounding-box
vehicle cull, 0.75-1.5 m decimation, near/far split) — reference
pipelines/extras/lidar3d-near-far.yaml:177-353 — so a toy 25 m world with a
sparse 16-ring sensor starves them.  The sequence is bench.py's exact
world and HDL-64-like sensor at up to 8 m/s.

Usage: python eval/cross_pipeline.py [--frames 12] [--pipelines a.yaml ...]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "pipelines")

PIPELINES = [
    "lidar3d-default.yaml",
    "lidar3d-ndt.yaml",
    "rgbd.yaml",
    os.path.join("extras", "lidar3d-kissicp-like.yaml"),
    os.path.join("extras", "lidar3d-dual-map.yaml"),
    os.path.join("extras", "lidar3d-near-far.yaml"),
    os.path.join("extras", "lidar3d-edges.yaml"),
    os.path.join("extras", "lidar3d-intensity.yaml"),
]

CAPS = dict(
    raw_capacity=1 << 17,  # 64x2048 scan = 131072 points exactly
    map_slots=1 << 17,
    layer_capacities={"raw": 1 << 17},  # others take filter_graph defaults
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--pipelines", nargs="*", default=PIPELINES)
    ap.add_argument("--accel", type=float, default=3.0)
    args = ap.parse_args()

    import jax.numpy as jnp

    from mola_lidar_odometry_tpu.models.odometry import LidarOdometry
    from mola_lidar_odometry_tpu.ops import se3
    from mola_lidar_odometry_tpu.utils import sim

    # bench.py's exact world/sensor: dense street geometry + an HDL-64-like
    # scanner — the shared sequence must be one the real-street constants in
    # the extras configs were tuned for, AND dense enough to support 8 m/s
    # (a 32-ring scan in this narrow fov cannot track that speed; measured)
    world = sim.make_world(0, extent=60.0, n_boxes=100, n_plates=50)
    traj = sim.make_trajectory(args.frames, dt=0.1, seed=1, speed=8.0, accel=args.accel)
    scans = [
        sim.simulate_scan(
            world, traj.R[k], traj.t[k], traj.twists[k],
            n_rings=64, n_azimuth=2048, fov_up_deg=3.0, fov_down_deg=-24.0,
            spin_period=0.1, noise=0.01, max_range=80.0, seed=1000 + k,
        )
        for k in range(args.frames)
    ]
    rng = np.random.default_rng(0)
    intens = [rng.uniform(0, 100, s[0].shape[0]).astype(np.float32) for s in scans]
    G0 = se3.Pose(
        jnp.asarray(traj.R[0], jnp.float32), jnp.asarray(traj.t[0], jnp.float32)
    )

    rows = []
    for name in args.pipelines:
        lo = LidarOdometry.from_yaml_file(os.path.join(ROOT, name), **CAPS)
        worst = 0.0
        for k, (xyz, times, rings, valid) in enumerate(scans):
            out = lo.on_lidar_scan(
                xyz[valid],
                float(traj.stamps[k]),
                times=times[valid],
                ring=rings[valid],
                intensity=intens[k][valid],
            )
            Gk = se3.Pose(
                jnp.asarray(traj.R[k], jnp.float32),
                jnp.asarray(traj.t[k], jnp.float32),
            )
            e = float(
                jnp.linalg.norm(
                    se3.se3_log(
                        se3.relative(
                            se3.relative(G0, Gk), se3.Pose(out.pose_R, out.pose_t)
                        )
                    )
                )
            )
            worst = max(worst, e)
            print(
                f"  {name} f{k}: q={float(out.quality):.3f} "
                f"iters={int(out.iterations)} err={e:.4f}",
                file=sys.stderr,
            )
        rows.append((name, worst))
        print(f"{name}: worst={worst:.3f}", flush=True)

    print("\n| pipeline | worst error |")
    print("|---|---|")
    for name, worst in sorted(rows, key=lambda r: r[1]):
        print(f"| {name} | {worst:.3f} |")


if __name__ == "__main__":
    main()
