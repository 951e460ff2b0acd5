"""Collective-cost accounting of the point-sharded fleet step.

VERDICT round-2 weak item 7: the ``point`` mesh axis was correctness-proven
(dryrun) but its GSPMD collective cost was never accounted.  Real multi-chip
hardware is unavailable here, so this probe compiles the sharded fleet step
on a virtual CPU mesh and reads the *optimized* HLO: every collective op
(all-reduce / all-gather / reduce-scatter / collective-permute / all-to-all),
its element count, and the bytes it moves per step.  That is exactly the ICI
traffic a real mesh would pay (GSPMD inserts the same collectives
independently of the backend), so fleet-vs-point sharding decisions become
evidence-based.

Usage: python eval/shard_cost.py [--devices 8] [--point 2]
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

_DTYPE_BYTES = {
    "f32": 4, "f64": 8, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "s64": 8, "u64": 8, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(sig: str) -> int:
    """Total bytes of all shapes in an HLO result signature."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(sig):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--point", type=int, default=2)
    ap.add_argument("--raw-capacity", type=int, default=4096)
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from mola_lidar_odometry_tpu.models.spec import spec_from_yaml
    from mola_lidar_odometry_tpu.parallel import batch as pb
    from mola_lidar_odometry_tpu.utils.config import load_yaml_file

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    cfg = load_yaml_file(os.path.join(here, "pipelines", "lidar3d-default.yaml"), env={})
    cap = args.raw_capacity
    spec = spec_from_yaml(
        cfg,
        raw_capacity=cap,
        map_slots=1 << 13,
        layer_capacities={
            "raw": cap,
            "decimated_for_map_raw": cap // 2,
            "decimated_for_icp_skewed": cap // 4,
            "decimated_for_icp": cap // 4,
            "decimated_for_map": cap // 2,
        },
        kf_ring_capacity=64,
    )

    def account(hlo: str) -> dict:
        ops = collections.Counter()
        byts = collections.Counter()
        for line in hlo.splitlines():
            m = re.search(r"=\s*(\S+)\s+(all-reduce|all-gather|reduce-scatter|"
                          r"collective-permute|all-to-all)\(", line)
            if m:
                ops[m.group(2)] += 1
                byts[m.group(2)] += _shape_bytes(m.group(1))
        return {
            "collectives": dict(ops),
            "bytes_per_step": dict(byts),
            "total_collective_bytes": sum(byts.values()),
        }

    report = {}
    for point in (1, args.point):
        mesh = pb.make_mesh(args.devices, point_axis=point)
        step, carry0, _ = pb.make_sharded_fleet_step(spec, mesh)
        scan0 = pb._dummy_scan(spec, mesh.shape["fleet"])
        report[f"gspmd fleet={mesh.shape['fleet']}xpoint={point}"] = account(
            step.lower(carry0, scan0).compile().as_text()
        )

    mesh = pb.make_mesh(args.devices, point_axis=1)
    step, carry0 = pb.make_shardmap_fleet_step(spec, mesh)
    scan0 = pb._dummy_scan(spec, mesh.shape["fleet"])
    sm = account(step.lower(carry0, scan0).compile().as_text())
    report[f"shard_map fleet={mesh.shape['fleet']}"] = sm

    assert sm["total_collective_bytes"] == 0, (
        "the shard_map fleet path must be collective-free: "
        f"{sm['collectives']}"
    )
    report["verdict"] = (
        "shard_map fleet path: 0 collective bytes/step (chip-local by "
        "construction) — the production deployment.  GSPMD jit paths pay "
        "all-gathers of the flat map tables; keep them for the point axis."
    )
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
