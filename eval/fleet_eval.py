"""Batched fleet evaluation — the TPU-native replacement for GNU parallel.

The reference parallelizes dataset sequences with ``parallel -j N`` across
CPU processes (reference eval/cli_kitti.sh:23; SURVEY.md §2.4).  Here the
same fan-out runs as ONE SPMD program: B independent odometry instances are
vmapped over a stacked carry and driven by ``lax.scan`` over the scan
sequence, optionally sharded over a device mesh (parallel/batch.py).

Each instance gets a different simulated world/trajectory (seed offset), so
this doubles as the 64-way datagen mode from BASELINE.md.  Reports
per-instance gauge-aligned ATE-RMSE vs the simulator ground truth and fleet
throughput.

Usage:
    python eval/fleet_eval.py --batch 8 --frames 25 [--rings 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def auto_batch(n_scan_points: int, lo: int = 8, hi: int = 64) -> int:
    """Inverse-batch policy (round-3 VERDICT item 9): per-step instruction
    floors (sort ~2.5 ms, per-gather fixed costs) do not shrink with scan
    size, so small-scan fleets waste the chip at the headline B=8.  Scale
    the instance count so the total points per step stay near the headline
    working set (B=8 x 131k points), clamped to [8, 64]."""
    ref_points = 8 * (1 << 17)
    b = max(1, ref_points // max(n_scan_points, 1))
    # round down to a power of two for friendly mesh factorizations
    b = 1 << (b.bit_length() - 1)
    return max(lo, min(hi, b))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--batch", type=int, default=0,
        help="fleet width; 0 = auto (inverse with scan size, see auto_batch)",
    )
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--rings", type=int, default=32)
    ap.add_argument("--azimuth", type=int, default=1024)
    ap.add_argument("--pipeline", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "pipelines", "lidar3d-default.yaml"))
    ap.add_argument("--raw-capacity", type=int, default=0,
                    help="0 = next power of two >= rings*azimuth")
    ap.add_argument("--map-slots", type=int, default=0,
                    help="0 = auto (derive ALL capacities + budgets from the "
                    "first scan via utils/capacity.py); >0 = legacy manual "
                    "sizing with this map table size")
    args = ap.parse_args()

    n_scan = args.rings * args.azimuth
    if args.raw_capacity <= 0:
        args.raw_capacity = 1 << max(n_scan - 1, 1).bit_length()
    if args.batch <= 0:
        args.batch = auto_batch(n_scan)
        print(
            f"auto-batch: {args.batch} instances at {n_scan}-pt scans "
            f"(raw capacity {args.raw_capacity})",
            file=sys.stderr,
        )

    import jax

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    jax.config.update("jax_compilation_cache_dir", os.path.join(here, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp

    from mola_lidar_odometry_tpu.models.spec import spec_from_yaml
    from mola_lidar_odometry_tpu.parallel import batch as pb
    from mola_lidar_odometry_tpu.utils import sim
    from mola_lidar_odometry_tpu.utils.config import load_yaml_file

    cfg = load_yaml_file(args.pipeline, env={})

    B, F = args.batch, args.frames
    import pickle

    cache = os.path.join(
        here, f".fleet_cache_{B}x{F}_{args.rings}x{args.azimuth}.pkl"
    )
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            trajs, stacks = pickle.load(f)
    else:
        print(f"simulating {B} independent sequences x {F} frames ...", file=sys.stderr)
        trajs, stacks = [], []
        for b in range(B):
            traj, scans = sim.simulate_sequence(
                F, world_seed=b, traj_seed=100 + b,
                n_rings=args.rings, n_azimuth=args.azimuth,
            )
            trajs.append(traj)
            stacks.append(scans)
        with open(cache, "wb") as f:
            pickle.dump((trajs, stacks), f)

    if args.map_slots > 0:
        # explicit manual sizing (legacy behavior, kept for A/B)
        spec = spec_from_yaml(
            cfg,
            raw_capacity=args.raw_capacity,
            map_slots=args.map_slots,
            layer_capacities={
                "raw": args.raw_capacity,
                "decimated_for_map_raw": min(1 << 15, args.raw_capacity),
                "decimated_for_icp_skewed": min(1 << 13, max(1024, args.raw_capacity // 4)),
                "decimated_for_icp": min(1 << 13, max(1024, args.raw_capacity // 4)),
                "decimated_for_map": min(1 << 15, args.raw_capacity),
            },
        )
    else:
        # auto: derive every capacity + budget from the first scan, exactly
        # like bench.py / a production LidarOdometry with auto_capacity.
        # Round-4 finding: the old hand sizing kept map_slots=1<<17 per
        # instance regardless of scan size — at 32k-pt scans the map table
        # ops (slab prune, eviction sweep) scale with TABLE size, not scan
        # size, so small-scan fleets paid headline-sized table costs.
        from mola_lidar_odometry_tpu.utils.capacity import derive_capacities

        spec0 = spec_from_yaml(cfg)
        x0, t0, _, v0 = stacks[0][0]
        max_pts = max(int(s[3].sum()) for st in stacks for s in st)
        raw_cap, map_slots, caps, budgets = derive_capacities(
            spec0, x0[v0], t0[v0], with_budgets=True, known_max_points=max_pts
        )
        print(
            f"sizing: auto raw={raw_cap} slots={map_slots} layers={caps} "
            f"budgets={budgets}",
            file=sys.stderr,
        )
        spec = spec_from_yaml(
            cfg, raw_capacity=raw_cap, map_slots=map_slots,
            layer_capacities=caps, insert_budgets=budgets,
        )

    per_step = [
        pb.pack_scans(
            spec,
            [stacks[b][k] for b in range(B)],
            [trajs[b].stamps[k] for b in range(B)],
        )
        for k in range(F)
    ]
    seq = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_step)
    seq = jax.device_put(seq)

    fstep = pb.make_fleet_step(spec)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(carry, seq):
        carry, outs = jax.lax.scan(fstep, carry, seq)
        return carry, (outs.pose_R, outs.pose_t, outs.quality, outs.accepted)

    carry0 = pb.init_fleet_carry(spec, B)
    t0 = time.time()
    _, (Rs, ts, q, acc) = run(carry0, seq)
    jax.block_until_ready(ts)
    t_compile = time.time() - t0

    # Timed window: REPEATS executions dispatched back-to-back, ONE sync —
    # same steady-state protocol as bench.py (round 5): a per-call sync
    # would charge the tunnel's fixed ~27 ms dispatch RPC to every F-frame
    # sequence (17% of an 8x25 run), which production's continuous replay
    # never pays.  Carries are pre-built outside the window (production
    # keeps ONE resident carry; run donates its input).
    repeats = 6
    carries = [pb.init_fleet_carry(spec, B) for _ in range(repeats)]
    jax.block_until_ready(carries)
    t0 = time.time()
    outs = [run(c, seq) for c in carries]
    jax.block_until_ready(outs[-1][1][1])
    dt = (time.time() - t0) / repeats
    (Rs, ts, q, acc) = outs[-1][1]

    # gauge-aligned ATE-RMSE per instance
    Rs, ts = np.asarray(Rs), np.asarray(ts)  # (F, B, 3, 3), (F, B, 3)
    ates = []
    for b in range(B):
        R0, t0_ = trajs[b].R[0], trajs[b].t[0]
        errs = []
        for k in range(F):
            gt_t = R0.T @ (trajs[b].t[k] - t0_)
            errs.append(np.linalg.norm(ts[k, b] - gt_t))
        ates.append(float(np.sqrt(np.mean(np.square(errs)))))

    result = {
        "batch": B,
        "frames": F,
        "scans_per_sec_per_chip": round(B * F / dt, 2),
        "compile_s": round(t_compile, 1),
        "run_s": round(dt, 3),
        "ate_rmse_per_instance_m": [round(a, 3) for a in ates],
        "ate_rmse_mean_m": round(float(np.mean(ates)), 3),
        "mean_quality": round(float(np.asarray(q)[1:].mean()), 3),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
