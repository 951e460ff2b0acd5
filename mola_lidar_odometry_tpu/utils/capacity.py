"""Capacity sizing policy: derive buffer sizes from the first scan.

VERDICT round-2 item 7: the fixed-capacity tables (TPU static shapes) were
hand-right-sized to the bench world; on a denser world a fleet silently
degrades until someone reads the drop counters.  This module replaces hand
tuning with a host-side dry pass over the FIRST scan:

  * every filter-graph layer is sized by actually running the pipeline
    once in exact host arithmetic (the float64 oracle interpreter — the
    same compiled spec the device step runs) and measuring the layer
    populations;
  * the map hash table is sized from the measured unique-voxel count of
    the map-insert layer at the map's own resolution, times a fill-factor
    and sliding-window margin.

Sizing happens before the first jit (the step is already deferred to the
first scan for SE(2) auto-detection), so auto-capacity costs one host-side
pipeline pass, no recompiles.  Saturation remains observable at runtime:
``StepOutput.map_collision_drops`` feeds a windowed warning in
models/odometry.py when drops exceed 0.1% of inserts.
"""

from __future__ import annotations

import math
import os
from typing import Dict, Tuple

import numpy as np


def _round_up(n: int, m: int) -> int:
    return ((max(n, 1) + m - 1) // m) * m


def _next_pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 1).bit_length()


# margins: layer populations vary frame-to-frame (deskew, range-estimate
# drift moves the decimation resolutions).  1.25x holds every variation
# observed on the bench/eval worlds (round-4 device profile: steady-state
# peaks sit BELOW the first-scan populations, so the measurement is already
# an upper proxy), saturation still warns at runtime, and every extra 512
# ICP-layer rows cost real capture-gather time (row-count-bound).
LAYER_MARGIN = 1.25
LAYER_QUANTUM = 512
# the insert budget must cover a bring-up frame's unique voxels with room
# for depth fill (models/spec.py budget resolution); undershooting thins
# first-frame map coverage, so it keeps the fatter 1.5x margin
BUDGET_MARGIN = 1.5
RAW_QUANTUM = 8192
# The sliding map accumulates several keyframes of fresh voxels before
# eviction, and a voxel drops when BOTH ways of its 2-way bucket are taken
# (ops/voxel_hash.py).  Measured on a dense non-bench world (10 frames,
# 140-box clutter): factor 8 -> 0.28% of inserts dropped, 16 -> 0.086%,
# 32 -> 0.009%.  Table BYTES are not free: random-row gathers (the step's
# dominant cost) are ~5 ns/row on a hot ~33 MB working set vs ~13.5 ns on
# a cold ~268 MB one (eval/micro_gather.py), so an oversized table slows
# every capture.  Round-5 device A/B (B=8, 131k-pt bench): factor 32 =
# 868 scans/s/chip (GT 0.148, 0 drops), 16 = 1109 (GT 0.150, 0.009%
# drops), 8 = 1156 (GT 0.158, 0.036% here but 0.28% on the dense world —
# over the <0.1% budget).  16 is the best factor that holds the budget on
# every measured world; MOLA_MAP_SLOTS_FACTOR overrides for device A/B.
MAP_SLOTS_FACTOR = int(os.environ.get("MOLA_MAP_SLOTS_FACTOR", "16"))
MAP_SLOTS_MIN = 1 << 12
MAP_SLOTS_MAX = 1 << 20


def derive_capacities(
    spec,
    xyz: np.ndarray,
    times: np.ndarray = None,
    with_budgets: bool = False,
    known_max_points: int = None,
):
    """Dry-run the spec's filter graph on the first scan (exact host
    arithmetic) and derive ``(raw_capacity, map_slots, layer_capacities)``
    — plus, with ``with_budgets=True``, a 4th element: per-map-layer insert
    budgets sized from the MEASURED unique-voxel count (the fill-priority
    insert must cover every new voxel of a bring-up frame; see
    models/spec.py budget resolution).

    ``known_max_points``: when the caller KNOWS the true maximum scan size
    of the whole sequence (bench pre-generates every scan; dataset readers
    can stat file sizes), the raw buffer is sized exactly to it — the 1.25x
    raw margin exists only to guard against a partial first revolution, and
    every raw-wide sort/gather pays ~1 ns/element for the padding (round-4
    device profile: the margin alone cost ~0.9 ms of the 12.5 ms step).
    """
    from mola_lidar_odometry_tpu import oracle as O

    xyz = np.asarray(xyz, np.float64)
    n = len(xyz)
    if times is None:
        times = np.zeros(n)
    times = np.asarray(times, np.float64)

    rng = float(np.max(np.linalg.norm(xyz, axis=1))) if n else 0.0
    est_range = max(rng, spec.absolute_minimum_sensor_range)

    # first-frame dynamic environment (same variables models/step publishes)
    env = {
        k: 0.0
        for k in (
            "vx", "vy", "vz", "wx", "wy", "wz",
            "robot_x", "robot_y", "robot_z",
            "robot_yaw", "robot_pitch", "robot_roll",
            "ICP_ITERATION", "icp_iterations", "SENSOR_TIME_OFFSET",
            "twistCorrectionCount", "current_relative_timestamp",
        )
    }
    env["ADAPTIVE_THRESHOLD_SIGMA"] = spec.adaptive_threshold.initial_sigma
    env["ESTIMATED_SENSOR_MAX_RANGE"] = est_range
    env["INSTANTANEOUS_SENSOR_MAX_RANGE"] = est_range

    layers = {"raw": O.Cloud(xyz, times)}
    layers = O.apply_pipeline_exact(spec.adjust_pipeline, layers, env)
    layers = O.apply_pipeline_exact(spec.filter1, layers, env)
    layers = O.apply_pipeline_exact(spec.filter2, layers, env)

    # 1.25x headroom: the first scan is often SMALLER than steady state
    # (partial first revolution in recorded bags), and _pad_scan silently
    # truncates anything past raw_capacity.  A truncation watchdog in
    # models/odometry.py covers the remaining tail.  Rounded to 8k, NOT the
    # next power of two: pow2 rounding doubled the raw buffer on the bench
    # world and every raw-wide sort/gather paid for the padding (round-4
    # device profile: the two decimation sorts scale ~1 ns/element).
    if known_max_points is not None:
        raw_capacity = _round_up(max(n, int(known_max_points)), RAW_QUANTUM)
    else:
        raw_capacity = _round_up(int(n * 1.25), RAW_QUANTUM)
    caps: Dict[str, int] = {"raw": raw_capacity}
    for name, c in layers.items():
        if name == "raw":
            continue
        caps[name] = _round_up(int(math.ceil(len(c.xyz) * LAYER_MARGIN)), LAYER_QUANTUM)

    # unique voxels of every map-insert source at its target layer's
    # resolution -> hash-table sizing
    defs = {d.name: d for d in spec.map_layers}
    vox_total = 0
    vox_by_target: Dict[str, int] = {}
    for op in spec.map_inserts:
        src = layers.get(op.input_layer)
        d = defs.get(op.target_map_layer)
        if src is None or d is None or len(src.xyz) == 0:
            continue
        vs = float(np.asarray(d.voxel_size(env), np.float64))
        keys = np.floor(src.xyz / max(vs, 1e-6)).astype(np.int64)
        nv = len(np.unique(keys, axis=0))
        vox_total += nv
        vox_by_target[op.target_map_layer] = max(vox_by_target.get(op.target_map_layer, 0), nv)
    map_slots = int(
        min(max(_next_pow2(vox_total * MAP_SLOTS_FACTOR), MAP_SLOTS_MIN), MAP_SLOTS_MAX)
    )
    if not with_budgets:
        return raw_capacity, map_slots, caps
    # budget = 1.5x measured unique voxels: covers bring-up coverage plus
    # some depth fill; steady-state frames store far fewer, so this is the
    # binding constraint (measured: budget below the unique-voxel count
    # thins first-frame coverage and degrades every subsequent pose)
    budgets = {
        name: _round_up(int(math.ceil(nv * BUDGET_MARGIN)), LAYER_QUANTUM)
        for name, nv in vox_by_target.items()
    }
    return raw_capacity, map_slots, caps, budgets
