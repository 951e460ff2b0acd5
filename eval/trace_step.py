"""Per-HLO-op device profile of the bench scan-step (jax.profiler trace).

Runs the exact bench.py configuration (lidar3d-default, B=8, 131k-pt scans)
for a few steady-state steps under ``jax.profiler.trace`` and aggregates the
device "X" events by op name, attributing each to a source line where the
trace carries one.  This is the targeting tool for hot-path work: the
aggregate tells which *instruction families* (gather / scatter / sort /
fusion) own the step.

Usage: python eval/trace_step.py [--steps 6] [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="/tmp/mola_trace")
    ap.add_argument(
        "--hlo", default="",
        help="also write the optimized HLO of the profiled step here — "
        "instruction names match the profile rows exactly (same executable), "
        "so unattributed fusions can be resolved by shape/opcode",
    )
    ap.add_argument(
        "--scan", action="store_true",
        help="profile the EXACT bench program (one lax.scan over the whole "
        "sequence, donated carry) instead of per-step dispatches — the scan "
        "body can pay per-iteration copies the per-step profile never sees; "
        "device time is reported per scan step (sequence length divides)",
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from mola_lidar_odometry_tpu.models.spec import spec_from_yaml
    from mola_lidar_odometry_tpu.parallel import batch as pb
    from mola_lidar_odometry_tpu.utils.config import load_yaml_file

    sys.path.insert(0, HERE)
    import bench

    scans, stamps = bench.gen_scans()
    cfg = load_yaml_file(os.path.join(HERE, "pipelines", "lidar3d-default.yaml"), env={})
    # identical sizing to bench.py (auto-derived; MOLA_BENCH_HANDSIZED=1
    # reproduces the round-3 hand constants)
    spec = spec_from_yaml(cfg, kf_ring_capacity=256, **bench.resolve_sizing(cfg, scans))
    B = args.batch
    import functools

    # donate the carry so per-call map-table entry copies don't pollute the
    # profile (bench.py's scan-over-steps pays that copy once per sequence)
    fstep = functools.partial(jax.jit, donate_argnums=(0,))(pb.make_fleet_step(spec))
    carry = pb.init_fleet_carry(spec, B)

    packed = [
        pb.pack_scans(spec, [s] * B, [stamps[k]] * B) for k, s in enumerate(scans)
    ]
    if args.hlo and not args.scan:
        txt = fstep.lower(carry, packed[0]).compile().as_text()
        with open(args.hlo, "w") as f:
            f.write(txt)
        print(f"optimized HLO -> {args.hlo} ({len(txt)} bytes)", file=sys.stderr)

    if args.scan:
        # the bench program verbatim: one lax.scan dispatch over the whole
        # sequence with a donated carry (bench.py run_seq)
        seq = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *packed)
        seq = jax.device_put(seq)

        raw_step = pb.make_fleet_step(spec)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_seq(c, s):
            c, outs = jax.lax.scan(raw_step, c, s)
            return c, outs.quality

        compiled = run_seq.lower(carry, seq).compile()
        if args.hlo:
            # with --scan, dump the SCAN executable: instruction names match
            # the scan profile rows exactly (the per-step module's don't)
            txt = compiled.as_text()
            with open(args.hlo, "w") as f:
                f.write(txt)
            print(
                f"optimized scan HLO -> {args.hlo} ({len(txt)} bytes)",
                file=sys.stderr,
            )
        c2, q = compiled(carry, seq)  # warm-up / first exec
        jax.block_until_ready(q)
        carry = pb.init_fleet_carry(spec, B)
        jax.block_until_ready(carry)
        import time as _time
        t0 = _time.time()
        with jax.profiler.trace(args.out):
            c3, q = compiled(carry, seq)
            jax.block_until_ready(q)
        wall = _time.time() - t0
        args.steps = len(packed)
        print(
            f"scan-mode wall: {wall * 1e3:.1f} ms for {args.steps} steps "
            f"= {wall * 1e3 / args.steps:.3f} ms/step wall",
            file=sys.stderr,
        )
    else:
        # warm up into steady state (map built, tracking converged)
        warm = 10
        for k in range(warm):
            carry, out = fstep(carry, packed[k])
        jax.block_until_ready(carry)

        with jax.profiler.trace(args.out):
            for k in range(warm, warm + args.steps):
                carry, out = fstep(carry, packed[k])
            jax.block_until_ready(carry)

    paths = sorted(
        glob.glob(os.path.join(args.out, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime,
    )
    assert paths, f"no trace found under {args.out}"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    # device-side events: pick pids whose process name mentions TPU/device
    pid_name = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {
        p for p, n in pid_name.items() if "TPU" in n or "/device" in n.lower()
    }

    agg = collections.defaultdict(float)
    srcs = {}
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        a = ev.get("args", {}) or {}
        # skip container rows (jit_ program spans wrap all child ops and
        # would double-count device time)
        if name.startswith("jit_") or ("program_id" in name and not a):
            continue
        dur = float(ev.get("dur", 0.0))
        agg[name] += dur
        total += dur
        if name not in srcs:
            src = a.get("source") or a.get("long_name") or ""
            srcs[name] = str(src)[:110]

    steps = args.steps
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    print(f"total device time: {total / 1e3 / steps:.3f} ms/step  (B={B}, {steps} steps)")
    print(f"{'ms/step':>9}  {'%':>5}  name / source")
    shown = 0.0
    for name, dur in rows[: args.top]:
        shown += dur
        print(f"{dur / 1e3 / steps:9.3f}  {100 * dur / total:5.1f}  {name}")
        if srcs.get(name):
            print(f"{'':17}{srcs[name]}")
    print(f"(top {args.top} = {100 * shown / total:.1f}% of device time)")


if __name__ == "__main__":
    main()
