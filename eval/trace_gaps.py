"""Device-timeline gap analysis of a jax.profiler trace.

Answers "where does wall - sum(op time) go": for each device line, computes
the busy union of X events vs the covered span, and prints the largest idle
gaps with the op names on either side.  Run eval/trace_step.py --scan first
(or point --trace at any trace dir).

Usage: python eval/trace_gaps.py [--trace /tmp/mola_trace] [--top 25]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="/tmp/mola_trace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    paths = sorted(
        glob.glob(os.path.join(args.trace, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime,
    )
    assert paths, f"no trace under {args.trace}"
    print(f"trace: {paths[-1]}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    pid_name, tid_name = {}, {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M":
            if ev.get("name") == "process_name":
                pid_name[ev["pid"]] = ev["args"].get("name", "")
            elif ev.get("name") == "thread_name":
                tid_name[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items() if "TPU" in n or "/device" in n.lower()}

    lines = collections.defaultdict(list)  # (pid,tid) -> [(start,end,name)]
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        a = ev.get("args", {}) or {}
        if name.startswith("jit_") or ("program_id" in name and not a):
            continue
        s = float(ev["ts"]); d = float(ev.get("dur", 0.0))
        lines[(ev["pid"], ev["tid"])].append((s, s + d, name))

    for key, evs in sorted(lines.items(), key=lambda kv: -len(kv[1])):
        evs.sort()
        span = evs[-1][1] - evs[0][0]
        # busy union
        busy, cur_s, cur_e = 0.0, evs[0][0], evs[0][1]
        gaps = []
        for s, e, name in evs[1:]:
            if s > cur_e:
                gaps.append((s - cur_e, cur_e, name))
                busy += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        busy += cur_e - cur_s
        tname = tid_name.get(key, "")
        print(
            f"\nline pid={key[0]} tid={key[1]} [{tname}]: {len(evs)} events, "
            f"span {span/1e3:.2f} ms, busy {busy/1e3:.2f} ms, "
            f"idle {(span-busy)/1e3:.2f} ms ({100*(span-busy)/span:.1f}%)"
            f" -> idle/step {(span-busy)/1e3/args.steps:.3f} ms"
        )
        gaps.sort(reverse=True)
        gap_by_next = collections.defaultdict(float)
        for g, at, nxt in gaps:
            gap_by_next[nxt] += g
        print("  largest single gaps (ms, before op):")
        for g, at, nxt in gaps[: args.top]:
            print(f"    {g/1e3:8.3f}  before {nxt[:90]}")
        print("  idle aggregated by the op that follows the gap (ms total):")
        for nxt, g in sorted(gap_by_next.items(), key=lambda kv: -kv[1])[: args.top]:
            print(f"    {g/1e3:8.3f}  {nxt[:90]}")


if __name__ == "__main__":
    main()
