"""icp-log-viewer — inspect .icplog.npz debug files.

Counterpart of the external ``icp-log-viewer`` GUI the reference points at
for its ``.icplog`` files (reference docs/mola_lo_pipelines.rst "ICP log
files"; pipelines/lidar3d-default.yaml:177-182).  Renders the per-iteration
pose trajectory and pairing counts of one or more logged align() runs to a
PNG (headless hosts) or prints a text summary.

Usage:
    python -m mola_lidar_odometry_tpu.apps.icplog_viewer icp-logs/*.npz [-o out.png]
"""

from __future__ import annotations

import argparse

import numpy as np


def summarize(path: str) -> dict:
    d = np.load(path)
    t = d["poses_t"]
    steps = np.linalg.norm(np.diff(t, axis=0), axis=1)
    return {
        "file": path,
        "iterations": int(d["iterations"]),
        "quality": float(d["quality"]),
        "final_t": t[-1].tolist(),
        "total_correction_m": float(np.linalg.norm(t[-1] - t[0])),
        "last_step_m": float(steps[-1]) if len(steps) else 0.0,
        "paired_first": int(d["paired"][0]),
        "paired_last": int(d["paired"][-1]),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="icp-log-viewer")
    ap.add_argument("logs", nargs="+", help=".icplog.npz files")
    ap.add_argument("-o", "--output", default=None, help="render PNG here")
    args = ap.parse_args(argv)

    infos = [summarize(p) for p in args.logs]
    for info in infos:
        print(
            f"{info['file']}: iters={info['iterations']} q={info['quality']:.3f} "
            f"corr={info['total_correction_m']:.3f}m "
            f"paired {info['paired_first']}->{info['paired_last']}"
        )

    if args.output:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 5))
        for p in args.logs:
            d = np.load(p)
            t = d["poses_t"]
            ax1.plot(t[:, 0], t[:, 1], ".-", ms=3, label=p.split("/")[-1])
            ax2.plot(d["paired"], label=p.split("/")[-1])
        ax1.set_title("per-iteration pose (x, y)")
        ax1.set_xlabel("x [m]")
        ax1.set_ylabel("y [m]")
        ax1.axis("equal")
        ax2.set_title("pairings per iteration")
        ax2.set_xlabel("iteration")
        if len(args.logs) <= 8:
            ax1.legend(fontsize=7)
        fig.tight_layout()
        fig.savefig(args.output, dpi=110)
        print(f"-> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
