"""Dissect one ICP iteration: where do 0.46 ms/iter actually go?

Times the iteration's components in isolation inside a 20x scan (real data
dependency through the carry, host-read sync — see eval/micro_ops.py).

Usage: python eval/micro_icp.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

INNER = 20


def main():
    import jax
    import jax.numpy as jnp

    from mola_lidar_odometry_tpu.ops import se3
    from mola_lidar_odometry_tpu.ops.se3 import Pose
    from mola_lidar_odometry_tpu.ops.solver import (
        PairingBlock,
        PosePrior,
        solve_gauss_newton_blocks,
    )
    from mola_lidar_odometry_tpu.ops.voxel_hash import CandSet, nn_from
    from mola_lidar_odometry_tpu.ops import pallas_match

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)

    base = [None]

    def bench(name, f, *args, repeats=5):
        @jax.jit
        def run(*a):
            def body(c, _):
                out = f(c, *a)
                s = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(out))
                return s * 1e-30 + c * 0.5, None

            c, _ = jax.lax.scan(body, jnp.float32(1e-30), None, length=INNER)
            return c

        float(run(*args))
        best = np.inf
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(*args))
            best = min(best, time.perf_counter() - t0)
        if base[0] is None:
            base[0] = best
            print(f"(floor {1e3*best:.2f} ms/call)", file=sys.stderr)
            return
        ms = 1e3 * (best - base[0]) / INNER
        print(f"{name:55s} {ms:8.3f} ms")

    bench("floor", lambda c: c)

    N, C = 8192, 540
    Cp = 27  # per-voxel-nn candidate count
    q = jnp.asarray(rng.random((N, 3), np.float32) * 50)
    cand = CandSet(
        pts=jnp.asarray(q[:, None, :] + rng.random((N, C, 3)).astype(np.float32)),
        mask=jnp.asarray(rng.random((N, C)) < 0.7),
    )
    cand27 = CandSet(pts=cand.pts[:, :Cp], mask=cand.mask[:, :Cp])
    valid = jnp.ones((N,), bool)
    pose = Pose.identity()

    def j(c, p):
        return Pose(p.R + c * 0, p.t + c)

    bench("se3.transform (8192)", lambda c, p: se3.transform(j(c, pose), p), q)
    bench("nn_from XLA (C=540)", lambda c, cd: nn_from(cd, q + c, valid)[:2], cand)
    bench("nn_from XLA (C=27)", lambda c, cd: nn_from(cd, q + c, valid)[:2], cand27)

    planar = pallas_match.to_planar(cand)
    bench("pallas nn_select (C=540)", lambda c, pl: pallas_match.nn_select(pl, q + c), planar)
    planar27 = pallas_match.to_planar(cand27)
    bench("pallas nn_select (C=27)", lambda c, pl: pallas_match.nn_select(pl, q + c), planar27)
    bench("to_planar (C=540)", lambda c, cd: pallas_match.to_planar(cd._replace(pts=cd.pts + c)), cand)

    tgt = q + 0.05
    pv = jnp.asarray(rng.random(N) < 0.8)

    def gn(c, q_, tgt_):
        blk = PairingBlock("p2p", q_ + c, tgt_, jnp.zeros_like(q_), pv, 1.0)
        p, _ = solve_gauss_newton_blocks(pose, [blk], 1.0, PosePrior.none(), 2)
        return p

    bench("GN 2-inner (8192 pairs)", gn, q, tgt)

    def gn1(c, q_, tgt_):
        blk = PairingBlock("p2p", q_ + c, tgt_, jnp.zeros_like(q_), pv, 1.0)
        p, _ = solve_gauss_newton_blocks(pose, [blk], 1.0, PosePrior.none(), 1)
        return p

    bench("GN 1-inner (8192 pairs)", gn1, q, tgt)

    # full iteration body equivalents
    def iter_xla(c, cd, q_):
        qq = se3.transform(j(c, pose), q_)
        tgt_, d2, found = nn_from(cd, qq, valid)
        pvv = found & (d2 < 4.0)
        blk = PairingBlock("p2p", q_, tgt_, jnp.zeros_like(q_), pvv, 1.0)
        p, _ = solve_gauss_newton_blocks(pose, [blk], 1.0, PosePrior.none(), 2)
        return p

    bench("ITER = transform+nn(540)+GN2", iter_xla, cand, q)

    def iter_27(c, cd, q_):
        return iter_xla(c, cd, q_)

    bench("ITER = transform+nn(27)+GN2", iter_27, cand27, q)

    # convergence/small-op zoo: pose_error_norms + expr-ish scalar math
    def small(c, p):
        p2 = j(c, p)
        dt, dr = se3.pose_error_norms(pose, p2)
        return dt + dr

    bench("pose_error_norms", small, pose)


if __name__ == "__main__":
    main()
