"""Stage-level device timing: where does a scan-step spend its time?

Times each sub-program of the odometry step in isolation on the current
device (filters, matcher query, GN solve, one full ICP iteration, map
insert/prune, full step) so optimization targets the real bottleneck.

Usage: python eval/profile_stages.py [--batch 1] [--repeats 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def timeit(fn, *args, repeats=20, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--repeats", type=int, default=20)
    ap.add_argument("--raw", type=int, default=1 << 17)
    ap.add_argument("--icp-cap", type=int, default=1 << 13)
    ap.add_argument("--map-cap", type=int, default=1 << 16)
    ap.add_argument("--slots", type=int, default=1 << 17)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mola_lidar_odometry_tpu.models import step as step_mod
    from mola_lidar_odometry_tpu.models.spec import spec_from_yaml
    from mola_lidar_odometry_tpu.models.step import Scan
    from mola_lidar_odometry_tpu.ops import filters as F, icp as icp_ops, voxel_hash as vh
    from mola_lidar_odometry_tpu.ops.pointcloud import PointCloud
    from mola_lidar_odometry_tpu.ops.se3 import Pose
    from mola_lidar_odometry_tpu.ops.solver import PosePrior
    from mola_lidar_odometry_tpu.utils.config import load_yaml_file
    from mola_lidar_odometry_tpu.utils.expr import Expr

    B = args.batch
    dev = jax.devices()[0]
    print(f"device: {dev}  batch={B}", file=sys.stderr)

    rng = np.random.default_rng(0)
    raw_n = args.raw

    def mb(shape):  # random point cloud on device
        return jnp.asarray(rng.uniform(-60, 60, shape).astype(np.float32))

    vmap = jax.vmap if B > 1 else (lambda f: f)

    def batched(x):
        return jnp.broadcast_to(x, (B,) + x.shape) if B > 1 else x

    # --- raw filters ---
    raw_pc = PointCloud.from_xyz(mb((raw_n, 3)))
    raw_pc_b = jax.tree_util.tree_map(batched, raw_pc)

    dec = jax.jit(vmap(lambda pc: F.decimate_voxels(pc, 0.35, args.map_cap)))
    t = timeit(dec, raw_pc_b, repeats=args.repeats)
    print(f"decimate_voxels raw({raw_n})->cap {args.map_cap}: {1e3 * t:8.2f} ms")

    rng_f = jax.jit(vmap(lambda pc: F.filter_by_range(pc, 1.8, 72.0)[0]))
    t = timeit(rng_f, raw_pc_b, repeats=args.repeats)
    print(f"filter_by_range({raw_n}):                  {1e3 * t:8.2f} ms")

    dsk = jax.jit(vmap(lambda pc: F.deskew(pc, jnp.asarray([8.0, 0, 0, 0, 0, 0.2], jnp.float32))))
    t = timeit(dsk, raw_pc_b, repeats=args.repeats)
    print(f"deskew({raw_n}):                           {1e3 * t:8.2f} ms")

    # --- map insert / query ---
    m = vh.VoxelHashMap.create(args.slots, 20, 0.8)
    map_pts = PointCloud.from_xyz(mb((args.map_cap, 3)))
    m = vh.insert(m, map_pts)
    m_b = jax.tree_util.tree_map(batched, m)
    map_pts_b = jax.tree_util.tree_map(batched, map_pts)

    ins = jax.jit(vmap(vh.insert))
    t = timeit(ins, m_b, map_pts_b, repeats=args.repeats)
    print(f"map insert({args.map_cap} pts):               {1e3 * t:8.2f} ms")

    prune = jax.jit(vmap(lambda m: vh.prune_farther_than(m, jnp.zeros(3), 100.0)))
    t = timeit(prune, m_b, repeats=args.repeats)
    print(f"map prune:                              {1e3 * t:8.2f} ms")

    q = mb((args.icp_cap, 3))
    qv = jnp.ones(args.icp_cap, bool)
    q_b, qv_b = batched(q), batched(qv)
    qq = jax.jit(vmap(vh.query_nn))
    t_query = timeit(qq, m_b, q_b, qv_b, repeats=args.repeats)
    print(f"query_nn({args.icp_cap} q, 27nbr):            {1e3 * t_query:8.2f} ms")

    # --- GN solve on fixed pairings ---
    from mola_lidar_odometry_tpu.ops.solver import PairingBlock, solve_gauss_newton_blocks

    tgt = q + 0.05
    tgt_b = batched(tgt)

    def gn(q, tgt, qv):
        blk = PairingBlock("p2p", q, tgt, jnp.zeros_like(q), qv, 1.0)
        pose, _ = solve_gauss_newton_blocks(
            Pose.identity(), [blk], 1.0, PosePrior.none(), 2
        )
        return pose

    gn_j = jax.jit(vmap(gn))
    t_gn = timeit(gn_j, q_b, tgt_b, qv_b, repeats=args.repeats)
    print(f"GN solve (2 inner, {args.icp_cap} pairs):     {1e3 * t_gn:8.2f} ms")

    # --- one full ICP align (fixed 10 iterations) ---
    import jax as _jax

    cfg = icp_ops.IcpConfig(
        matchers=(icp_ops.MatcherCfg(threshold=Expr("2.0"), local_layer="icp"),),
        kernel_param=Expr("1.0"),
        max_iterations=10,
        min_abs_step_trans=0.0,  # force all 10 iterations
        min_abs_step_rot=0.0,
        hook_min_trans=1e9,  # enable capture-once (hook never fires)
        use_pallas=_jax.default_backend() == "tpu",
    )

    def align(m, q, qv):
        return icp_ops.align(
            {"localmap": m}, {"icp": (q, qv)}, Pose.identity(), PosePrior.none(), cfg, {}
        ).iterations

    al = jax.jit(vmap(align))
    t_icp = timeit(al, m_b, q_b, qv_b, repeats=args.repeats)
    print(f"ICP align 10 iters:                     {1e3 * t_icp:8.2f} ms  ({1e3 * t_icp / 10:.2f} ms/iter)")

    # --- full scan step ---
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    cfg_y = load_yaml_file(os.path.join(here, "pipelines", "lidar3d-default.yaml"), env={})
    spec = spec_from_yaml(
        cfg_y,
        raw_capacity=raw_n,
        map_slots=args.slots,
        layer_capacities={
            "raw": raw_n,
            "decimated_for_map_raw": args.map_cap,
            "decimated_for_icp_skewed": args.icp_cap,
            "decimated_for_icp": args.icp_cap,
            "decimated_for_map": args.map_cap,
        },
    )
    step = jax.jit(vmap(step_mod.make_step(spec)) if B > 1 else step_mod.make_step(spec))
    carry = step_mod.init_carry(spec)
    carry = jax.tree_util.tree_map(batched, carry) if B > 1 else carry
    scan = Scan(
        xyz=batched(mb((raw_n, 3))),
        time=batched(jnp.zeros(raw_n)),
        intensity=batched(jnp.zeros(raw_n)),
        ring=batched(jnp.zeros(raw_n, jnp.int32)),
        valid=batched(jnp.ones(raw_n, bool)),
        stamp=batched(jnp.float32(0.0)) if B > 1 else jnp.float32(0.0),
    )
    carry, _ = step(carry, scan)  # first step builds the map
    jax.block_until_ready(carry)

    def run(c, s):
        c2, out = step(c, s)
        return out.iterations

    t_step = timeit(run, carry, scan, repeats=max(3, args.repeats // 2))
    print(f"FULL STEP (steady state):               {1e3 * t_step:8.2f} ms")


if __name__ == "__main__":
    main()
