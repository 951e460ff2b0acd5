"""The ICP iteration loop as a single XLA program (lax.while_loop).

TPU rebuild of ``mp2p_icp::ICP::align`` as exercised by the reference
odometry (module/src/LidarOdometry.cpp:916-1024; parameters
pipelines/lidar3d-default.yaml:172-209):

  iterate {  matcher (NN under annealed distance threshold)
             -> robust Gauss-Newton (inner iters, Geman-McClure, prior)
             -> convergence check (minAbsStep_trans / minAbsStep_rot)  }
  then quality = paired ratio  (QualityEvaluator_PairedRatio)

The per-iteration dynamic variables (``ICP_ITERATION``) feed the annealed
matcher-threshold and robust-kernel expressions exactly like the reference's
ParameterSource re-realization.  The iteration-hook semantics used for twist
re-optimization (LidarOdometry.cpp:923-952) appear here as a loop-exit
condition: when the accumulated pose delta from the align() start exceeds the
configured thresholds the loop stops with ``hook_stop=True`` and the caller
(models/step.py) re-deskews and re-enters with the remaining budget.

Everything is fixed-shape; the candidate set is the 27-voxel neighborhood
gather from ops/voxel_hash.  Iteration count is data-dependent via
``lax.while_loop`` so converged frames exit early on device.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from mola_lidar_odometry_tpu.ops import se3, voxel_hash
from mola_lidar_odometry_tpu.ops.se3 import Pose
from mola_lidar_odometry_tpu.ops.solver import PosePrior, solve_gauss_newton
from mola_lidar_odometry_tpu.utils.expr import Expr


@dataclass(frozen=True)
class IcpConfig:
    """Static ICP configuration compiled from the pipeline YAML."""

    max_iterations: int = 300
    min_abs_step_trans: float = 1e-4
    min_abs_step_rot: float = 5e-5
    threshold: Expr = field(default_factory=lambda: Expr("2.0*ADAPTIVE_THRESHOLD_SIGMA"))
    kernel_param: Expr = field(default_factory=lambda: Expr("0.5*ADAPTIVE_THRESHOLD_SIGMA"))
    gn_inner_iterations: int = 2
    # iteration-hook (twist re-optimization) thresholds; 0 disables
    hook_min_trans: float = 0.0
    hook_min_rot: float = 0.0


class IcpResult(NamedTuple):
    pose: Pose
    quality: jax.Array  # () f32 in [0, 1]
    iterations: jax.Array  # () i32 — iterations consumed by this align()
    hook_stop: jax.Array  # () bool — stopped by the twist-reopt hook
    converged: jax.Array  # () bool


def _match(m, pose, xyz, valid, thr):
    q = se3.transform(pose, xyz)
    nn, d2, found = voxel_hash.query_nn(m, q, valid)
    pair_valid = found & (d2 < thr * thr)
    return nn, pair_valid


def align(
    m: voxel_hash.VoxelHashMap,
    local_xyz: jax.Array,  # (N, 3) ICP layer points, vehicle frame
    local_valid: jax.Array,  # (N,) bool
    init_pose: Pose,
    prior: PosePrior,
    cfg: IcpConfig,
    env: Dict[str, jax.Array],
    max_iterations=None,  # traced remaining-budget override (optional)
) -> IcpResult:
    """Run the matcher->solver loop from ``init_pose`` until convergence,
    budget exhaustion, or an iteration-hook stop."""

    budget = jnp.asarray(
        cfg.max_iterations if max_iterations is None else max_iterations, jnp.int32
    )
    hook_on = cfg.hook_min_trans > 0 or cfg.hook_min_rot > 0

    def body(state):
        pose, it, _, _ = state
        env_it = dict(env)
        env_it["ICP_ITERATION"] = it.astype(jnp.float32)
        thr = cfg.threshold(env_it)
        kernel_c = cfg.kernel_param(env_it)

        nn, pair_valid = _match(m, pose, local_xyz, local_valid, thr)
        new_pose, _ = solve_gauss_newton(
            pose, local_xyz, nn, pair_valid, kernel_c, prior, cfg.gn_inner_iterations
        )

        dt, dr = se3.pose_error_norms(pose, new_pose)
        converged = (dt < cfg.min_abs_step_trans) & (dr < cfg.min_abs_step_rot)

        if hook_on:
            ht, hr = se3.pose_error_norms(init_pose, new_pose)
            hook = (ht > cfg.hook_min_trans) | (hr > cfg.hook_min_rot)
        else:
            hook = jnp.asarray(False)
        return new_pose, it + 1, converged, hook

    def cond(state):
        _, it, converged, hook = state
        return (~converged) & (~hook) & (it < budget)

    state0 = (init_pose, jnp.int32(0), jnp.asarray(False), jnp.asarray(False))
    pose, it, converged, hook = jax.lax.while_loop(cond, body, state0)

    # Quality: paired ratio at the final pose/threshold
    env_q = dict(env)
    env_q["ICP_ITERATION"] = it.astype(jnp.float32)
    thr = cfg.threshold(env_q)
    _, pair_valid = _match(m, pose, local_xyz, local_valid, thr)
    n_local = jnp.maximum(jnp.sum(local_valid), 1)
    quality = jnp.sum(pair_valid) / n_local.astype(jnp.float32)

    return IcpResult(pose=pose, quality=quality, iterations=it, hook_stop=hook, converged=converged)
