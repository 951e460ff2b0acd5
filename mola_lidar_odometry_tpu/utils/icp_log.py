"""ICP debug logs — the ``.icplog`` analogue.

The reference's mp2p_icp writes per-align debug files with pairings and
partial solutions per iteration, decimated, for offline inspection with
icp-log-viewer (reference pipelines/lidar3d-default.yaml:172-182:
``saveIterationDetails``, ``decimationIterationDetails``,
``debugFileNameFormat``, ``decimationDebugFiles``; pre-log layer filter
LidarOdometry.cpp:358-365).

Device-side, the ICP loop is one ``lax.while_loop`` — per-iteration state
cannot stream to the host without breaking the program.  Instead, when debug
logging is enabled the host runs a *replay*: after a scan is processed it
re-executes the align with a fixed iteration schedule that records the pose
trajectory and pairing counts per iteration (bounded, fixed shape), then
writes one ``.icplog.npz`` per logged frame.  Decimation keeps this off the
hot path (every Nth frame only), exactly like the reference's
``decimationDebugFiles``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np


class IcpLogWriter:
    """Frame-decimated writer of ICP iteration logs."""

    def __init__(
        self,
        directory: str = "icp-logs",
        decimation: int = 10,
        max_logged_iterations: int = 40,
    ):
        self.dir = Path(directory)
        self.decimation = max(1, int(decimation))
        self.max_iters = int(max_logged_iterations)
        self._frame = 0
        self._made = False

    def want_frame(self) -> bool:
        take = (self._frame % self.decimation) == 0
        self._frame += 1
        return take

    def log(
        self,
        *,
        frame_idx: int,
        stamp: float,
        poses_R: np.ndarray,  # (I, 3, 3) per-iteration poses
        poses_t: np.ndarray,  # (I, 3)
        paired: np.ndarray,  # (I,) pairing counts
        quality: float,
        iterations: int,
        extra: Optional[Dict[str, np.ndarray]] = None,
    ) -> Path:
        if not self._made:
            self.dir.mkdir(parents=True, exist_ok=True)
            self._made = True
        path = self.dir / f"icp-run-{frame_idx:06d}.icplog.npz"
        np.savez_compressed(
            path,
            stamp=np.float64(stamp),
            poses_R=np.asarray(poses_R, np.float32),
            poses_t=np.asarray(poses_t, np.float32),
            paired=np.asarray(paired, np.int32),
            quality=np.float32(quality),
            iterations=np.int32(iterations),
            **(extra or {}),
        )
        return path


def replay_align_with_trace(maps, layers, init_pose, prior, cfg, env, n_iters: int):
    """Re-run an align with a FIXED iteration schedule, recording each
    iteration's pose and pairing count (a fori_loop with stacked outputs —
    fixed shapes, one device program)."""
    import jax
    import jax.numpy as jnp

    from mola_lidar_odometry_tpu.ops import icp as icp_ops
    from mola_lidar_odometry_tpu.ops.solver import solve_gauss_newton_blocks

    def body(it, carry):
        pose, Rs, ts, paired_log = carry
        env_it = dict(env)
        env_it["ICP_ITERATION"] = it.astype(jnp.float32)
        kernel_c = cfg.kernel_param(env_it)
        candsets = icp_ops._capture_all(cfg, maps, layers, pose)
        blocks, paired, _ = icp_ops._matcher_blocks(cfg, candsets, layers, pose, env_it, it)
        pose, _ = solve_gauss_newton_blocks(
            pose, blocks, kernel_c, prior, cfg.gn_inner_iterations
        )
        Rs = Rs.at[it].set(pose.R)
        ts = ts.at[it].set(pose.t)
        paired_log = paired_log.at[it].set(paired.astype(jnp.int32))
        return pose, Rs, ts, paired_log

    Rs0 = jnp.zeros((n_iters, 3, 3), jnp.float32)
    ts0 = jnp.zeros((n_iters, 3), jnp.float32)
    p0 = jnp.zeros((n_iters,), jnp.int32)
    _, Rs, ts, paired = jax.lax.fori_loop(0, n_iters, body, (init_pose, Rs0, ts0, p0))
    return Rs, ts, paired
