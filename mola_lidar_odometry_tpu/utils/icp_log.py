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


def replay_align_with_trace(
    maps, layers, init_pose, prior, cfg, env, n_iters: int, detail_every: int = 0
):
    """Re-run an align with a FIXED iteration schedule, recording each
    iteration's pose and pairing count (a fori_loop with stacked outputs —
    fixed shapes, one device program).

    With ``detail_every > 0`` (the reference's ``saveIterationDetails`` +
    ``decimationIterationDetails``, pipelines/lidar3d-default.yaml:178-180)
    every ``detail_every``-th iteration ALSO records the first matcher's
    full pairing set: per local point, its sensor-frame coordinates, the
    matched map target, the squared distance, and validity — the partial
    solutions an icp-log viewer inspects."""
    import jax
    import jax.numpy as jnp

    from mola_lidar_odometry_tpu.ops import icp as icp_ops
    from mola_lidar_odometry_tpu.ops.solver import solve_gauss_newton_blocks

    want_details = detail_every > 0
    mc0 = cfg.matchers[0]
    n_local = layers[mc0.local_layer][0].shape[0]
    n_detail = (n_iters + detail_every - 1) // detail_every if want_details else 0

    def body(it, carry):
        pose, Rs, ts, paired_log, det = carry
        env_it = dict(env)
        env_it["ICP_ITERATION"] = it.astype(jnp.float32)
        kernel_c = cfg.kernel_param(env_it)
        candsets = icp_ops._capture_all(cfg, maps, layers, pose)
        blocks, paired, _ = icp_ops._matcher_blocks(cfg, candsets, layers, pose, env_it, it)
        if want_details:
            from mola_lidar_odometry_tpu.ops import se3 as _se3

            b0 = blocks[0]
            tp_g = _se3.transform(pose, b0.p_local)  # map frame, at THIS pose
            row = jnp.concatenate(
                [
                    b0.p_local,  # sensor-frame local points
                    b0.q_global,  # matched map targets
                    jnp.sum((b0.q_global - tp_g) ** 2, axis=-1, keepdims=True),
                    b0.valid.astype(jnp.float32)[:, None],
                ],
                axis=-1,
            )  # (N, 8)
            slot = it // detail_every
            det = jnp.where(
                (it % detail_every) == 0,
                jax.lax.dynamic_update_index_in_dim(det, row, slot, 0),
                det,
            )
        pose, _ = solve_gauss_newton_blocks(
            pose, blocks, kernel_c, prior, cfg.gn_inner_iterations
        )
        Rs = Rs.at[it].set(pose.R)
        ts = ts.at[it].set(pose.t)
        paired_log = paired_log.at[it].set(paired.astype(jnp.int32))
        return pose, Rs, ts, paired_log, det

    Rs0 = jnp.zeros((n_iters, 3, 3), jnp.float32)
    ts0 = jnp.zeros((n_iters, 3), jnp.float32)
    p0 = jnp.zeros((n_iters,), jnp.int32)
    det0 = jnp.zeros((max(n_detail, 1), n_local, 8), jnp.float32)
    _, Rs, ts, paired, det = jax.lax.fori_loop(
        0, n_iters, body, (init_pose, Rs0, ts0, p0, det0)
    )
    if not want_details:
        det = None
    return Rs, ts, paired, det
