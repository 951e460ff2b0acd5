"""Constant-velocity kinematic state fuser (sliding window, in-jit).

TPU rebuild of the ``mola::NavStateFuse`` contract the odometry consumes
(reference module/src/LidarOdometry.cpp:336-338, 788-789, 810-811, 1035-1038;
parameters pipelines/lidar3d-default.yaml:126-144):

  * ``fuse_pose(t, pose)``        — push a pose observation
  * ``estimated_navstate(t)``     — pose + twist extrapolated to ``t`` under a
    constant-velocity model, or invalid if the newest fused pose is older
    than ``max_time_to_use_velocity_model``
  * ``reset()``                   — wipe after a bad ICP gate

State is a fixed ring of the last W fused (time, pose) entries.  The body
twist is the dt^2-weighted mean of consecutive finite-difference twists
inside ``sliding_window_length`` (the small-LS moral equivalent of the
reference's random-walk window fuser); with fewer than two usable entries it
falls back to the configured ``initial_twist``.  The returned prior
information matrix scales with the extrapolation horizon through the
random-walk sigmas, so the ICP prior weakens as the model extrapolates
further — matching how the reference's prior covariance grows.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mola_lidar_odometry_tpu.ops import se3
from mola_lidar_odometry_tpu.ops.se3 import Pose
from mola_lidar_odometry_tpu.ops.solver import PosePrior

WINDOW = 8  # ring capacity (entries, not seconds)


@dataclass(frozen=True)
class NavStateConfig:
    max_time_to_use_velocity_model: float = 0.75  # [s]
    sliding_window_length: float = 0.5  # [s]
    sigma_random_walk_acceleration_linear: float = 1.0  # [m/s^2]
    sigma_random_walk_acceleration_angular: float = 10.0  # [rad/s^2]
    sigma_integrator_position: float = 1.0  # [m]
    sigma_integrator_orientation: float = 1.0  # [rad]
    initial_twist: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    # Prior strength of ``initial_twist`` in the window solve (reference
    # pipelines/lidar3d-default.yaml:141-142): the window's pooled twist
    # evidence counts as one unit-sigma observation, the prior as a
    # 1/sigma^2-weighted one, so small sigmas pin the twist to the prior.
    initial_twist_sigma_lin: float = 20.0  # [m/s]
    initial_twist_sigma_ang: float = 3.0  # [rad/s]
    # Geman-McClure scale for IRLS over the window's per-pair twists
    # (reference :144 ``robust_param``); 0 disables robust reweighting.
    robust_param: float = 0.0
    # Reject the window solution when its weighted twist RMSE exceeds this
    # (fall back to ``initial_twist``; reference :145 ``max_rmse``).
    max_rmse: float = 0.0

    @staticmethod
    def from_yaml(cfg: dict) -> "NavStateConfig":
        from mola_lidar_odometry_tpu.utils.config import as_float

        tw = cfg.get("initial_twist", [0.0] * 6)
        return NavStateConfig(
            max_time_to_use_velocity_model=as_float(
                cfg.get("max_time_to_use_velocity_model"), 0.75
            ),
            sliding_window_length=as_float(cfg.get("sliding_window_length"), 0.5),
            sigma_random_walk_acceleration_linear=as_float(
                cfg.get("sigma_random_walk_acceleration_linear"), 1.0
            ),
            sigma_random_walk_acceleration_angular=as_float(
                cfg.get("sigma_random_walk_acceleration_angular"), 10.0
            ),
            sigma_integrator_position=as_float(cfg.get("sigma_integrator_position"), 1.0),
            sigma_integrator_orientation=as_float(
                cfg.get("sigma_integrator_orientation"), 1.0
            ),
            initial_twist=tuple(float(as_float(x)) for x in tw),
            initial_twist_sigma_lin=as_float(cfg.get("initial_twist_sigma_lin"), 20.0),
            initial_twist_sigma_ang=as_float(cfg.get("initial_twist_sigma_ang"), 3.0),
            robust_param=as_float(cfg.get("robust_param"), 0.0),
            max_rmse=as_float(cfg.get("max_rmse"), 0.0),
        )


class NavStateBuffer(NamedTuple):
    """Ring buffer of fused poses (chronological by construction)."""

    times: jax.Array  # (W,) f32
    R: jax.Array  # (W, 3, 3) f32
    t: jax.Array  # (W, 3) f32
    valid: jax.Array  # (W,) bool
    head: jax.Array  # () i32 — next write slot

    @staticmethod
    def empty() -> "NavStateBuffer":
        return NavStateBuffer(
            times=jnp.zeros((WINDOW,), jnp.float32),
            R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (WINDOW, 3, 3)),
            t=jnp.zeros((WINDOW, 3), jnp.float32),
            valid=jnp.zeros((WINDOW,), bool),
            head=jnp.int32(0),
        )


class NavStateEstimate(NamedTuple):
    pose: Pose
    twist: jax.Array  # (6,) body twist [v, w]
    valid: jax.Array  # () bool — "hasMotionModel"
    prior: PosePrior  # ICP prior built from pose + horizon-scaled info


def fuse_pose(buf: NavStateBuffer, time, pose: Pose) -> NavStateBuffer:
    i = buf.head % WINDOW
    return NavStateBuffer(
        times=buf.times.at[i].set(jnp.asarray(time, jnp.float32)),
        R=buf.R.at[i].set(pose.R),
        t=buf.t.at[i].set(pose.t),
        valid=buf.valid.at[i].set(True),
        head=buf.head + 1,
    )


def reset(buf: NavStateBuffer) -> NavStateBuffer:
    return NavStateBuffer.empty()


def _chronological(buf: NavStateBuffer):
    """Entries oldest->newest: ring order starting at head."""
    idx = (buf.head + jnp.arange(WINDOW, dtype=jnp.int32)) % WINDOW
    return buf.times[idx], buf.R[idx], buf.t[idx], buf.valid[idx]


def estimate(buf: NavStateBuffer, cfg: NavStateConfig, t_query) -> NavStateEstimate:
    t_query = jnp.asarray(t_query, jnp.float32)
    times, Rs, ts, valid = _chronological(buf)

    in_window = valid & (t_query - times <= cfg.sliding_window_length + cfg.max_time_to_use_velocity_model)

    # newest valid entry = last slot with valid (chronological order)
    any_valid = jnp.any(valid)
    last_i = jnp.int32(WINDOW - 1)  # newest is always the last ring slot if full...
    # robust: index of last valid entry
    idx = jnp.arange(WINDOW, dtype=jnp.int32)
    last_i = jnp.max(jnp.where(valid, idx, -1))
    safe_last = jnp.maximum(last_i, 0)
    last_pose = Pose(Rs[safe_last], ts[safe_last])
    last_time = times[safe_last]

    # consecutive finite-difference twists among in-window valid pairs
    pair_ok = in_window[:-1] & in_window[1:]
    dt = times[1:] - times[:-1]
    pair_ok = pair_ok & (dt > 1e-6)
    rel = se3.compose(se3.inverse(Pose(Rs[:-1], ts[:-1])), Pose(Rs[1:], ts[1:]))
    xi = se3.se3_log(rel)  # (W-1, 6)
    safe_dt = jnp.where(pair_ok, dt, 1.0)
    tw_pairs = xi / safe_dt[:, None]
    # Recency-weighted mean: the random-walk acceleration model makes old
    # velocity samples decay fast, so the newest pair dominates (a plain
    # window mean lags accelerations by ~half the window and drags the ICP
    # initial guess behind the vehicle).
    tau = jnp.maximum(cfg.sliding_window_length / 4.0, 1e-3)
    age = t_query - times[1:]
    w = jnp.where(pair_ok, dt * dt * jnp.exp(-jnp.maximum(age, 0.0) / tau), 0.0)
    wsum = jnp.sum(w)
    have_pairs = wsum > 0
    # Normalize the window's pooled evidence to one unit-sigma twist
    # observation, then solve the tiny weighted LS together with the
    # initial-twist prior (weights 1/sigma^2 per axis) under optional
    # Geman-McClure IRLS over the per-pair twist residuals — the
    # ``NavStateFuse`` contract (reference pipelines/lidar3d-default.yaml:
    # 138-145: initial_twist + sigmas, robust_param, max_rmse).
    wn = w / jnp.where(have_pairs, wsum, 1.0)  # (W-1,) sum<=1
    init_tw = jnp.asarray(cfg.initial_twist, jnp.float32)
    sl = max(cfg.initial_twist_sigma_lin, 1e-6)
    sa = max(cfg.initial_twist_sigma_ang, 1e-6)
    w0 = jnp.asarray([1.0 / sl**2] * 3 + [1.0 / sa**2] * 3, jnp.float32)
    rob2 = cfg.robust_param * cfg.robust_param
    rw = jnp.ones_like(wn)
    n_irls = 3 if cfg.robust_param > 0 else 1
    twist = init_tw
    for _ in range(n_irls):
        den = jnp.sum(wn * rw) + w0
        num = jnp.sum(tw_pairs * (wn * rw)[:, None], axis=0) + w0 * init_tw
        twist = num / den
        if cfg.robust_param > 0:
            r2 = jnp.sum((tw_pairs - twist) ** 2, axis=-1)
            rw = jnp.where(pair_ok, (rob2 / (r2 + rob2)) ** 2, 0.0)
    if cfg.max_rmse > 0:
        rmse = jnp.sqrt(jnp.sum(wn * jnp.sum((tw_pairs - twist) ** 2, axis=-1)))
        twist = jnp.where(have_pairs & (rmse > cfg.max_rmse), init_tw, twist)
    twist = jnp.where(have_pairs, twist, init_tw)

    horizon = t_query - last_time
    model_ok = any_valid & (horizon >= 0) & (horizon <= cfg.max_time_to_use_velocity_model)

    pose_q = se3.compose(last_pose, se3.se3_exp(twist * horizon))

    # Prior information: integrator sigma + random-walk growth over horizon
    sp = cfg.sigma_integrator_position + 0.5 * cfg.sigma_random_walk_acceleration_linear * horizon**2
    so = (
        cfg.sigma_integrator_orientation
        + 0.5 * cfg.sigma_random_walk_acceleration_angular * horizon**2
    )
    inv_p = 1.0 / jnp.maximum(sp * sp, 1e-12)
    inv_o = 1.0 / jnp.maximum(so * so, 1e-12)
    diag = jnp.concatenate([jnp.full((3,), inv_p), jnp.full((3,), inv_o)])
    info = jnp.diag(diag) * model_ok.astype(jnp.float32)

    return NavStateEstimate(
        pose=Pose(
            jnp.where(model_ok, pose_q.R, last_pose.R),
            jnp.where(model_ok, pose_q.t, last_pose.t),
        ),
        twist=jnp.where(model_ok, twist, 0.0),
        valid=model_ok,
        prior=PosePrior(pose_q, info),
    )
