"""Keyframe pose ring buffer — the ``mola::SearchablePoseList`` contract.

Reference usage (module/src/LidarOdometry.cpp:1065-1115): the local-map and
simple-map keyframe deciders keep every past insert pose, query the relative
pose to the *closest* one (KD-tree), and periodically drop poses farther than
a threshold.  On TPU the unbounded KD-tree becomes a fixed ring of poses with
a masked min-distance reduction (a few hundred entries cover the sliding
local map by construction — distant KFs are pruned exactly like the
reference's ``removeAllFartherThan``).

``measure_from_last_kf_only`` mirrors the reference option of the same name:
distance is then measured to the newest entry only.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mola_lidar_odometry_tpu.ops import se3
from mola_lidar_odometry_tpu.ops.se3 import Pose


class PoseRing(NamedTuple):
    R: jax.Array  # (C, 3, 3)
    t: jax.Array  # (C, 3)
    valid: jax.Array  # (C,) bool
    head: jax.Array  # () i32

    @staticmethod
    def empty(capacity: int) -> "PoseRing":
        return PoseRing(
            R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (capacity, 3, 3)),
            t=jnp.zeros((capacity, 3), jnp.float32),
            valid=jnp.zeros((capacity,), bool),
            head=jnp.int32(0),
        )

    @property
    def capacity(self) -> int:
        return self.t.shape[0]

    def size(self) -> jax.Array:
        return jnp.sum(self.valid)


def insert(ring: PoseRing, pose: Pose) -> PoseRing:
    i = ring.head % ring.capacity
    return PoseRing(
        R=ring.R.at[i].set(pose.R),
        t=ring.t.at[i].set(pose.t),
        valid=ring.valid.at[i].set(True),
        head=ring.head + 1,
    )


def check(
    ring: PoseRing, pose: Pose, *, from_last_only: bool = False
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(is_first, dist_to_closest, rot_to_closest) — SearchablePoseList::check.

    ``is_first`` is True when the ring holds no poses.  Distances follow the
    reference: Euclidean translation norm and SO(3) log-norm of the relative
    pose to the nearest (by translation) stored pose.
    """
    is_first = ring.size() == 0
    if from_last_only:
        idx = (ring.head - 1) % ring.capacity
        sel = jnp.where(ring.valid[idx], idx, 0)
    else:
        d2 = jnp.sum((ring.t - pose.t) ** 2, axis=-1)
        d2 = jnp.where(ring.valid, d2, jnp.inf)
        sel = jnp.argmin(d2)
    closest = Pose(ring.R[sel], ring.t[sel])
    dt, dr = se3.pose_error_norms(closest, pose)
    dt = jnp.where(is_first, jnp.inf, dt)
    dr = jnp.where(is_first, jnp.inf, dr)
    return is_first, dt, dr


def remove_farther_than(ring: PoseRing, center: jax.Array, distance) -> PoseRing:
    """Invalidate poses with translation farther than ``distance`` from center."""
    d2 = jnp.sum((ring.t - center) ** 2, axis=-1)
    keep = d2 <= distance * distance
    return ring._replace(valid=ring.valid & keep)
