"""Fixed-capacity masked point buffers — the TPU metric_map_t point layers.

The reference passes observations between pipeline stages as
``mp2p_icp::metric_map_t``: a dict of named layers, each an unbounded C++
point cloud (reference module/include/mola_lidar_odometry/LidarOdometry.h:451,
512).  On TPU every array must have a static shape, so a layer is a padded
``PointCloud`` with a validity mask, and a "metric map" of observation layers
is a plain ``dict[str, PointCloud]`` whose keys/capacities are fixed at trace
time by the pipeline config.

All per-point channels the reference's XYZIRT clouds carry are kept: xyz,
intensity, ring, per-point relative timestamp.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PointCloud(NamedTuple):
    """Padded point buffer with validity mask (capacity = xyz.shape[-2])."""

    xyz: jax.Array  # (..., N, 3) f32
    time: jax.Array  # (..., N) f32 — per-point relative timestamp [s]
    intensity: jax.Array  # (..., N) f32
    ring: jax.Array  # (..., N) i32
    valid: jax.Array  # (..., N) bool

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def count(self) -> jax.Array:
        return jnp.sum(self.valid, axis=-1)

    @staticmethod
    def empty(capacity: int, batch: Tuple[int, ...] = ()) -> "PointCloud":
        return PointCloud(
            xyz=jnp.zeros(batch + (capacity, 3), jnp.float32),
            time=jnp.zeros(batch + (capacity,), jnp.float32),
            intensity=jnp.zeros(batch + (capacity,), jnp.float32),
            ring=jnp.zeros(batch + (capacity,), jnp.int32),
            valid=jnp.zeros(batch + (capacity,), bool),
        )

    @staticmethod
    def from_xyz(xyz, time=None, intensity=None, ring=None, valid=None) -> "PointCloud":
        xyz = jnp.asarray(xyz, jnp.float32)
        n = xyz.shape[-2]
        batch = xyz.shape[:-2]
        return PointCloud(
            xyz=xyz,
            time=jnp.zeros(batch + (n,), jnp.float32) if time is None else jnp.asarray(time, jnp.float32),
            intensity=(
                jnp.zeros(batch + (n,), jnp.float32) if intensity is None else jnp.asarray(intensity, jnp.float32)
            ),
            ring=jnp.zeros(batch + (n,), jnp.int32) if ring is None else jnp.asarray(ring, jnp.int32),
            valid=jnp.ones(batch + (n,), bool) if valid is None else jnp.asarray(valid, bool),
        )

    def with_mask(self, keep: jax.Array) -> "PointCloud":
        return self._replace(valid=self.valid & keep)

    def bounding_radius(self) -> jax.Array:
        """max point norm over valid points (0 if empty) — used for the
        sensor-max-range estimate (reference LidarOdometry.cpp:1499-1510)."""
        r = jnp.linalg.norm(self.xyz, axis=-1)
        return jnp.max(jnp.where(self.valid, r, 0.0), axis=-1)

    def compact(self, capacity: int) -> "PointCloud":
        """Pack valid points into the prefix of a buffer of ``capacity``.

        Deterministic (keeps input order).  Points beyond ``capacity`` are
        dropped — capacities are sized by the pipeline config so this only
        trims pathological frames.  All channels are packed into one row
        buffer first so the compaction is a SINGLE gather (per-gather fixed
        cost dominates on TPU; see ops/voxel_hash docstring).
        """
        n = self.capacity
        # first-`capacity` valid indices in input order via top_k: scoring
        # valid points by descending input position makes top_k return them
        # input-ordered.  ~10x cheaper than jnp.nonzero(size=...) on TPU
        # (0.13 ms vs 1.2 ms at 131k->65k, eval/micro_ops.py).
        score = jnp.where(self.valid, n - jnp.arange(n, dtype=jnp.int32), 0)
        vals, idx = jax.lax.top_k(score, min(capacity, n))
        if capacity > n:
            pad = capacity - n
            vals = jnp.pad(vals, (0, pad))
            idx = jnp.pad(idx, (0, pad), constant_values=n)
        in_range = vals > 0
        idx = jnp.where(in_range, idx, n)
        safe = jnp.where(in_range, idx, 0)
        packed = jnp.concatenate(
            [
                self.xyz,
                self.time[:, None],
                self.intensity[:, None],
                self.ring.astype(jnp.float32)[:, None],
                self.valid.astype(jnp.float32)[:, None],
            ],
            axis=-1,
        )  # (n, 7)
        from mola_lidar_odometry_tpu.ops import batched_mem as BM

        g = jnp.where(in_range[:, None], BM.gather_rows(packed, safe), 0.0)
        return PointCloud(
            xyz=g[:, :3],
            time=g[:, 3],
            intensity=g[:, 4],
            ring=g[:, 5].astype(jnp.int32),
            valid=in_range & (g[:, 6] > 0),
        )


# A named-layer observation map (the TPU analogue of mp2p_icp::metric_map_t
# restricted to point layers; voxel-map layers live in ops/voxel_hash.py).
LayerDict = Dict[str, PointCloud]


def transform_cloud(R: jax.Array, t: jax.Array, pc: PointCloud) -> PointCloud:
    """Rigidly transform all points (valid mask unchanged)."""
    xyz = jnp.einsum("ij,nj->ni", R, pc.xyz, precision=jax.lax.Precision.HIGHEST) + t
    return pc._replace(xyz=xyz)
