"""Occupancy voxel map with ray-traced free space (log-odds), for lidar2d.

TPU-native replacement for ``mrpt::maps::CVoxelMap`` as configured by the 2D
pipeline (reference pipelines/lidar2d.yaml:183-198: ``resolution``,
``prob_hit``/``prob_miss``, ``clamp_min``/``clamp_max``,
``ray_trace_free_space``, ``remove_voxels_farther_than``,
``occupiedThreshold``) — a Bonxai-style probabilistic voxel grid.

Same direct-mapped hash layout as the other maps; slots store a log-odds
occupancy value.  Inserting a scan performs two scatter passes:

  1. **misses** — each beam is sampled at one-voxel steps from the sensor
     origin toward the endpoint (static sample count, masked past the
     endpoint) and every touched voxel accumulates the miss log-odds.  This
     deviates from an exact DDA walk (a voxel crossed twice by sample
     spacing gets the update twice) but keeps the pass one fixed-shape
     scatter; matching only consumes *occupied* voxels where hits dominate.
  2. **hits** — endpoint voxels accumulate the hit log-odds.

Log-odds are clamped to [logit(clamp_min), logit(clamp_max)].  The matcher
side exposes occupied-voxel centers as nearest-neighbor targets — the
point-layer view mp2p_icp's Matcher_Points_DistanceThreshold sees when the
global layer is an occupancy voxel map.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mola_lidar_odometry_tpu.ops.filters import voxel_coords, voxel_hash
from mola_lidar_odometry_tpu.ops.pointcloud import PointCloud
from mola_lidar_odometry_tpu.ops.voxel_hash import claim_slots, neighbor_coords


def _logit(p: float) -> float:
    return math.log(p / (1.0 - p))


class OccupancyMap(NamedTuple):
    """Fixed-capacity log-odds occupancy voxel map."""

    voxel_size: jax.Array  # () f32
    keys: jax.Array  # (V, 3) i32
    used: jax.Array  # (V,) bool — slot owned (free OR occupied knowledge)
    logodds: jax.Array  # (V,) f32
    # insert/likelihood parameters, as scalar pytree leaves (jit-safe)
    l_hit: jax.Array = _logit(0.7)
    l_miss: jax.Array = _logit(0.3)
    l_min: jax.Array = _logit(0.05)
    l_max: jax.Array = _logit(0.95)
    l_occ: jax.Array = _logit(0.6)  # occupiedThreshold

    @property
    def num_slots(self) -> int:
        return self.keys.shape[0]

    def is_empty(self) -> jax.Array:
        return ~jnp.any(self.used & (self.logodds > self.l_occ))

    def occupied(self) -> jax.Array:
        return self.used & (self.logodds > self.l_occ)

    def num_voxels(self) -> jax.Array:
        return jnp.sum(self.occupied())

    @staticmethod
    def create(
        num_slots: int,
        voxel_size,
        *,
        prob_hit: float = 0.7,
        prob_miss: float = 0.3,
        clamp_min: float = 0.05,
        clamp_max: float = 0.95,
        occupied_threshold: float = 0.6,
    ) -> "OccupancyMap":
        if num_slots & (num_slots - 1):
            raise ValueError("num_slots must be a power of two")
        return OccupancyMap(
            voxel_size=jnp.asarray(voxel_size, jnp.float32),
            keys=jnp.zeros((num_slots, 3), jnp.int32),
            used=jnp.zeros((num_slots,), bool),
            logodds=jnp.zeros((num_slots,), jnp.float32),
            l_hit=jnp.float32(_logit(prob_hit)),
            l_miss=jnp.float32(_logit(prob_miss)),
            l_min=jnp.float32(_logit(clamp_min)),
            l_max=jnp.float32(_logit(clamp_max)),
            l_occ=jnp.float32(_logit(occupied_threshold)),
        )

    def clear(self) -> "OccupancyMap":
        return self._replace(
            used=jnp.zeros_like(self.used), logodds=jnp.zeros_like(self.logodds)
        )


def _scatter_update(m: OccupancyMap, xyz, valid, delta) -> OccupancyMap:
    """Claim slots for the touched voxels and scatter-add ``delta`` log-odds."""
    V = m.num_slots
    coords = voxel_coords(xyz, m.voxel_size)
    slot = voxel_hash(coords, V)
    rows = jnp.concatenate(
        [m.keys.astype(jnp.float32), m.used.astype(jnp.float32)[:, None]], axis=-1
    )
    g4 = rows[slot]  # ONE gather of [key3|used] per point
    same_key = jnp.all(g4[:, :3] == coords.astype(jnp.float32), axis=-1)
    accept, claim_ok = claim_slots(same_key, g4[:, 3] > 0, coords, slot, valid, V)
    # fresh claims start from log-odds 0
    lo = jnp.where(m.used, m.logodds, 0.0)
    lo = lo.at[slot].add(jnp.where(accept, delta, 0.0), mode="drop")
    lo = jnp.clip(lo, m.l_min, m.l_max)
    used = m.used.at[jnp.where(accept, slot, V)].set(True, mode="drop")
    keys = m.keys.at[jnp.where(claim_ok, slot, V)].set(coords, mode="drop")
    return m._replace(keys=keys, used=used, logodds=lo)


def insert(
    m: OccupancyMap,
    pc: PointCloud,
    sensor_origin=None,
    *,
    ray_trace: bool = True,
    max_ray_samples: int = 512,
) -> OccupancyMap:
    """Insert a scan (global frame); ``sensor_origin`` (3,) is the ray origin
    for the free-space pass.  ``ray_trace``/``max_ray_samples`` are static
    (they shape the program) and come from the MapLayerDef, not the state."""
    if ray_trace:
        origin = (
            jnp.zeros(3, jnp.float32)
            if sensor_origin is None
            else jnp.asarray(sensor_origin, jnp.float32)
        )
        d = pc.xyz - origin  # (N, 3)
        rng = jnp.linalg.norm(d, axis=-1)
        S = max_ray_samples
        # samples at one-voxel spacing, masked past (range - half voxel)
        ts = (jnp.arange(S, dtype=jnp.float32)[None, :] + 0.5) * m.voxel_size  # (1,S)
        inside = ts < (rng[:, None] - 0.5 * m.voxel_size)
        pts = origin + d[:, None, :] * (ts / jnp.maximum(rng[:, None], 1e-6))[:, :, None]
        miss_valid = inside & pc.valid[:, None]
        m = _scatter_update(
            m, pts.reshape(-1, 3), miss_valid.reshape(-1), m.l_miss
        )
    return _scatter_update(m, pc.xyz, pc.valid, m.l_hit)


def prune_farther_than(m: OccupancyMap, center: jax.Array, distance) -> OccupancyMap:
    """Drop voxels with L1 distance beyond ``distance`` (<=0 disables)."""
    centers = (m.keys.astype(jnp.float32) + 0.5) * m.voxel_size
    l1 = jnp.max(jnp.abs(centers - center), axis=-1)
    keep = (l1 <= distance) | (distance <= 0)
    return m._replace(used=m.used & keep)


class OccCandSet(NamedTuple):
    """Cached occupied-voxel-center candidates (one fused gather)."""

    ctr: jax.Array  # (N, P, 3) probed voxel centers
    live: jax.Array  # (N, P) occupied + key match


def capture(m: OccupancyMap, queries: jax.Array, neighbors: int = 27) -> OccCandSet:
    """ONE fused gather of [key3|occupied] rows around ``queries``."""
    n = queries.shape[0]
    base = voxel_coords(queries, m.voxel_size)
    cand = neighbor_coords(queries, base, m.voxel_size, neighbors)  # (N,P,3)
    slots = voxel_hash(cand, m.num_slots)  # (N, P)
    occ = m.occupied().astype(jnp.float32)
    rows = jnp.concatenate([m.keys.astype(jnp.float32), occ[:, None]], axis=-1)
    g = rows[slots.reshape(-1)].reshape(n, cand.shape[1], 4)
    live = jnp.all(g[..., :3] == cand.astype(jnp.float32), axis=-1) & (g[..., 3] > 0)
    ctr = (cand.astype(jnp.float32) + 0.5) * m.voxel_size  # (N, P, 3)
    return OccCandSet(ctr, live)


def _k_from(cand: OccCandSet, queries: jax.Array, k: int):
    d2 = jnp.where(
        cand.live, jnp.sum((cand.ctr - queries[:, None, :]) ** 2, axis=-1), jnp.inf
    )
    tk, ti = jax.lax.top_k(-d2, k)
    best_pt = jnp.take_along_axis(cand.ctr, ti[:, :, None], axis=-2)
    return best_pt, -tk


def p2p_from(cand: OccCandSet, queries, valid):
    pt, d2 = _k_from(cand, queries, 1)
    found = valid & jnp.isfinite(d2[:, 0])
    return pt[:, 0], jnp.where(found, d2[:, 0], jnp.inf), found


def p2p2_from(cand: OccCandSet, queries, valid):
    pt, d2 = _k_from(cand, queries, 2)
    found = valid[:, None] & jnp.isfinite(d2)
    return pt, jnp.where(found, d2, jnp.inf), found


def query_p2p(
    m: OccupancyMap, queries: jax.Array, valid: jax.Array, *, neighbors: int = 27
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Nearest *occupied* voxel center per query."""
    return p2p_from(capture(m, queries, neighbors), queries, valid)


def query_p2p2(
    m: OccupancyMap, queries: jax.Array, valid: jax.Array, *, neighbors: int = 27
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Two nearest occupied voxel centers (pairingsPerPoint=2,
    lidar2d.yaml matcher)."""
    return p2p2_from(capture(m, queries, neighbors), queries, valid)
