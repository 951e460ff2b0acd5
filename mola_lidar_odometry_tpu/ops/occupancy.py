"""Occupancy voxel map with ray-traced free space (log-odds), for lidar2d.

TPU-native replacement for ``mrpt::maps::CVoxelMap`` as configured by the 2D
pipeline (reference pipelines/lidar2d.yaml:183-198: ``resolution``,
``prob_hit``/``prob_miss``, ``clamp_min``/``clamp_max``,
``ray_trace_free_space``, ``remove_voxels_farther_than``,
``occupiedThreshold``) — a Bonxai-style probabilistic voxel grid.

Same direct-mapped hash layout as the other maps; slots store a log-odds
occupancy value.  Inserting a scan performs two scatter passes:

  1. **misses** — an exact Amanatides-Woo DDA walk (``lax.scan`` over a
     static step budget) emits every voxel the beam crosses exactly once,
     masked past ``range - voxel/2``; all emitted voxels accumulate the
     miss log-odds in one fixed-shape scatter.  This matches the oracle's
     fine dedup'd walk (oracle.py ExactOccupancyMap.insert) and mrpt's
     Bonxai ray cast — round-4 fix of the sampled-ray deviation.
  2. **hits** — endpoint voxels accumulate the hit log-odds.

Log-odds are clamped to [logit(clamp_min), logit(clamp_max)].  The matcher
side exposes occupied-voxel centers as nearest-neighbor targets — the
point-layer view mp2p_icp's Matcher_Points_DistanceThreshold sees when the
global layer is an occupancy voxel map.

**Match index (round 3, rebuilt per insert since round 4).**  The reference
matcher's NN search is a true KD-tree over occupied centers (unbounded
radius), but a 27-probe capture at the occupancy *resolution* (0.05 m for
lidar2d.yaml) only sees ±0.075 m — far below the pipeline's annealed match
threshold (2sigma, sigma_0 = 1.0), so ICP went blind beyond one voxel and
the 2D family lost the whole inter-frame motion (caught by the round-3
oracle parity test).  The map therefore carries a companion ``match``
VoxelHashMap holding occupied-voxel CENTERS on a coarse grid
(``match_grid_factor`` x resolution): capture probes that grid, extending
the exact-NN radius to one coarse cell (0.4 m by default) at the same
fused-gather cost.  The index is REBUILT from the live occupied set on
every insert (epoch-bump clear + one fixed-shape insert of the slot
table), so a voxel that decays below the occupied threshold leaves the
index immediately — exactly the oracle's ``match_targets`` recompute and
the reference KD-tree rebuild semantics (no stale-center deviation).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mola_lidar_odometry_tpu.ops.filters import voxel_coords, voxel_hash
from mola_lidar_odometry_tpu.ops.pointcloud import PointCloud
from mola_lidar_odometry_tpu.ops.voxel_hash import claim_slots


def _logit(p: float) -> float:
    return math.log(p / (1.0 - p))


class OccupancyMap(NamedTuple):
    """Fixed-capacity log-odds occupancy voxel map (+ coarse match index)."""

    voxel_size: jax.Array  # () f32
    keys: jax.Array  # (V, 3) i32
    used: jax.Array  # (V,) bool — slot owned (free OR occupied knowledge)
    logodds: jax.Array  # (V,) f32
    # coarse NN index of occupied-voxel centers (see module docstring)
    match: "object" = None  # VoxelHashMap
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

    MATCH_GRID_FACTOR = 8  # coarse match-index cell = factor * resolution
    MATCH_POINTS_PER_VOXEL = 32

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
        match_points_per_voxel: int = MATCH_POINTS_PER_VOXEL,
    ) -> "OccupancyMap":
        from mola_lidar_odometry_tpu.ops.voxel_hash import VoxelHashMap

        if num_slots & (num_slots - 1):
            raise ValueError("num_slots must be a power of two")
        match = VoxelHashMap.create(
            num_slots,
            match_points_per_voxel,
            jnp.asarray(voxel_size, jnp.float32) * OccupancyMap.MATCH_GRID_FACTOR,
        )
        return OccupancyMap(
            voxel_size=jnp.asarray(voxel_size, jnp.float32),
            keys=jnp.zeros((num_slots, 3), jnp.int32),
            used=jnp.zeros((num_slots,), bool),
            logodds=jnp.zeros((num_slots,), jnp.float32),
            match=match,
            l_hit=jnp.float32(_logit(prob_hit)),
            l_miss=jnp.float32(_logit(prob_miss)),
            l_min=jnp.float32(_logit(clamp_min)),
            l_max=jnp.float32(_logit(clamp_max)),
            l_occ=jnp.float32(_logit(occupied_threshold)),
        )

    def set_voxel_size(self, voxel_size) -> "OccupancyMap":
        vs = jnp.asarray(voxel_size, jnp.float32)
        return self._replace(
            voxel_size=vs,
            match=self.match._replace(voxel_size=vs * self.MATCH_GRID_FACTOR),
        )

    def clear(self) -> "OccupancyMap":
        return self._replace(
            used=jnp.zeros_like(self.used),
            logodds=jnp.zeros_like(self.logodds),
            match=self.match.clear(),
        )


def _scatter_update(m: OccupancyMap, xyz, valid, delta):
    """Claim slots for the touched voxels and scatter-add ``delta`` log-odds."""
    V = m.num_slots
    coords = voxel_coords(xyz, m.voxel_size)
    slot = voxel_hash(coords, V)
    rows = jnp.concatenate(
        [m.keys.astype(jnp.float32), m.used.astype(jnp.float32)[:, None]], axis=-1
    )
    g4 = rows[slot]  # ONE gather of [key3|used] per point
    same_key = jnp.all(g4[:, :3] == coords.astype(jnp.float32), axis=-1)
    occupied = g4[:, 3] > 0
    accept, claim_ok = claim_slots(same_key, occupied, coords, slot, valid, V)
    # fresh claims start from log-odds 0
    lo = jnp.where(m.used, m.logodds, 0.0)
    lo = lo.at[slot].add(jnp.where(accept, delta, 0.0), mode="drop")
    lo = jnp.clip(lo, m.l_min, m.l_max)
    used = m.used.at[jnp.where(accept, slot, V)].set(True, mode="drop")
    keys = m.keys.at[jnp.where(claim_ok, slot, V)].set(coords, mode="drop")
    return m._replace(keys=keys, used=used, logodds=lo)


def _dda_voxels(origin: jax.Array, xyz: jax.Array, valid, voxel_size, n_steps: int):
    """Exact Amanatides-Woo voxel walk from ``origin`` toward each point.

    Returns ``(coords, emit)`` of shapes ``(S, N, 3)`` / ``(S, N)``: the
    first ``S`` voxels each beam crosses (origin voxel first, each crossed
    voxel exactly once) with ``emit`` masking voxels whose ENTRY ray
    parameter is below ``range - voxel/2`` — the same stop rule as the
    oracle's fine walk (oracle.py ExactOccupancyMap.insert).  The recurrence
    is a ``lax.scan`` over the static step budget: per step, advance the
    axis whose next grid crossing is nearest (all (N,)-vector ops)."""
    vs = jnp.asarray(voxel_size, jnp.float32)
    d = xyz - origin[None, :]
    rng = jnp.linalg.norm(d, axis=-1)
    lim = rng - 0.5 * vs  # (N,)
    safe = jnp.maximum(jnp.abs(d), 1e-12)
    stepdir = jnp.where(d >= 0, 1, -1).astype(jnp.int32)  # (N, 3)
    # per-axis ray-parameter (in units of |ray|: t in [0, rng]) per crossing
    tdelta = vs * rng[:, None] / safe
    v0 = jnp.floor(origin / vs).astype(jnp.int32)[None, :] * jnp.ones(
        (xyz.shape[0], 1), jnp.int32
    )
    frac = origin[None, :] / vs - v0.astype(jnp.float32)
    dist_to_edge = jnp.where(d >= 0, 1.0 - frac, frac)
    tmax0 = dist_to_edge * tdelta  # (N, 3)
    # degenerate axes (d==0) never advance
    tmax0 = jnp.where(jnp.abs(d) < 1e-12, jnp.float32(jnp.inf), tmax0)

    def body(carry, _):
        v, tmax, t_entry = carry
        emit = valid & (t_entry < lim)
        ax = jnp.argmin(tmax, axis=-1)  # (N,)
        t_next = jnp.min(tmax, axis=-1)
        onehot = jax.nn.one_hot(ax, 3, dtype=jnp.int32)
        v_next = v + onehot * stepdir
        tmax_next = tmax + onehot.astype(jnp.float32) * tdelta
        return (v_next, tmax_next, t_next), (v, emit)

    (_, _, _), (coords, emit) = jax.lax.scan(
        body,
        (v0, tmax0, jnp.zeros_like(rng)),
        None,
        length=n_steps,
        unroll=4,
    )
    return coords, emit


def insert(
    m: OccupancyMap,
    pc: PointCloud,
    sensor_origin=None,
    *,
    ray_trace: bool = True,
    max_ray_samples: int = 512,
) -> OccupancyMap:
    return insert_stats(
        m, pc, sensor_origin, ray_trace=ray_trace, max_ray_samples=max_ray_samples
    )[0]


def insert_stats(
    m: OccupancyMap,
    pc: PointCloud,
    sensor_origin=None,
    *,
    ray_trace: bool = True,
    max_ray_samples: int = 512,
):
    """Insert a scan (global frame); ``sensor_origin`` (3,) is the ray origin
    for the free-space pass.  ``ray_trace``/``max_ray_samples`` are static
    (they shape the program) and come from the MapLayerDef, not the state."""
    from mola_lidar_odometry_tpu.ops import voxel_hash as vh

    if ray_trace:
        origin = (
            jnp.zeros(3, jnp.float32)
            if sensor_origin is None
            else jnp.asarray(sensor_origin, jnp.float32)
        )
        # exact DDA walk: each crossed voxel exactly once (oracle semantics)
        coords, emit = _dda_voxels(
            origin, pc.xyz, pc.valid, m.voxel_size, max_ray_samples
        )
        centers = (coords.astype(jnp.float32) + 0.5) * m.voxel_size
        m = _scatter_update(
            m, centers.reshape(-1, 3), emit.reshape(-1), m.l_miss
        )

    m2 = _scatter_update(m, pc.xyz, pc.valid, m.l_hit)
    # ---- match index: rebuild from the LIVE occupied set ------------------
    # Epoch-bump clear + one fixed-shape insert of the slot table.  Decayed
    # voxels leave the index the same frame (oracle match_targets semantics);
    # a coarse cell overflowing its point cap surfaces as full_drops.
    all_centers = (m2.keys.astype(jnp.float32) + 0.5) * m2.voxel_size
    # epoch liveness is 16-bit: a slot last written at epoch e would read
    # live again at e + 65536 (multi-hour runs), resurrecting stale centers
    # for a frame per wrap.  Hard-zero one row slab per insert (rolling, same
    # cost class as slab eviction): every slot is physically cleared every
    # n_slabs frames, so nothing survives to meet its epoch again.
    mc = m2.match.clear()
    mc = vh.zero_state_slab(mc, mc.epoch, n_slabs=64)
    match, mstats = vh.insert_stats(
        mc, PointCloud.from_xyz(all_centers, valid=m2.occupied())
    )
    return m2._replace(match=match), mstats


def prune_farther_than(m: OccupancyMap, center: jax.Array, distance) -> OccupancyMap:
    """Drop voxels with L1 distance beyond ``distance`` (<=0 disables)."""
    from mola_lidar_odometry_tpu.ops import voxel_hash as vh

    centers = (m.keys.astype(jnp.float32) + 0.5) * m.voxel_size
    l1 = jnp.max(jnp.abs(centers - center), axis=-1)
    keep = (l1 <= distance) | (distance <= 0)
    return m._replace(
        used=m.used & keep,
        match=vh.prune_farther_than(m.match, center, distance),
    )


def capture(m: OccupancyMap, queries: jax.Array, neighbors: int = 27):
    """Neighborhood candidates from the coarse match index (occupied-voxel
    centers in a VoxelHashMap — so the exact-NN radius is one coarse cell,
    covering the annealed matcher thresholds; see module docstring).
    Returns a ``voxel_hash.CandSet``; all downstream matching reuses the
    point-map paths."""
    from mola_lidar_odometry_tpu.ops import voxel_hash as vh

    return vh.capture(m.match, queries, neighbors)


def query_p2p(
    m: OccupancyMap, queries: jax.Array, valid: jax.Array, *, neighbors: int = 27
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Nearest *occupied* voxel center per query."""
    from mola_lidar_odometry_tpu.ops import voxel_hash as vh

    return vh.nn_from(capture(m, queries, neighbors), queries, valid)


def query_p2p2(
    m: OccupancyMap, queries: jax.Array, valid: jax.Array, *, neighbors: int = 27
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Two nearest occupied voxel centers (pairingsPerPoint=2,
    lidar2d.yaml matcher)."""
    from mola_lidar_odometry_tpu.ops import voxel_hash as vh

    return vh.nn2_from(capture(m, queries, neighbors), queries, valid)
