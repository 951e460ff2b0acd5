"""Point-cloud filter kernels — TPU equivalents of mp2p_icp_filters.

Each function is a pure, jit/vmap-safe array op over masked fixed-capacity
``PointCloud`` buffers.  Contracts follow the reference YAML usage (see
SURVEY.md §2.3):

  * ``FilterDecimateVoxels``  -> :func:`decimate_voxels`
      (pipelines/lidar3d-default.yaml:285-292)
  * ``FilterByRange``         -> :func:`filter_by_range`      (:297-302)
  * ``FilterBoundingBox``     -> :func:`filter_bounding_box`  (:305-310)
  * ``FilterDeskew``          -> :func:`deskew`               (:328-350)
  * ``FilterAdjustTimestamps``-> :func:`adjust_timestamps`    (:267-276)
  * ``FilterNormalizeIntensity``/``FilterByIntensity``/``FilterCurvature``
      -> :func:`normalize_intensity` / :func:`filter_by_intensity` /
         :func:`filter_curvature` (extras pipelines)

Voxel decimation replaces the reference's per-voxel hash map walk with a
parallel scatter-min: every point computes its voxel's hash slot, the lowest
point index wins the slot, and winners keep their points ("FirstPoint"
semantics — first point in input order per voxel).  Two voxels that collide
in the hash table merge (one voxel is dropped for that frame); with the
default table 4x larger than the point count this is rare and only slightly
over-decimates.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mola_lidar_odometry_tpu.ops import se3
from mola_lidar_odometry_tpu.ops.pointcloud import PointCloud

# Spatial hash primes (standard Teschner et al. constants).
_HX = jnp.int32(73856093)
_HY = jnp.int32(19349663)
_HZ = jnp.int32(83492791)


def voxel_coords(xyz: jax.Array, voxel_size) -> jax.Array:
    """Integer voxel coordinates: floor(x / voxel_size), (..., 3) i32."""
    return jnp.floor(xyz / voxel_size).astype(jnp.int32)


def voxel_hash(coords: jax.Array, table_size: int) -> jax.Array:
    """Spatial hash of (..., 3) i32 voxel coords into [0, table_size).

    table_size must be a power of two.

    POLYNOMIAL chaining, not xor-of-multiplies: for any odd ``a``,
    ``a ^ -a == -2``, so xoring two sign-flipped odd products always
    collides — the classic ``x*HX ^ y*HY ^ z*HZ`` mix mapped EVERY voxel
    pair ``(x, y, z)``/``(-x, -y, z)`` with odd x, y to the same slot (a
    dense systematic collision family straddling the origin, where every
    trajectory starts).  The Horner-style chain below has no such family;
    the final shift-xor folds high-order entropy into the masked bits.
    """
    h = (coords[..., 0] * _HX + coords[..., 1]) * _HY + coords[..., 2]
    h = h * _HZ
    h = h ^ (h >> 16)
    return (h & jnp.int32(table_size - 1)).astype(jnp.int32)


def decimate_voxels(
    pc: PointCloud,
    voxel_size,
    out_capacity: int,
    *,
    method: str = "FirstPoint",
    min_input_points: int = 0,
    table_size: int = 1 << 19,
) -> PointCloud:
    """Voxel-grid downsample (FilterDecimateVoxels).

    ``method``:
      * ``FirstPoint``        — keep the first valid input point per voxel.
      * ``ClosestToAverage``  — keep the point closest to the voxel centroid.

    If the number of valid input points is below ``min_input_points`` the
    input passes through unfiltered (reference
    ``minimum_input_points_to_filter``), still compacted to ``out_capacity``.
    """
    from mola_lidar_odometry_tpu.ops import batched_mem as BM

    n = pc.capacity
    slots = voxel_hash(voxel_coords(pc.xyz, voxel_size), table_size)
    idx = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(n)

    if method == "FirstPoint":
        # Sort-based: TPU scatter costs ~36 ns per scattered element while
        # sort has a flat ~2.5 ms floor (eval/micro_gather.py), so the
        # scatter-min claim table (~18 ms/step at B=8 in the round-2 device
        # profile) loses to two sorts at 131k points.  Lexicographic
        # (slot, idx) sort groups each voxel's points with the lowest input
        # index first — run heads ARE the FirstPoint winners; a second
        # 1-operand sort compacts winners to the front in input order.
        T = jnp.int32(table_size)
        key = jnp.where(pc.valid, slots, T)
        # stable 1-key sort: idx rides as a VALUE operand — within equal
        # keys the ascending input order is preserved, so the explicit idx
        # key is redundant and the comparator is half as wide (the two
        # decimation sorts are raw-capacity-sized, ~1 ns/element on device)
        skey, sidx = jax.lax.sort([key, idx], num_keys=1, is_stable=True)
        first = (
            jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
            & (skey < T)
        )
        passthrough = pc.count() < min_input_points
        winner = jnp.where(passthrough, skey < T, first)
        # compact winners to the front with a SECOND, single-operand sort:
        # the loser flag rides above the winner's ORIGINAL INPUT INDEX in
        # ONE i32 key, so ascending order emits winners in INPUT order and
        # the key's low bits ARE the output indices (no gather).  Input
        # order is load-bearing, not cosmetic: decimation CASCADES
        # (decimated_for_icp re-decimates decimated_for_map's output), and
        # FirstPoint at the next stage keeps the first point per coarse
        # voxel in *input* order — a slot-ordered stage-1 output changes
        # which representative wins stage 2, which diverges from the
        # reference/oracle semantics (round-4 NDT parity failure: worst
        # 0.206 vs the 0.1 gate, bisected to exactly this).  Round-4
        # device A/B at 131k x B=8: this 1-operand sort 0.90 ms,
        # 2-operand stable sort 1.26 ms, top_k 1.49 ms, cumsum+flat-
        # scatter 4.8 ms.  Winners beyond out_capacity are dropped (same
        # truncation contract as before; the saturation watchdog in
        # models/odometry.py still sees the layer fill).
        shift = max(1, (n - 1).bit_length())
        k2 = jnp.where(winner, 0, jnp.int32(1) << shift) | sidx
        (k2s,) = jax.lax.sort([k2], num_keys=1)
        sel = k2s & ((jnp.int32(1) << shift) - 1)
        nw = jnp.sum(winner.astype(jnp.int32))
        if out_capacity <= n:
            out_idx = sel[:out_capacity]
        else:
            out_idx = jnp.pad(sel, (0, out_capacity - n))
        valid_out = jnp.arange(out_capacity, dtype=jnp.int32) < nw
        packed = jnp.concatenate(
            [
                pc.xyz,
                pc.time[:, None],
                pc.intensity[:, None],
                pc.ring.astype(jnp.float32)[:, None],
            ],
            axis=-1,
        )  # (n, 6)
        g = jnp.where(
            valid_out[:, None],
            BM.gather_rows(packed, jnp.where(valid_out, out_idx, 0)),
            0.0,
        )
        return PointCloud(
            xyz=g[:, :3],
            time=g[:, 3],
            intensity=g[:, 4],
            ring=g[:, 5].astype(jnp.int32),
            valid=valid_out,
        )
    elif method == "ClosestToAverage":
        # Pass 1: per-slot centroid via scatter-add (flat 3-lane layout so
        # the batched form stays a single flat scatter).
        idx3 = slots[:, None] * 3 + jnp.arange(3, dtype=jnp.int32)[None]
        ssum = BM.scatter_add(
            jnp.zeros((table_size * 3,), jnp.float32),
            idx3,
            jnp.where(pc.valid[:, None], pc.xyz, 0.0),
        )
        scnt = BM.scatter_add(
            jnp.zeros((table_size,), jnp.float32), slots, pc.valid.astype(jnp.float32)
        )
        mean = BM.gather_rows(ssum.reshape(table_size, 3), slots) / jnp.maximum(
            BM.gather_rows(scnt, slots), 1.0
        )[:, None]
        d2 = jnp.sum((pc.xyz - mean) ** 2, axis=-1)
        # scatter-min distance, then the first index attaining it wins
        dist_table = BM.table_min(
            jnp.full((table_size,), jnp.inf, jnp.float32),
            slots,
            jnp.where(pc.valid, d2, jnp.inf),
        )
        attains = pc.valid & (d2 <= BM.gather_rows(dist_table, slots))
        cand = jnp.where(attains, idx, big)
    else:
        raise ValueError(f"Unknown decimate method {method!r}")

    table = BM.table_min(jnp.full((table_size,), big, jnp.int32), slots, cand)
    keep = pc.valid & (BM.gather_rows(table, slots) == idx)

    n_in = pc.count()
    passthrough = n_in < min_input_points
    keep = jnp.where(passthrough, pc.valid, keep)
    return pc._replace(valid=keep).compact(out_capacity)


def filter_by_range(
    pc: PointCloud, range_min, range_max
) -> Tuple[PointCloud, PointCloud]:
    """Split by sensor-frame range: (between, outside) layers (FilterByRange)."""
    r2 = jnp.sum(pc.xyz * pc.xyz, axis=-1)
    between = (r2 >= range_min * range_min) & (r2 <= range_max * range_max)
    return pc.with_mask(between), pc.with_mask(~between)


def filter_bounding_box(
    pc: PointCloud, bb_min, bb_max
) -> Tuple[PointCloud, PointCloud]:
    """Split by axis-aligned box: (inside, outside) layers (FilterBoundingBox)."""
    bb_min = jnp.asarray(bb_min, jnp.float32)
    bb_max = jnp.asarray(bb_max, jnp.float32)
    inside = jnp.all((pc.xyz >= bb_min) & (pc.xyz <= bb_max), axis=-1)
    return pc.with_mask(inside), pc.with_mask(~inside)


def adjust_timestamps(pc: PointCloud, *, method: str = "MiddleIsZero", offset=0.0) -> PointCloud:
    """Shift per-point timestamps (FilterAdjustTimestamps).

    ``MiddleIsZero``: the midpoint of [t_min, t_max] maps to 0.
    ``EarliestIsZero``: t_min maps to 0.  ``offset`` (the per-sensor
    SENSOR_TIME_OFFSET dynamic variable) is added afterwards.
    """
    tmin = jnp.min(jnp.where(pc.valid, pc.time, jnp.inf))
    tmax = jnp.max(jnp.where(pc.valid, pc.time, -jnp.inf))
    any_valid = jnp.any(pc.valid)
    tmin = jnp.where(any_valid, tmin, 0.0)
    tmax = jnp.where(any_valid, tmax, 0.0)
    if method == "MiddleIsZero":
        shift = 0.5 * (tmin + tmax)
    elif method == "EarliestIsZero":
        shift = tmin
    else:
        raise ValueError(f"Unknown timestamp method {method!r}")
    return pc._replace(time=jnp.where(pc.valid, pc.time - shift + offset, pc.time))


def deskew(pc: PointCloud, twist: jax.Array, *, skip: bool = False) -> PointCloud:
    """Motion-compensate points using the body twist (FilterDeskew).

    Each point at relative time dt moves to ``R(w*dt) p + v*dt`` where
    ``twist = [vx vy vz wx wy wz]`` — the vehicle pose advanced by constant
    twist from the timestamp-zero reference instant (which
    ``adjust_timestamps(MiddleIsZero)`` put mid-scan).
    """
    if skip:
        return pc
    v, w = twist[:3], twist[3:]
    dt = pc.time[:, None]
    Rp = se3.so3_exp(w[None, :] * dt)  # (N, 3, 3)
    # exact f32: the default reduced-precision MXU pass corrupts deskewed
    # coordinates by tens of cm at lidar range (see ops/se3._HI rationale)
    xyz = (
        jnp.einsum("nij,nj->ni", Rp, pc.xyz, precision=jax.lax.Precision.HIGHEST)
        + v[None, :] * dt
    )
    return pc._replace(xyz=jnp.where(pc.valid[:, None], xyz, pc.xyz))


def normalize_intensity(pc: PointCloud) -> PointCloud:
    """Scale intensities into [0, 1] by the per-frame max (FilterNormalizeIntensity)."""
    m = jnp.max(jnp.where(pc.valid, pc.intensity, 0.0))
    return pc._replace(intensity=pc.intensity / jnp.maximum(m, 1e-12))


def filter_by_intensity(pc: PointCloud, low, high) -> PointCloud:
    """Keep points with intensity in [low, high] (FilterByIntensity)."""
    keep = (pc.intensity >= low) & (pc.intensity <= high)
    return pc.with_mask(keep)


def curvature_mask(
    pc: PointCloud,
    *,
    max_cosine: float = 0.5,
    min_clearance: float = 0.02,
    max_gap: float = 1e9,
    window: int = 2,
) -> jax.Array:
    """High-curvature ("edge") mask along scan order (FilterCurvature).

    The reference's FilterCurvature walks each ring and scores a point by the
    angle between its neighbors (extras/lidar3d-edges.yaml:252-259).  Here the
    score is the cosine of the angle between the vectors to the +/-``window``
    neighbors in buffer order within the same ring; edges have
    ``cos > -max_cosine`` ... points on straight lines have cos ~ -1.
    ``max_gap`` rejects points whose neighbors are farther than this (range
    discontinuities, not edges).
    """
    prev = jnp.roll(pc.xyz, window, axis=0)
    nxt = jnp.roll(pc.xyz, -window, axis=0)
    ring_ok = (jnp.roll(pc.ring, window) == pc.ring) & (jnp.roll(pc.ring, -window) == pc.ring)
    a = prev - pc.xyz
    b = nxt - pc.xyz
    na = jnp.linalg.norm(a, axis=-1)
    nb = jnp.linalg.norm(b, axis=-1)
    cos = jnp.sum(a * b, axis=-1) / jnp.maximum(na * nb, 1e-9)
    clear = (na > min_clearance) & (nb > min_clearance) & (na < max_gap) & (nb < max_gap)
    return (cos > -max_cosine) & clear & ring_ok


def filter_curvature(pc: PointCloud, **kw) -> PointCloud:
    """Keep high-curvature ("edge") points (FilterCurvature, larger side)."""
    return pc.with_mask(curvature_mask(pc, **kw))


def range_image_edge_mask(
    pc: PointCloud, *, score_threshold: float = 10.0, row_window_length: int = 6
) -> jax.Array:
    """Edge score over an organized scan (GeneratorEdgesFromRangeImage).

    The reference extracts edge pixels from organized range images by a
    row-window range-difference score (pipelines/rgbd.yaml:233-244:
    ``score_threshold`` 10, ``row_window_length`` 6).  Points are assumed
    stored row-major with ``ring`` = row index (our organized-scan layout);
    the LOAM-style score is ``sum_j |r_{i+j} - r_i| / r_i`` over the +/-
    window within the same row, scaled x100 to match the reference's
    integer-centric threshold range.
    """
    r = jnp.linalg.norm(pc.xyz, axis=-1)
    score = jnp.zeros_like(r)
    in_row = jnp.ones_like(r, dtype=bool)
    w = max(1, row_window_length // 2)
    for j in range(1, w + 1):
        for sgn in (-1, 1):
            rj = jnp.roll(r, sgn * j)
            ring_ok = jnp.roll(pc.ring, sgn * j) == pc.ring
            vj = jnp.roll(pc.valid, sgn * j) & ring_ok
            score = score + jnp.where(vj, jnp.abs(rj - r), 0.0)
            in_row = in_row & vj
    rel = 100.0 * score / jnp.maximum(r, 1e-6)
    return pc.valid & in_row & (rel > score_threshold)
