"""NDT voxel map: per-voxel Gaussians + plane normals, for point-to-plane ICP.

TPU-native replacement for ``mola::NDT`` (reference
pipelines/lidar3d-ndt.yaml:236-254: ``voxel_size``, ``min_distance_between_
points``, ``remove_voxels_farther_than`` L1 pruning, ``max_eigen_ratio_for_
planes``) and the plane side of ``mp2p_icp::Matcher_Point2Plane``
(pipelines/lidar3d-ndt.yaml:195-200).

Design: the same direct-mapped spatial-hash layout as ops/voxel_hash, with
two stores per slot:

  * raw Gaussian **moments** for accumulation (scatter-add on insert):
    ``s (V, 3)`` point sums and ``ss (V, 6)`` symmetric-packed second moments.
    Moments are accumulated RELATIVE TO THE VOXEL CENTER (integer key * voxel
    size + half): at km-scale global positions (KITTI length) ``ulp(x^2)``
    reaches 0.1-1.0 in f32 and swamps true in-voxel variances; center-relative
    accumulation keeps every term O(voxel_size).
  * a packed **query row** ``qdata (V, 12)`` refreshed after every insert:
    ``[key3 | n | mean3 | normal3 | plane_ok | pad]`` — so a neighborhood
    probe is ONE fused gather (per-gather fixed cost dominates on TPU; see
    ops/voxel_hash docstring)

Plane normals come from a closed-form 3x3 symmetric eigen solve on the VPU
(no iterative eigh).  The reference's ``min_distance_between_points`` dedup
is approximated by pre-decimating the insert batch at that resolution (host
pipeline config does this); moments are otherwise exact.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mola_lidar_odometry_tpu.ops.filters import voxel_coords, voxel_hash
from mola_lidar_odometry_tpu.ops.pointcloud import PointCloud
from mola_lidar_odometry_tpu.ops.voxel_hash import claim_slots, neighbor_coords


class NdtMap(NamedTuple):
    """Fixed-capacity NDT voxel map (all arrays device-resident)."""

    voxel_size: jax.Array  # () f32
    max_eigen_ratio: jax.Array  # () f32 — lambda_min/lambda_mid plane gate
    qdata: jax.Array  # (V, 12) f32 packed query rows [key3|n|mean3|nrm3|ok|pad]
    s: jax.Array  # (V, 3) f32 moment sums
    ss: jax.Array  # (V, 6) f32 sym-packed second moments

    MIN_POINTS_FOR_PLANE = 5

    @property
    def num_slots(self) -> int:
        return self.qdata.shape[0]

    @property
    def keys(self) -> jax.Array:
        return self.qdata[:, :3].astype(jnp.int32)

    @property
    def n(self) -> jax.Array:
        return self.qdata[:, 3].astype(jnp.int32)

    @property
    def normal(self) -> jax.Array:
        return self.qdata[:, 7:10]

    @property
    def plane_ok(self) -> jax.Array:
        return self.qdata[:, 10] > 0

    def num_voxels(self) -> jax.Array:
        return jnp.sum(self.qdata[:, 3] > 0)

    def is_empty(self) -> jax.Array:
        return jnp.all(self.qdata[:, 3] == 0)

    def means(self) -> jax.Array:
        return self.qdata[:, 4:7]

    @staticmethod
    def create(num_slots: int, voxel_size, max_eigen_ratio=0.05) -> "NdtMap":
        if num_slots & (num_slots - 1):
            raise ValueError("num_slots must be a power of two")
        return NdtMap(
            voxel_size=jnp.asarray(voxel_size, jnp.float32),
            max_eigen_ratio=jnp.asarray(max_eigen_ratio, jnp.float32),
            qdata=jnp.zeros((num_slots, 12), jnp.float32),
            s=jnp.zeros((num_slots, 3), jnp.float32),
            ss=jnp.zeros((num_slots, 6), jnp.float32),
        )

    def clear(self) -> "NdtMap":
        return self._replace(
            qdata=self.qdata.at[:, 3:].set(0.0),
            s=jnp.zeros_like(self.s),
            ss=jnp.zeros_like(self.ss),
        )


def _sym_eigen_smallest(cov6: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Closed-form smallest eigenpair of symmetric 3x3 batches.

    ``cov6`` is (..., 6) packed [xx, yy, zz, xy, xz, yz].  Returns
    ``(eigvec_min (...,3), eig_min (...), eig_mid (...))`` via the
    trigonometric eigenvalue formula + a cross-product eigenvector — pure
    vector math, no iterative decomposition.
    """
    xx, yy, zz, xy, xz, yz = (cov6[..., i] for i in range(6))
    q = (xx + yy + zz) / 3.0
    p1 = xy * xy + xz * xz + yz * yz
    p2 = (xx - q) ** 2 + (yy - q) ** 2 + (zz - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))

    # B = (A - q I) / p; r = det(B) / 2
    bxx, byy, bzz = (xx - q) / p, (yy - q) / p, (zz - q) / p
    bxy, bxz, byz = xy / p, xz / p, yz / p
    detB = (
        bxx * (byy * bzz - byz * byz)
        - bxy * (bxy * bzz - byz * bxz)
        + bxz * (bxy * byz - byy * bxz)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)  # largest
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    e2 = 3.0 * q - e1 - e3

    # Eigenvector of e3: columns of (A - e1 I)(A - e2 I) span it.
    def shifted(e):
        return jnp.stack(
            [
                jnp.stack([xx - e, xy, xz], -1),
                jnp.stack([xy, yy - e, yz], -1),
                jnp.stack([xz, yz, zz - e], -1),
            ],
            -2,
        )

    # exact f32: the reduced-precision MXU path loses ~1e-1 here on TPU
    M = jnp.matmul(shifted(e1), shifted(e2), precision=jax.lax.Precision.HIGHEST)
    norms = jnp.linalg.norm(M, axis=-2)  # column norms (..., 3)
    col = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(M, col[..., None, None], axis=-1)[..., 0]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v = v / jnp.maximum(vn, 1e-20)
    # Degenerate (isotropic) covariance: fall back to +z; plane gate will
    # reject it anyway via the eigen ratio.
    degen = vn[..., 0] < 1e-12
    v = jnp.where(degen[..., None], jnp.asarray([0.0, 0.0, 1.0], jnp.float32), v)
    return v, e3, e2


def _voxel_centers(m: NdtMap) -> jax.Array:
    return (m.qdata[:, :3] + 0.5) * m.voxel_size


def _refresh_planes(m: NdtMap) -> NdtMap:
    """Recompute per-voxel mean/normal/plane validity into the query rows.

    ``s``/``ss`` hold voxel-center-relative moments, so the covariance is
    formed from O(voxel_size) quantities and stays exact in f32 regardless
    of how far the vehicle is from the origin.
    """
    nf32 = m.qdata[:, 3]
    nf = jnp.maximum(nf32, 1.0)[:, None]
    mean_rel = m.s / nf
    mx, my, mz = mean_rel[:, 0], mean_rel[:, 1], mean_rel[:, 2]
    cov6 = m.ss / nf - jnp.stack(
        [mx * mx, my * my, mz * mz, mx * my, mx * mz, my * mz], axis=-1
    )
    v, e_min, e_mid = _sym_eigen_smallest(cov6)
    ok = (
        (nf32 >= NdtMap.MIN_POINTS_FOR_PLANE)
        & (e_min >= -1e-6)
        & (e_min <= m.max_eigen_ratio * jnp.maximum(e_mid, 1e-12))
    )
    mean = _voxel_centers(m) + mean_rel
    qdata = m.qdata.at[:, 4:7].set(mean)
    qdata = qdata.at[:, 7:10].set(v)
    qdata = qdata.at[:, 10].set(ok.astype(jnp.float32))
    return m._replace(qdata=qdata)


def insert(m: NdtMap, pc: PointCloud) -> NdtMap:
    """Accumulate the valid points of ``pc`` (global frame) into the Gaussians."""
    return insert_stats(m, pc)[0]


def insert_stats(m: NdtMap, pc: PointCloud):
    """Insert + capacity counters (NDT has no per-voxel point cap: moments
    accumulate unbounded, so only slot-collision drops can occur)."""
    from mola_lidar_odometry_tpu.ops import batched_mem as BM

    V = m.num_slots
    Q = m.qdata.shape[1]
    coords = voxel_coords(pc.xyz, m.voxel_size)
    slot = voxel_hash(coords, V)
    g4 = BM.gather_rows(m.qdata[:, :4], slot)  # ONE gather of [key3|n]/pt
    same_key = jnp.all(g4[:, :3] == coords.astype(jnp.float32), axis=-1)
    accept, claim_ok = claim_slots(same_key, g4[:, 3] > 0, coords, slot, pc.valid, V)

    w = accept.astype(jnp.float32)
    rel = pc.xyz - (coords.astype(jnp.float32) + 0.5) * m.voxel_size
    x, y, z = rel[:, 0], rel[:, 1], rel[:, 2]
    mom = jnp.stack([x * x, y * y, z * z, x * y, x * z, y * z], axis=-1)

    a3 = jnp.arange(3, dtype=jnp.int32)
    qflat = BM.scatter_add(m.qdata.reshape(-1), slot * Q + 3, w)
    key_base = jnp.where(claim_ok, slot * Q, V * Q)
    qflat = BM.scatter_set(
        qflat, key_base[:, None] + a3[None], coords.astype(jnp.float32)
    )
    qdata = qflat.reshape(V, Q)
    new_s = BM.scatter_add(
        m.s.reshape(-1), (slot * 3)[:, None] + a3[None], rel * w[:, None]
    ).reshape(V, 3)
    new_ss = BM.scatter_add(
        m.ss.reshape(-1),
        (slot * 6)[:, None] + jnp.arange(6, dtype=jnp.int32)[None],
        mom * w[:, None],
    ).reshape(V, 6)
    from mola_lidar_odometry_tpu.ops.voxel_hash import InsertStats

    stats = InsertStats(
        collision_drops=jnp.sum(pc.valid & ~accept).astype(jnp.int32),
        full_drops=jnp.int32(0),
    )
    return _refresh_planes(m._replace(qdata=qdata, s=new_s, ss=new_ss)), stats


def prune_farther_than(m: NdtMap, center: jax.Array, distance) -> NdtMap:
    """Drop voxels with L1 distance beyond ``distance`` (<=0 disables).

    Moments are zeroed with the count: a pruned slot may be re-claimed by a
    different voxel later and must not inherit stale Gaussians.
    """
    centers = _voxel_centers(m)
    l1 = jnp.max(jnp.abs(centers - center), axis=-1)
    keep = ((l1 <= distance) | (distance <= 0)).astype(jnp.float32)
    qdata = m.qdata.at[:, 3].mul(keep)
    qdata = qdata.at[:, 10].mul(keep)
    return m._replace(
        qdata=qdata, s=m.s * keep[:, None], ss=m.ss * keep[:, None]
    )


class NdtCandSet(NamedTuple):
    """Cached neighborhood Gaussians of a query batch (one fused gather)."""

    mu: jax.Array  # (N, P, 3) voxel means
    nrm: jax.Array  # (N, P, 3) plane normals
    live: jax.Array  # (N, P) slot live + key match
    plane_ok: jax.Array  # (N, P)


def capture(m: NdtMap, queries: jax.Array, neighbors: int = 27) -> NdtCandSet:
    from mola_lidar_odometry_tpu.ops import batched_mem as BM

    base = voxel_coords(queries, m.voxel_size)
    cand = neighbor_coords(queries, base, m.voxel_size, neighbors)  # (N,P,3)
    slots = voxel_hash(cand, m.num_slots)
    g = BM.gather_rows(m.qdata, slots.reshape(-1)).reshape(
        cand.shape[0], cand.shape[1], 12
    )
    key_ok = jnp.all(g[..., :3] == cand.astype(jnp.float32), axis=-1)
    live = key_ok & (g[..., 3] > 0)
    return NdtCandSet(g[..., 4:7], g[..., 7:10], live, live & (g[..., 10] > 0))


def p2p_from(
    cand: NdtCandSet, queries: jax.Array, valid: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Nearest cached voxel *mean* per query (point-to-point fallback)."""
    mu = cand.mu
    d2 = jnp.where(cand.live, jnp.sum((mu - queries[:, None, :]) ** 2, axis=-1), jnp.inf)
    j = jnp.argmin(d2, axis=-1)
    dmin = jnp.take_along_axis(d2, j[:, None], axis=-1)[:, 0]
    pmin = jnp.take_along_axis(mu, j[:, None, None], axis=-2)[:, 0]
    found = valid & jnp.isfinite(dmin)
    return pmin, jnp.where(found, dmin, jnp.inf), found


def p2pl_from(
    cand: NdtCandSet, queries: jax.Array, valid: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Nearest cached plane per query (Matcher_Point2Plane vs mola::NDT).

    Returns ``(plane_pt, normal, dist2, found)`` where ``plane_pt`` is the
    query's orthogonal projection onto the plane and ``dist2`` the squared
    point-plane distance (what ``distanceThreshold`` gates on).
    """
    mu = cand.mu
    d2 = jnp.where(cand.plane_ok, jnp.sum((mu - queries[:, None, :]) ** 2, axis=-1), jnp.inf)
    j = jnp.argmin(d2, axis=-1)
    dmin = jnp.take_along_axis(d2, j[:, None], axis=-1)[:, 0]
    best_mu = jnp.take_along_axis(mu, j[:, None, None], axis=-2)[:, 0]
    best_nrm = jnp.take_along_axis(cand.nrm, j[:, None, None], axis=-2)[:, 0]

    found = valid & jnp.isfinite(dmin)
    dpl = jnp.sum(best_nrm * (queries - best_mu), axis=-1)  # signed plane dist
    plane_pt = queries - dpl[:, None] * best_nrm
    d2q = jnp.where(found, dpl * dpl, jnp.inf)
    return plane_pt, best_nrm, d2q, found


def query_p2p(
    m: NdtMap, queries: jax.Array, valid: jax.Array, *, neighbors: int = 27
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Single-shot nearest-mean query."""
    return p2p_from(capture(m, queries, neighbors), queries, valid)


def query_p2pl(
    m: NdtMap, queries: jax.Array, valid: jax.Array, *, neighbors: int = 27
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Single-shot nearest-plane query."""
    return p2pl_from(capture(m, queries, neighbors), queries, valid)
