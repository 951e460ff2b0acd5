"""NDT voxel map: per-voxel Gaussians + plane normals, for point-to-plane ICP.

TPU-native replacement for ``mola::NDT`` (reference
pipelines/lidar3d-ndt.yaml:236-254: ``voxel_size``, ``min_distance_between_
points``, ``remove_voxels_farther_than`` L1 pruning, ``max_eigen_ratio_for_
planes``) and the plane side of ``mp2p_icp::Matcher_Point2Plane``
(pipelines/lidar3d-ndt.yaml:195-200).

Design: the same direct-mapped spatial-hash layout as ops/voxel_hash, but
slots store *running Gaussian moments* instead of raw points:

  * ``keys (V, 3) i32``  — voxel integer coords of the slot's occupant
  * ``n    (V,)   i32``  — points accumulated (0 = empty slot)
  * ``s    (V, 3) f32``  — sum of points
  * ``ss   (V, 6) f32``  — sum of outer products, symmetric-packed
                           [xx, yy, zz, xy, xz, yz]
  * ``normal (V, 3) f32`` / ``plane_ok (V,) bool`` — derived plane fit,
    refreshed after every insert (closed-form 3x3 symmetric eigen solve on
    the VPU; no iterative eigh)

Moment accumulation is a plain scatter-add (order-independent), so inserts
need no per-slot ranking sort — cheaper than the point-storing map.  The
reference's ``min_distance_between_points`` dedup is approximated by
pre-decimating the insert batch at that resolution (host pipeline config
does this); moments are otherwise exact.

Queries gather the 27-voxel neighborhood Gaussians of each point; the
nearest-mean voxel with a valid plane yields a point-to-plane pairing
(projection point + unit normal), with a point-to-point (nearest mean)
fallback used by the second matcher of the NDT pipeline.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mola_lidar_odometry_tpu.ops.filters import voxel_coords, voxel_hash
from mola_lidar_odometry_tpu.ops.pointcloud import PointCloud
from mola_lidar_odometry_tpu.ops.voxel_hash import claim_slots


class NdtMap(NamedTuple):
    """Fixed-capacity NDT voxel map (all arrays device-resident)."""

    voxel_size: jax.Array  # () f32
    max_eigen_ratio: jax.Array  # () f32 — lambda_min/lambda_mid plane gate
    keys: jax.Array  # (V, 3) i32
    n: jax.Array  # (V,) i32
    s: jax.Array  # (V, 3) f32
    ss: jax.Array  # (V, 6) f32 sym-packed second moments
    normal: jax.Array  # (V, 3) f32 unit plane normal (derived)
    plane_ok: jax.Array  # (V,) bool (derived)

    MIN_POINTS_FOR_PLANE = 5

    @property
    def num_slots(self) -> int:
        return self.keys.shape[0]

    def num_voxels(self) -> jax.Array:
        return jnp.sum(self.n > 0)

    def is_empty(self) -> jax.Array:
        return jnp.all(self.n == 0)

    def means(self) -> jax.Array:
        return self.s / jnp.maximum(self.n[:, None].astype(jnp.float32), 1.0)

    @staticmethod
    def create(num_slots: int, voxel_size, max_eigen_ratio=0.05) -> "NdtMap":
        if num_slots & (num_slots - 1):
            raise ValueError("num_slots must be a power of two")
        return NdtMap(
            voxel_size=jnp.asarray(voxel_size, jnp.float32),
            max_eigen_ratio=jnp.asarray(max_eigen_ratio, jnp.float32),
            keys=jnp.zeros((num_slots, 3), jnp.int32),
            n=jnp.zeros((num_slots,), jnp.int32),
            s=jnp.zeros((num_slots, 3), jnp.float32),
            ss=jnp.zeros((num_slots, 6), jnp.float32),
            normal=jnp.zeros((num_slots, 3), jnp.float32),
            plane_ok=jnp.zeros((num_slots,), bool),
        )

    def clear(self) -> "NdtMap":
        return self._replace(
            n=jnp.zeros_like(self.n),
            s=jnp.zeros_like(self.s),
            ss=jnp.zeros_like(self.ss),
            plane_ok=jnp.zeros_like(self.plane_ok),
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

    M = shifted(e1) @ shifted(e2)  # (..., 3, 3)
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


def _refresh_planes(m: NdtMap) -> NdtMap:
    """Recompute per-voxel normals + plane validity from the moments."""
    nf = jnp.maximum(m.n.astype(jnp.float32), 1.0)[:, None]
    mean = m.s / nf
    mx, my, mz = mean[:, 0], mean[:, 1], mean[:, 2]
    cov6 = m.ss / nf - jnp.stack(
        [mx * mx, my * my, mz * mz, mx * my, mx * mz, my * mz], axis=-1
    )
    v, e_min, e_mid = _sym_eigen_smallest(cov6)
    ok = (
        (m.n >= NdtMap.MIN_POINTS_FOR_PLANE)
        & (e_min >= -1e-6)
        & (e_min <= m.max_eigen_ratio * jnp.maximum(e_mid, 1e-12))
    )
    return m._replace(normal=v, plane_ok=ok)


def insert(m: NdtMap, pc: PointCloud) -> NdtMap:
    """Accumulate the valid points of ``pc`` (global frame) into the Gaussians."""
    V = m.num_slots
    coords = voxel_coords(pc.xyz, m.voxel_size)
    slot = voxel_hash(coords, V)
    accept, claim_ok = claim_slots(m.keys, m.n > 0, coords, slot, pc.valid)

    w = accept.astype(jnp.float32)
    x, y, z = pc.xyz[:, 0], pc.xyz[:, 1], pc.xyz[:, 2]
    mom = jnp.stack([x * x, y * y, z * z, x * y, x * z, y * z], axis=-1)

    new_n = m.n.at[slot].add(accept.astype(jnp.int32), mode="drop")
    new_s = m.s.at[slot].add(pc.xyz * w[:, None], mode="drop")
    new_ss = m.ss.at[slot].add(mom * w[:, None], mode="drop")
    new_keys = m.keys.at[jnp.where(claim_ok, slot, V)].set(coords, mode="drop")
    return _refresh_planes(m._replace(keys=new_keys, n=new_n, s=new_s, ss=new_ss))


def prune_farther_than(m: NdtMap, center: jax.Array, distance) -> NdtMap:
    """Drop voxels with L1 distance beyond ``distance`` (<=0 disables)."""
    centers = (m.keys.astype(jnp.float32) + 0.5) * m.voxel_size
    l1 = jnp.max(jnp.abs(centers - center), axis=-1)
    keep = (l1 <= distance) | (distance <= 0)
    return m._replace(
        n=jnp.where(keep, m.n, 0),
        plane_ok=m.plane_ok & keep,
    )


def _gather_neighborhood(m: NdtMap, queries: jax.Array):
    """Yield (slot, slot_live) for the 27 neighbor voxels of each query."""
    base = voxel_coords(queries, m.voxel_size)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                off = jnp.asarray([dx, dy, dz], jnp.int32)
                c = base + off
                s = voxel_hash(c, m.num_slots)
                live = jnp.all(m.keys[s] == c, axis=-1) & (m.n[s] > 0)
                yield s, live


def query_p2p(
    m: NdtMap, queries: jax.Array, valid: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Nearest voxel *mean* per query (the NDT pipeline's point-to-point
    fallback matcher).  Returns ``(mean_xyz, dist2, found)``."""
    n = queries.shape[0]
    means = m.means()
    best_d2 = jnp.full((n,), jnp.inf, jnp.float32)
    best_pt = jnp.zeros((n, 3), jnp.float32)
    for s, live in _gather_neighborhood(m, queries):
        mu = means[s]
        d2 = jnp.where(live, jnp.sum((mu - queries) ** 2, axis=-1), jnp.inf)
        better = d2 < best_d2
        best_d2 = jnp.where(better, d2, best_d2)
        best_pt = jnp.where(better[:, None], mu, best_pt)
    found = valid & jnp.isfinite(best_d2)
    return best_pt, jnp.where(found, best_d2, jnp.inf), found


def query_p2pl(
    m: NdtMap, queries: jax.Array, valid: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Nearest plane per query (Matcher_Point2Plane against mola::NDT).

    Selects the nearest-mean voxel with a valid plane fit in the 27-voxel
    neighborhood.  Returns ``(plane_pt, normal, dist2, found)`` where
    ``plane_pt`` is the query's orthogonal projection onto the plane and
    ``dist2`` the squared point-plane distance (what ``distanceThreshold``
    gates on).
    """
    n = queries.shape[0]
    means = m.means()
    best_d2mean = jnp.full((n,), jnp.inf, jnp.float32)
    best_mu = jnp.zeros((n, 3), jnp.float32)
    best_nrm = jnp.zeros((n, 3), jnp.float32)
    for s, live in _gather_neighborhood(m, queries):
        ok = live & m.plane_ok[s]
        mu = means[s]
        d2 = jnp.where(ok, jnp.sum((mu - queries) ** 2, axis=-1), jnp.inf)
        better = d2 < best_d2mean
        best_d2mean = jnp.where(better, d2, best_d2mean)
        best_mu = jnp.where(better[:, None], mu, best_mu)
        best_nrm = jnp.where(better[:, None], m.normal[s], best_nrm)

    found = valid & jnp.isfinite(best_d2mean)
    dpl = jnp.sum(best_nrm * (queries - best_mu), axis=-1)  # signed plane dist
    plane_pt = queries - dpl[:, None] * best_nrm
    d2 = jnp.where(found, dpl * dpl, jnp.inf)
    return plane_pt, best_nrm, d2, found
