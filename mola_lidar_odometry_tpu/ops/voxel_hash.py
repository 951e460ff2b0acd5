"""Device-resident sliding hash-voxel point map + NN queries.

TPU-native replacement for ``mola::HashedVoxelPointCloud``
(reference pipelines/lidar3d-default.yaml:228-242: ``voxel_size``,
``max_points_per_voxel``, ``remove_voxels_farther_than`` L1 pruning) and for
the KD-tree NN search inside ``mp2p_icp::Matcher_Points_DistanceThreshold``
(pipelines/lidar3d-default.yaml:196-204).

Design (SURVEY.md §7): a direct-mapped spatial-hash table in HBM with a
static slot count ``V`` and per-voxel point capacity ``K``:

  * ``keys  (V, 3) i32`` — voxel integer coords of the slot's occupant
  * ``count (V,)   i32`` — live points in the slot (0 = empty)
  * ``pts   (V, K, 3) f32`` — point storage

Insertion is fully parallel and atomics-free:
  1. empty slots are *claimed* by scatter-min over point index (deterministic
     first-point-wins, mirroring the C++ map's insertion order semantics);
  2. per-slot arrival ranks come from one sort over the insert batch;
  3. points scatter into ``pts[slot, count+rank]`` bounded by ``K``.
Hash collisions (two voxels, one slot) drop the newcomer's points for that
frame — with V >= 4x the live voxel count this is rare, and distance-based
eviction recycles slots continuously.

Queries probe the static 3x3x3 voxel neighborhood of each query point and
reduce over the <=27*K candidates — the dense, fixed-shape analogue of the
reference's KD-tree radius search, sized so the whole thing stays in
registers/VMEM under XLA fusion.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mola_lidar_odometry_tpu.ops.filters import voxel_coords, voxel_hash
from mola_lidar_odometry_tpu.ops.pointcloud import PointCloud


class VoxelHashMap(NamedTuple):
    """Fixed-capacity voxel point map (all arrays device-resident)."""

    voxel_size: jax.Array  # () f32 — set when the map is created (dynamic var expr)
    keys: jax.Array  # (V, 3) i32
    count: jax.Array  # (V,) i32
    pts: jax.Array  # (V, K, 3) f32

    @property
    def num_slots(self) -> int:
        return self.keys.shape[0]

    @property
    def points_per_voxel(self) -> int:
        return self.pts.shape[1]

    def num_points(self) -> jax.Array:
        return jnp.sum(self.count)

    def num_voxels(self) -> jax.Array:
        return jnp.sum(self.count > 0)

    def is_empty(self) -> jax.Array:
        return jnp.all(self.count == 0)

    @staticmethod
    def create(num_slots: int, points_per_voxel: int, voxel_size) -> "VoxelHashMap":
        if num_slots & (num_slots - 1):
            raise ValueError("num_slots must be a power of two")
        return VoxelHashMap(
            voxel_size=jnp.asarray(voxel_size, jnp.float32),
            keys=jnp.zeros((num_slots, 3), jnp.int32),
            count=jnp.zeros((num_slots,), jnp.int32),
            pts=jnp.zeros((num_slots, points_per_voxel, 3), jnp.float32),
        )

    def clear(self) -> "VoxelHashMap":
        return self._replace(count=jnp.zeros_like(self.count))


def claim_slots(
    keys: jax.Array,  # (V, 3) current slot keys
    slot_used: jax.Array,  # (V,) bool — slot currently owned by some voxel
    coords: jax.Array,  # (n, 3) voxel coords of the incoming points
    slot: jax.Array,  # (n,) hash slot per point
    valid: jax.Array,  # (n,) bool
) -> Tuple[jax.Array, jax.Array]:
    """Atomics-free parallel slot claim, shared by all hash-map types.

    Empty slots are claimed by the first (lowest-index) valid point hashing to
    them; if two *different* voxels race for one empty slot, the earlier
    point's voxel wins and the other voxel's points drop for this frame.
    Returns ``(accept, claim_ok)``: accept = this point may write to its
    slot; claim_ok = this point's voxel newly owns the slot (write the key).
    """
    n = coords.shape[0]
    V = keys.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(n)

    occupied = slot_used[slot]
    same_key = jnp.all(keys[slot] == coords, axis=-1)

    wants_claim = valid & ~occupied
    claim = jnp.full((V,), big, jnp.int32).at[slot].min(
        jnp.where(wants_claim, idx, big), mode="drop"
    )
    winner_idx = claim[slot]  # (n,) index of the claiming point for my slot
    claim_won = wants_claim & (winner_idx < big)
    # my insertion is accepted if the winning claimant shares my voxel coords
    winner_coords = coords[jnp.where(winner_idx < big, winner_idx, 0)]
    claim_ok = claim_won & jnp.all(winner_coords == coords, axis=-1)

    accept = valid & ((occupied & same_key) | claim_ok)
    return accept, claim_ok


def insert(m: VoxelHashMap, pc: PointCloud) -> VoxelHashMap:
    """Insert the valid points of ``pc`` (already in map/global frame)."""
    V, K = m.num_slots, m.points_per_voxel
    n = pc.capacity
    idx = jnp.arange(n, dtype=jnp.int32)

    coords = voxel_coords(pc.xyz, m.voxel_size)  # (n, 3)
    slot = voxel_hash(coords, V)  # (n,)
    accept, claim_ok = claim_slots(m.keys, m.count > 0, coords, slot, pc.valid)

    # Phase 2: per-slot arrival rank via one sort over the batch.  Sort key
    # packs (slot, idx) so ranks follow input order within a slot.
    sort_key = jnp.where(accept, slot, jnp.int32(V))
    order = jnp.argsort(sort_key, stable=True)  # accepted points grouped by slot
    sorted_slot = sort_key[order]
    pos = jnp.arange(n, dtype=jnp.int32)
    is_head = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_slot[1:] != sorted_slot[:-1]]
    )
    head_pos = jnp.where(is_head, pos, 0)
    head_pos = jax.lax.associative_scan(jnp.maximum, head_pos)
    rank_sorted = pos - head_pos
    rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)

    dest = m.count[slot] + rank
    store = accept & (dest < K)

    flat_dest = jnp.where(store, slot * K + dest, V * K)  # OOB -> dropped
    pts_flat = m.pts.reshape(V * K, 3)
    pts_flat = pts_flat.at[flat_dest].set(pc.xyz, mode="drop")

    new_count = m.count.at[slot].add(jnp.where(store, 1, 0), mode="drop")
    # Only claimants write keys (non-claimants scattering a stale key could
    # land after the claimant's write and clobber it — scatter order with
    # duplicate indices is unspecified).  All claim_ok points of one slot
    # share the same coords, so duplicates are harmless here.
    new_keys = m.keys.at[jnp.where(claim_ok, slot, m.num_slots)].set(coords, mode="drop")
    return m._replace(keys=new_keys, count=new_count, pts=pts_flat.reshape(V, K, 3))


def prune_farther_than(m: VoxelHashMap, center: jax.Array, distance) -> VoxelHashMap:
    """Drop voxels with L1 distance from ``center`` beyond ``distance``.

    Mirrors ``remove_voxels_farther_than`` (L1 metric per SURVEY §2.3 /
    pipelines/lidar3d-default.yaml:237-238).  ``distance <= 0`` disables.
    """
    centers = (m.keys.astype(jnp.float32) + 0.5) * m.voxel_size
    l1 = jnp.max(jnp.abs(centers - center), axis=-1)
    keep = (l1 <= distance) | (distance <= 0)
    return m._replace(count=jnp.where(keep, m.count, 0))


def query_nn(
    m: VoxelHashMap, queries: jax.Array, valid: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Nearest map point of each query within its 27-voxel neighborhood.

    Returns ``(nn_xyz (N,3), dist2 (N,), found (N,))``.  ``found`` is False
    for invalid queries and queries with no candidate in the neighborhood;
    the caller applies the (dynamic, annealed) distance threshold on top,
    mirroring Matcher_Points_DistanceThreshold's ``threshold`` parameter.
    """
    K = m.points_per_voxel
    n = queries.shape[0]
    base = voxel_coords(queries, m.voxel_size)  # (N, 3)

    best_d2 = jnp.full((n,), jnp.inf, jnp.float32)
    best_pt = jnp.zeros((n, 3), jnp.float32)

    jslots = jnp.arange(K, dtype=jnp.int32)[None, :]  # (1, K)

    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                off = jnp.asarray([dx, dy, dz], jnp.int32)
                c = base + off
                s = voxel_hash(c, m.num_slots)
                key_ok = jnp.all(m.keys[s] == c, axis=-1) & (m.count[s] > 0)
                cand = m.pts[s]  # (N, K, 3)
                cmask = key_ok[:, None] & (jslots < m.count[s][:, None])  # (N, K)
                d2 = jnp.sum((cand - queries[:, None, :]) ** 2, axis=-1)
                d2 = jnp.where(cmask, d2, jnp.inf)
                j = jnp.argmin(d2, axis=-1)
                dmin = jnp.take_along_axis(d2, j[:, None], axis=-1)[:, 0]
                pmin = jnp.take_along_axis(cand, j[:, None, None], axis=-2)[:, 0]
                better = dmin < best_d2
                best_d2 = jnp.where(better, dmin, best_d2)
                best_pt = jnp.where(better[:, None], pmin, best_pt)

    found = valid & jnp.isfinite(best_d2)
    return best_pt, jnp.where(found, best_d2, jnp.inf), found


def query_nn2(
    m: VoxelHashMap, queries: jax.Array, valid: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Two nearest map points per query (``pairingsPerPoint: 2``).

    Mirrors Matcher_Points_DistanceThreshold with 2 pairings per local point
    (reference pipelines/lidar2d.yaml:152-159).  Returns
    ``(nn_xyz (N,2,3), dist2 (N,2), found (N,2))``; slot 1 may be un-found
    when the neighborhood holds a single candidate.
    """
    K = m.points_per_voxel
    n = queries.shape[0]
    base = voxel_coords(queries, m.voxel_size)

    best_d2 = jnp.full((n, 2), jnp.inf, jnp.float32)
    best_pt = jnp.zeros((n, 2, 3), jnp.float32)

    jslots = jnp.arange(K, dtype=jnp.int32)[None, :]

    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                off = jnp.asarray([dx, dy, dz], jnp.int32)
                c = base + off
                s = voxel_hash(c, m.num_slots)
                key_ok = jnp.all(m.keys[s] == c, axis=-1) & (m.count[s] > 0)
                cand = m.pts[s]  # (N, K, 3)
                cmask = key_ok[:, None] & (jslots < m.count[s][:, None])
                d2 = jnp.sum((cand - queries[:, None, :]) ** 2, axis=-1)
                d2 = jnp.where(cmask, d2, jnp.inf)
                # merge this voxel's top-2 with the running top-2
                v2, vi = jax.lax.top_k(-d2, 2)  # (N, 2) negated distances
                vpts = jnp.take_along_axis(cand, vi[:, :, None], axis=-2)
                all_d2 = jnp.concatenate([best_d2, -v2], axis=-1)  # (N, 4)
                all_pt = jnp.concatenate([best_pt, vpts], axis=-2)  # (N, 4, 3)
                t2, ti = jax.lax.top_k(-all_d2, 2)
                best_d2 = -t2
                best_pt = jnp.take_along_axis(all_pt, ti[:, :, None], axis=-2)

    found = valid[:, None] & jnp.isfinite(best_d2)
    return best_pt, jnp.where(found, best_d2, jnp.inf), found


def query_p2pl(
    m: VoxelHashMap,
    queries: jax.Array,
    valid: jax.Array,
    *,
    search_radius: float = 0.8,
    min_plane_points: int = 6,
    plane_eigen_threshold: float = 1e-2,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Point-to-plane query against a *point* map: fit a local plane per
    query from the neighborhood points.

    Mirrors ``Matcher_Point2Plane`` against point clouds (reference
    pipelines/rgbd.yaml:143-151: ``searchRadius``, ``knn``,
    ``minimumPlanePoints``, ``planeEigenThreshold``): the reference fits the
    plane to the k nearest neighbors; here the fit uses *all* candidate
    points of the 27-voxel neighborhood within ``search_radius`` — same
    estimator, slightly larger support, fixed shape.

    Returns ``(plane_pt, normal, dist2, found)`` with ``dist2`` the squared
    point-plane distance.
    """
    from mola_lidar_odometry_tpu.ops import ndt as _ndt  # local: avoid cycle

    K = m.points_per_voxel
    n = queries.shape[0]
    base = voxel_coords(queries, m.voxel_size)
    r2max = jnp.float32(search_radius * search_radius)

    cnt = jnp.zeros((n,), jnp.float32)
    s = jnp.zeros((n, 3), jnp.float32)
    ss = jnp.zeros((n, 6), jnp.float32)
    jslots = jnp.arange(K, dtype=jnp.int32)[None, :]

    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                off = jnp.asarray([dx, dy, dz], jnp.int32)
                c = base + off
                sl = voxel_hash(c, m.num_slots)
                key_ok = jnp.all(m.keys[sl] == c, axis=-1) & (m.count[sl] > 0)
                cand = m.pts[sl]  # (N, K, 3)
                cmask = key_ok[:, None] & (jslots < m.count[sl][:, None])
                d2 = jnp.sum((cand - queries[:, None, :]) ** 2, axis=-1)
                w = (cmask & (d2 <= r2max)).astype(jnp.float32)  # (N, K)
                cnt = cnt + jnp.sum(w, axis=-1)
                s = s + jnp.einsum("nk,nkc->nc", w, cand)
                x, y, z = cand[..., 0], cand[..., 1], cand[..., 2]
                mom = jnp.stack([x * x, y * y, z * z, x * y, x * z, y * z], -1)
                ss = ss + jnp.einsum("nk,nkc->nc", w, mom)

    nf = jnp.maximum(cnt, 1.0)[:, None]
    mean = s / nf
    mx, my, mz = mean[:, 0], mean[:, 1], mean[:, 2]
    cov6 = ss / nf - jnp.stack(
        [mx * mx, my * my, mz * mz, mx * my, mx * mz, my * mz], -1
    )
    nrm, e_min, e_mid = _ndt._sym_eigen_smallest(cov6)
    plane_ok = (
        (cnt >= min_plane_points)
        & (e_min <= plane_eigen_threshold * jnp.maximum(e_mid, 1e-12))
    )
    found = valid & plane_ok
    dpl = jnp.sum(nrm * (queries - mean), axis=-1)
    plane_pt = queries - dpl[:, None] * nrm
    d2 = jnp.where(found, dpl * dpl, jnp.inf)
    return plane_pt, nrm, d2, found


def as_pointcloud(m: VoxelHashMap, capacity: int) -> PointCloud:
    """Flatten live voxel contents into a PointCloud (for viz / serialization)."""
    V, K = m.num_slots, m.points_per_voxel
    jmask = jnp.arange(K, dtype=jnp.int32)[None, :] < m.count[:, None]
    pc = PointCloud.from_xyz(
        m.pts.reshape(V * K, 3), valid=jmask.reshape(V * K)
    )
    return pc.compact(capacity)
