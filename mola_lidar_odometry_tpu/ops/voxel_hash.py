"""Device-resident sliding hash-voxel point map + NN queries.

TPU-native replacement for ``mola::HashedVoxelPointCloud``
(reference pipelines/lidar3d-default.yaml:228-242: ``voxel_size``,
``max_points_per_voxel``, ``remove_voxels_farther_than`` L1 pruning) and for
the KD-tree NN search inside ``mp2p_icp::Matcher_Points_DistanceThreshold``
(pipelines/lidar3d-default.yaml:196-204).

Design (SURVEY.md §7): a direct-mapped spatial-hash table in HBM with a
static slot count ``V`` and per-voxel point capacity ``K``.  The entire slot
record is **packed into one f32 row** so a neighborhood probe is a single
fused gather — on TPU each gather instruction carries a large fixed cost, so
one (N*P)-row gather of packed rows beats separate key/count/point gathers
by an order of magnitude (measured on v5e):

  ``data (V, 5 + 3K) f32``:
    * ``[0:3]``      — voxel integer coords of the slot's occupant (exact f32)
    * ``[3]``        — live point count (0 = empty)
    * ``[4]``        — epoch tag: the row is live only when it equals the
      map's ``epoch`` scalar.  ``clear()`` is then a scalar increment —
      crucial because the bad-first-ICP restart wipe sits on the per-step
      path under vmap, where a real table wipe costs a whole-table select
      chain (~6 ms/step at B=8 measured before this design).
    * ``[5:5+K]``    — x coordinates of the K point slots (planar)
    * ``[5+K:5+2K]`` — y coordinates
    * ``[5+2K:]``    — z coordinates

  The planar (xxx…yyy…zzz) in-row point layout makes each coordinate a
  CONTIGUOUS lane slice of the gathered row — the fused Pallas capture
  kernel (ops/pallas_capture.py) slices lanes without strided shuffles.

Insertion is fully parallel and atomics-free:
  1. empty slots are *claimed* by scatter-min over point index (deterministic
     first-point-wins, mirroring the C++ map's insertion order semantics);
  2. per-slot arrival ranks come from one sort over the insert batch;
  3. points scatter into ``data[slot, 4 + 3*(count+rank)]`` bounded by ``K``.
Hash collisions (two voxels, one slot) drop the newcomer's points for that
frame — with V >= 4x the live voxel count this is rare, and distance-based
eviction recycles slots continuously.

Queries probe either the full 3x3x3 neighborhood (27 voxels, exact within
one voxel radius — the reference-parity default) or the 2x2x2 corner block
nearest the query (8 voxels — exact for matches within voxel_size/2, the
fast mode for converged tracking), reducing over the <=P*K candidates.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mola_lidar_odometry_tpu.ops.filters import voxel_coords, voxel_hash
from mola_lidar_odometry_tpu.ops.pointcloud import PointCloud

_OFFS27 = [
    (dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
]
_CORNERS8 = [(i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)]


def neighbor_coords(queries: jax.Array, base: jax.Array, voxel_size, neighbors: int) -> jax.Array:
    """Voxel coords of the probe set per query: (N, P, 3) i32."""
    if neighbors == 27:
        offs = jnp.asarray(_OFFS27, jnp.int32)  # (27, 3)
        return base[:, None, :] + offs[None]
    if neighbors == 8:
        # pick the 2x2x2 block on the side of the voxel center the query
        # falls — covers every point within voxel_size/2 of the query
        frac = queries / voxel_size - (base.astype(jnp.float32) + 0.5)
        step = jnp.where(frac >= 0, 1, -1).astype(jnp.int32)  # (N, 3)
        corners = jnp.asarray(_CORNERS8, jnp.int32)  # (8, 3)
        return base[:, None, :] + corners[None] * step[:, None, :]
    if neighbors == 1:
        return base[:, None, :]
    raise ValueError(f"neighbors must be 1, 8 or 27, got {neighbors}")


class VoxelHashMap(NamedTuple):
    """Fixed-capacity voxel point map (packed slot rows, device-resident)."""

    voxel_size: jax.Array  # () f32 — set when the map is created (dynamic var expr)
    data: jax.Array  # (V, 5 + 3K) f32 — [key3 | count | epoch | xyz planes]
    epoch: jax.Array  # () f32 — rows live iff their epoch lane equals this

    @property
    def num_slots(self) -> int:
        return self.data.shape[0]

    @property
    def points_per_voxel(self) -> int:
        return (self.data.shape[1] - 5) // 3

    @property
    def fresh(self) -> jax.Array:
        """(V,) bool — rows belonging to the current epoch."""
        return self.data[:, 4] == self.epoch

    @property
    def keys(self) -> jax.Array:
        return self.data[:, :3].astype(jnp.int32)

    @property
    def count(self) -> jax.Array:
        return jnp.where(self.fresh, self.data[:, 3], 0.0).astype(jnp.int32)

    @property
    def pts(self) -> jax.Array:
        V, K = self.num_slots, self.points_per_voxel
        return jnp.swapaxes(self.data[:, 5:].reshape(V, 3, K), 1, 2)

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
            data=jnp.zeros((num_slots, 5 + 3 * points_per_voxel), jnp.float32),
            epoch=jnp.float32(1.0),  # zero-filled rows are born dead
        )

    def clear(self) -> "VoxelHashMap":
        return self._replace(epoch=self.epoch + 1.0)


def claim_slots(
    same_key: jax.Array,  # (n,) bool — slot's current key equals my coords
    occupied: jax.Array,  # (n,) bool — slot currently owned by some voxel
    coords: jax.Array,  # (n, 3) voxel coords of the incoming points
    slot: jax.Array,  # (n,) hash slot per point
    valid: jax.Array,  # (n,) bool
    num_slots: int,
) -> Tuple[jax.Array, jax.Array]:
    """Atomics-free parallel slot claim, shared by all hash-map types.

    The caller gathers its packed slot rows ONCE and passes the derived
    per-point ``same_key``/``occupied`` flags (keeping the total gather
    count minimal).  Empty slots are claimed by the first (lowest-index)
    valid point hashing to them; if two *different* voxels race for one
    empty slot, the earlier point's voxel wins and the other voxel's points
    drop for this frame.  Returns ``(accept, claim_ok)``: accept = this
    point may write to its slot; claim_ok = this point's voxel newly owns
    the slot (write the key).
    """
    from mola_lidar_odometry_tpu.ops import batched_mem as BM

    n = coords.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(n)

    wants_claim = valid & ~occupied
    claim = BM.table_min(
        jnp.full((num_slots,), big, jnp.int32), slot, jnp.where(wants_claim, idx, big)
    )
    winner_idx = BM.gather_rows(claim, slot)  # (n,) claiming point per slot
    claim_won = wants_claim & (winner_idx < big)
    # my insertion is accepted if the winning claimant shares my voxel coords
    winner_coords = BM.gather_rows(coords, jnp.where(winner_idx < big, winner_idx, 0))
    claim_ok = claim_won & jnp.all(winner_coords == coords, axis=-1)

    accept = valid & ((occupied & same_key) | claim_ok)
    return accept, claim_ok


class InsertStats(NamedTuple):
    """Capacity-pressure counters of one insert batch (SURVEY §7 hard-part
    #1: fixed-capacity semantics must be observable, not silent).

    ``collision_drops``: valid points rejected because their voxel lost the
    hash slot to a *different* voxel this frame (table pressure — grow
    ``map_slots``).  ``full_drops``: accepted points beyond the per-voxel
    cap ``K`` (benign saturation — mirrors the reference's
    ``max_points_per_voxel``)."""

    collision_drops: jax.Array  # () i32
    full_drops: jax.Array  # () i32

    @staticmethod
    def zero() -> "InsertStats":
        return InsertStats(jnp.int32(0), jnp.int32(0))

    def __add__(self, other: "InsertStats") -> "InsertStats":
        return InsertStats(
            self.collision_drops + other.collision_drops,
            self.full_drops + other.full_drops,
        )


def insert(m: VoxelHashMap, pc: PointCloud) -> VoxelHashMap:
    """Insert the valid points of ``pc`` (already in map/global frame)."""
    return insert_stats(m, pc)[0]


def _h2(coords: jax.Array) -> jax.Array:
    """Secondary 32-bit spatial hash: compares voxel identities in the
    sorted insert domain without carrying the 3 coordinate lanes through
    the sort.  POLYNOMIAL chaining with constants independent from the
    slot hash's — xor-combining products is forbidden here (for odd ``a``,
    ``a ^ -a == -2``, so sign-flipped odd products always collide; the
    family bug this caused stored points into wrong-keyed rows).  Residual
    collision odds are the generic ~2^-31 per pair — far below the
    point-drop noise floor."""
    h = (coords[..., 0] * jnp.int32(-1640531527) + coords[..., 1]) * jnp.int32(
        0x2545F491
    ) + coords[..., 2]
    h = h * jnp.int32(0x27D4EB2F)
    return h ^ (h >> 15)


def insert_stats(m: VoxelHashMap, pc: PointCloud) -> Tuple[VoxelHashMap, InsertStats]:
    """Insert + capacity-pressure counters (see :class:`InsertStats`).

    Fully sort-fused: ONE lexicographic (slot, idx) sort groups each
    slot's valid points with the first-come point at the run head, which
    IS the reference's claim winner for empty slots — so claim
    resolution, per-slot arrival ranks (segmented prefix sums), the
    count-writer election, and the stats all happen in the sorted domain
    with no claim table, no winner gathers, and no rank map-back scatter
    (together ~2.6 ms/step at B=8 before this fold).  Voxel identities in
    the sorted domain compare via the secondary hash :func:`_h2`.

    The table update itself stays ONE flat scatter-set: TPU scatters
    carry a ~4.5 ms fixed cost per *instruction* on top of ~5 ns/element
    (eval/micro_gather.py), and the count is a plain set-element written
    by the LAST stored point of each slot (``cnt_eff + n_stored`` —
    exact, order-free; every index set is disjoint-or-equal so duplicate
    scatter ordering cannot change state).
    """
    V, K = m.num_slots, m.points_per_voxel
    n = pc.capacity

    from mola_lidar_odometry_tpu.ops import batched_mem as BM

    coords = voxel_coords(pc.xyz, m.voxel_size)  # (n, 3)
    slot = voxel_hash(coords, V)  # (n,)
    h2 = _h2(coords)

    # ONE sort: (slot | V-for-invalid, input idx) lexicographic, h2 rides
    sort_key = jnp.where(pc.valid, slot, jnp.int32(V))
    pos = jnp.arange(n, dtype=jnp.int32)
    skey, sidx, sh2 = jax.lax.sort([sort_key, pos, h2], num_keys=2)
    s_valid = skey < V
    s_slot = jnp.where(s_valid, skey, 0)

    # row state gathered in the SORTED domain.  Full rows on purpose: the
    # gather is row-count bound (width-free), while slicing the table to
    # (V, 5) first materializes a whole-column copy (~0.7 ms/step at B=8).
    g5 = BM.gather_rows(m.data, s_slot)[:, :5]  # [key3|cnt|epoch] per point
    fresh = s_valid & (g5[:, 4] == m.epoch)
    rowkey_h2 = _h2(g5[:, :3].astype(jnp.int32))
    occupied = fresh & (g5[:, 3] > 0)
    same_key = occupied & (rowkey_h2 == sh2)
    cnt_at = jnp.where(fresh, g5[:, 3], 0.0)

    is_head = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    is_tail = jnp.concatenate([skey[1:] != skey[:-1], jnp.ones((1,), bool)])

    # head h2 propagated through each run (segmented copy-first scan):
    # the run head is the lowest-input-index valid point of the slot —
    # exactly the reference's first-come claimant for an empty slot
    def seg_first(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, va), fa | fb

    head_h2, _ = jax.lax.associative_scan(seg_first, (sh2, is_head))

    accept = s_valid & jnp.where(occupied, same_key, sh2 == head_h2)

    # rank among ACCEPTED points of the run (segmented inclusive sum)
    def seg_sum(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, va + vb), fa | fb

    a32 = accept.astype(jnp.int32)
    incl, _ = jax.lax.associative_scan(seg_sum, (a32, is_head))
    rank = incl - a32
    # accepted points AFTER me in my run (reverse segmented sum)
    rincl, _ = jax.lax.associative_scan(seg_sum, (a32, is_tail), reverse=True)
    suffix_after = rincl - a32

    cnt_i = cnt_at.astype(jnp.int32)
    dest = cnt_i + rank
    store = accept & (dest < K)
    # unique count-writer per touched slot: the last accepted point when it
    # stored, else the point filling the final free slot (ranks contiguous)
    cnt_writer = store & ((suffix_after == 0) | (dest == K - 1))
    claim_ok = accept & ~occupied

    R = 5 + 3 * K
    oob = jnp.int32(V * R)
    f32 = jnp.float32
    p_base = s_slot * R
    s_xyz = BM.gather_rows(pc.xyz, sidx)  # (n, 3) hot narrow gather
    s_keys = BM.gather_rows(coords, sidx).astype(f32)
    # flat element indices (2D (row, col) scatters lower to a serialized
    # whole-table transpose + loop on TPU — measured 35 ms/step; the flat
    # form runs at the normal ~5 ns/elem scatter rate)
    idx = jnp.stack(
        [
            jnp.where(store, p_base + 5 + dest, oob),  # x
            jnp.where(store, p_base + 5 + K + dest, oob),  # y
            jnp.where(store, p_base + 5 + 2 * K + dest, oob),  # z
            jnp.where(claim_ok, p_base + 0, oob),  # key x
            jnp.where(claim_ok, p_base + 1, oob),  # key y
            jnp.where(claim_ok, p_base + 2, oob),  # key z
            jnp.where(claim_ok, p_base + 4, oob),  # epoch tag
            jnp.where(cnt_writer, p_base + 3, oob),  # count
        ],
        axis=-1,
    )  # (n, 8)
    cnt_new = jnp.minimum(cnt_at + jnp.asarray(rank + 1, f32), f32(K))
    vals = jnp.stack(
        [
            s_xyz[:, 0],
            s_xyz[:, 1],
            s_xyz[:, 2],
            s_keys[:, 0],
            s_keys[:, 1],
            s_keys[:, 2],
            jnp.broadcast_to(m.epoch, (n,)),
            cnt_new,
        ],
        axis=-1,
    )
    data = BM.scatter_set(m.data.reshape(-1), idx, vals).reshape(V, R)

    stats = InsertStats(
        collision_drops=jnp.sum(s_valid & ~accept).astype(jnp.int32),
        full_drops=jnp.sum(accept & (dest >= K)).astype(jnp.int32),
    )
    return m._replace(data=data), stats


def prune_farther_than(m: VoxelHashMap, center: jax.Array, distance) -> VoxelHashMap:
    """Drop voxels with L1 distance from ``center`` beyond ``distance``.

    Mirrors ``remove_voxels_farther_than`` (L1 metric per SURVEY §2.3 /
    pipelines/lidar3d-default.yaml:237-238).  ``distance <= 0`` disables.
    """
    centers = (m.data[:, :3] + 0.5) * m.voxel_size
    l1 = jnp.max(jnp.abs(centers - center), axis=-1)
    keep = (l1 <= distance) | (distance <= 0)
    return m._replace(data=m.data.at[:, 3].mul(keep.astype(jnp.float32)))


def prune_farther_than_slab(
    m: VoxelHashMap, center: jax.Array, distance, slab: jax.Array, n_slabs: int = 16
) -> VoxelHashMap:
    """Rolling-slab eviction: prune 1/``n_slabs`` of the table per call.

    The full-table prune's single-lane column write costs a whole-table
    rewrite chain on TPU (reshape + dynamic-update-slice + copies — ~12 ms
    per step at B=8, the third-largest line of the entire scan-step
    profile).  Sweeping one contiguous slab per step bounds the touched
    bytes to table/``n_slabs`` while every voxel is still checked each
    ``n_slabs`` frames — tighter than the reference's own eviction cadence
    (``check_for_removal_every_n: 100``, pipelines/lidar3d-default.yaml),
    so the amortization is a parity-preserving deviation (docs/parity.md).
    """
    V = m.num_slots
    S = V // n_slabs
    start = jnp.asarray(slab, jnp.int32) % n_slabs * S
    rows = jax.lax.dynamic_slice_in_dim(m.data, start, S, 0)  # (S, row)
    centers = (rows[:, :3] + 0.5) * m.voxel_size
    l1 = jnp.max(jnp.abs(centers - center), axis=-1)
    keep = ((l1 <= distance) | (distance <= 0)).astype(jnp.float32)
    rows = jnp.concatenate(
        [rows[:, :3], rows[:, 3:4] * keep[:, None], rows[:, 4:]], axis=1
    )
    return m._replace(data=jax.lax.dynamic_update_slice_in_dim(m.data, rows, start, 0))


class CandSet(NamedTuple):
    """Cached neighborhood candidates of a query batch (one fused gather).

    Captured once per align() at the entry pose and reused across ICP
    iterations: the candidate *set* is fixed (chosen by the entry voxel
    coords + probe margin) while distances are recomputed at the current
    pose each iteration.  Exact as long as the in-align pose correction
    stays below the probe margin (a full voxel for 27 probes) — which the
    twist-reoptimization hook bounds at ~0.15 m anyway.

    With ``cand_cap`` the set is further compacted to the cap nearest
    candidates at the capture pose: any candidate that could become the
    nearest neighbor later (pose delta d) must lie within
    d2_min + O(pose delta) of the capture-time minimum, so dropping all-but-
    the-nearest-C is a safe superset for realistic caps; it cuts the
    per-iteration streaming volume by C/(P*K).
    """

    pts: jax.Array  # (N, C, 3) candidate map points
    mask: jax.Array  # (N, C) candidate validity


def capture(
    m: VoxelHashMap,
    queries: jax.Array,
    neighbors: int = 27,
    per_voxel_nn: bool = False,
) -> CandSet:
    """ONE fused gather of the packed neighborhood rows around ``queries``.

    With ``per_voxel_nn`` the K points of each probed voxel reduce to the
    single point nearest the query at capture time (argmin over K, no
    sorting), leaving P candidates per query — a KISS-ICP-style
    closest-point-per-voxel view that cuts the per-iteration streaming
    volume K-fold.  Under the capture-once regime the selected point is at
    most 2x(in-align pose delta) worse than the exact in-voxel nearest —
    negligible under the robust kernel with the ~0.15 m hook bound.
    """
    from mola_lidar_odometry_tpu.ops import batched_mem as BM

    V, K = m.num_slots, m.points_per_voxel
    n = queries.shape[0]
    base = voxel_coords(queries, m.voxel_size)
    cand = neighbor_coords(queries, base, m.voxel_size, neighbors)  # (N,P,3)
    P = cand.shape[1]
    slots = voxel_hash(cand, V)  # (N, P)

    g = BM.gather_rows(m.data, slots.reshape(-1)).reshape(n, P, 5 + 3 * K)
    key_ok = jnp.all(g[..., :3] == cand.astype(jnp.float32), axis=-1)
    cnt = g[..., 3]
    live = key_ok & (cnt > 0) & (g[..., 4] == m.epoch)
    pts4 = jnp.stack(
        [g[..., 5 : 5 + K], g[..., 5 + K : 5 + 2 * K], g[..., 5 + 2 * K :]],
        axis=-1,
    )  # (n, P, K, 3)
    jslots = jnp.arange(K, dtype=jnp.float32)
    cmask4 = live[..., None] & (jslots < cnt[..., None])  # (n, P, K)

    if per_voxel_nn and K > 2:
        # Top-2 points per probed voxel, selected at the capture pose.
        # Keeping the nearest alone loses real accuracy under capture-once
        # (the in-voxel winner changes as the pose moves — measured 0.25 ->
        # 0.58 worst log-norm on the 12-frame sim); the runner-up covers the
        # overwhelming majority of in-voxel swaps within the 0.15 m hook
        # bound.  Gather-free: two one-hot select rounds (argmin +
        # take_along_axis lower to slow TPU gathers, ~4.7 ms vs ~0.4 ms).
        big = jnp.float32(3.4e38)
        d2 = jnp.sum((pts4 - queries[:, None, None, :]) ** 2, axis=-1)
        d2 = jnp.where(cmask4, d2, big)
        kidx = jnp.arange(K, dtype=jnp.int32)

        def pick(d2m):
            dmin = jnp.min(d2m, axis=-1, keepdims=True)
            first = jnp.min(
                jnp.where(d2m <= dmin, kidx, jnp.int32(K)), axis=-1, keepdims=True
            )
            oh = (kidx == first).astype(jnp.float32)  # (n, P, K)
            return jnp.sum(pts4 * oh[..., None], axis=2), jnp.any(d2m < big, -1), oh

        p1, m1, oh1 = pick(d2)
        p2, m2, _ = pick(jnp.where(oh1 > 0, big, d2))
        pts = jnp.concatenate([p1, p2], axis=1)  # (n, 2P, 3)
        cmask = jnp.concatenate([m1, m2], axis=1)
        return CandSet(pts, cmask)
    return CandSet(pts4.reshape(n, P * K, 3), cmask4.reshape(n, P * K))


def nn_from(
    cand: CandSet, queries: jax.Array, valid: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Nearest candidate per query — pure compute, no memory traffic."""
    d2 = jnp.sum((cand.pts - queries[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(cand.mask, d2, jnp.inf)
    j = jnp.argmin(d2, axis=-1)
    dmin = jnp.take_along_axis(d2, j[:, None], axis=-1)[:, 0]
    pmin = jnp.take_along_axis(cand.pts, j[:, None, None], axis=-2)[:, 0]
    found = valid & jnp.isfinite(dmin)
    return pmin, jnp.where(found, dmin, jnp.inf), found


def nn2_from(
    cand: CandSet, queries: jax.Array, valid: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Two nearest candidates per query (``pairingsPerPoint: 2``)."""
    d2 = jnp.sum((cand.pts - queries[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(cand.mask, d2, jnp.inf)
    top2, ti = jax.lax.top_k(-d2, 2)
    best_pt = jnp.take_along_axis(cand.pts, ti[:, :, None], axis=-2)
    best_d2 = -top2
    found = valid[:, None] & jnp.isfinite(best_d2)
    return best_pt, jnp.where(found, best_d2, jnp.inf), found


def p2pl_from(
    cand: CandSet,
    queries: jax.Array,
    valid: jax.Array,
    *,
    search_radius: float = 0.8,
    min_plane_points: int = 6,
    plane_eigen_threshold: float = 1e-2,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Point-to-plane against cached candidates: fit a local plane per query.

    Mirrors ``Matcher_Point2Plane`` against point clouds (reference
    pipelines/rgbd.yaml:143-151: ``searchRadius``, ``knn``,
    ``minimumPlanePoints``, ``planeEigenThreshold``): the reference fits the
    plane to the k nearest neighbors; here the fit uses *all* candidate
    points of the voxel neighborhood within ``search_radius`` — same
    estimator, slightly larger support, fixed shape.
    """
    from mola_lidar_odometry_tpu.ops import ndt as _ndt  # local: avoid cycle

    _hi = jax.lax.Precision.HIGHEST
    # Moments are accumulated on QUERY-relative coordinates: at km-scale
    # global positions ulp(x^2) swamps in-voxel variances in f32 and the
    # plane fit collapses; the fit itself is translation-invariant.
    rel = cand.pts - queries[:, None, :]  # (N, C, 3)
    cmask = cand.mask
    d2 = jnp.sum(rel * rel, axis=-1)
    w = (cmask & (d2 <= search_radius * search_radius)).astype(jnp.float32)

    cnt = jnp.sum(w, axis=1)  # (N,)
    s = jnp.einsum("nc,ncd->nd", w, rel, precision=_hi)
    x, y, z = rel[..., 0], rel[..., 1], rel[..., 2]
    mom = jnp.stack([x * x, y * y, z * z, x * y, x * z, y * z], -1)
    ss = jnp.einsum("nc,ncd->nd", w, mom, precision=_hi)

    nf = jnp.maximum(cnt, 1.0)[:, None]
    mean_rel = s / nf  # plane centroid relative to the query
    mx, my, mz = mean_rel[:, 0], mean_rel[:, 1], mean_rel[:, 2]
    cov6 = ss / nf - jnp.stack(
        [mx * mx, my * my, mz * mz, mx * my, mx * mz, my * mz], -1
    )
    nrm, e_min, e_mid = _ndt._sym_eigen_smallest(cov6)
    plane_ok = (
        (cnt >= min_plane_points)
        & (e_min <= plane_eigen_threshold * jnp.maximum(e_mid, 1e-12))
    )
    found = valid & plane_ok
    dpl = -jnp.sum(nrm * mean_rel, axis=-1)  # signed dist: query - centroid
    plane_pt = queries - dpl[:, None] * nrm
    d2q = jnp.where(found, dpl * dpl, jnp.inf)
    return plane_pt, nrm, d2q, found


def query_nn(
    m: VoxelHashMap, queries: jax.Array, valid: jax.Array, *, neighbors: int = 27
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Single-shot NN query (capture + reduce).

    Returns ``(nn_xyz (N,3), dist2 (N,), found (N,))``; the caller applies
    the (dynamic, annealed) distance threshold on top, mirroring
    Matcher_Points_DistanceThreshold's ``threshold`` parameter.
    """
    return nn_from(capture(m, queries, neighbors), queries, valid)


def query_nn2(
    m: VoxelHashMap, queries: jax.Array, valid: jax.Array, *, neighbors: int = 27
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Single-shot 2-NN query (reference pipelines/lidar2d.yaml:152-159)."""
    return nn2_from(capture(m, queries, neighbors), queries, valid)


def query_p2pl(
    m: VoxelHashMap,
    queries: jax.Array,
    valid: jax.Array,
    *,
    search_radius: float = 0.8,
    min_plane_points: int = 6,
    plane_eigen_threshold: float = 1e-2,
    neighbors: int = 27,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Single-shot point-to-plane query against a point map."""
    return p2pl_from(
        capture(m, queries, neighbors),
        queries,
        valid,
        search_radius=search_radius,
        min_plane_points=min_plane_points,
        plane_eigen_threshold=plane_eigen_threshold,
    )


def as_pointcloud(m: VoxelHashMap, capacity: int) -> PointCloud:
    """Flatten live voxel contents into a PointCloud (for viz / serialization)."""
    V, K = m.num_slots, m.points_per_voxel
    jmask = jnp.arange(K, dtype=jnp.int32)[None, :] < m.count[:, None]
    pc = PointCloud.from_xyz(
        m.pts.reshape(V * K, 3), valid=jmask.reshape(V * K)
    )
    return pc.compact(capacity)
