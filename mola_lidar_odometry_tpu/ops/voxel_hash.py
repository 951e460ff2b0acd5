"""Device-resident sliding hash-voxel point map + NN queries.

TPU-native replacement for ``mola::HashedVoxelPointCloud``
(reference pipelines/lidar3d-default.yaml:228-242: ``voxel_size``,
``max_points_per_voxel``, ``remove_voxels_farther_than`` L1 pruning) and for
the KD-tree NN search inside ``mp2p_icp::Matcher_Points_DistanceThreshold``
(pipelines/lidar3d-default.yaml:196-204).

Storage design (round 3 — driven by the measured v5e cost model in
docs/benchmarks.md):

  ``data (V * stride / 128, 128) int32`` — the table is tiled into rows of
  EXACTLY 128 lanes (the physical TPU tile width), each logical slot owning
  a ``stride``-lane window.  Earlier layouts used one 65-lane f32 row per
  slot; TPU pads the minor dim to 128, so every whole-table op (the insert
  reshape, the eviction update, layout conversions) streamed 2x the live
  bytes and XLA bounced the table between physical layouts at ~1.2 ms per
  copy at B=8.  With 128-exact rows the flat view used by the insert
  scatter is layout-identical (no materializing reshape) and the table
  never changes layout.

  Slot window (``stride`` = smallest of 32/64/128/256 >= 2 + K):
    * lane 0 — **packed voxel key** ``pkey``: the voxel integer coords
      wrapped into 12|12|8 bits (x|y|z).  Exact voxel identity as long as
      live voxels span < 2048 cells in x/y and < 128 in z around each
      other — guaranteed whenever ``remove_voxels_farther_than`` keeps the
      map bounded (the reference default); documented envelope otherwise
      (docs/parity.md).
    * lane 1 — **state**: ``(epoch & 0xffff) << 16 | count``.  A slot is
      live only when its epoch field equals the map's ``epoch`` scalar, so
      ``clear()`` is a scalar increment — a real table wipe under vmap
      costs a whole-table select chain (~6 ms/step at B=8, measured).
    * lanes 2..2+K — the K point slots, ONE i32 lane per point: the
      within-voxel offset quantized 10|10|10 bits (x|y|z), dequantized at
      offset-cell centers (max error ``voxel_size/2048`` per axis —
      ~0.5 mm at the 1 m localmap default, far below sensor noise; the
      float64 oracle parity gates bound the end-to-end effect).  Absolute
      positions reconstruct from the probed voxel's coords, which every
      reader already knows (capture probes a coordinate; whole-table
      views unwrap ``pkey`` near an anchor).

  Packed points (round 4) cut the insert scatter from 5 to 3 words per
  stored point and HALVE the table bytes (stride 64 -> 32 at K=20), which
  also makes every bucket row 4-way associative for free and keeps more
  of the table hot under the row gathers that dominate capture.

**Set-associative buckets (round 3).**  A direct-mapped table drops every
point of the voxel that loses a slot to a different voxel — measured at
0.8-3% of inserts at practical load factors, far above the 0.1% budget.
Because one physical 128-lane row already holds ``W = 128/stride`` slot
windows (W=2 at the default K=20), the row IS a W-way bucket for free:
voxels hash to a BUCKET (= one row), insert claims any stale way, and
capture key-matches against every way of the row it already gathered —
identical gather/scatter traffic, and the drop probability falls from
``live/V`` to ``P(>=2 other voxels in my bucket)`` ~ ``(live·W/V)²/2``
(~0.03% at the auto-sized load).  ``W`` is 1 for strides >= 128.

Insertion is fully parallel, atomics-free and SORT-FUSED: one
lexicographic (bucket, pkey, idx) sort groups each voxel's valid points
contiguously (first-come point at the subrun head); per-voxel ranks and
per-bucket way claims come from segmented scans in the sorted domain; the
table update is ONE flat element scatter of 3 words per stored point
(packed offset, pkey, state) — all points of a subrun write identical
pkey/state values, so duplicate scatter ordering cannot change state.
Measured on this v5e: scatters cost ~6 ns per (masked or live) element
with no per-instruction floor, so fewer static elements per point is the
whole game (8 -> 5 -> 3 across rounds, and no layout round-trip).  Ways
inside a bucket
are claimed in pkey order rather than strict arrival order (the sort
groups by pkey) — only observable when a bucket overflows, where the
reference (unbounded map) has no analogue at all.

Queries probe either the full 3x3x3 neighborhood (27 voxels, exact within
one voxel radius — the reference-parity default) or the 2x2x2 corner block
nearest the query (8 voxels — exact for matches within voxel_size/2),
reducing over the <=P*K candidates.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mola_lidar_odometry_tpu.ops.filters import voxel_coords, voxel_hash
from mola_lidar_odometry_tpu.ops.pointcloud import PointCloud

_OFFS27 = [
    (dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
]
_CORNERS8 = [(i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)]

# packed-key bit layout: x 12 | y 12 | z 8 (wrapped / modular)
_PKX_BITS, _PKY_BITS, _PKZ_BITS = 12, 12, 8
_PKX, _PKY, _PKZ = 1 << _PKX_BITS, 1 << _PKY_BITS, 1 << _PKZ_BITS


def pack_key(coords: jax.Array) -> jax.Array:
    """Wrap voxel integer coords into one i32 ``pkey`` (exact modulo the
    wrap range; see module docstring for the envelope argument)."""
    cx = coords[..., 0] & (_PKX - 1)
    cy = coords[..., 1] & (_PKY - 1)
    cz = coords[..., 2] & (_PKZ - 1)
    return (cx << (_PKY_BITS + _PKZ_BITS)) | (cy << _PKZ_BITS) | cz


def unpack_key_near(pkey: jax.Array, anchor: jax.Array) -> jax.Array:
    """Decode wrapped keys to the representative nearest ``anchor`` (3,) i32.

    Exact for voxels within half the wrap range of the anchor (±1024 cells
    in x/y, ±64 in z) — the sliding local map under its eviction radius
    always satisfies this.
    """
    ux = (pkey >> (_PKY_BITS + _PKZ_BITS)) & (_PKX - 1)
    uy = (pkey >> _PKZ_BITS) & (_PKY - 1)
    uz = pkey & (_PKZ - 1)

    def near(u, a, m):
        return a + (((u - a + m // 2) & (m - 1)) - m // 2)

    return jnp.stack(
        [
            near(ux, anchor[..., 0], _PKX),
            near(uy, anchor[..., 1], _PKY),
            near(uz, anchor[..., 2], _PKZ),
        ],
        axis=-1,
    )


# within-voxel point quantization: 10 bits per axis (1024 offset cells)
_QBITS = 10
_Q = 1 << _QBITS
_INV_Q = 1.0 / _Q


def pack_points(xyz: jax.Array, coords: jax.Array, voxel_size) -> jax.Array:
    """(..., 3) f32 points + their (..., 3) i32 voxel coords -> (...,) i32.

    Within-voxel offsets quantized to 10|10|10 bits (x|y|z).  ``coords``
    must be ``voxel_coords(xyz, voxel_size)`` — offsets are in [0, 1) by
    construction; the clip only guards f32 edge rounding."""
    f = xyz / voxel_size - coords.astype(jnp.float32)
    q = jnp.clip((f * _Q).astype(jnp.int32), 0, _Q - 1)
    return (q[..., 0] << (2 * _QBITS)) | (q[..., 1] << _QBITS) | q[..., 2]


def unpack_points(word: jax.Array, coords: jax.Array, voxel_size) -> jax.Array:
    """Inverse of :func:`pack_points` at offset-cell centers.

    ``coords`` are the (UNWRAPPED) voxel coords the points belong to,
    broadcastable against ``word``'s shape + (3,).  Max error per axis is
    ``voxel_size / 2048``.  The Pallas capture kernel reproduces this
    dequantization bit-exactly (same op order) — keep the two in sync."""
    q = jnp.stack(
        [
            (word >> (2 * _QBITS)) & (_Q - 1),
            (word >> _QBITS) & (_Q - 1),
            word & (_Q - 1),
        ],
        axis=-1,
    ).astype(jnp.float32)
    return (coords.astype(jnp.float32) + (q + 0.5) * _INV_Q) * voxel_size


def _pick_stride(K: int) -> int:
    need = 2 + K
    for s in (32, 64, 128, 256):
        if need <= s:
            return s
    raise ValueError(f"points_per_voxel={K} too large (max 254)")


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
    if neighbors == 4:
        # containing voxel + the 3 single-axis FACE neighbors on the side
        # of the voxel center the query falls.  Covers every NN reachable
        # across a voxel face (the dominant cross-voxel case); misses only
        # edge/corner-diagonal NNs, so this footprint is meant for the
        # phase-1 coarse leg of the fused align (the phase-2 refresh
        # re-captures the full 2x2x2 block at the settled pose).
        frac = queries / voxel_size - (base.astype(jnp.float32) + 0.5)
        step = jnp.where(frac >= 0, 1, -1).astype(jnp.int32)  # (N, 3)
        faces = jnp.asarray(
            [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1)], jnp.int32
        )  # (4, 3)
        return base[:, None, :] + faces[None] * step[:, None, :]
    if neighbors == 1:
        return base[:, None, :]
    raise ValueError(f"neighbors must be 1, 4, 8 or 27, got {neighbors}")


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class VoxelHashMap:
    """Fixed-capacity voxel point map (128-lane-tiled i32 slot windows)."""

    voxel_size: jax.Array  # () f32 — set when the map is created
    data: jax.Array  # (V * stride / 128, 128) i32
    epoch: jax.Array  # () i32 — slots live iff their state epoch matches
    K: int = 20  # static: point capacity per voxel
    stride: int = 64  # static: lanes per slot window

    # -- pytree / NamedTuple-compat plumbing --------------------------------
    _fields = ("voxel_size", "data", "epoch", "K", "stride")

    def tree_flatten(self):
        return (self.voxel_size, self.data, self.epoch), (self.K, self.stride)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, K=aux[0], stride=aux[1])

    def _replace(self, **kw) -> "VoxelHashMap":
        return dataclasses.replace(self, **kw)

    # -- shape properties ----------------------------------------------------
    @property
    def num_slots(self) -> int:
        return self.data.shape[-2] * 128 // self.stride

    @property
    def ways(self) -> int:
        """Slot windows per 128-lane row = bucket associativity (W)."""
        return max(128 // self.stride, 1)

    @property
    def num_buckets(self) -> int:
        return self.num_slots // self.ways

    @property
    def points_per_voxel(self) -> int:
        return self.K

    # -- decoded whole-table views (cold paths: viz, serialization, tests) ---
    @property
    def _windows(self) -> jax.Array:
        """(V, stride) i32 — one window per logical slot."""
        return self.data.reshape(self.num_slots, self.stride)

    @property
    def _epoch16(self) -> jax.Array:
        return self.epoch & jnp.int32(0xFFFF)

    @property
    def fresh(self) -> jax.Array:
        """(V,) bool — slots belonging to the current epoch."""
        state = self._windows[:, 1]
        return ((state >> 16) & 0xFFFF) == self._epoch16

    @property
    def count(self) -> jax.Array:
        state = self._windows[:, 1]
        return jnp.where(self.fresh, state & 0xFFFF, 0)

    @property
    def keys(self) -> jax.Array:
        """(V, 3) i32 voxel coords, unwrapped near the origin."""
        return unpack_key_near(self._windows[:, 0], jnp.zeros(3, jnp.int32))

    def keys_near(self, anchor_vox: jax.Array) -> jax.Array:
        return unpack_key_near(self._windows[:, 0], anchor_vox)

    @property
    def pts(self) -> jax.Array:
        """(V, K, 3) f32 — stored points (garbage beyond each count),
        unwrapped near the ORIGIN — use :meth:`pts_near` when the map may
        live beyond the pkey wrap envelope of the origin."""
        return self.pts_near(jnp.zeros(3, jnp.int32))

    def pts_near(self, anchor_vox: jax.Array) -> jax.Array:
        """(V, K, 3) f32 stored points, voxel coords unwrapped near
        ``anchor_vox`` (3,) i32 (e.g. the robot's voxel)."""
        K = self.K
        w = self._windows[:, 2 : 2 + K]  # (V, K) packed offsets
        coords = self.keys_near(anchor_vox)  # (V, 3)
        return unpack_points(w, coords[:, None, :], self.voxel_size)

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
        K = int(points_per_voxel)
        stride = _pick_stride(K)
        if num_slots * stride < 128:  # tiny test maps: widen the windows
            stride = 128 // num_slots
        rows = num_slots * stride // 128
        return VoxelHashMap(
            voxel_size=jnp.asarray(voxel_size, jnp.float32),
            data=jnp.zeros((rows, 128), jnp.int32),
            epoch=jnp.int32(1),  # zero-filled rows are born dead
            K=K,
            stride=stride,
        )

    def clear(self) -> "VoxelHashMap":
        return self._replace(epoch=self.epoch + 1)


def _window_base(m: VoxelHashMap, slot: jax.Array) -> jax.Array:
    """Flat element index of a slot's window start."""
    return slot * m.stride


def _gather_buckets(m: VoxelHashMap, bucket: jax.Array) -> jax.Array:
    """(n, W * stride) i32 — ALL ways of each bucket, via row gathers.

    Row gathers are row-count bound and width-free on this chip, so a
    bucket (= one physical 128-lane row for strides <= 128) costs the same
    gather as a single window; strides > 128 gather stride/128 rows.
    """
    from mola_lidar_odometry_tpu.ops import batched_mem as BM

    s = m.stride
    if s <= 128:
        return BM.gather_rows(m.data, bucket)  # (n, 128) = W windows
    rpp = s // 128  # rows per slot (W == 1)
    idx = (bucket[:, None] * rpp + jnp.arange(rpp, dtype=jnp.int32)[None]).reshape(-1)
    g = BM.gather_rows(m.data, idx)
    return g.reshape(bucket.shape[0], s)


def claim_slots(
    same_key: jax.Array,  # (n,) bool — slot's current key equals my coords
    occupied: jax.Array,  # (n,) bool — slot currently owned by some voxel
    coords: jax.Array,  # (n, 3) voxel coords of the incoming points
    slot: jax.Array,  # (n,) hash slot per point
    valid: jax.Array,  # (n,) bool
    num_slots: int,
) -> Tuple[jax.Array, jax.Array]:
    """Atomics-free parallel slot claim, shared by the NDT/occupancy maps.

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
    deferred_drops: Any = 0  # i32 — storable points past the insert budget
    # (transient, not lost: overlapping scans re-present them next frame)

    @staticmethod
    def zero() -> "InsertStats":
        return InsertStats(jnp.int32(0), jnp.int32(0), jnp.int32(0))

    def __add__(self, other: "InsertStats") -> "InsertStats":
        return InsertStats(
            self.collision_drops + other.collision_drops,
            self.full_drops + other.full_drops,
            self.deferred_drops + other.deferred_drops,
        )


def insert(m: VoxelHashMap, pc: PointCloud, min_distance: float = 0.0) -> VoxelHashMap:
    """Insert the valid points of ``pc`` (already in map/global frame)."""
    return insert_stats(m, pc, min_distance)[0]


def insert_stats(
    m: VoxelHashMap, pc: PointCloud, min_distance: float = 0.0, budget: int = 0
) -> Tuple[VoxelHashMap, InsertStats]:
    """Insert + capacity-pressure counters (see :class:`InsertStats`).

    Fully sort-fused: ONE lexicographic (bucket, pkey, idx) sort groups
    each voxel's valid points contiguously (first-come point at the
    subrun head), so existing-way matching, free-way claiming (per-bucket
    segmented rank over claiming subruns), per-voxel arrival ranks, and
    the stats all happen in the sorted domain with no claim table and no
    winner gathers.

    The table update is ONE flat element scatter of 3 i32 words per
    stored point: the 10|10|10-quantized within-voxel offset into the
    point lane, plus the way's pkey and final state — every stored point
    of a subrun writes the IDENTICAL pkey/state words (the subrun's final
    count), so duplicate scatter ordering cannot change the result.
    Elements are ~6 ns each on this chip with no per-instruction floor
    (eval/micro_insert.py), so the static element count per point is the
    entire cost.
    """
    V, K, W = m.num_slots, m.K, m.ways
    NB = m.num_buckets
    n = pc.capacity
    s = m.stride

    from mola_lidar_odometry_tpu.ops import batched_mem as BM

    coords = voxel_coords(pc.xyz, m.voxel_size)  # (n, 3)
    bucket = voxel_hash(coords, NB)  # (n,)
    pkey = pack_key(coords)

    # ONE sort: (bucket | NB-for-invalid, pkey, input idx) lexicographic.
    # The 10|10|10-quantized point word is packed BEFORE the sort and rides
    # as a value operand — value lanes permute without widening the
    # comparator, and carrying the word kills the post-sort (n,3) xyz
    # gather (a ~94k-row, ~1 ms line in the round-4 device profile; rows
    # are the cost, width is free).
    sort_key = jnp.where(pc.valid, bucket, jnp.int32(NB))
    pos = jnp.arange(n, dtype=jnp.int32)
    packed_pre = pack_points(pc.xyz, coords, m.voxel_size)
    # 2-key STABLE sort: pos rides as a value — stability already yields
    # ascending input order within equal (bucket, pkey), so the explicit
    # pos key is redundant and the comparator is a third narrower (same
    # trick as the decimation group sort, filters.py).
    sb, spk, sidx, s_packed = jax.lax.sort(
        [sort_key, pkey, pos, packed_pre], num_keys=2, is_stable=True
    )
    s_valid = sb < NB
    # Spread-pad the INVALID tail (sorted past the valid prefix): routing
    # every dead point to row 0 makes the bucket gather re-read one row
    # thousands of times, and duplicated gather rows are measurably slower
    # than unique ones (eval/micro_gather.py; same fix as the capture
    # spread-pad).  Consecutive iota rows keep the gather all-unique; all
    # downstream matching/claiming is already gated on ``s_valid``.
    s_bucket = jnp.where(s_valid, sb, pos % jnp.int32(NB))

    # bucket rows gathered in the SORTED domain: all W ways per point
    g = _gather_buckets(m, s_bucket)  # (n, W*s)
    pk_w = jnp.stack([g[:, w * s] for w in range(W)], axis=-1)  # (n, W)
    st_w = jnp.stack([g[:, w * s + 1] for w in range(W)], axis=-1)
    fresh_w = ((st_w >> 16) & 0xFFFF) == m._epoch16  # (n, W)
    match_w = fresh_w & (pk_w == spk[:, None]) & s_valid[:, None]
    any_match = jnp.any(match_w, axis=-1)
    widx = jnp.arange(W, dtype=jnp.int32)
    exist_way = jnp.min(jnp.where(match_w, widx[None], W), axis=-1)
    exist_way = jnp.where(any_match, exist_way, 0)
    cnt_exist = jnp.sum(jnp.where(match_w, st_w & 0xFFFF, 0), axis=-1)

    # segment structure: voxel subruns inside bucket runs
    b_chg = sb[1:] != sb[:-1]
    v_chg = b_chg | (spk[1:] != spk[:-1])
    one = jnp.ones((1,), bool)
    is_bucket_head = jnp.concatenate([one, b_chg])
    is_voxel_head = jnp.concatenate([one, v_chg])
    is_voxel_tail = jnp.concatenate([v_chg, one])

    def seg_sum(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, va + vb), fa | fb

    # way claim: the r-th claiming voxel of a bucket takes the bucket's
    # r-th stale way (claim order = pkey order within the bucket run)
    claim_head = (is_voxel_head & s_valid & ~any_match).astype(jnp.int32)
    r_incl, _ = jax.lax.associative_scan(seg_sum, (claim_head, is_bucket_head))
    r = r_incl - 1  # my subrun's claim rank (valid where ~any_match)
    free_w = ~fresh_w  # stale ways are claimable
    free_before = jnp.cumsum(free_w.astype(jnp.int32), axis=-1) - free_w
    free_cnt = jnp.sum(free_w, axis=-1)
    claim_ok = s_valid & ~any_match & (r >= 0) & (r < free_cnt)
    claim_way = jnp.sum(
        jnp.where(free_w & (free_before == r[:, None]), widx[None], 0), axis=-1
    )
    accept = any_match | claim_ok
    way = jnp.where(any_match, exist_way, claim_way)
    cnt_at = jnp.where(any_match, cnt_exist, 0)

    if min_distance > 0:
        # the rejection test needs full-precision positions + voxel coords
        # in the sorted domain; this gather is paid ONLY by configs that
        # set min_distance_between_points > 0 (no shipped default does)
        s_xyz = BM.gather_rows(pc.xyz, sidx)  # (n, 3) hot narrow gather
        s_coords = voxel_coords(s_xyz, m.voxel_size)
        # ``min_distance_between_points`` (reference insertOpts,
        # pipelines/lidar3d-default.yaml:236): reject a point closer than
        # this to any point ALREADY STORED in its voxel.  The stored points
        # are in the gathered bucket row — one packed lane slice, no extra
        # memory traffic (dequantized against my own voxel coords: stored
        # points share my voxel).  Same-batch points do not see each other
        # (they arrive pre-decimated at >= this resolution in every shipped
        # pipeline); documented deviation, docs/parity.md.
        off = way * s
        kj = jnp.arange(K, dtype=jnp.int32)
        cols = off[:, None] + 2 + kj[None]
        spts = unpack_points(
            jnp.take_along_axis(g, cols, axis=1), s_coords[:, None, :], m.voxel_size
        )  # (n, K, 3)
        stored = kj[None, :] < cnt_at[:, None]
        d2s = jnp.sum((spts - s_xyz[:, None, :]) ** 2, axis=-1)
        too_close = jnp.any(stored & (d2s < min_distance * min_distance), axis=-1)
        accept = accept & ~too_close
    else:
        too_close = jnp.zeros_like(accept)

    # rank among ACCEPTED points of my voxel subrun
    a32 = accept.astype(jnp.int32)
    incl, _ = jax.lax.associative_scan(seg_sum, (a32, is_voxel_head))
    rank = incl - a32

    dest = cnt_at + rank
    store = accept & (dest < K)

    # Insert budget (round 3): scatter cost is ~6 ns per STATIC element, so
    # masked no-op writes are as expensive as live ones — yet steady-state
    # frames STORE only a fraction of the layer capacity (everything else
    # lands in voxels already at K).  With 0 < budget < n, keep only the
    # first ``budget`` storable points (stream order) and compact them to a
    # budget-sized prefix, shrinking the scatter's static size ~n/budget x.
    # Overflow is *deferred*, not lost: the kept set per subrun is a prefix
    # (the global stored-order cumsum is monotone along the stream), counts
    # stay exact, and overlapping next-frame scans re-present the dropped
    # points while their voxels still have room (counted in
    # ``deferred_drops``; utils/capacity.py sizes the budget).
    C = int(budget)
    compact = 0 < C < n
    if compact:
        # Priority = voxel fill depth: points landing at dest=0 (first
        # point of a new voxel) are kept before any dest=1 point, etc.
        # A bring-up frame thus stores one point into EVERY new voxel
        # before densifying any — full spatial coverage for ICP from the
        # first frame; only depth (K-fill) is deferred.  Within a subrun
        # dest increases with position, so kept sets remain subrun
        # prefixes and the exact-count logic holds.
        #
        # Lowering: the kept set is "first C storables under (dest, pos)
        # lexicographic order", so ONE single-operand combined-key sort
        # (dest in the high bits, stream pos in the low bits — K<=20 and
        # layer-sized n keep the pair inside i32) yields the priority
        # permutation directly, and the stream-domain keep flag is a
        # plain threshold compare against the (C+1)-th smallest key
        # (keys are all-distinct: pos is unique).  This replaces a (K, n)
        # level-expanded cumsum (lowered to a 0.26 ms reduce-window at
        # B=8 bench shapes) plus the 2-operand kept-to-front sort below
        # (0.08 ms) with a ~0.01 ms sort + a fused compare (a C-sized
        # keep-flag scatter was A/B'd first: 0.19 ms — the compare is
        # free).  Fewer than C storables: prio_sorted[C] is the invalid
        # sentinel and the compare degenerates to ``store`` exactly.
        shift = max(1, (n - 1).bit_length())
        pkey_prio = jnp.where(
            store,
            (dest << shift) | pos,
            jnp.int32(1) << 30,
        )
        (prio_sorted,) = jax.lax.sort([pkey_prio], num_keys=1)
        prio_sel = prio_sorted[:C] & ((jnp.int32(1) << shift) - 1)
        prio_live = prio_sorted[:C] < (jnp.int32(1) << 30)
        keep = store & (pkey_prio < prio_sorted[C])
    else:
        keep = store

    # per-subrun KEPT count (for the exact final state count)
    k32 = keep.astype(jnp.int32)
    kincl, _ = jax.lax.associative_scan(seg_sum, (k32, is_voxel_head))
    krincl, _ = jax.lax.associative_scan(seg_sum, (k32, is_voxel_tail), reverse=True)
    n_kept = kincl + krincl - k32

    cnt_fin = jnp.minimum(cnt_at + n_kept, K)
    state_fin = (m._epoch16 << 16) | cnt_fin
    # pkey/state are written ONCE per (voxel, way) subrun — by the first
    # kept point (rank 0 is always kept when anything is: kept sets are
    # stored-prefixes).  All landing indices are therefore DISTINCT, which
    # lets the scatter promise unique_indices and skip XLA's sort-based
    # duplicate-combine lowering (~0.5 ms at bench shapes).
    head = keep & (rank == 0)

    oob = jnp.int32(m.data.shape[-2] * 128)
    p_base = (s_bucket * W + way) * s
    packed = s_packed  # quantized pre-sort, permuted by the sort
    # flat element indices (the (rows,128) -> flat reshape is layout-exact
    # for 128-lane rows — no materializing layout round-trip)
    idx = jnp.stack(
        [
            jnp.where(keep, p_base + 2 + dest, oob),  # packed point offset
            jnp.where(head, p_base + 0, oob),  # pkey (head of subrun only)
            jnp.where(head, p_base + 1, oob),  # state (head of subrun only)
        ],
        axis=-1,
    )  # (n, 3)
    vals = jnp.stack([packed, spk, state_fin], axis=-1)
    if compact:
        # the priority sort above already compacted the kept positions
        # into its C-prefix — gather those rows so the scatter touches
        # only 3*C static elements instead of 3*n.  Scatter row order is
        # priority order rather than stream order: irrelevant, all
        # landing indices are distinct.  Prefix entries beyond the live
        # storables gather row 0 (clamp) — masked to the oob index so
        # they drop (dropped entries may repeat under unique_indices).
        idx = jnp.where(prio_live[:, None], BM.gather_rows(idx, prio_sel), oob)
        vals = BM.gather_rows(vals, prio_sel)
    data = BM.scatter_set_unique(m.data.reshape(-1), idx, vals).reshape(m.data.shape)

    stats = InsertStats(
        # dedup rejections (min_distance) are intended behavior, not
        # capacity pressure — excluded from the collision counter
        collision_drops=jnp.sum(s_valid & ~accept & ~too_close).astype(jnp.int32),
        full_drops=jnp.sum(accept & (dest >= K)).astype(jnp.int32),
        deferred_drops=jnp.sum(store & ~keep).astype(jnp.int32),
    )
    return m._replace(data=data), stats


def _prune_state_scatter(
    m: VoxelHashMap, center: jax.Array, distance, row_start, n_rows: int
) -> VoxelHashMap:
    """Kill far slots in rows [row_start, row_start+n_rows): read the
    slab as ONE flat row gather, zero dead slots' state lanes with a
    vector select, write it back with ONE dynamic_update_slice.

    Lowering history (all measured at B=8, 67 MB table):
      * element scatter write-back: 1.4 ms for 16k elements in round 3
        (serial sub-100k path), 0.35 ms + a 0.10 ms table copy in the
        round-5 re-test — always loses to the DUS (0.03 ms, vh while.330).
      * ``dynamic_slice_in_dim`` READ: under vmap it lowers to a batched
        gather whose chosen operand layout forces a whole-table relayout
        copy (0.12 ms, round-5 scan profile copy.2267).  The flat
        ``BM.gather_rows`` read keeps the table's native layout — the
        gather itself is row-count-bound (~us at slab sizes)."""
    from mola_lidar_odometry_tpu.ops import batched_mem as BM

    stride = m.stride
    spr = max(128 // stride, 1)
    ridx = row_start + jnp.arange(n_rows, dtype=jnp.int32)
    rows = BM.gather_rows(m.data, ridx)  # (n_rows, 128)
    # slots covered by these rows
    if stride <= 128:
        w = rows.reshape(n_rows * spr, stride)
    else:
        rpp = stride // 128
        w = rows.reshape(n_rows // rpp, stride)
    pkey, state = w[:, 0], w[:, 1]
    live = ((state >> 16) & 0xFFFF) == m._epoch16
    cvox = voxel_coords(center[None], m.voxel_size)[0]  # (3,) i32
    kvox = unpack_key_near(pkey, cvox)  # (S, 3)
    centers = (kvox.astype(jnp.float32) + 0.5) * m.voxel_size
    l1 = jnp.max(jnp.abs(centers - center), axis=-1)
    kill = live & (l1 > distance) & (distance > 0)
    lane = jnp.arange(w.shape[-1], dtype=jnp.int32)
    neww = jnp.where(kill[:, None] & (lane[None, :] == 1), 0, w)
    data = jax.lax.dynamic_update_slice_in_dim(
        m.data, neww.reshape(rows.shape), row_start, -2
    )
    return m._replace(data=data)


def zero_state_slab(m: VoxelHashMap, slab: jax.Array, n_slabs: int = 64) -> VoxelHashMap:
    """Hard-zero the state lanes of one contiguous row slab (1/``n_slabs``
    of the table), cycling with ``slab``.

    Epoch-tagged liveness wraps at 16 bits: a slot last written at epoch
    ``e`` reads as live again at ``e + 65536``, resurrecting stale entries
    on multi-hour runs.  Callers that epoch-bump-clear every frame (the
    occupancy match index) chain this after ``clear()``: every slot is
    physically zeroed every ``n_slabs`` frames, so nothing survives long
    enough to meet its epoch again — at the same ~(table/n_slabs) cost
    class as the rolling-slab eviction, never a whole-table op."""
    from mola_lidar_odometry_tpu.ops import batched_mem as BM

    R = m.data.shape[-2]
    ns = min(int(n_slabs), R)
    S = R // ns
    start = jnp.asarray(slab, jnp.int32) % ns * S
    # flat row-gather read (not dynamic_slice: its vmapped lowering forces
    # a whole-table relayout copy — see _prune_state_scatter)
    rows = BM.gather_rows(m.data, start + jnp.arange(S, dtype=jnp.int32))
    stride = m.stride
    lane = jnp.arange(128, dtype=jnp.int32)
    if stride <= 128:
        is_state = ((lane % jnp.int32(stride)) == 1)[None, :]
    else:
        # one slot spans stride/128 rows; the state lane is lane 1 of the
        # FIRST row of each slot only (lane 1 of the other rows is a point
        # word — zeroing it would corrupt a stored point)
        rpp = stride // 128
        row_in_slot = (start + jnp.arange(S, dtype=jnp.int32)) % rpp
        is_state = (lane[None, :] == 1) & (row_in_slot[:, None] == 0)
    neww = jnp.where(is_state, 0, rows)
    data = jax.lax.dynamic_update_slice_in_dim(m.data, neww, start, -2)
    return m._replace(data=data)


def prune_farther_than(m: VoxelHashMap, center: jax.Array, distance) -> VoxelHashMap:
    """Drop voxels with L1 distance from ``center`` beyond ``distance``.

    Mirrors ``remove_voxels_farther_than`` (L1 metric per SURVEY §2.3 /
    pipelines/lidar3d-default.yaml:237-238).  ``distance <= 0`` disables.
    """
    return _prune_state_scatter(m, center, distance, 0, m.data.shape[-2])


def prune_farther_than_slab(
    m: VoxelHashMap, center: jax.Array, distance, slab: jax.Array, n_slabs: int = 64
) -> VoxelHashMap:
    """Rolling-slab eviction: prune 1/``n_slabs`` of the table per call.

    Each call checks one contiguous row slab and zeroes far slots' state
    lanes with one ~(V/n_slabs)-element scatter — every voxel is still
    checked each ``n_slabs`` frames (64-frame sweep = 6.4 s at 10 Hz),
    still tighter than the reference's own
    eviction cadence (``check_for_removal_every_n: 100``,
    pipelines/lidar3d-default.yaml), so the amortization is a
    parity-preserving deviation (docs/parity.md).  Round-2's
    dynamic-update-slice formulation cost ~2.9 ms/step at B=8 in whole-
    table update/copy ops; this one touches only the slab's state lanes.
    """
    R = m.data.shape[-2]
    S = R // n_slabs
    start = jnp.asarray(slab, jnp.int32) % n_slabs * S
    return _prune_state_scatter(m, center, distance, start, S)


class CandSet(NamedTuple):
    """Cached neighborhood candidates of a query batch (one fused gather).

    Captured once per align() at the entry pose and reused across ICP
    iterations: the candidate *set* is fixed (chosen by the entry voxel
    coords + probe margin) while distances are recomputed at the current
    pose each iteration.  Exact as long as the in-align pose correction
    stays below the probe margin (a full voxel for 27 probes) — which the
    twist-reoptimization hook bounds at ~0.15 m anyway.
    """

    pts: jax.Array  # (N, C, 3) candidate map points
    mask: jax.Array  # (N, C) candidate validity


def capture(
    m: VoxelHashMap,
    queries: jax.Array,
    neighbors: int = 27,
    per_voxel_nn: bool = False,
) -> CandSet:
    """ONE fused gather of the packed neighborhood windows around
    ``queries``.

    With ``per_voxel_nn`` the K points of each probed voxel reduce to the
    two nearest the query at capture time (top-2 via one-hot selects, no
    sorting), leaving 2P candidates per query — a KISS-ICP-style
    closest-point-per-voxel view that cuts the per-iteration streaming
    volume K/2-fold.  Under the capture-once regime the selected points
    are at most 2x(in-align pose delta) worse than the exact in-voxel
    nearest — negligible under the robust kernel with the ~0.15 m hook
    bound.
    """
    V, K, W = m.num_slots, m.K, m.ways
    s = m.stride
    n = queries.shape[0]
    base = voxel_coords(queries, m.voxel_size)
    cand = neighbor_coords(queries, base, m.voxel_size, neighbors)  # (N,P,3)
    P = cand.shape[1]
    buckets = voxel_hash(cand, m.num_buckets)  # (N, P)

    gb = _gather_buckets(m, buckets.reshape(-1)).reshape(n, P, W * s)
    target = pack_key(cand)  # (N, P)
    # key-matched way select: the bucket row is already in registers, so
    # checking all W ways costs VPU compares, no extra memory traffic
    g = gb[..., 0:s]
    match = (gb[..., 0] == target) & (
        ((gb[..., 1] >> 16) & 0xFFFF) == m._epoch16
    )
    for w in range(1, W):
        mw = (gb[..., w * s] == target) & (
            ((gb[..., w * s + 1] >> 16) & 0xFFFF) == m._epoch16
        )
        g = jnp.where(mw[..., None], gb[..., w * s : (w + 1) * s], g)
        match = match | mw
    state = g[..., 1]
    cnt = jnp.where(match, state & 0xFFFF, 0)
    live = match & (cnt > 0)
    # candidates belong to the PROBED voxel, so the probe coords (already
    # in registers) anchor the dequantization — no key unwrap needed
    pts4 = unpack_points(g[..., 2 : 2 + K], cand[:, :, None, :], m.voxel_size)
    # (n, P, K, 3)
    jslots = jnp.arange(K, dtype=jnp.int32)
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


def derive_anchor_vox(m: VoxelHashMap) -> jax.Array:
    """(3,) i32 — an unwrap anchor derived from the map's own live keys.

    Per axis, the live wrapped key values are treated as angles on a circle
    of period ``2^bits`` and their circular mean is the anchor.  Because the
    sliding map's live extent is always within half the wrap range (the
    eviction radius guarantees it), every live voxel unwraps exactly
    relative to this anchor — absolute positions are recovered modulo the
    wrap period, which is exact whenever the map actually lives within the
    envelope and the best possible reconstruction from the table alone
    otherwise.  Callers that know the robot pose should still pass it as
    the explicit anchor (it pins the absolute offset unconditionally)."""
    w = m._windows
    pkey = w[:, 0]
    live = m.fresh & ((w[:, 1] & 0xFFFF) > 0)
    wt = live.astype(jnp.float32)
    nf = jnp.maximum(jnp.sum(wt), 1.0)

    def axis_mean(u, period):
        theta = u.astype(jnp.float32) * (2.0 * math.pi / period)
        c = jnp.sum(jnp.cos(theta) * wt) / nf
        s = jnp.sum(jnp.sin(theta) * wt) / nf
        ang = jnp.arctan2(s, c)  # [-pi, pi]
        a = jnp.round(ang * (period / (2.0 * math.pi))).astype(jnp.int32)
        # canonicalize to the SIGNED range [-period/2, period/2): a map
        # clustered around the origin must anchor at ~0, not ~period-1
        # (both unwrap self-consistently, but legacy near-origin behavior —
        # and every near-origin test/consumer — expects the 0-side
        # representative)
        return ((a + period // 2) & jnp.int32(period - 1)) - period // 2

    ux = (pkey >> (_PKY_BITS + _PKZ_BITS)) & (_PKX - 1)
    uy = (pkey >> _PKZ_BITS) & (_PKY - 1)
    uz = pkey & (_PKZ - 1)
    return jnp.stack([axis_mean(ux, _PKX), axis_mean(uy, _PKY), axis_mean(uz, _PKZ)])


def as_pointcloud(m: VoxelHashMap, capacity: int, anchor=None) -> PointCloud:
    """Flatten live voxel contents into a PointCloud (for viz / serialization).

    ``anchor`` (3,) f32 world position (e.g. the current robot pose) anchors
    the pkey unwrap — required for correct absolute positions once the map
    slides beyond ±1024 voxels of the origin in x/y (±64 in z).  Without an
    explicit anchor one is derived from the map's own live keys
    (:func:`derive_anchor_vox`): relative geometry stays exact at any map
    position; the absolute offset is exact modulo the wrap period."""
    V, K = m.num_slots, m.K
    if anchor is None:
        avox = derive_anchor_vox(m)
    else:
        avox = voxel_coords(jnp.asarray(anchor, jnp.float32)[None], m.voxel_size)[0]
    jmask = jnp.arange(K, dtype=jnp.int32)[None, :] < m.count[:, None]
    pc = PointCloud.from_xyz(
        m.pts_near(avox).reshape(V * K, 3), valid=jmask.reshape(V * K)
    )
    return pc.compact(capacity)
