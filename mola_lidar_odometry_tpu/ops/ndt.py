"""NDT voxel map: per-voxel Gaussians + plane normals, for point-to-plane ICP.

TPU-native replacement for ``mola::NDT`` (reference
pipelines/lidar3d-ndt.yaml:236-254: ``voxel_size``, ``min_distance_between_
points``, ``remove_voxels_farther_than`` L1 pruning, ``max_eigen_ratio_for_
planes``) and the plane side of ``mp2p_icp::Matcher_Point2Plane``
(pipelines/lidar3d-ndt.yaml:195-200).

Storage (round 3): the same 128-lane int32 bucket design as
ops/voxel_hash — the table is ``(NB, 128) i32`` rows, each row a 4-way
bucket of stride-32 slot windows:

  lane 0      wrapped 12|12|8 packed voxel key (voxel_hash.pack_key)
  lane 1      state: ``epoch16 << 16 | n`` (point count, capped 65535)
  lanes 2:5   s  — f32-bit moment sums, VOXEL-CENTER-RELATIVE (at km-scale
              positions ulp(x^2) in f32 swamps in-voxel variances; relative
              accumulation keeps every term O(voxel_size))
  lanes 5:11  ss — symmetric-packed second moments [xx yy zz xy xz yz]
  lanes 11:14 mean (GLOBAL frame, f32 bits) — derived, kept hot for capture
  lanes 14:17 plane normal
  lane 17     plane_ok flag

Design deltas vs the round-2 layout (three measured-cost-model fixes):

  * **4-way buckets**: a voxel claims any stale way of its row, so a slot
    collision needs FOUR other live voxels in the bucket (was: one) — same
    gather traffic, the row is already in registers.
  * **One scatter instruction**: insert computes each voxel subrun's POST-
    INSERT totals (segmented scans in the sorted domain) and scatter-SETs
    18 identical-per-subrun words per point — replacing 4 scatter
    instructions (key set + count add + s add + ss add).  Writing totals
    instead of deltas also makes re-claimed slots start from exact zeros.
  * **No whole-table plane refresh**: mean/normal/plane_ok are recomputed
    for TOUCHED voxels only, inside the same scatter — the old
    ``_refresh_planes`` rewrote 7 full columns of the table on every
    insert (the whole-table-write class the cost model forbids under
    vmap).

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
from mola_lidar_odometry_tpu.ops.voxel_hash import (
    InsertStats,
    neighbor_coords,
    pack_key,
    unpack_key_near,
)

_STRIDE = 32
_WAYS = 128 // _STRIDE  # 4
_MAX_N = 0xFFFF


class NdtMap(NamedTuple):
    """Fixed-capacity NDT voxel map (128-lane 4-way bucket rows)."""

    voxel_size: jax.Array  # () f32
    max_eigen_ratio: jax.Array  # () f32 — lambda_min/lambda_mid plane gate
    data: jax.Array  # (num_slots/4, 128) i32
    epoch: jax.Array  # () i32 — slots live iff their state epoch matches

    MIN_POINTS_FOR_PLANE = 5

    @property
    def num_slots(self) -> int:
        return self.data.shape[-2] * _WAYS

    @property
    def num_buckets(self) -> int:
        return self.data.shape[-2]

    @property
    def _epoch16(self) -> jax.Array:
        return self.epoch & jnp.int32(0xFFFF)

    # -- decoded whole-table views (cold paths: viz, serialization, tests) --
    @property
    def _windows(self) -> jax.Array:
        return self.data.reshape(self.num_slots, _STRIDE)

    @property
    def _fresh(self) -> jax.Array:
        return ((self._windows[:, 1] >> 16) & 0xFFFF) == self._epoch16

    @property
    def n(self) -> jax.Array:
        return jnp.where(self._fresh, self._windows[:, 1] & 0xFFFF, 0)

    @property
    def keys(self) -> jax.Array:
        return unpack_key_near(self._windows[:, 0], jnp.zeros(3, jnp.int32))

    def _f32_lanes(self, lo: int, hi: int) -> jax.Array:
        w = jax.lax.bitcast_convert_type(
            self._windows[:, lo:hi], jnp.float32
        )
        return jnp.where(self._fresh[:, None], w, 0.0)

    @property
    def s(self) -> jax.Array:
        return self._f32_lanes(2, 5)

    @property
    def ss(self) -> jax.Array:
        return self._f32_lanes(5, 11)

    def means(self) -> jax.Array:
        return self._f32_lanes(11, 14)

    @property
    def normal(self) -> jax.Array:
        return self._f32_lanes(14, 17)

    @property
    def plane_ok(self) -> jax.Array:
        return self._fresh & (self._windows[:, 17] > 0)

    def num_voxels(self) -> jax.Array:
        return jnp.sum(self.n > 0)

    def is_empty(self) -> jax.Array:
        return jnp.all(self.n == 0)

    @staticmethod
    def create(num_slots: int, voxel_size, max_eigen_ratio=0.05) -> "NdtMap":
        if num_slots & (num_slots - 1) or num_slots < _WAYS:
            raise ValueError("num_slots must be a power of two >= 4")
        return NdtMap(
            voxel_size=jnp.asarray(voxel_size, jnp.float32),
            max_eigen_ratio=jnp.asarray(max_eigen_ratio, jnp.float32),
            data=jnp.zeros((num_slots // _WAYS, 128), jnp.int32),
            epoch=jnp.int32(1),  # zero-filled rows are born dead
        )

    def clear(self) -> "NdtMap":
        return self._replace(epoch=self.epoch + 1)


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


def insert(m: NdtMap, pc: PointCloud, min_distance: float = 0.0) -> NdtMap:
    """Accumulate the valid points of ``pc`` (global frame) into the Gaussians."""
    return insert_stats(m, pc, min_distance)[0]


# sub-cell dedup grid (min_distance_between_points): lanes 18..31 of each
# slot window hold a persistent claim bitmask over a G^3 grid of
# min_distance-sized sub-cells (G <= _DEDUP_MAX_G so G^3 <= 448 bits fits
# the 14 free lanes)
_DEDUP_LANE0 = 18
_DEDUP_LANES = _STRIDE - _DEDUP_LANE0  # 14
_DEDUP_MAX_G = 7


def insert_stats(m: NdtMap, pc: PointCloud, min_distance: float = 0.0):
    """Sort-fused insert: ONE (bucket, pkey, idx) sort groups each voxel's
    points; per-bucket way claims and per-subrun moment totals come from
    segmented scans; the table update is ONE scatter-set of 18 words per
    point (pkey, state, s, ss, mean, normal, plane_ok — all
    identical-per-subrun POST-INSERT values, so duplicate scatter ordering
    cannot change the result and re-claimed ways start from exact zeros).

    ``min_distance`` (reference insertOpts ``min_distance_between_points``,
    pipelines/lidar3d-ndt.yaml:236-254, there 0.2 m): BEHAVIORAL cross-frame
    dedup against already-stored content — each slot window persists a claim
    bitmask over ``G^3`` sub-cells of ``min_distance`` size (lanes 18-31); a
    point landing in an already-claimed sub-cell is rejected and never
    enters the moments.  The distance test is thus quantized to the sub-cell
    grid (same-sub-cell ⇒ rejected; adjacent-sub-cell points closer than
    min_distance are still accepted), and — like the point-map
    implementation — same-batch points do not see each other (shipped
    pipelines pre-decimate at >= this resolution); both documented in
    docs/parity.md."""
    from mola_lidar_odometry_tpu.ops import batched_mem as BM

    NB = m.num_buckets
    n = pc.capacity

    coords = voxel_coords(pc.xyz, m.voxel_size)  # (n, 3)
    bucket = voxel_hash(coords, NB)
    pkey = pack_key(coords)

    sort_key = jnp.where(pc.valid, bucket, jnp.int32(NB))
    pos = jnp.arange(n, dtype=jnp.int32)
    sb, spk, sidx = jax.lax.sort([sort_key, pkey, pos], num_keys=3)
    s_valid = sb < NB
    s_bucket = jnp.where(s_valid, sb, 0)

    g = BM.gather_rows(m.data, s_bucket)  # (n, 128) — the full bucket
    widx = jnp.arange(_WAYS, dtype=jnp.int32)
    pk_w = jnp.stack([g[:, w * _STRIDE] for w in range(_WAYS)], axis=-1)
    st_w = jnp.stack([g[:, w * _STRIDE + 1] for w in range(_WAYS)], axis=-1)
    fresh_w = ((st_w >> 16) & 0xFFFF) == m._epoch16
    match_w = fresh_w & (pk_w == spk[:, None]) & s_valid[:, None]
    any_match = jnp.any(match_w, axis=-1)
    exist_way = jnp.min(jnp.where(match_w, widx[None], _WAYS), axis=-1)
    exist_way = jnp.where(any_match, exist_way, 0)
    n_exist = jnp.sum(jnp.where(match_w, st_w & 0xFFFF, 0), axis=-1)

    # segment structure + way claims (identical machinery to voxel_hash)
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

    claim_head = (is_voxel_head & s_valid & ~any_match).astype(jnp.int32)
    r_incl, _ = jax.lax.associative_scan(seg_sum, (claim_head, is_bucket_head))
    r = r_incl - 1
    free_w = ~fresh_w
    free_before = jnp.cumsum(free_w.astype(jnp.int32), axis=-1) - free_w
    free_cnt = jnp.sum(free_w, axis=-1)
    claim_ok = s_valid & ~any_match & (r >= 0) & (r < free_cnt)
    claim_way = jnp.sum(
        jnp.where(free_w & (free_before == r[:, None]), widx[None], 0), axis=-1
    )
    accept = any_match | claim_ok
    way = jnp.where(any_match, exist_way, claim_way)

    # existing moments of MY way (zeros for claims): 9 lane reads via
    # take_along_axis over the row already in registers
    base = way[:, None] * _STRIDE
    mom_cols = base + jnp.arange(2, 11, dtype=jnp.int32)[None]  # s3 | ss6
    old_mom = jax.lax.bitcast_convert_type(
        jnp.take_along_axis(g, mom_cols, axis=1), jnp.float32
    )
    old_mom = jnp.where(any_match[:, None], old_mom, 0.0)

    # per-subrun POST-INSERT totals (identical for every subrun member)
    s_xyz = BM.gather_rows(pc.xyz, sidx)

    dedup = min_distance > 0
    if dedup:
        # behavioral min_distance_between_points: reject against the
        # PERSISTED sub-cell claim bitmask of my way (see docstring)
        vs = m.voxel_size
        G = jnp.clip(
            jnp.floor(vs / jnp.float32(min_distance)).astype(jnp.int32),
            1,
            _DEDUP_MAX_G,
        )
        s_coords = voxel_coords(s_xyz, vs)
        f = s_xyz / vs - s_coords.astype(jnp.float32)  # [0, 1) per axis
        cell = jnp.clip((f * G.astype(jnp.float32)).astype(jnp.int32), 0, G - 1)
        bit = (cell[:, 0] * G + cell[:, 1]) * G + cell[:, 2]  # (n,)
        lane_off = bit >> 5  # 0.._DEDUP_LANES-1
        bmask = jnp.int32(1) << (bit & 31)
        bit_cols = base + _DEDUP_LANE0 + jnp.arange(_DEDUP_LANES, dtype=jnp.int32)[None]
        old_bits = jnp.take_along_axis(g, bit_cols, axis=1)  # (n, 14)
        old_bits = jnp.where(any_match[:, None], old_bits, 0)
        lane_iota = jnp.arange(_DEDUP_LANES, dtype=jnp.int32)[None]
        my_old = jnp.sum(jnp.where(lane_iota == lane_off[:, None], old_bits, 0), axis=1)
        too_close = s_valid & ((my_old & bmask) != 0)
        accept = accept & ~too_close
        my_bits = jnp.where(
            (lane_iota == lane_off[:, None]) & accept[:, None], bmask[:, None], 0
        )  # (n, 14)
    else:
        too_close = jnp.zeros_like(accept)
    ctr = (coords.astype(jnp.float32) + 0.5) * m.voxel_size
    s_ctr = BM.gather_rows(ctr, sidx)
    rel = jnp.where(accept[:, None], s_xyz - s_ctr, 0.0)
    x, y, z = rel[:, 0], rel[:, 1], rel[:, 2]
    mom9 = jnp.concatenate(
        [rel, jnp.stack([x * x, y * y, z * z, x * y, x * z, y * z], -1)], axis=-1
    )  # (n, 9)

    def seg_sum2d(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, va + vb), fa | fb

    a32 = accept.astype(jnp.int32)
    self_row = jnp.concatenate([mom9, a32[:, None].astype(jnp.float32)], -1)
    incl, _ = jax.lax.associative_scan(
        seg_sum2d, (self_row, is_voxel_head[:, None])
    )
    rincl, _ = jax.lax.associative_scan(
        seg_sum2d, (self_row, is_voxel_tail[:, None]), reverse=True
    )
    tot = incl + rincl - self_row  # (n, 10): subrun moment sums + count
    new_mom = old_mom + tot[:, :9]
    n_new = jnp.minimum(
        n_exist + tot[:, 9].astype(jnp.int32), _MAX_N
    )

    # plane recompute for the touched voxel (vectorized over points; every
    # subrun member computes the identical value)
    nf = jnp.maximum(n_new.astype(jnp.float32), 1.0)[:, None]
    mean_rel = new_mom[:, :3] / nf
    mx, my, mz = mean_rel[:, 0], mean_rel[:, 1], mean_rel[:, 2]
    cov6 = new_mom[:, 3:9] / nf - jnp.stack(
        [mx * mx, my * my, mz * mz, mx * my, mx * mz, my * mz], axis=-1
    )
    nrm, e_min, e_mid = _sym_eigen_smallest(cov6)
    ok = (
        (n_new >= NdtMap.MIN_POINTS_FOR_PLANE)
        & (e_min >= -1e-6)
        & (e_min <= m.max_eigen_ratio * jnp.maximum(e_mid, 1e-12))
    )
    mean_g = s_ctr + mean_rel
    state_fin = (m._epoch16 << 16) | n_new

    # ONE scatter-set: 18 words per point (+14 bitmask words under dedup)
    vals_f32 = jnp.concatenate([new_mom, mean_g, nrm], axis=-1)  # (n, 15)
    vals = jnp.concatenate(
        [
            spk[:, None],
            state_fin[:, None],
            jax.lax.bitcast_convert_type(vals_f32, jnp.int32),
            ok.astype(jnp.int32)[:, None],
        ],
        axis=-1,
    )  # (n, 18)
    n_lanes = 18
    write = accept
    if dedup:
        # per-subrun OR of the accepted points' claim bits (identical for
        # every subrun member, so duplicate scatter ordering is still safe)
        def seg_or2d(a, b):
            va, fa = a
            vb, fb = b
            return jnp.where(fb, vb, va | vb), fa | fb

        incl_b, _ = jax.lax.associative_scan(
            seg_or2d, (my_bits, is_voxel_head[:, None])
        )
        rincl_b, _ = jax.lax.associative_scan(
            seg_or2d, (my_bits, is_voxel_tail[:, None]), reverse=True
        )
        sub_bits = incl_b | rincl_b  # union incl. self counted twice (OR-safe)
        vals = jnp.concatenate([vals, old_bits | sub_bits], axis=-1)  # (n, 32)
        n_lanes = 18 + _DEDUP_LANES
        # a fully-deduped subrun must still refresh its epoch/state lane
        # (the voxel stays live even when this batch adds nothing), so any
        # accept-or-rejected member of a LIVE subrun may write the
        # identical-per-subrun totals
        write = accept | (too_close & any_match)
    oob = jnp.int32(m.data.shape[-2] * 128)
    p_base = (s_bucket * _WAYS + way) * _STRIDE
    lane = jnp.arange(n_lanes, dtype=jnp.int32)
    idx = jnp.where(write[:, None], p_base[:, None] + lane[None], oob)
    data = BM.scatter_set(m.data.reshape(-1), idx, vals).reshape(m.data.shape)

    stats = InsertStats(
        # dedup rejections (min_distance) are intended behavior, not
        # capacity pressure — excluded from the collision counter
        collision_drops=jnp.sum(s_valid & ~accept & ~too_close).astype(jnp.int32),
        full_drops=jnp.int32(0),  # moments accumulate unbounded (n capped)
    )
    return m._replace(data=data), stats


def prune_farther_than(m: NdtMap, center: jax.Array, distance) -> NdtMap:
    """Drop voxels with L1 distance beyond ``distance`` (<=0 disables) by
    zeroing their state lanes (one element scatter; dead epoch ⇒ the moment
    lanes read as zero and claims overwrite them with fresh totals)."""
    from mola_lidar_odometry_tpu.ops import batched_mem as BM

    w = m._windows  # (V, 32)
    pkey, state = w[:, 0], w[:, 1]
    live = ((state >> 16) & 0xFFFF) == m._epoch16
    cvox = voxel_coords(center[None], m.voxel_size)[0]
    kvox = unpack_key_near(pkey, cvox)
    centers = (kvox.astype(jnp.float32) + 0.5) * m.voxel_size
    l1 = jnp.max(jnp.abs(centers - center), axis=-1)
    kill = live & (l1 > distance) & (distance > 0)
    sl = jnp.arange(w.shape[0], dtype=jnp.int32)
    oob = jnp.int32(m.data.shape[-2] * 128)
    idx = jnp.where(kill, sl * _STRIDE + 1, oob)
    data = BM.scatter_set(
        m.data.reshape(-1), idx, jnp.zeros_like(idx)
    ).reshape(m.data.shape)
    return m._replace(data=data)


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
    P = cand.shape[1]
    nq = cand.shape[0]
    buckets = voxel_hash(cand, m.num_buckets)
    gb = BM.gather_rows(m.data, buckets.reshape(-1)).reshape(nq, P, 128)
    target = pack_key(cand)

    # key-matched way select over the row already in registers
    g = gb[..., 0:_STRIDE]
    match = (gb[..., 0] == target) & (
        ((gb[..., 1] >> 16) & 0xFFFF) == m._epoch16
    )
    for w in range(1, _WAYS):
        mw = (gb[..., w * _STRIDE] == target) & (
            ((gb[..., w * _STRIDE + 1] >> 16) & 0xFFFF) == m._epoch16
        )
        g = jnp.where(mw[..., None], gb[..., w * _STRIDE : (w + 1) * _STRIDE], g)
        match = match | mw
    live = match & ((g[..., 1] & 0xFFFF) > 0)
    mu = jax.lax.bitcast_convert_type(g[..., 11:14], jnp.float32)
    nrm = jax.lax.bitcast_convert_type(g[..., 14:17], jnp.float32)
    return NdtCandSet(mu, nrm, live, live & (g[..., 17] > 0))


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
