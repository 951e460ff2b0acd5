"""Tests for the hash-voxel map: insert / cap / prune / NN query.

Correctness is diffed against a brute-force dense reference (numpy), per
SURVEY.md §7 step 4.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mola_lidar_odometry_tpu.ops import voxel_hash as vh
from mola_lidar_odometry_tpu.ops.pointcloud import PointCloud


def cloud(xyz):
    return PointCloud.from_xyz(jnp.asarray(xyz, jnp.float32))


def qz(xyz, voxel_size):
    """Expected stored value under the round-4 packed-point storage: the
    10|10|10 within-voxel quantization round-trip (pack->unpack, the exact
    device op order), as a numpy (n, 3) f32 array."""
    from mola_lidar_odometry_tpu.ops.voxel_hash import pack_points, unpack_points

    p = jnp.asarray(np.asarray(xyz, np.float32).reshape(-1, 3))
    c = vh.voxel_coords(p, voxel_size)
    return np.asarray(unpack_points(pack_points(p, c, voxel_size), c, voxel_size))


def test_insert_and_counts():
    m = vh.VoxelHashMap.create(1 << 12, 4, 1.0)
    xyz = np.array(
        [[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [1.5, 0.5, 0.5], [0.3, 0.3, 0.3]],
        dtype=np.float32,
    )
    m = jax.jit(vh.insert)(m, cloud(xyz))
    assert int(m.num_voxels()) == 2
    assert int(m.num_points()) == 4


def test_per_voxel_cap():
    m = vh.VoxelHashMap.create(1 << 12, 3, 1.0)
    xyz = np.tile(np.array([[0.5, 0.5, 0.5]], dtype=np.float32), (10, 1))
    xyz += np.random.default_rng(0).uniform(0, 0.3, (10, 3)).astype(np.float32)
    m = vh.insert(m, cloud(xyz))
    assert int(m.num_points()) == 3  # capped at K


def test_incremental_insert_respects_existing():
    m = vh.VoxelHashMap.create(1 << 12, 4, 1.0)
    m = vh.insert(m, cloud([[0.1, 0.1, 0.1]]))
    m = vh.insert(m, cloud([[0.2, 0.2, 0.2], [0.3, 0.1, 0.4]]))
    assert int(m.num_voxels()) == 1
    assert int(m.num_points()) == 3
    m = vh.insert(m, cloud([[0.4, 0.4, 0.4], [0.5, 0.5, 0.5]]))
    assert int(m.num_points()) == 4  # cap K=4


def test_prune_farther_than():
    m = vh.VoxelHashMap.create(1 << 12, 4, 1.0)
    m = vh.insert(m, cloud([[0.5, 0.5, 0.5], [10.5, 0.5, 0.5], [0.5, 30.5, 0.5]]))
    assert int(m.num_voxels()) == 3
    m = jax.jit(vh.prune_farther_than)(m, jnp.zeros(3), 20.0)
    assert int(m.num_voxels()) == 2  # the y=30 voxel dropped (L1 > 20)
    m2 = vh.prune_farther_than(m, jnp.zeros(3), 0.0)
    assert int(m2.num_voxels()) == 2  # 0 disables pruning


def test_negative_coords_roundtrip():
    m = vh.VoxelHashMap.create(1 << 12, 4, 0.5)
    pts = np.array([[-3.2, -0.1, -7.9], [-3.4, -0.2, -7.0]], dtype=np.float32)
    m = vh.insert(m, cloud(pts))
    assert int(m.num_voxels()) == 2
    nn, d2, found = vh.query_nn(m, jnp.asarray(pts), jnp.ones(2, bool))
    assert bool(found.all())
    # stored points are quantized (<= voxel_size/2048 per axis), so the
    # self-query distance is bounded by 3 * (vs/2048)^2, not exactly zero
    np.testing.assert_allclose(np.asarray(d2), 0.0, atol=3 * (0.5 / 2048) ** 2)
    np.testing.assert_allclose(np.asarray(nn), qz(pts, 0.5), atol=1e-7)


def test_query_nn_vs_bruteforce():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-10, 10, (2000, 3)).astype(np.float32)
    m = vh.VoxelHashMap.create(1 << 14, 8, 1.0)
    m = jax.jit(vh.insert)(m, cloud(pts))

    queries = (pts[:100] + rng.uniform(-0.3, 0.3, (100, 3))).astype(np.float32)
    nn, d2, found = jax.jit(vh.query_nn)(m, jnp.asarray(queries), jnp.ones(100, bool))
    nn, d2, found = np.asarray(nn), np.asarray(d2), np.asarray(found)

    # Brute force over points actually stored in the map (insert may cap/drop)
    stored = np.asarray(vh.as_pointcloud(m, 4096).xyz)
    stored_n = int(vh.as_pointcloud(m, 4096).count().sum())
    stored = stored[:stored_n]
    for i in range(100):
        d = np.sum((stored - queries[i]) ** 2, axis=1)
        jbest = d.argmin()
        if found[i]:
            # query result must match brute force whenever brute-force NN lies
            # within the 27-voxel neighborhood (here offsets are < 1 voxel)
            assert abs(d[jbest] - d2[i]) < 1e-4, (i, d[jbest], d2[i])


def test_query_respects_neighborhood_limit():
    m = vh.VoxelHashMap.create(1 << 12, 4, 1.0)
    m = vh.insert(m, cloud([[5.5, 5.5, 5.5]]))
    # query 10 voxels away: no candidates in 27-neighborhood
    _, d2, found = vh.query_nn(m, jnp.asarray([[15.5, 5.5, 5.5]]), jnp.ones(1, bool))
    assert not bool(found[0])


def test_as_pointcloud():
    m = vh.VoxelHashMap.create(1 << 12, 4, 1.0)
    xyz = np.array([[0.1, 0.2, 0.3], [5.1, 5.2, 5.3]], dtype=np.float32)
    m = vh.insert(m, cloud(xyz))
    pc = vh.as_pointcloud(m, 16)
    got = np.sort(np.asarray(pc.xyz)[np.asarray(pc.valid)], axis=0)
    np.testing.assert_allclose(got, np.sort(qz(xyz, 1.0), axis=0), atol=1e-7)


def test_as_pointcloud_far_from_origin_derived_anchor():
    """A map living beyond the pkey wrap envelope of the origin (±1024
    voxels x/y, ±128 z) must still export correct positions with NO explicit
    anchor: the unwrap anchor is derived from the map's own live keys
    (ADVICE r4: export/viz call sites without a pose were aliasing)."""
    m = vh.VoxelHashMap.create(1 << 12, 4, 1.0)
    # 1500 voxels out in x, 100 in z: beyond the old origin-anchored safe
    # envelope (±1024 x/y, ±64 z) but within half the wrap period of the
    # origin, so the derived anchor recovers exact absolute positions
    # (beyond half a period the offset is inherently modulo the wrap)
    base = np.array([1500.0, -300.0, 100.0], np.float32)
    xyz = base[None, :] + np.array(
        [[0.1, 0.2, 0.3], [5.1, 5.2, 5.3], [-3.4, 2.2, -1.7]], np.float32
    )
    m = vh.insert(m, cloud(xyz))
    pc = vh.as_pointcloud(m, 16)  # anchor=None -> derived from live keys
    got = np.sort(np.asarray(pc.xyz)[np.asarray(pc.valid)], axis=0)
    np.testing.assert_allclose(got, np.sort(qz(xyz, 1.0), axis=0), atol=1e-3)


def test_zero_state_slab_kills_epoch_wrap_ghosts():
    """Rolling slab zero-fill: a slot abandoned for >= n_slabs clears
    physically, so 16-bit epoch wrap can never resurrect it (occupancy
    match-index chain; ADVICE r4)."""
    m = vh.VoxelHashMap.create(1 << 8, 4, 1.0)
    m = vh.insert(m, cloud([[0.5, 0.5, 0.5], [3.5, 0.5, 0.5]]))
    assert int(m.num_voxels()) == 2
    m = m.clear()
    # sweep every slab once (n_slabs capped at the row count internally)
    for s in range(m.data.shape[-2]):
        m = vh.zero_state_slab(m, jnp.int32(s), n_slabs=m.data.shape[-2])
    # simulate 65536 epoch bumps: without the zero-fill the old state
    # lane would read as live again at the wrapped epoch
    m = m._replace(epoch=m.epoch + 65535)
    assert int(m.num_voxels()) == 0
    assert int(m.num_points()) == 0
    # the table stays usable after the wipe
    m = vh.insert(m, cloud([[1.5, 1.5, 1.5]]))
    assert int(m.num_voxels()) == 1


def test_vmap_batch_of_maps():
    # Fleet mode: independent maps under vmap
    def build(seed):
        m = vh.VoxelHashMap.create(1 << 10, 4, 1.0)
        pts = jax.random.uniform(jax.random.PRNGKey(seed), (64, 3)) * 10
        return vh.insert(m, PointCloud.from_xyz(pts)).num_points()

    counts = jax.vmap(lambda s: build(s))(jnp.arange(4))
    assert counts.shape == (4,)
    assert all(int(c) > 0 for c in counts)


class TestMinDistanceBetweenPoints:
    """insertOpts min_distance_between_points is behavioral on point maps
    (reference pipelines/lidar3d-default.yaml:236 — there 0/disabled)."""

    def test_rejects_near_duplicates_across_frames(self):
        m = vh.VoxelHashMap.create(1 << 8, 8, 1.0)
        p0 = np.array([[0.50, 0.50, 0.50]], np.float32)
        m = vh.insert(m, PointCloud.from_xyz(jnp.asarray(p0)), min_distance=0.2)
        assert int(m.num_points()) == 1
        # 5 cm away: rejected; 30 cm away: stored
        near = np.array([[0.55, 0.50, 0.50]], np.float32)
        far = np.array([[0.80, 0.50, 0.50]], np.float32)
        m1, st1 = vh.insert_stats(m, PointCloud.from_xyz(jnp.asarray(near)), min_distance=0.2)
        assert int(m1.num_points()) == 1
        assert int(st1.collision_drops) == 0  # dedup is not capacity pressure
        m2 = vh.insert(m, PointCloud.from_xyz(jnp.asarray(far)), min_distance=0.2)
        assert int(m2.num_points()) == 2

    def test_disabled_by_default(self):
        m = vh.VoxelHashMap.create(1 << 8, 8, 1.0)
        pts = np.array([[0.50, 0.50, 0.50], [0.52, 0.50, 0.50]], np.float32)
        m = vh.insert(m, PointCloud.from_xyz(jnp.asarray(pts)))
        assert int(m.num_points()) == 2


class TestInsertDifferentialFuzz:
    """Randomized differential test of the sort-fused bucketized insert
    against a Python dict model implementing the same contract:

      * voxels hash to a W-way bucket; an incoming voxel matches its live
        way or claims a stale way, claims assigned in pkey order;
      * per-voxel cap K, first-come point order within a frame;
      * collision drops only when every way of the bucket is owned by
        other voxels.
    """

    def _model_insert(self, model, coords, pts, valid, NB, W, K):
        from mola_lidar_odometry_tpu.ops.filters import voxel_hash as vhash
        import jax.numpy as jnp

        buckets = np.asarray(vhash(jnp.asarray(coords), NB))
        qpts = qz(pts, 1.0)  # what the device stores (quantized round-trip)
        drops = 0
        # group points per voxel in first-come order
        order = {}
        for i in range(len(pts)):
            if not valid[i]:
                continue
            key = tuple(coords[i])
            order.setdefault(key, []).append(i)
        # claims resolved in pkey order within each bucket (sorted domain)
        from mola_lidar_odometry_tpu.ops.voxel_hash import pack_key

        pkeys = np.asarray(pack_key(jnp.asarray(coords)))
        by_bucket = {}
        for key, idxs in order.items():
            b = int(buckets[idxs[0]])
            by_bucket.setdefault(b, []).append((int(pkeys[idxs[0]]), key, idxs))
        for b, entries in by_bucket.items():
            entries.sort()
            bucket_model = model.setdefault(b, {})  # way -> (key, [points])
            for pk, key, idxs in entries:
                owner_way = next(
                    (w for w, (k, _) in bucket_model.items() if k == key), None
                )
                if owner_way is None:
                    free = [w for w in range(W) if w not in bucket_model]
                    if not free:
                        drops += len(idxs)
                        continue
                    bucket_model[free[0]] = (key, [])
                    owner_way = free[0]
                stored = bucket_model[owner_way][1]
                for i in idxs:
                    if len(stored) < K:
                        # model stores what the device stores: the
                        # quantization round-trip of the point
                        stored.append(tuple(np.round(qpts[i], 5)))
                    # beyond K: full drop (not counted here)
        return drops

    def test_matches_dict_model(self):
        rng = np.random.default_rng(42)
        V, K = 256, 4
        m = vh.VoxelHashMap.create(V, K, 1.0)
        NB, W = m.num_buckets, m.ways
        model = {}
        total_drops = 0
        for frame in range(4):
            n = 300
            pts = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
            valid = rng.uniform(size=n) > 0.1
            coords = np.floor(pts).astype(np.int32)
            m, st = vh.insert_stats(m, PointCloud.from_xyz(jnp.asarray(pts), valid=jnp.asarray(valid)))
            total_drops += self._model_insert(model, coords, pts, valid, NB, W, K)
            assert int(st.collision_drops) <= n  # sanity
        # compare stored content voxel-by-voxel
        stored_pts = set()
        for b, ways in model.items():
            for w, (key, plist) in ways.items():
                for p in plist:
                    stored_pts.add(p)
        live = np.asarray(m.count) > 0
        pts_dev = np.asarray(m.pts)
        cnt_dev = np.asarray(m.count)
        dev_pts = set()
        for s in np.nonzero(live)[0]:
            for j in range(int(cnt_dev[s])):
                dev_pts.add(tuple(np.round(pts_dev[s, j], 5)))
        assert dev_pts == stored_pts, (
            f"device/model mismatch: {len(dev_pts ^ stored_pts)} points differ "
            f"(device {len(dev_pts)}, model {len(stored_pts)})"
        )


class TestInsertBudget:
    """The compacted (budget-bounded) insert defers overflow, never corrupts.

    Contract (voxel_hash.insert_stats ``budget``): at most ``budget``
    points stored per call, kept sets are stored-order prefixes of the
    (bucket, pkey, arrival) stream, and re-presenting the same cloud
    (with min_distance dedup, as any re-observation scenario) converges
    to the unbudgeted result — deferral, not loss.
    """

    def _stored_set(self, m):
        pc = vh.as_pointcloud(m, m.num_slots * m.K)
        xyz = np.asarray(pc.xyz)[np.asarray(pc.valid)]
        return {tuple(np.round(p, 5)) for p in xyz}

    def test_single_call_exact_prefix(self):
        # big table + deep K: no collisions, no per-voxel caps -> the kept
        # set must be EXACTLY the first C valid points in sorted stream
        # order (bucket, pkey, arrival)
        from mola_lidar_odometry_tpu.ops.filters import voxel_hash as vhash, voxel_coords
        rng = np.random.default_rng(3)
        V, K, C = 1 << 12, 8, 100
        pts = rng.uniform(-20, 20, (300, 3)).astype(np.float32)
        m0 = vh.VoxelHashMap.create(V, K, 1.0)
        coords = np.asarray(voxel_coords(jnp.asarray(pts), 1.0))
        buckets = np.asarray(vhash(jnp.asarray(coords), m0.num_buckets))
        pkeys = np.asarray(vh.pack_key(jnp.asarray(coords)))
        order = np.lexsort((np.arange(len(pts)), pkeys, buckets))
        # priority = (voxel fill depth, stream position): dest-0 points of
        # every voxel are kept before any dest-1 point (spatial coverage
        # first, densification deferred)
        dest = np.zeros(len(pts), np.int64)
        seen = {}
        for spos, i in enumerate(order):
            key = tuple(coords[i])
            dest[i] = seen.get(key, 0)
            seen[key] = dest[i] + 1
        stream_pos = np.empty(len(pts), np.int64)
        stream_pos[order] = np.arange(len(pts))
        prio = np.lexsort((stream_pos, dest))
        expect = {tuple(np.round(p, 5)) for p in qz(pts, 1.0)[prio[:C]]}
        m, st = vh.insert_stats(m0, cloud(pts), budget=C)
        assert int(st.deferred_drops) == 300 - C
        assert self._stored_set(m) == expect

    def test_defers_and_converges(self):
        rng = np.random.default_rng(7)
        V, K, C, MD = 512, 4, 64, 1e-3
        pts = rng.uniform(-10, 10, (400, 3)).astype(np.float32)
        pc = cloud(pts)

        ref = vh.insert(vh.VoxelHashMap.create(V, K, 1.0), pc, min_distance=MD)
        ref_set = self._stored_set(ref)

        m = vh.VoxelHashMap.create(V, K, 1.0)
        prev = 0
        for it in range(20):
            m, st = jax.jit(
                lambda m_, p_: vh.insert_stats(m_, p_, min_distance=MD, budget=C)
            )(m, pc)
            now = int(m.num_points())
            assert now - prev <= C, f"stored {now - prev} > budget {C}"
            prev = now
            if int(st.deferred_drops) == 0 and now == len(self._stored_set(m)):
                break
        assert self._stored_set(m) == ref_set

    def test_budget_off_matches_reference_path(self):
        rng = np.random.default_rng(8)
        pts = rng.uniform(-6, 6, (200, 3)).astype(np.float32)
        a = vh.insert(vh.VoxelHashMap.create(256, 3, 1.0), cloud(pts))
        m, st = vh.insert_stats(vh.VoxelHashMap.create(256, 3, 1.0), cloud(pts), budget=0)
        assert int(st.deferred_drops) == 0
        assert self._stored_set(a) == self._stored_set(m)
