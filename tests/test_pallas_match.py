"""Numeric equivalence of the Pallas fused NN-select kernel vs the XLA path.

Runs in Pallas interpreter mode on CPU (tiny shapes; the interpreter is
orders of magnitude slower than compiled TPU execution)."""

import numpy as np
import jax.numpy as jnp

from mola_lidar_odometry_tpu.ops import pallas_match as pm, voxel_hash as vh
from mola_lidar_odometry_tpu.ops.pointcloud import PointCloud


def test_nn_select_matches_brute_force():
    rng = np.random.default_rng(0)
    n, c = 16, 128
    planar = pm.PlanarCands(
        x=jnp.asarray(rng.normal(size=(n, c)).astype(np.float32)),
        y=jnp.asarray(rng.normal(size=(n, c)).astype(np.float32)),
        z=jnp.asarray(rng.normal(size=(n, c)).astype(np.float32)),
        mask=jnp.asarray((rng.random((n, c)) > 0.3).astype(np.float32)),
    )
    q = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    tgt, d2 = pm.nn_select(planar, q, interpret=True)

    X = np.stack([np.asarray(planar.x), np.asarray(planar.y), np.asarray(planar.z)], -1)
    dd = ((X - np.asarray(q)[:, None, :]) ** 2).sum(-1)
    dd = np.where(np.asarray(planar.mask) > 0, dd, np.inf)
    ref_d2 = dd.min(1)
    has = np.isfinite(ref_d2)
    np.testing.assert_allclose(np.asarray(d2)[has], ref_d2[has], rtol=1e-5)
    j = dd.argmin(1)
    np.testing.assert_allclose(
        np.asarray(tgt)[has], X[np.arange(n), j][has], rtol=1e-5
    )
    # no-candidate rows report a huge distance (not a pairing)
    assert np.all(np.asarray(d2)[~has] > 1e37)


def test_nn_select_matches_xla_path():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-8, 8, (600, 3)).astype(np.float32)
    m = vh.insert(vh.VoxelHashMap.create(1 << 10, 4, 1.0), PointCloud.from_xyz(jnp.asarray(pts)))
    q = jnp.asarray(rng.uniform(-8, 8, (32, 3)).astype(np.float32))
    valid = jnp.ones(32, bool)

    cand = vh.capture(m, q, 8)  # small probe keeps the interpreter fast
    tgt_x, d2_x, found_x = vh.nn_from(cand, q, valid)

    tgt_p, d2_p = pm.nn_select(pm.to_planar(cand), q, interpret=True)
    found_p = np.asarray(valid & (d2_p < 1e37))

    fx = np.asarray(found_x)
    assert (fx == found_p).all()
    np.testing.assert_allclose(np.asarray(d2_x)[fx], np.asarray(d2_p)[fx], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(tgt_x)[fx], np.asarray(tgt_p)[fx], rtol=1e-5)


def test_capture_planar_matches_xla_capture():
    """The fused capture kernel (interpret mode) must reproduce the XLA
    top-2-per-voxel capture on the round-4 packed (rows, 128) i32 table
    layout (quantized point lanes, W = 128 // stride ways per bucket)."""
    from mola_lidar_odometry_tpu.ops import pallas_capture as pc

    rng = np.random.default_rng(2)
    pts = rng.uniform(-6, 6, (800, 3)).astype(np.float32)
    m = vh.insert(
        vh.VoxelHashMap.create(1 << 10, 20, 1.0), PointCloud.from_xyz(jnp.asarray(pts))
    )
    assert m.stride == 32  # K=20 packed points -> 4-way buckets
    n = 24
    q = jnp.asarray(rng.uniform(-6, 6, (n, 3)).astype(np.float32))

    for nbr in (4, 8, 27):
        ref = vh.capture(m, q, nbr, per_voxel_nn=True)  # (n, 2P, 3) + mask
        cx, cy, cz, cm = pc.capture_planar(
            m.data, m.voxel_size, m.epoch, q, nbr, interpret=True, tile_q=128,
            K=m.K, stride=m.stride,
        )
        # planar layout: (2P, npad) candidate planes, query-major lanes
        got = np.stack(
            [np.asarray(cx)[:, :n].T, np.asarray(cy)[:, :n].T, np.asarray(cz)[:, :n].T],
            axis=-1,
        )  # (n, 2P, 3)
        gm = np.asarray(cm)[:, :n].T > 0
        rm = np.asarray(ref.mask)
        np.testing.assert_array_equal(gm, rm)
        np.testing.assert_allclose(
            got[gm], np.asarray(ref.pts)[rm], rtol=0, atol=1e-6
        )


def test_capture_reselect_identity_matches_capture():
    """Reselect on the capture's own rows with UNMOVED queries must be
    bit-identical to the original capture (same kernel math, probe keys
    re-derived from the same positions)."""
    from mola_lidar_odometry_tpu.ops import pallas_capture as pc

    rng = np.random.default_rng(5)
    pts = rng.uniform(-6, 6, (600, 3)).astype(np.float32)
    m = vh.insert(
        vh.VoxelHashMap.create(1 << 10, 20, 1.0), PointCloud.from_xyz(jnp.asarray(pts))
    )
    n = 24
    q = jnp.asarray(rng.uniform(-5, 5, (n, 3)).astype(np.float32))
    cx, cy, cz, cm, rows = pc.capture_planar(
        m.data, m.voxel_size, m.epoch, q, 8, interpret=True, tile_q=128,
        K=m.K, stride=m.stride, return_rows=True,
    )
    rx, ry, rz, rm = pc.capture_planar_reselect(
        rows, m.voxel_size, m.epoch, q, q, 8, interpret=True, tile_q=128,
        K=m.K, stride=m.stride,
    )
    np.testing.assert_array_equal(np.asarray(cm), np.asarray(rm))
    sel = np.asarray(cm) > 0
    for a, b in ((cx, rx), (cy, ry), (cz, rz)):
        np.testing.assert_array_equal(np.asarray(a)[sel], np.asarray(b)[sel])


def test_capture_reselect_reranks_by_moved_query():
    """With queries moved WITHIN the captured footprint, reselect must rank
    candidates by distance to the MOVED position: a fresh capture at the
    moved position returns the same top-1 whenever the moved query stays in
    the same voxel (the capture-time footprint is then a superset)."""
    from mola_lidar_odometry_tpu.ops import pallas_capture as pc

    rng = np.random.default_rng(7)
    pts = rng.uniform(-6, 6, (600, 3)).astype(np.float32)
    m = vh.insert(
        vh.VoxelHashMap.create(1 << 10, 20, 1.0), PointCloud.from_xyz(jnp.asarray(pts))
    )
    n = 24
    q0 = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    # small in-voxel move (|delta| ~ 0.1 << voxel 1.0)
    q1 = q0 + rng.uniform(-0.06, 0.06, (n, 3)).astype(np.float32)
    # identical probe footprint = same voxel AND same octant (the 8-probe
    # corner block picks neighbors on the query's side of the voxel
    # center) — only then is a fresh capture's per-probe row set identical
    # and the comparison exact
    same_voxel = (np.floor(q0) == np.floor(q1)).all(axis=1)
    oct0 = (q0 - (np.floor(q0) + 0.5)) >= 0
    oct1 = (q1 - (np.floor(q1) + 0.5)) >= 0
    same_voxel = same_voxel & (oct0 == oct1).all(axis=1)
    _, _, _, _, rows = pc.capture_planar(
        m.data, m.voxel_size, m.epoch, jnp.asarray(q0), 8, interpret=True,
        tile_q=128, K=m.K, stride=m.stride, return_rows=True,
    )
    rx, ry, rz, rm = pc.capture_planar_reselect(
        rows, m.voxel_size, m.epoch, jnp.asarray(q1), jnp.asarray(q0), 8,
        interpret=True, tile_q=128, K=m.K, stride=m.stride,
    )
    fx, fy, fz, fm = pc.capture_planar(
        m.data, m.voxel_size, m.epoch, jnp.asarray(q1), 8, interpret=True,
        tile_q=128, K=m.K, stride=m.stride,
    )
    # compare the top-1 block (first P planes) per query for same-voxel moves
    P = 8
    got = np.stack([np.asarray(a)[:P, :n] for a in (rx, ry, rz)], -1)
    ref = np.stack([np.asarray(a)[:P, :n] for a in (fx, fy, fz)], -1)
    gm = np.asarray(rm)[:P, :n] > 0
    fm_ = np.asarray(fm)[:P, :n] > 0
    both = gm & fm_ & same_voxel[None, :]
    assert both.sum() > 40  # the scene is dense enough to be a real check
    np.testing.assert_allclose(got[both], ref[both], rtol=0, atol=1e-6)
