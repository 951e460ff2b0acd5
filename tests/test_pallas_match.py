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
