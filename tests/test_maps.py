"""Tests for the NDT and occupancy map layers + point-to-plane ICP."""

import jax.numpy as jnp
import numpy as np

from mola_lidar_odometry_tpu.ops import icp, ndt, occupancy, se3, voxel_hash as vh
from mola_lidar_odometry_tpu.ops.ndt import NdtMap, _sym_eigen_smallest
from mola_lidar_odometry_tpu.ops.occupancy import OccupancyMap
from mola_lidar_odometry_tpu.ops.pointcloud import PointCloud
from mola_lidar_odometry_tpu.ops.se3 import Pose
from mola_lidar_odometry_tpu.ops.solver import PosePrior
from mola_lidar_odometry_tpu.utils.expr import Expr


def plane_points(n, normal, d, extent=10.0, noise=0.0, seed=0):
    """Random points on the plane normal.x = d."""
    rng = np.random.default_rng(seed)
    normal = np.asarray(normal, np.float64)
    normal = normal / np.linalg.norm(normal)
    # basis of the plane
    a = np.cross(normal, [1.0, 0.0, 0.0])
    if np.linalg.norm(a) < 1e-6:
        a = np.cross(normal, [0.0, 1.0, 0.0])
    a = a / np.linalg.norm(a)
    b = np.cross(normal, a)
    uv = rng.uniform(-extent, extent, (n, 2))
    pts = d * normal + uv[:, :1] * a + uv[:, 1:] * b
    pts += rng.normal(0, noise, (n, 3)) if noise else 0.0
    return pts.astype(np.float32)


class TestSymEigen:
    def test_matches_numpy(self):
        rng = np.random.default_rng(3)
        A = rng.normal(size=(64, 3, 3)).astype(np.float32)
        cov = np.einsum("nij,nkj->nik", A, A)  # SPD batch
        packed = np.stack(
            [cov[:, 0, 0], cov[:, 1, 1], cov[:, 2, 2], cov[:, 0, 1], cov[:, 0, 2], cov[:, 1, 2]],
            -1,
        )
        import jax as _jax

        v, e_min, e_mid = _sym_eigen_smallest(jnp.asarray(packed))
        w_np = np.linalg.eigvalsh(cov)
        # TPU transcendentals (arccos/cos) are slightly less precise in f32
        loose = _jax.default_backend() == "tpu"
        rtol, atol = (6e-3, 4e-3) if loose else (2e-3, 1e-3)
        np.testing.assert_allclose(np.asarray(e_min), w_np[:, 0], rtol=rtol, atol=atol)
        np.testing.assert_allclose(np.asarray(e_mid), w_np[:, 1], rtol=rtol, atol=atol)
        # eigenvector check: A v = e_min v
        Av = np.einsum("nij,nj->ni", cov, np.asarray(v))
        np.testing.assert_allclose(
            Av, w_np[:, :1] * np.asarray(v), rtol=1e-2, atol=0.1 if loose else 5e-2
        )


class TestNdtMap:
    def test_plane_fit_and_query(self):
        pts = plane_points(2000, [0.0, 0.0, 1.0], 0.0, extent=5.0, noise=0.01)
        m = NdtMap.create(1 << 12, 1.0, max_eigen_ratio=0.05)
        m = ndt.insert(m, PointCloud.from_xyz(jnp.asarray(pts)))
        assert int(m.num_voxels()) > 20
        assert bool(jnp.any(m.plane_ok))
        # normals of plane voxels should be ~ +-z
        nz = np.abs(np.asarray(m.normal)[np.asarray(m.plane_ok)][:, 2])
        assert np.all(nz > 0.99)

        # query a point 0.3 above the plane: projection lands on the plane
        q = jnp.asarray([[1.2, 0.7, 0.3]], jnp.float32)
        pt, nrm, d2, found = ndt.query_p2pl(m, q, jnp.ones(1, bool))
        assert bool(found[0])
        assert abs(float(jnp.sqrt(d2[0])) - 0.3) < 0.05
        assert abs(float(pt[0, 2])) < 0.05

    def test_p2p_fallback_mean(self):
        pts = plane_points(500, [0, 0, 1.0], 0.0, extent=3.0)
        m = NdtMap.create(1 << 12, 1.0)
        m = ndt.insert(m, PointCloud.from_xyz(jnp.asarray(pts)))
        q = jnp.asarray([[0.5, 0.5, 0.2]], jnp.float32)
        mu, d2, found = ndt.query_p2p(m, q, jnp.ones(1, bool))
        assert bool(found[0]) and float(d2[0]) < 1.0

    def test_prune(self):
        pts = plane_points(500, [0, 0, 1.0], 0.0, extent=20.0)
        m = NdtMap.create(1 << 13, 1.0)
        m = ndt.insert(m, PointCloud.from_xyz(jnp.asarray(pts)))
        n0 = int(m.num_voxels())
        m = ndt.prune_farther_than(m, jnp.zeros(3), 5.0)
        assert int(m.num_voxels()) < n0

    def test_plane_fit_far_from_origin(self):
        # KITTI-scale coordinates: at ~3.6 km from the origin ulp(x^2) in f32
        # swamps in-voxel variances unless moments are voxel-center-relative
        # (ADVICE round 1).  Plane normals must stay exact.
        off = np.asarray([2000.0, 3000.0, 50.0], np.float32)
        pts = plane_points(2000, [0.0, 0.0, 1.0], 0.0, extent=5.0, noise=0.01) + off
        m = NdtMap.create(1 << 12, 1.0, max_eigen_ratio=0.05)
        m = ndt.insert(m, PointCloud.from_xyz(jnp.asarray(pts)))
        ok = np.asarray(m.plane_ok)
        assert ok.sum() > 20, "plane gate starved far from origin"
        nz = np.abs(np.asarray(m.normal)[ok][:, 2])
        assert np.all(nz > 0.98)
        # query projection onto the plane stays correct
        q = jnp.asarray([off + np.asarray([1.2, 0.7, 0.3], np.float32)])
        pt, nrm, d2, found = ndt.query_p2pl(m, q, jnp.ones(1, bool))
        assert bool(found[0])
        assert abs(float(jnp.sqrt(d2[0])) - 0.3) < 0.06

    def test_reclaimed_slot_has_fresh_moments(self):
        # prune zeroes moments with the count: a slot re-claimed by another
        # voxel must not inherit stale Gaussians (round-1 latent bug)
        pts = plane_points(800, [0, 0, 1.0], 0.0, extent=6.0, noise=0.01)
        m = NdtMap.create(1 << 10, 1.0)
        m = ndt.insert(m, PointCloud.from_xyz(jnp.asarray(pts)))
        m = ndt.prune_farther_than(m, jnp.asarray([1e6, 1e6, 0.0]), 1.0)
        assert int(m.num_voxels()) == 0
        assert float(jnp.abs(m.s).max()) == 0.0
        assert float(jnp.abs(m.ss).max()) == 0.0
        # re-insert a vertical-wall plane; normals must reflect ONLY new data
        wall = plane_points(800, [1.0, 0, 0], 3.0, extent=6.0, noise=0.01, seed=5)
        m = ndt.insert(m, PointCloud.from_xyz(jnp.asarray(wall)))
        ok = np.asarray(m.plane_ok)
        assert ok.sum() > 10
        nx = np.abs(np.asarray(m.normal)[ok][:, 0])
        assert np.all(nx > 0.98)

    def test_icp_point2plane_converges(self):
        # two orthogonal planes + ground constrain all 6 DoF loosely; use
        # 3 planes for a well-posed problem
        pts = np.concatenate(
            [
                plane_points(1500, [0, 0, 1.0], 0.0, extent=10),
                plane_points(1500, [1.0, 0, 0], 8.0, extent=6, seed=1),
                plane_points(1500, [0, 1.0, 0], -7.0, extent=6, seed=2),
            ]
        )
        m = NdtMap.create(1 << 14, 1.0)
        m = ndt.insert(m, PointCloud.from_xyz(jnp.asarray(pts)))
        true = se3.se3_exp(jnp.asarray([0.3, -0.2, 0.1, 0.02, -0.03, 0.04], jnp.float32))
        scan = se3.transform(se3.inverse(true), jnp.asarray(pts[::3]))
        cfg = icp.IcpConfig(
            matchers=(
                icp.MatcherCfg(
                    kind="point2plane", local_layer="icp", global_layer="localmap",
                    threshold=Expr("1.0"),
                ),
                icp.MatcherCfg(
                    kind="point2point", local_layer="icp", global_layer="localmap",
                    threshold=Expr("2.0"),
                ),
            ),
            kernel_param=Expr("0.5"),
            max_iterations=60,
        )
        res = icp.align(
            {"localmap": m}, {"icp": (scan, jnp.ones(scan.shape[0], bool))},
            Pose.identity(), PosePrior.none(), cfg, {},
        )
        dt, dr = se3.pose_error_norms(res.pose, true)
        assert float(dt) < 0.03, float(dt)
        assert float(dr) < 5e-3
        assert float(res.quality) > 0.7


class TestOccupancyMap:
    def test_hits_and_free_space(self):
        m = OccupancyMap.create(1 << 14, 0.25)
        # wall of points at x=5, sensor at origin
        ys = np.linspace(-2, 2, 100).astype(np.float32)
        pts = np.stack([np.full(100, 5.0), ys, np.zeros(100)], 1)
        pc = PointCloud.from_xyz(jnp.asarray(pts))
        m = occupancy.insert(m, pc, sensor_origin=jnp.zeros(3), max_ray_samples=128)
        assert int(m.num_voxels()) > 10  # occupied wall voxels

        # endpoint voxel occupied, mid-ray voxel free
        tgt, d2, found = occupancy.query_p2p(
            m, jnp.asarray([[5.0, 0.0, 0.0], [2.5, 0.0, 0.0]]), jnp.ones(2, bool)
        )
        assert bool(found[0]) and float(d2[0]) < 0.1
        # free space: the nearest occupied center is the wall, 2.5 m away —
        # the coarse match index finds it (true-NN semantics, round 3); any
        # realistic matcher threshold rejects it
        if bool(found[1]):
            assert float(d2[1]) > 2.0**2

    def test_repeated_miss_does_not_occupy(self):
        m = OccupancyMap.create(1 << 12, 0.25)
        pts = np.asarray([[4.0, 0.0, 0.0]], np.float32)
        pc = PointCloud.from_xyz(jnp.asarray(pts))
        for _ in range(5):
            m = occupancy.insert(m, pc, sensor_origin=jnp.zeros(3), max_ray_samples=128)
        occ = np.asarray(m.occupied())
        keys = np.asarray(m.keys)[occ]
        # only the endpoint voxel (x ~ 4.0 -> coord 16) is occupied
        assert keys.shape[0] >= 1
        assert np.all(keys[:, 0] >= 15)

    def test_prune(self):
        m = OccupancyMap.create(1 << 12, 0.5)
        pts = np.stack([np.linspace(0, 30, 60)] * 3, 1).astype(np.float32)
        m = occupancy.insert(m, PointCloud.from_xyz(jnp.asarray(pts)), ray_trace=False)
        n0 = int(m.num_voxels())
        m = occupancy.prune_farther_than(m, jnp.zeros(3), 10.0)
        assert int(m.num_voxels()) < n0


class TestQueryNn2:
    def test_two_nearest(self):
        m = vh.VoxelHashMap.create(1 << 10, 8, 1.0)
        pts = jnp.asarray([[0.1, 0.1, 0.1], [0.4, 0.1, 0.1], [0.9, 0.9, 0.9]], jnp.float32)
        m = vh.insert(m, PointCloud.from_xyz(pts))
        q = jnp.asarray([[0.0, 0.1, 0.1]], jnp.float32)
        nn2, d2, found = vh.query_nn2(m, q, jnp.ones(1, bool))
        assert bool(found[0, 0]) and bool(found[0, 1])
        # stored points are quantized to voxel_size/1024 offset cells
        np.testing.assert_allclose(np.asarray(nn2[0, 0]), [0.1, 0.1, 0.1], atol=6e-4)
        np.testing.assert_allclose(np.asarray(nn2[0, 1]), [0.4, 0.1, 0.1], atol=6e-4)
        assert float(d2[0, 0]) <= float(d2[0, 1])


class TestNdtMinDistance:
    """insertOpts min_distance_between_points on NDT: behavioral cross-frame
    dedup against stored content (reference pipelines/lidar3d-ndt.yaml:
    236-254 sets 0.2 m).  Quantized to min_distance sub-cells
    (docs/parity.md)."""

    def test_rejects_stored_subcell_across_frames(self):
        m = NdtMap.create(1 << 8, 1.0)
        p0 = jnp.asarray([[0.31, 0.31, 0.31]], jnp.float32)
        m = ndt.insert(m, PointCloud.from_xyz(p0), min_distance=0.2)
        assert int(m.n.sum()) == 1
        # same sub-cell next frame: rejected, count unchanged
        p1 = jnp.asarray([[0.33, 0.32, 0.30]], jnp.float32)
        m = ndt.insert(m, PointCloud.from_xyz(p1), min_distance=0.2)
        assert int(m.n.sum()) == 1
        # a different sub-cell of the same voxel: accepted
        p2 = jnp.asarray([[0.75, 0.75, 0.75]], jnp.float32)
        m = ndt.insert(m, PointCloud.from_xyz(p2), min_distance=0.2)
        assert int(m.n.sum()) == 2
        # the rejected point must not have polluted the moments: mean is
        # the average of the two ACCEPTED points
        live = np.asarray(m.n) > 0
        mean = np.asarray(m.means())[live][0]
        np.testing.assert_allclose(mean, [0.53, 0.53, 0.53], atol=2e-2)

    def test_fully_deduped_frame_keeps_voxel_live(self):
        m = NdtMap.create(1 << 8, 1.0)
        p0 = jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32)
        m = ndt.insert(m, PointCloud.from_xyz(p0), min_distance=0.5)
        m = ndt.insert(m, PointCloud.from_xyz(p0), min_distance=0.5)
        assert int(m.num_voxels()) == 1
        assert int(m.n.sum()) == 1

    def test_disabled_matches_plain_insert(self):
        rng = np.random.default_rng(3)
        pts = rng.uniform(-4, 4, (300, 3)).astype(np.float32)
        m0 = ndt.insert(NdtMap.create(1 << 10, 1.0), PointCloud.from_xyz(jnp.asarray(pts)))
        m1 = ndt.insert(
            NdtMap.create(1 << 10, 1.0), PointCloud.from_xyz(jnp.asarray(pts)),
            min_distance=0.0,
        )
        np.testing.assert_array_equal(np.asarray(m0.n), np.asarray(m1.n))
        np.testing.assert_allclose(
            np.asarray(m0.means()), np.asarray(m1.means()), atol=0
        )


class TestNdtDifferential:
    def test_moments_match_dict_model(self):
        """Multi-frame NDT inserts vs exact per-voxel numpy moments."""
        rng = np.random.default_rng(7)
        m = NdtMap.create(1 << 10, 1.0, max_eigen_ratio=0.05)
        model = {}  # voxel key -> list of points
        for frame in range(3):
            pts = rng.uniform(-6, 6, (400, 3)).astype(np.float32)
            m = ndt.insert(m, PointCloud.from_xyz(jnp.asarray(pts)))
            for p in pts:
                model.setdefault(tuple(np.floor(p).astype(int)), []).append(p)
        n_dev = np.asarray(m.n)
        keys_dev = np.asarray(m.keys)
        means_dev = np.asarray(m.means())
        live = n_dev > 0
        # collision drops possible (tiny table): device voxel set must be a
        # subset of the model with EXACT counts and means where present
        checked = 0
        for s in np.nonzero(live)[0]:
            key = tuple(keys_dev[s])
            assert key in model, key
            pts = np.asarray(model[key], np.float64)
            assert int(n_dev[s]) == len(pts)
            np.testing.assert_allclose(
                means_dev[s], pts.mean(axis=0), atol=2e-3
            )
            checked += 1
        assert checked > 50
