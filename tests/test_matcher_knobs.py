"""Matcher contract corners + SE(2) auto-pinning (VERDICT round-1 items).

``allowMatchAlreadyMatchedGlobalPoints: false`` must enforce one-to-one
pairing; ``thresholdAngularDeg`` must grow the match threshold with point
range; a planar (2D) first scan must auto-enable SE(2) pinning without any
YAML flag (reference LidarOdometry.cpp:863-876).
"""

import numpy as np
import jax.numpy as jnp

from mola_lidar_odometry_tpu.ops import icp as icp_ops, voxel_hash as vh
from mola_lidar_odometry_tpu.ops.pointcloud import PointCloud
from mola_lidar_odometry_tpu.ops.se3 import Pose
from mola_lidar_odometry_tpu.utils.expr import Expr


def _paired_count(mc_kwargs, local, m):
    cfg = icp_ops.IcpConfig(
        matchers=(
            icp_ops.MatcherCfg(
                threshold=Expr("1.0"), local_layer="icp", **mc_kwargs
            ),
        ),
        kernel_param=Expr("1.0"),
    )
    candsets = icp_ops._capture_all(
        cfg, {"localmap": m}, {"icp": (local, jnp.ones(len(local), bool))}, Pose.identity()
    )
    blocks, paired, _ = icp_ops._matcher_blocks(
        cfg,
        candsets,
        {"icp": (local, jnp.ones(len(local), bool))},
        Pose.identity(),
        {"ICP_ITERATION": jnp.float32(0.0)},
        jnp.int32(0),
    )
    return int(paired)


def test_one_to_one_pairing_reduces_matches():
    # one global point, five local points nearby: many-to-one vs one-to-one
    m = vh.VoxelHashMap.create(256, 8, 1.0)
    m = vh.insert(m, PointCloud.from_xyz(np.array([[0.5, 0.5, 0.5]], np.float32)))
    local = jnp.asarray(
        np.array([[0.45 + 0.01 * i, 0.5, 0.5] for i in range(5)], np.float32)
    )
    many = _paired_count({"allow_match_already_matched": True}, local, m)
    one = _paired_count({"allow_match_already_matched": False}, local, m)
    assert many == 5
    assert one == 1


def test_threshold_angular_deg_grows_with_range():
    # two identical offsets (0.3 m), one near (r=2) one far (r=40); base
    # threshold 0.25 rejects both; +1 deg angular slack accepts only the far
    m = vh.VoxelHashMap.create(1 << 12, 8, 1.0)
    m = vh.insert(
        m,
        PointCloud.from_xyz(np.array([[2.0, 0.0, 0.5], [40.0, 0.0, 0.5]], np.float32)),
    )
    local = jnp.asarray(np.array([[2.0, 0.3, 0.5], [40.0, 0.3, 0.5]], np.float32))

    def count(deg):
        cfg = icp_ops.IcpConfig(
            matchers=(
                icp_ops.MatcherCfg(
                    threshold=Expr("0.25"),
                    threshold_angular_deg=deg,
                    local_layer="icp",
                ),
            ),
            kernel_param=Expr("1.0"),
        )
        candsets = icp_ops._capture_all(
            cfg, {"localmap": m}, {"icp": (local, jnp.ones(2, bool))}, Pose.identity()
        )
        _, paired, _ = icp_ops._matcher_blocks(
            cfg, candsets, {"icp": (local, jnp.ones(2, bool))}, Pose.identity(),
            {"ICP_ITERATION": jnp.float32(0.0)}, jnp.int32(0),
        )
        return int(paired)

    assert count(0.0) == 0
    assert count(1.0) == 1  # far point: 0.25 + 40*sin(1 deg) ~ 0.95 > 0.3
    assert count(10.0) == 2  # near point too: 0.25 + 2*0.17 ~ 0.6 > 0.3


def test_se2_autopin_from_planar_scan():
    from mola_lidar_odometry_tpu.models.odometry import LidarOdometry
    import os

    pipeline = os.path.join(
        os.path.dirname(__file__), "..", "pipelines", "lidar3d-default.yaml"
    )
    ov = dict(
        raw_capacity=1 << 10,
        map_slots=1 << 12,
        layer_capacities={
            "raw": 1 << 10, "decimated_for_map_raw": 512,
            "decimated_for_icp_skewed": 512, "decimated_for_icp": 512,
            "decimated_for_map": 512,
        },
    )
    rng = np.random.default_rng(0)
    planar = np.stack(
        [rng.uniform(-5, 5, 2048), rng.uniform(-5, 5, 2048), np.zeros(2048)], 1
    ).astype(np.float32)
    lo2d = LidarOdometry.from_yaml_file(pipeline, env={}, **ov)
    assert lo2d.spec.pin_se2 is None  # auto until the first scan
    lo2d.on_lidar_scan(planar, stamp=0.0)
    assert lo2d.spec.pin_se2 is True

    full3d = planar + rng.normal(0, 1.0, planar.shape).astype(np.float32)
    lo3d = LidarOdometry.from_yaml_file(pipeline, env={}, **ov)
    lo3d.on_lidar_scan(full3d, stamp=0.0)
    assert lo3d.spec.pin_se2 is False
