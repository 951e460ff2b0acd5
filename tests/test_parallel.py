"""Fleet (vmap) and mesh-sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from mola_lidar_odometry_tpu.models.spec import spec_from_yaml
from mola_lidar_odometry_tpu.parallel import batch as pb
from mola_lidar_odometry_tpu.utils.config import load_yaml_file

import os

PIPELINE = os.path.join(os.path.dirname(__file__), "..", "pipelines", "lidar3d-default.yaml")

TINY = dict(
    raw_capacity=2048,
    map_slots=1 << 12,
    layer_capacities={
        "raw": 2048,
        "decimated_for_map_raw": 2048,
        "decimated_for_icp_skewed": 1024,
        "decimated_for_icp": 1024,
        "decimated_for_map": 2048,
    },
    kf_ring_capacity=64,
)


def make_spec():
    return spec_from_yaml(load_yaml_file(PIPELINE, env={}), **TINY)


def rand_scans(spec, b, seed=0):
    rng = np.random.default_rng(seed)
    scans = []
    for _ in range(b):
        n = spec.raw_capacity
        xyz = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
        scans.append((xyz, np.zeros(n, np.float32), np.zeros(n, np.int32), np.ones(n, bool)))
    return pb.pack_scans(spec, scans, np.zeros(b))


def test_vmap_fleet_step():
    spec = make_spec()
    fstep = jax.jit(pb.make_fleet_step(spec))
    carry = pb.init_fleet_carry(spec, 4)
    scan = rand_scans(spec, 4)
    carry2, out = fstep(carry, scan)
    assert out.pose_t.shape == (4, 3)
    assert bool(out.accepted.all())
    # second step exercises the ICP path per instance
    scan2 = rand_scans(spec, 4, seed=1)
    scan2 = scan2._replace(stamp=scan2.stamp + 0.1)
    carry3, out2 = fstep(carry2, scan2)
    assert int(carry3.frame_idx[0]) == 2


def test_sharded_fleet_runs_on_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = pb.make_mesh(8, point_axis=2)
    assert dict(mesh.shape) == {"fleet": 4, "point": 2}
    spec = make_spec()
    jitted, carry, s_sh = pb.make_sharded_fleet_step(spec, mesh)
    scan = jax.device_put(rand_scans(spec, 4), s_sh)
    carry2, out = jitted(carry, scan)
    jax.block_until_ready(carry2)
    assert out.pose_t.shape == (4, 3)


def test_graft_entry_single():
    import importlib.util

    here = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    mspec = importlib.util.spec_from_file_location("graft_entry", here)
    mod = importlib.util.module_from_spec(mspec)
    mspec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
