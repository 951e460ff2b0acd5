"""Fleet parallelism: many odometry instances over a device mesh.

The reference's only job-level parallelism is GNU ``parallel -j N`` over
dataset sequences (reference eval/cli_kitti.sh:23; SURVEY.md §2.4).  The
TPU-native equivalent runs a *fleet* of independent odometry instances as one
SPMD program: carries are stacked on a leading batch axis, ``vmap`` makes the
per-instance step batched, and ``jax.sharding`` lays the batch out over the
``fleet`` mesh axis — scaling across chips rides ICI with zero collectives in
the steady state (each instance's map/matcher work is chip-local).

A second mesh axis (``point``) shards the padded point dimension of the scan
inputs; XLA/GSPMD inserts the necessary collectives (psum for the 6x6 normal
equations, gathers around the hash-map scatter) automatically.  For the
matcher-dominated workload the fleet axis is the efficient one; the point
axis exists for few-instance / huge-scan configurations.

**Two fleet-axis lowerings** (measured by eval/shard_cost.py on the virtual
mesh):

  * :func:`make_sharded_fleet_step` — ``jit`` + ``in_shardings`` (GSPMD).
    GSPMD cannot prove the flat-memory rewrites of ops/batched_mem (indices
    ``b*V + slot`` into ``(B*V,)`` tables) stay shard-local, so it
    ALL-GATHERS the map tables every step (~27 MB/step at toy shapes) —
    correct, but ICI-bound at scale.  Kept for the point axis and as the
    semantics oracle.
  * :func:`make_shardmap_fleet_step` — ``shard_map`` over ``fleet``: each
    shard runs the vmapped step on its local instances, so every table op
    is chip-local BY CONSTRUCTION and the compiled program contains zero
    inter-chip collectives (asserted by eval/shard_cost.py).  This is the
    production fleet deployment path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mola_lidar_odometry_tpu.models import step as step_mod
from mola_lidar_odometry_tpu.models.spec import OdometrySpec
from mola_lidar_odometry_tpu.models.step import Carry, Scan


def init_fleet_carry(spec: OdometrySpec, batch: int) -> Carry:
    """Stack ``batch`` fresh carries on a leading axis."""
    one = step_mod.init_carry(spec)
    return jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), one)


def make_fleet_step(spec: OdometrySpec):
    """vmapped scan step: (Carry[B], Scan[B]) -> (Carry[B], StepOutput[B])."""
    return jax.vmap(step_mod.make_step(spec))


def fleet_shardings(mesh: Mesh, carry: Carry, scan: Scan):
    """NamedShardings: carry on the fleet axis; scan on fleet x point."""

    def carry_spec(x):
        return NamedSharding(mesh, P("fleet", *([None] * (x.ndim - 1))))

    c_sh = jax.tree_util.tree_map(carry_spec, carry)

    def scan_spec(x):
        if x.ndim >= 2:  # (B, N, ...) point-dim sharded
            return NamedSharding(mesh, P("fleet", "point", *([None] * (x.ndim - 2))))
        if x.ndim == 1:
            return NamedSharding(mesh, P("fleet"))
        return NamedSharding(mesh, P())

    s_sh = jax.tree_util.tree_map(scan_spec, scan)
    return c_sh, s_sh


def make_sharded_fleet_step(spec: OdometrySpec, mesh: Mesh):
    """jit the fleet step with explicit input/output shardings over ``mesh``."""
    batch = mesh.shape["fleet"]
    carry0 = init_fleet_carry(spec, batch)
    scan0 = _dummy_scan(spec, batch)
    c_sh, s_sh = fleet_shardings(mesh, carry0, scan0)
    fstep = make_fleet_step(spec)
    jitted = jax.jit(fstep, in_shardings=(c_sh, s_sh), out_shardings=None)
    carry0 = jax.device_put(carry0, c_sh)
    return jitted, carry0, s_sh


def make_shardmap_fleet_step(spec: OdometrySpec, mesh: Mesh, batch: Optional[int] = None):
    """shard_map the fleet step over the ``fleet`` axis: each shard runs its
    ``batch/n_fleet`` local instances; zero inter-chip collectives by
    construction (see module docstring).  Returns ``(jitted, carry0)``."""
    from jax import shard_map  # jax>=0.6 home (experimental path deprecated)

    batch = batch or mesh.shape["fleet"]
    if batch % mesh.shape["fleet"]:
        raise ValueError(
            f"batch {batch} must divide over the fleet axis {mesh.shape['fleet']}"
        )
    carry0 = init_fleet_carry(spec, batch)
    scan0 = _dummy_scan(spec, batch)
    fstep = make_fleet_step(spec)

    def leaf_spec(x):
        return P("fleet", *([None] * (x.ndim - 1)))

    c_specs = jax.tree_util.tree_map(leaf_spec, carry0)
    s_specs = jax.tree_util.tree_map(leaf_spec, scan0)
    _, out0 = jax.eval_shape(fstep, carry0, scan0)
    o_specs = (c_specs, jax.tree_util.tree_map(leaf_spec, out0))

    fn = shard_map(
        fstep, mesh=mesh, in_specs=(c_specs, s_specs), out_specs=o_specs,
        check_vma=False,
    )
    jitted = jax.jit(fn)
    c_sh = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), c_specs
    )
    carry0 = jax.device_put(carry0, c_sh)
    return jitted, carry0


def _dummy_scan(spec: OdometrySpec, batch: int) -> Scan:
    n = spec.raw_capacity
    return Scan(
        xyz=jnp.zeros((batch, n, 3), jnp.float32),
        time=jnp.zeros((batch, n), jnp.float32),
        intensity=jnp.zeros((batch, n), jnp.float32),
        ring=jnp.zeros((batch, n), jnp.int32),
        valid=jnp.zeros((batch, n), bool),
        stamp=jnp.zeros((batch,), jnp.float32),
    )


def pack_scans(spec: OdometrySpec, scans, stamps) -> Scan:
    """Pad a list of (xyz, times, rings, valid) numpy scans into a batched Scan."""
    b = len(scans)
    n = spec.raw_capacity
    xyz = np.zeros((b, n, 3), np.float32)
    tms = np.zeros((b, n), np.float32)
    rng = np.zeros((b, n), np.int32)
    val = np.zeros((b, n), bool)
    for i, (x, t, r, v) in enumerate(scans):
        k = min(len(x), n)
        xyz[i, :k] = x[:k]
        tms[i, :k] = t[:k]
        rng[i, :k] = r[:k]
        val[i, :k] = v[:k]
    return Scan(
        xyz=jnp.asarray(xyz),
        time=jnp.asarray(tms),
        intensity=jnp.zeros((b, n), jnp.float32),
        ring=jnp.asarray(rng),
        valid=jnp.asarray(val),
        stamp=jnp.asarray(np.asarray(stamps, np.float32)),
    )


def make_mesh(n_devices: Optional[int] = None, point_axis: int = 1) -> Mesh:
    devs = jax.devices()[: (n_devices or len(jax.devices()))]
    fleet = len(devs) // point_axis
    arr = np.asarray(devs).reshape(fleet, point_axis)
    return Mesh(arr, ("fleet", "point"))
