"""Unified local-map layer interface over the concrete map types.

The reference's local map is an ``mp2p_icp::metric_map_t`` whose named layers
can be any registered metric-map class — ``mola::HashedVoxelPointCloud``,
``mola::NDT``, ``mrpt::maps::CVoxelMap``, ``mola::SparseTreesPointCloud``,
plain point layers … (SURVEY.md §2.3; YAML ``metric_map_definition`` blocks
in pipelines/*.yaml).  Here the *class* of each layer is static trace-time
configuration (:class:`MapLayerDef`, parsed from the same YAML schema) and
dispatch happens in Python while building the jitted step; the *state* is a
pytree (one of the NamedTuples from ops/voxel_hash, ops/ndt, ops/occupancy).

``SparseTreesPointCloud`` (block-sparse point storage, rgbd.yaml:203-217) is
served by the hash-voxel point map with the block size as voxel size and a
deep per-voxel point budget — same insert/NN/prune contract, one code path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from mola_lidar_odometry_tpu.ops import ndt, occupancy, voxel_hash
from mola_lidar_odometry_tpu.ops.pointcloud import PointCloud
from mola_lidar_odometry_tpu.utils.expr import Expr, as_expr


@dataclass(frozen=True)
class MapLayerDef:
    """Static definition of one local-map layer (from ``localmap_generator``).

    Mirrors the YAML ``metric_map_definition`` schema
    (pipelines/lidar3d-default.yaml:228-242, lidar3d-ndt.yaml:236-254,
    lidar2d.yaml:185-198).  ``num_slots`` is the TPU-specific fixed hash-table
    capacity.
    """

    name: str = "localmap"
    map_class: str = "HashedVoxelPointCloud"
    num_slots: int = 1 << 18
    voxel_size: Expr = field(default_factory=lambda: Expr("1.0"))
    remove_voxels_farther_than: Expr = field(default_factory=lambda: Expr("0"))
    # HashedVoxelPointCloud / SparseTreesPointCloud
    points_per_voxel: int = 20
    min_distance_between_points: float = 0.0
    # Static per-frame budget for the insert scatter (0 = unbounded).
    # Resolved by spec_from_yaml from the input layer's capacity: scatter
    # cost is per STATIC element, while steady-state frames store only a
    # fraction of the layer (see voxel_hash.insert_stats).
    insert_budget: int = 0
    # NDT
    max_eigen_ratio_for_planes: float = 0.05
    # CVoxelMap (occupancy)
    prob_hit: float = 0.7
    prob_miss: float = 0.3
    clamp_min: float = 0.05
    clamp_max: float = 0.95
    occupied_threshold: float = 0.6
    ray_trace_free_space: bool = True
    max_ray_samples: int = 512  # TPU-static free-space sample budget per beam

    def create(self, voxel_size) -> Any:
        cls = self.map_class
        if cls in ("HashedVoxelPointCloud", "SparseTreesPointCloud", "CPointsMap",
                   "CSimplePointsMap", "CPointsMapXYZI", "CPointsMapXYZIRT"):
            # plain point layers are a degenerate hash map with tiny voxels
            return voxel_hash.VoxelHashMap.create(
                self.num_slots, self.points_per_voxel, voxel_size
            )
        if cls == "NDT":
            return ndt.NdtMap.create(
                self.num_slots, voxel_size, self.max_eigen_ratio_for_planes
            )
        if cls == "CVoxelMap":
            return occupancy.OccupancyMap.create(
                self.num_slots,
                voxel_size,
                prob_hit=self.prob_hit,
                prob_miss=self.prob_miss,
                clamp_min=self.clamp_min,
                clamp_max=self.clamp_max,
                occupied_threshold=self.occupied_threshold,
            )
        raise ValueError(f"Unsupported metric map class {cls!r}")


def map_def_from_yaml(name: str, md: dict, num_slots: int) -> MapLayerDef:
    """Parse one ``metric_map_definition`` YAML block."""
    from mola_lidar_odometry_tpu.utils.config import as_bool, as_float, as_str

    cls = as_str(md.get("class", "mola::HashedVoxelPointCloud")).split("::")[-1]
    creation = md.get("creationOpts", {}) or {}
    ins = md.get("insertOpts", {}) or {}
    lik = md.get("likelihoodOpts", {}) or {}
    voxel = creation.get("voxel_size", creation.get("resolution", 1.0))
    if cls == "SparseTreesPointCloud":
        voxel = creation.get("grid_size", voxel)
    return MapLayerDef(
        name=name,
        map_class=cls,
        num_slots=num_slots,
        voxel_size=as_expr(voxel),
        remove_voxels_farther_than=as_expr(ins.get("remove_voxels_farther_than", 0.0)),
        points_per_voxel=int(float(ins.get("max_points_per_voxel", 20) or 20)),
        min_distance_between_points=as_float(ins.get("min_distance_between_points"), 0.0),
        max_eigen_ratio_for_planes=as_float(ins.get("max_eigen_ratio_for_planes"), 0.05),
        prob_hit=as_float(ins.get("prob_hit"), 0.7),
        prob_miss=as_float(ins.get("prob_miss"), 0.3),
        clamp_min=as_float(ins.get("clamp_min"), 0.05),
        clamp_max=as_float(ins.get("clamp_max"), 0.95),
        occupied_threshold=as_float(lik.get("occupiedThreshold"), 0.6),
        ray_trace_free_space=as_bool(ins.get("ray_trace_free_space"), default=True),
    )


# ---------------------------------------------------------------------------
# state-polymorphic operations (dispatch on pytree type at trace time)
# ---------------------------------------------------------------------------


def insert(state, pc: PointCloud, sensor_origin=None, layer_def: "MapLayerDef" = None):
    return insert_stats(state, pc, sensor_origin, layer_def)[0]


def insert_stats(state, pc: PointCloud, sensor_origin=None, layer_def: "MapLayerDef" = None):
    """Insert + capacity-pressure counters (voxel_hash.InsertStats; zero for
    map types without point-slot semantics)."""
    if isinstance(state, voxel_hash.VoxelHashMap):
        md = layer_def.min_distance_between_points if layer_def else 0.0
        bud = layer_def.insert_budget if layer_def else 0
        return voxel_hash.insert_stats(state, pc, min_distance=md, budget=bud)
    if isinstance(state, ndt.NdtMap):
        md = layer_def.min_distance_between_points if layer_def else 0.0
        return ndt.insert_stats(state, pc, min_distance=md)
    if isinstance(state, occupancy.OccupancyMap):
        return occupancy.insert_stats(
            state,
            pc,
            sensor_origin,
            ray_trace=layer_def.ray_trace_free_space if layer_def else True,
            max_ray_samples=layer_def.max_ray_samples if layer_def else 512,
        )
    raise TypeError(type(state))


def prune_farther_than(state, center, distance):
    if isinstance(state, voxel_hash.VoxelHashMap):
        return voxel_hash.prune_farther_than(state, center, distance)
    if isinstance(state, ndt.NdtMap):
        return ndt.prune_farther_than(state, center, distance)
    if isinstance(state, occupancy.OccupancyMap):
        return occupancy.prune_farther_than(state, center, distance)
    raise TypeError(type(state))


def prune_farther_than_amortized(state, center, distance, step_idx):
    """Per-step eviction sweep: rolling slab for the big point-map tables,
    full prune for the small NDT/occupancy tables (see
    voxel_hash.prune_farther_than_slab)."""
    if isinstance(state, voxel_hash.VoxelHashMap):
        return voxel_hash.prune_farther_than_slab(state, center, distance, step_idx)
    return prune_farther_than(state, center, distance)


def is_empty(state) -> jax.Array:
    return state.is_empty()


def clear(state):
    return state.clear()


def set_voxel_size(state, voxel_size):
    if isinstance(state, occupancy.OccupancyMap):
        return state.set_voxel_size(voxel_size)  # also scales the match grid
    return state._replace(voxel_size=jnp.asarray(voxel_size, jnp.float32))


def capture(state, queries, neighbors: int = 27, per_voxel_nn: bool = False):
    """Gather the neighborhood candidate set once (see CandSet docstrings)."""
    if isinstance(state, voxel_hash.VoxelHashMap):
        return voxel_hash.capture(state, queries, neighbors, per_voxel_nn)
    if isinstance(state, ndt.NdtMap):
        return ndt.capture(state, queries, neighbors)
    if isinstance(state, occupancy.OccupancyMap):
        return occupancy.capture(state, queries, neighbors)
    raise TypeError(type(state))


def match_p2p(candset, queries, valid):
    """Nearest cached candidate (pure compute)."""
    if isinstance(candset, voxel_hash.CandSet):
        return voxel_hash.nn_from(candset, queries, valid)
    if isinstance(candset, ndt.NdtCandSet):
        return ndt.p2p_from(candset, queries, valid)
    from mola_lidar_odometry_tpu.ops import pallas_match

    if isinstance(candset, pallas_match.PlanarCands):
        tgt, d2 = pallas_match.nn_select(candset, queries)
        found = valid & (d2 < 1e37)
        return tgt, jnp.where(found, d2, jnp.inf), found
    raise TypeError(type(candset))


def match_p2p2(candset, queries, valid):
    if isinstance(candset, voxel_hash.CandSet):
        return voxel_hash.nn2_from(candset, queries, valid)
    raise TypeError(f"pairingsPerPoint=2 unsupported for {type(candset)}")


def match_p2pl(candset, queries, valid, *, search_radius=0.8, min_plane_points=6,
               plane_eigen_threshold=1e-2):
    if isinstance(candset, ndt.NdtCandSet):
        return ndt.p2pl_from(candset, queries, valid)
    if isinstance(candset, voxel_hash.CandSet):
        return voxel_hash.p2pl_from(
            candset, queries, valid,
            search_radius=search_radius,
            min_plane_points=min_plane_points,
            plane_eigen_threshold=plane_eigen_threshold,
        )
    raise TypeError(f"point-to-plane matching unsupported for {type(candset)}")


def query_p2p(
    state, queries, valid, *, neighbors: int = 27
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Nearest-target query: returns (target_xyz, dist2, found)."""
    if isinstance(state, voxel_hash.VoxelHashMap):
        return voxel_hash.query_nn(state, queries, valid, neighbors=neighbors)
    if isinstance(state, ndt.NdtMap):
        return ndt.query_p2p(state, queries, valid, neighbors=neighbors)
    if isinstance(state, occupancy.OccupancyMap):
        return occupancy.query_p2p(state, queries, valid, neighbors=neighbors)
    raise TypeError(type(state))


def query_p2p2(state, queries, valid, *, neighbors: int = 27):
    """Two-nearest query (pairingsPerPoint=2)."""
    if isinstance(state, voxel_hash.VoxelHashMap):
        return voxel_hash.query_nn2(state, queries, valid, neighbors=neighbors)
    if isinstance(state, occupancy.OccupancyMap):
        return occupancy.query_p2p2(state, queries, valid, neighbors=neighbors)
    raise TypeError(f"pairingsPerPoint=2 unsupported for {type(state)}")


def query_p2pl(
    state,
    queries,
    valid,
    *,
    search_radius: float = 0.8,
    min_plane_points: int = 6,
    plane_eigen_threshold: float = 1e-2,
    neighbors: int = 27,
):
    """Point-to-plane query: returns (plane_pt, normal, dist2, found).

    NDT layers use their precomputed per-voxel planes; point layers fit a
    local plane per query (Matcher_Point2Plane vs point maps, rgbd.yaml:143).
    """
    if isinstance(state, ndt.NdtMap):
        return ndt.query_p2pl(state, queries, valid, neighbors=neighbors)
    if isinstance(state, voxel_hash.VoxelHashMap):
        return voxel_hash.query_p2pl(
            state,
            queries,
            valid,
            search_radius=search_radius,
            min_plane_points=min_plane_points,
            plane_eigen_threshold=plane_eigen_threshold,
            neighbors=neighbors,
        )
    raise TypeError(f"point-to-plane matching unsupported for {type(state)}")


def as_pointcloud(state, capacity: int, anchor=None) -> PointCloud:
    """Flatten a map layer to a point view (viz / serialization / export).

    ``anchor`` (3,) world position (typically the current robot pose)
    disambiguates the wrapped voxel keys of hash maps — required for
    correct absolute points once the sliding map lives beyond ±1024
    voxels of the origin in x/y (±128 in z); see voxel_hash.pts_near."""
    if isinstance(state, voxel_hash.VoxelHashMap):
        return voxel_hash.as_pointcloud(state, capacity, anchor=anchor)
    if isinstance(state, ndt.NdtMap):
        live = state.n > 0
        return PointCloud.from_xyz(state.means(), valid=live).compact(capacity)
    if isinstance(state, occupancy.OccupancyMap):
        centers = (state.keys.astype(jnp.float32) + 0.5) * state.voxel_size
        return PointCloud.from_xyz(centers, valid=state.occupied()).compact(capacity)
    raise TypeError(type(state))
