"""Map and simple-map serialization.

The reference persists two artifacts (module/src/LidarOdometry.cpp:466-470,
1865-1904, lazy-load externalization :2151-2214):

  * ``.mm``        — the metric map (local voxel map layers)
  * ``.simplemap`` — keyframed trajectory + raw observations, optionally with
    point clouds externalized to ``<name>_Images/*.bin`` files for lazy load

Here both are portable ``.npz`` containers (``*.mm.npz`` /
``*.simplemap.npz``) with the same content model: self-describing, loadable
for multi-session mapping ("resume") and localization-only runs.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Union

import numpy as np


def _npz_path(path: Union[str, Path]) -> str:
    """Normalize to the '.npz' path np.savez actually writes.

    ``np.savez_compressed`` appends '.npz' when missing while ``np.load``
    opens the literal path — so save('map.mm') + load('map.mm') would miss.
    Both save and load go through this; load keeps a literal existing path.
    """
    p = str(path)
    if p.endswith(".npz") or Path(p).exists():
        return p
    return p + ".npz"


def save_metric_map(path: Union[str, Path], maps) -> None:
    """Persist the local map (the '.mm' analogue).

    ``maps`` is either a single map-layer state or a dict of named layers
    (any of VoxelHashMap / NdtMap / OccupancyMap).  Array leaves and static
    floats are stored per layer; the layer class name keys the reload.
    """
    import json

    path = _npz_path(path)
    if not isinstance(maps, dict):
        maps = {"localmap": maps}
    arrays = {}
    meta = {}
    for name, m in maps.items():
        kind = type(m).__name__
        meta[name] = {"kind": kind}
        for fld in m._fields:
            v = getattr(m, fld)
            if hasattr(v, "shape"):
                arrays[f"{name}/{fld}"] = np.asarray(v)
            else:
                meta[name][fld] = v
    np.savez_compressed(str(path), __meta__=json.dumps(meta), **arrays)


def load_metric_map(path: Union[str, Path]):
    """Load a '.mm.npz' saved by :func:`save_metric_map` → dict of layers."""
    import json

    import jax.numpy as jnp

    from mola_lidar_odometry_tpu.ops.ndt import NdtMap
    from mola_lidar_odometry_tpu.ops.occupancy import OccupancyMap
    from mola_lidar_odometry_tpu.ops.voxel_hash import VoxelHashMap

    classes = {
        "VoxelHashMap": VoxelHashMap,
        "NdtMap": NdtMap,
        "OccupancyMap": OccupancyMap,
    }
    d = np.load(_npz_path(path), allow_pickle=False)
    meta = json.loads(str(d["__meta__"]))
    out = {}
    for name, info in meta.items():
        cls = classes[info["kind"]]
        kwargs = {}
        for fld in cls._fields:
            key = f"{name}/{fld}"
            if key in d:
                kwargs[fld] = jnp.asarray(d[key])
            elif fld in info:
                kwargs[fld] = info[fld]
        out[name] = cls(**kwargs)
    return out


def save_simplemap(path: Union[str, Path], keyframes: List, lazy_load: bool = False) -> None:
    path = Path(_npz_path(path))
    arrays = {}
    meta = []
    ext_dir = path.parent / (path.stem + "_Images")
    if lazy_load:
        ext_dir.mkdir(exist_ok=True)
    for i, kf in enumerate(keyframes):
        entry = {
            "stamp": kf.stamp,
            "t": kf.t.tolist(),
            "quat_xyzw": kf.quat_xyzw.tolist(),
            "twist": kf.twist.tolist(),
            "has_scan": kf.scan_xyz is not None,
            "gnss": kf.gnss or {},
            "metadata": kf.metadata or {},
        }
        if kf.scan_xyz is not None:
            if lazy_load:
                ext = ext_dir / f"scan_{i:06d}.bin"
                kf.scan_xyz.astype(np.float32).tofile(ext)
                entry["scan_path"] = str(ext)
            else:
                arrays[f"scan_{i:06d}"] = kf.scan_xyz.astype(np.float32)
        meta.append(entry)
    import json

    np.savez_compressed(str(path), meta=json.dumps(meta), **arrays)


def load_simplemap(path: Union[str, Path]) -> List:
    from mola_lidar_odometry_tpu.models.odometry import SimpleMapKeyframe
    import json

    d = np.load(_npz_path(path), allow_pickle=False)
    meta = json.loads(str(d["meta"]))
    out = []
    for i, e in enumerate(meta):
        scan = None
        key = f"scan_{i:06d}"
        if e.get("has_scan"):
            if key in d:
                scan = d[key]
            elif e.get("scan_path") and Path(e["scan_path"]).exists():
                scan = np.fromfile(e["scan_path"], np.float32).reshape(-1, 3)
        out.append(
            SimpleMapKeyframe(
                stamp=e["stamp"],
                t=np.asarray(e["t"]),
                quat_xyzw=np.asarray(e["quat_xyzw"]),
                twist=np.asarray(e["twist"]),
                scan_xyz=scan,
                scan_path=e.get("scan_path"),
                gnss=e.get("gnss") or None,
                metadata=e.get("metadata") or None,
            )
        )
    return out


# ---------------------------------------------------------------------------
# MRPT-binary interop (reference-toolchain consumable; utils/mrpt_io.py)
# ---------------------------------------------------------------------------


def export_simplemap_mrpt(path: Union[str, Path], keyframes: List) -> None:
    """Write the keyframe list as an MRPT ``.simplemap`` (gzip CArchive),
    the container the reference ecosystem's sm2mm / mm-viewer / loop-closure
    tools consume (reference module/src/LidarOdometry.cpp:1865-1904)."""
    from mola_lidar_odometry_tpu.utils import mrpt_io as M

    entries = []
    for kf in keyframes:
        q = np.asarray(kf.quat_xyzw, np.float64)
        pose = M.MrptPose3D(
            np.asarray(kf.t, np.float64),
            np.array([q[3], q[0], q[1], q[2]]),  # xyzw -> wxyz
        )
        obs = []
        scan = kf.scan_xyz
        if scan is None and kf.scan_path and Path(kf.scan_path).exists():
            scan = np.fromfile(kf.scan_path, np.float32).reshape(-1, 3)
        if scan is not None:
            obs.append(
                M.MrptObservation(
                    classname="CObservationPointCloud",
                    sensor_label="lidar",
                    stamp=float(kf.stamp),
                    sensor_pose=M.MrptPose3D(np.zeros(3), np.array([1.0, 0, 0, 0])),
                    points=np.asarray(scan, np.float32),
                )
            )
        entries.append(
            M.MrptSimpleMapEntry(
                pose=pose,
                cov=np.zeros((6, 6)),
                observations=obs,
                twist=np.asarray(kf.twist, np.float64),
            )
        )
    M.save_simplemap_mrpt(path, entries)


def import_simplemap_mrpt(path: Union[str, Path]) -> List:
    """Read an MRPT ``.simplemap`` back into SimpleMapKeyframe objects."""
    from mola_lidar_odometry_tpu.models.odometry import SimpleMapKeyframe
    from mola_lidar_odometry_tpu.utils import mrpt_io as M

    out = []
    for e in M.load_simplemap_mrpt(path):
        q = e.pose.quat_wxyz
        scan = None
        stamp = 0.0
        for o in e.observations:
            stamp = o.stamp or stamp
            if o.points is not None:
                scan = o.points
        out.append(
            SimpleMapKeyframe(
                stamp=stamp,
                t=np.asarray(e.pose.t),
                quat_xyzw=np.array([q[1], q[2], q[3], q[0]]),
                twist=np.asarray(e.twist if e.twist is not None else np.zeros(6)),
                scan_xyz=scan,
            )
        )
    return out


def export_metric_map_mrpt(
    path: Union[str, Path], maps, capacity: int = 1 << 20, anchor=None
) -> None:
    """Write the local map as an mp2p_icp ``.mm`` (gzip CArchive): each
    layer flattened to its point view (voxel contents / NDT means /
    occupied centers).

    ``anchor`` (3,) world position (e.g. the robot pose at save time) pins
    the wrapped-voxel-key unwrap of hash layers; without it the anchor is
    derived from the map's own live keys (exact relative geometry, absolute
    offset modulo the wrap period — see voxel_hash.derive_anchor_vox)."""
    from mola_lidar_odometry_tpu.ops import maps as maps_ops
    from mola_lidar_odometry_tpu.utils import mrpt_io as M

    if not isinstance(maps, dict):
        maps = {"localmap": maps}
    layers = {}
    for name, m in maps.items():
        pc = maps_ops.as_pointcloud(m, capacity, anchor=anchor)
        xyz = np.asarray(pc.xyz)
        valid = np.asarray(pc.valid)
        layers[name] = (xyz[valid].astype(np.float32), None)
    M.save_metric_map_mrpt(path, layers)


def import_metric_map_mrpt(path: Union[str, Path]):
    """Read an mp2p_icp ``.mm`` into {layer: (N,3) points} arrays."""
    from mola_lidar_odometry_tpu.utils import mrpt_io as M

    return {k: pts for k, (pts, _) in M.load_metric_map_mrpt(path).items()}
