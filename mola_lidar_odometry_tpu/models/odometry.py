"""Host-side odometry orchestrator — the public ``LidarOdometry`` API.

The thin host wrapper around the jitted scan step, mirroring the reference
module's public surface (module/include/mola_lidar_odometry/LidarOdometry.h:
72-625): ``initialize(yaml)``, ``on_lidar_scan(...)`` (the push entry point,
cf. ``onNewObservation``), ``estimated_trajectory()``, ``reconstructed_map()``
(simple-map), ``reset()``, active flag, trajectory/simple-map writers.

Everything numeric lives on device in the step; this class only feeds padded
scans, accumulates per-frame outputs, and materializes host products (TUM
trajectory, simple-map keyframe list, debug traces).  GNSS observations are
ring-buffered and attached to simple-map keyframes by timestamp proximity
(reference LidarOdometry.cpp:1221-1235, 1392-1414).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import jax
import numpy as np

from mola_lidar_odometry_tpu.models import step as step_mod
from mola_lidar_odometry_tpu.models.spec import OdometrySpec, spec_from_yaml
from mola_lidar_odometry_tpu.models.step import Carry, Scan, StepOutput
from mola_lidar_odometry_tpu.utils import tum
from mola_lidar_odometry_tpu.utils.config import load_yaml_file, load_yaml_text
from mola_lidar_odometry_tpu.utils.profiler import Profiler

import jax.numpy as jnp


@dataclass
class SimpleMapKeyframe:
    """A simple-map entry: pose + (optionally) the raw observation.

    ``metadata`` mirrors the reference's per-KF YAML metadata observation
    (frame bounding box etc., LidarOdometry.cpp:1244-1268)."""

    stamp: float
    t: np.ndarray  # (3,)
    quat_xyzw: np.ndarray  # (4,)
    twist: np.ndarray  # (6,)
    scan_xyz: Optional[np.ndarray] = None  # None for non-KF pose-only entries
    scan_path: Optional[str] = None  # set when externalized (lazy-load)
    gnss: Optional[dict] = None
    metadata: Optional[dict] = None


class LidarOdometry:
    """TPU LiDAR odometry instance (single vehicle; see parallel/ for fleets)."""

    def __init__(self, spec: OdometrySpec):
        self.spec = spec
        self.profiler = Profiler(enabled=True)
        # step compilation is deferred to the first scan when pin_se2 is
        # None (auto): the reference pins z/pitch/roll whenever the incoming
        # observation IS a 2D scan (LidarOdometry.cpp:863-876); here a
        # planar first scan resolves the auto mode (see _ensure_step)
        self._step = None
        if spec.pin_se2 is not None:
            self._step = jax.jit(step_mod.make_step(spec))
        self.reset()
        self.active = spec.start_active
        self._fatal_error = False
        self._label_regexes = [re.compile(s) for s in spec.lidar_sensor_labels]
        # ICP debug logs (.icplog analogue), enabled like the reference via
        # MP2P_ICP_GENERATE_DEBUG_FILES=1 (pipelines/lidar3d-default.yaml:177)
        self._icp_log = None
        self._icp_replay = None
        import os as _os

        if _os.environ.get("MP2P_ICP_GENERATE_DEBUG_FILES", "0") == "1":
            from mola_lidar_odometry_tpu.utils.icp_log import IcpLogWriter

            self._icp_log = IcpLogWriter(
                decimation=int(_os.environ.get("MP2P_ICP_LOG_FILES_DECIMATION", 10))
            )
        # Session preload (reference LidarOdometry.cpp:465-476; YAML
        # `load_existing_local_map` / `load_existing_simple_map`, the
        # MOLA_LOAD_MM / MOLA_LOAD_SM contract): multi-session mapping or
        # localization-only runs start from a previous session's outputs.
        self._closed = False
        mm = spec.local_map_updates.load_existing_local_map
        if mm:
            self.load_local_map(mm)
        sm = spec.simplemap.load_existing_simple_map
        if sm:
            from mola_lidar_odometry_tpu.utils.serialization import load_simplemap

            self.simplemap = load_simplemap(sm)

    def close(self) -> None:
        """Flush configured outputs (reference destructor behavior,
        LidarOdometry.cpp:84-111: save trajectory / simplemap / traces at
        exit when the YAML asked for them).  Idempotent."""
        if getattr(self, "_closed", True):
            return
        self._closed = True
        if self.spec.save_trajectory and self.trajectory:
            self.save_trajectory_tum(self.spec.trajectory_output_file)
        if (
            self.spec.simplemap.generate
            and self.simplemap
            and self.spec.simplemap.save_final_map_to_file
        ):
            self.save_simplemap(self.spec.simplemap.save_final_map_to_file)
        if self.spec.debug_traces_save and self.traces:
            self.save_debug_traces(self.spec.debug_traces_file)

    def __del__(self):  # pragma: no cover - GC timing dependent
        try:
            self.close()
        except Exception:
            pass

    # -- construction ------------------------------------------------------
    @staticmethod
    def _build(cfg, overrides) -> "LidarOdometry":
        import os as _os

        # capacity auto-sizing (utils/capacity.py): active when the caller
        # pinned nothing — neither explicit overrides nor the env knobs.
        auto = overrides.pop("auto_capacity", None)
        if auto is None:
            auto = not (
                {"raw_capacity", "map_slots", "layer_capacities"} & overrides.keys()
                or "MOLA_TPU_RAW_CAPACITY" in _os.environ
                or "MOLA_TPU_MAP_SLOTS" in _os.environ
            )
        lo = LidarOdometry(spec_from_yaml(cfg, **overrides))
        if auto:
            lo._auto_cfg = (cfg, dict(overrides))
            lo._step = None  # defer the jit: sizes resolve on the first scan
        return lo

    @staticmethod
    def from_yaml_file(path: Union[str, Path], env=None, **overrides) -> "LidarOdometry":
        return LidarOdometry._build(load_yaml_file(path, env=env), overrides)

    @staticmethod
    def from_yaml_text(text: str, env=None, **overrides) -> "LidarOdometry":
        return LidarOdometry._build(load_yaml_text(text, env=env), overrides)

    # -- lifecycle ---------------------------------------------------------
    def reset(self) -> None:
        """Re-initialize all state from the spec (reference ``reset()``)."""
        self.carry: Carry = step_mod.init_carry(self.spec)
        self.trajectory: List[Dict[str, Any]] = []  # accepted poses
        self.simplemap: List[SimpleMapKeyframe] = []
        self.traces: List[Dict[str, float]] = []
        self._gnss_buffer: List[dict] = []  # last N GNSS observations
        self._imu_buffer: List[dict] = []
        self._last_odom = None  # previous wheel-odometry (R, t)
        # publisher callbacks (the mola_kernel advertise* interfaces,
        # reference LidarOdometry.cpp:2079-2149): localization every scan,
        # map every publish_map_updates_every_n keyframes
        self._stamp0 = None  # host f64 stamp base (first scan)
        self._localization_subscribers: List = []
        self._map_subscribers: List = []
        self.publish_map_updates_every_n = 10
        self._kf_counter = 0
        self.frames_processed = 0
        self.frames_dropped = 0
        self._drop_window: List[tuple] = []  # (collision_drops, inserts)
        self._capacity_warned = False
        # reset() is the reference's full re-initialization: a fatal-error
        # latch from a previous run clears here (LidarOdometry.cpp:495-501)
        self._fatal_error = False

    # -- observation dispatch (reference onNewObservation :503-603) --------
    def _ensure_step(self, first_xyz: "np.ndarray", first_times=None) -> None:
        """First-scan spec finalization, before the first jit:

        * capacity auto-sizing — a host-side dry pass over the first scan
          derives every layer capacity and the map hash size
          (utils/capacity.py; VERDICT-7 sizing policy);
        * pin_se2=None (auto) resolves from the scan's planarity (reference
          LidarOdometry.cpp:863-876: SE(2) pinning is keyed on the
          observation being a 2D range scan).
        """
        if self._step is not None:
            return
        import dataclasses

        if getattr(self, "_auto_cfg", None) is not None:
            from mola_lidar_odometry_tpu.utils.capacity import derive_capacities

            cfg, overrides = self._auto_cfg
            derived = dict(
                zip(
                    ("raw_capacity", "map_slots", "layer_capacities", "insert_budgets"),
                    derive_capacities(self.spec, first_xyz, first_times, with_budgets=True),
                )
            )
            # explicit caller overrides always win over derived sizes
            derived.update(overrides)
            self.spec = spec_from_yaml(cfg, **derived)
            self._auto_cfg = None
            # no scan has been processed yet: rebuild the carry at the
            # derived shapes
            self.carry = step_mod.init_carry(self.spec)

        if self.spec.pin_se2 is None:
            # auto mode only: an explicit YAML pin_se2 must never be
            # overridden by first-scan planarity detection
            z = np.asarray(first_xyz)[:, 2] if len(first_xyz) else np.zeros(1)
            planar = bool(np.max(np.abs(z)) < 1e-6) if z.size else False
            self.spec = dataclasses.replace(self.spec, pin_se2=planar)
        self._step = jax.jit(step_mod.make_step(self.spec))

    def set_mapping_enabled(self, enabled: bool) -> None:
        """Runtime local-map toggle (the reference GUI's "generate map"
        checkbox, LidarOdometry.cpp:1944-1961): disabled = localization-only
        against the frozen map; matching continues."""
        import jax.numpy as _jnp

        self.carry = self.carry._replace(mapping_enabled=_jnp.asarray(bool(enabled)))

    @property
    def mapping_enabled(self) -> bool:
        return bool(self.carry.mapping_enabled)

    def matches_lidar_label(self, label: str) -> bool:
        return any(r.fullmatch(label) or r.match(label) for r in self._label_regexes)

    def on_gnss(self, stamp: float, data: dict) -> None:
        """Ring-buffer GNSS observations for simple-map keyframes
        (reference onGPSImpl, LidarOdometry.cpp:1392-1414; buffer of 100)."""
        if self._stamp0 is None:
            self._stamp0 = float(stamp)
        stamp = float(stamp) - self._stamp0
        self._gnss_buffer.append({"stamp": stamp, **data})
        if len(self._gnss_buffer) > 100:
            self._gnss_buffer.pop(0)

    def on_imu(self, stamp: float, data: dict) -> None:
        """IMU intake. The reference profiles and otherwise ignores IMU
        (onIMUImpl is a stub, LidarOdometry.cpp:1333-1338); we keep a small
        buffer so downstream consumers can use it."""
        with self.profiler.enter("onIMU"):
            self._imu_buffer.append({"stamp": stamp, **data})
            if len(self._imu_buffer) > 1000:
                self._imu_buffer.pop(0)

    def on_wheel_odometry(self, stamp: float, pose: "np.ndarray") -> None:
        """Fuse wheel odometry (reference onWheelOdometryImpl ->
        NavStateFuse::fuse_odometry, LidarOdometry.cpp:1357-1373).

        ``pose`` is a 4x4 (or (R, t)) absolute odometry-frame pose.  The
        relative motion since the previous odometry reading, composed onto
        the current estimate, enters the navstate window as a pose sample —
        feeding the velocity model between LiDAR scans.  Like the reference,
        this NEVER mutates the pose estimate itself (only ICP-accepted scans
        move ``carry.pose``); odometry is velocity evidence only.
        """
        from mola_lidar_odometry_tpu.models import navstate as ns
        from mola_lidar_odometry_tpu.ops import se3

        if isinstance(pose, tuple):
            R, t = pose
        else:
            pose = np.asarray(pose)
            R, t = pose[:3, :3], pose[:3, 3]
        if self._stamp0 is None:
            self._stamp0 = float(stamp)
        stamp = float(stamp) - self._stamp0
        with self.profiler.enter("onWheelOdometry"):
            if self._last_odom is not None:
                R0, t0 = self._last_odom
                rel_R = R0.T @ R
                rel_t = R0.T @ (t - t0)
                # chain the increment onto the NEWEST window pose (dead
                # reckoning between scans), not the scan-gated carry pose —
                # consecutive odometry samples must advance the window or
                # the velocity evidence they encode is lost
                nav = self.carry.nav
                idx = np.nonzero(np.asarray(nav.valid))[0]
                if len(idx):
                    order = (int(nav.head) - 1 - np.arange(len(nav.times))) % len(nav.times)
                    newest = next(i for i in order if bool(nav.valid[i]))
                    cur = se3.Pose(nav.R[newest], nav.t[newest])
                else:
                    cur = se3.Pose(self.carry.pose_R, self.carry.pose_t)
                new = se3.compose(
                    cur,
                    se3.Pose(jnp.asarray(rel_R, jnp.float32), jnp.asarray(rel_t, jnp.float32)),
                )
                self.carry = self.carry._replace(
                    nav=ns.fuse_pose(self.carry.nav, stamp, new),
                )
            self._last_odom = (np.asarray(R, np.float64), np.asarray(t, np.float64))

    # -- relocalization (reference LidarOdometry.h:102-107, declared but
    # stubbed at LidarOdometry.cpp:2222-2230; implemented for real here) ---
    def relocalize_near_pose_pdf(self, R: "np.ndarray", t: "np.ndarray") -> None:
        """Re-seed the estimator near the given pose: reset the kinematic
        state and continue localizing against the existing local map."""
        self.carry = self.carry._replace(
            pose_R=jnp.asarray(R, jnp.float32),
            pose_t=jnp.asarray(t, jnp.float32),
            nav=type(self.carry.nav).empty(),
            sigma=jnp.float32(0.0),  # re-open the adaptive threshold
        )

    def relocalize_from_gnss(self) -> bool:
        """Seed position from the newest buffered GNSS fix (ENU expected in
        ``data['enu']``).  Returns False if no usable fix is buffered."""
        for g in reversed(self._gnss_buffer):
            enu = g.get("enu")
            if enu is not None:
                self.relocalize_near_pose_pdf(
                    np.asarray(self.carry.pose_R), np.asarray(enu, np.float64)
                )
                return True
        return False

    def on_lidar_scan(
        self,
        xyz: np.ndarray,
        stamp: float,
        times: Optional[np.ndarray] = None,
        intensity: Optional[np.ndarray] = None,
        ring: Optional[np.ndarray] = None,
        keep_scan_for_simplemap: bool = True,
    ) -> Optional[StepOutput]:
        """Process one scan (numpy, sensor frame).  Returns the step output."""
        if not self.active or self._fatal_error:
            return None
        try:
            # Rebase stamps to the first scan (float64 on host): device time
            # is float32, whose ulp reaches ~1 ms at t=10^4 s — enough to
            # corrupt 0.1 s inter-scan deltas on long recordings.  Outputs
            # add the base back (estimated_trajectory / simplemap).
            if self._stamp0 is None:
                self._stamp0 = float(stamp)
            stamp = float(stamp) - self._stamp0
            self._ensure_step(xyz, times)
            scan = self._pad_scan(xyz, stamp, times, intensity, ring)
            if self._icp_log is not None and self._icp_log.want_frame():
                self._write_icp_log(scan)
            with self.profiler.enter("onLidar"):
                self.carry, out = self._step(self.carry, scan)
            self._post_step(out, xyz if keep_scan_for_simplemap else None)
            return out
        except Exception:
            # reference behavior: a worker exception sets a fatal flag and
            # discards further input (LidarOdometry.cpp:614-619)
            self._fatal_error = True
            raise

    # -- ICP debug logs (.icplog analogue; utils/icp_log.py) ----------------
    def _write_icp_log(self, scan: Scan, n_iters: int = 30) -> None:
        from mola_lidar_odometry_tpu.models import navstate as ns
        from mola_lidar_odometry_tpu.models.filter_graph import apply_pipeline
        from mola_lidar_odometry_tpu.models.step import _dynamic_env
        from mola_lidar_odometry_tpu.ops.se3 import Pose
        from mola_lidar_odometry_tpu.utils.icp_log import replay_align_with_trace

        import os as _os

        # reference decimationIterationDetails (lidar3d-default.yaml:180):
        # full pairing details every Nth iteration; 0 disables the details
        detail_every = int(_os.environ.get("MP2P_ICP_LOG_ITER_DETAILS", 3))
        spec = self.spec
        if self._icp_replay is None:

            def replay(carry, scan):
                from mola_lidar_odometry_tpu.ops.pointcloud import PointCloud

                env = _dynamic_env(spec, carry, scan.stamp)
                layers = {"raw": PointCloud(scan.xyz, scan.time, scan.intensity, scan.ring, scan.valid)}
                for pl in (spec.generator_pipeline, spec.adjust_pipeline, spec.filter1, spec.filter2):
                    layers = apply_pipeline(pl, layers, env)
                nav = ns.estimate(carry.nav, spec.navstate, scan.stamp)
                pose0 = Pose(
                    jnp.where(nav.valid, nav.pose.R, carry.pose_R),
                    jnp.where(nav.valid, nav.pose.t, carry.pose_t),
                )
                cfg = spec.icp_with_vel
                icp_layers = {
                    mc.local_layer: (layers[mc.local_layer].xyz, layers[mc.local_layer].valid)
                    for mc in cfg.matchers
                }
                trace = replay_align_with_trace(
                    carry.maps, icp_layers, pose0, nav.prior, cfg, env,
                    n_iters, detail_every=detail_every,
                )
                return trace + (pose0.R, pose0.t)

            self._icp_replay = jax.jit(replay)

        Rs, ts, paired, det, p0R, p0t = self._icp_replay(self.carry, scan)
        extra = {
            # align entry pose: details of detail-slot 0 were recorded here
            "pose0_R": np.asarray(p0R, np.float32),
            "pose0_t": np.asarray(p0t, np.float32),
        }
        if det is not None:
            # per-detail-iteration pairings: [lx ly lz tx ty tz d2 valid]
            extra["pair_details"] = np.asarray(det, np.float32)
            extra["detail_iters"] = np.arange(
                0, Rs.shape[0], detail_every, dtype=np.int32
            )
        self._icp_log.log(
            frame_idx=self.frames_processed,
            stamp=float(scan.stamp),
            poses_R=np.asarray(Rs),
            poses_t=np.asarray(ts),
            paired=np.asarray(paired),
            quality=float(self.carry.last_icp_quality),
            iterations=n_iters,
            extra=extra,
        )

    # -- internals ---------------------------------------------------------
    def _pad_scan(self, xyz, stamp, times, intensity, ring) -> Scan:
        n_cap = self.spec.raw_capacity
        n = min(len(xyz), n_cap)
        pad = lambda a, dtype, fill=0: np.concatenate(
            [np.asarray(a[:n], dtype=dtype), np.full(n_cap - n, fill, dtype=dtype)]
        )
        xyz_p = np.zeros((n_cap, 3), np.float32)
        xyz_p[:n] = xyz[:n]
        valid = np.zeros(n_cap, bool)
        valid[:n] = np.all(np.isfinite(xyz[:n]), axis=1)
        return Scan(
            xyz=jnp.asarray(xyz_p),
            time=jnp.asarray(pad(times if times is not None else np.zeros(n), np.float32)),
            intensity=jnp.asarray(pad(intensity if intensity is not None else np.zeros(n), np.float32)),
            ring=jnp.asarray(pad(ring if ring is not None else np.zeros(n), np.int32)),
            valid=jnp.asarray(valid),
            stamp=jnp.float32(stamp),
        )

    def _closest_gnss(self, stamp: float) -> Optional[dict]:
        if not self._gnss_buffer:
            return None
        best = min(self._gnss_buffer, key=lambda g: abs(g["stamp"] - stamp))
        if abs(best["stamp"] - stamp) <= self.spec.simplemap.save_gnss_max_age:
            return best
        return None

    def _post_step(self, out: StepOutput, scan_xyz: Optional[np.ndarray]) -> None:
        from mola_lidar_odometry_tpu.ops import se3

        processed = bool(out.processed)
        if not processed:
            self.frames_dropped += 1
            return
        self.frames_processed += 1

        # raw-truncation watchdog: a scan padded EXACTLY to capacity very
        # likely lost points in _pad_scan (silent truncation)
        if (
            int(out.n_raw) >= self.spec.raw_capacity
            and not getattr(self, "_raw_truncation_warned", False)
        ):
            self._raw_truncation_warned = True
            import logging

            logging.getLogger("mola_lidar_odometry_tpu").warning(
                "scan filled the raw buffer (%d points): larger scans are "
                "being truncated — grow raw_capacity",
                self.spec.raw_capacity,
            )

        # capacity-saturation watchdog (VERDICT-7): collision drops beyond
        # 0.1% of inserts in a rolling window mean map_slots is undersized
        # for this world — warn instead of silently degrading.  Only
        # keyframe frames insert (non-KF frames would dilute the ratio).
        if bool(out.kf_local):
            self._drop_window.append(
                (int(out.map_collision_drops), max(int(out.n_map_layer), 1))
            )
        if len(self._drop_window) > 32:
            self._drop_window.pop(0)
        drops = sum(d for d, _ in self._drop_window)
        inserts = sum(n for _, n in self._drop_window)
        if (
            len(self._drop_window) >= 8  # let the window fill first
            and drops > 0.001 * inserts
            and not self._capacity_warned
        ):
            self._capacity_warned = True
            import logging

            logging.getLogger("mola_lidar_odometry_tpu").warning(
                "map hash collision drops %.2f%% of inserts over the last %d "
                "frames (map_slots=%d undersized for this world; grow it or "
                "use capacity auto-sizing)",
                100.0 * drops / max(inserts, 1),
                len(self._drop_window),
                self.spec.map_layers[0].num_slots,
            )

        if bool(out.map_restarted):
            self.trajectory.clear()

        if bool(out.accepted):
            q = np.asarray(se3.rot_to_quat(out.pose_R))
            entry = {
                "stamp": float(out.stamp) + (self._stamp0 or 0.0),
                "t": np.asarray(out.pose_t, np.float64),
                "quat_xyzw": q.astype(np.float64),
            }
            self.trajectory.append(entry)

            if bool(out.sm_insert):
                keep_scan = scan_xyz if bool(out.kf_simplemap) else None
                meta = None
                if keep_scan is not None and len(keep_scan):
                    meta = {  # frame bbox metadata (reference :1244-1268)
                        "bbox_min": keep_scan.min(axis=0).tolist(),
                        "bbox_max": keep_scan.max(axis=0).tolist(),
                        "n_points": int(len(keep_scan)),
                    }
                kf = SimpleMapKeyframe(
                    stamp=float(out.stamp) + (self._stamp0 or 0.0),
                    t=entry["t"],
                    quat_xyzw=entry["quat_xyzw"],
                    twist=np.asarray(out.twist, np.float64),
                    scan_xyz=keep_scan,
                    gnss=self._closest_gnss(float(out.stamp)),
                    metadata=meta,
                )
                self.simplemap.append(kf)

            # doPublishUpdatedLocalization (reference :2079-2100)
            for cb in self._localization_subscribers:
                cb(entry)
            # doPublishUpdatedMap every N keyframes (reference :2102-2149)
            if bool(out.kf_local):
                self._kf_counter += 1
                if (
                    self._map_subscribers
                    and self._kf_counter % self.publish_map_updates_every_n == 0
                ):
                    pts = self.local_map_pointcloud()
                    for cb in self._map_subscribers:
                        cb(pts)

        if self.spec.debug_traces_save:
            # full dynamic-variable dump per frame, like the reference's
            # doWriteDebugTracesFile (LidarOdometry.cpp:2247-2282)
            tw = np.asarray(out.twist, np.float64)
            t = np.asarray(out.pose_t, np.float64)
            yaw, pitch, roll = (
                float(x) for x in se3.rot_to_ypr(out.pose_R)
            )
            self.traces.append(
                {
                    "stamp": float(out.stamp),
                    "vx": tw[0], "vy": tw[1], "vz": tw[2],
                    "wx": tw[3], "wy": tw[4], "wz": tw[5],
                    "robot_x": t[0], "robot_y": t[1], "robot_z": t[2],
                    "robot_yaw": yaw, "robot_pitch": pitch, "robot_roll": roll,
                    "ADAPTIVE_THRESHOLD_SIGMA": float(out.sigma),
                    "icp_iterations": int(out.iterations),
                    "twistCorrectionCount": int(out.corrections),
                    "ESTIMATED_SENSOR_MAX_RANGE": float(out.est_range),
                    "icp_quality": float(out.quality),
                    "n_raw": int(out.n_raw),
                    "n_icp": int(out.n_icp_layer),
                    "accepted": int(bool(out.accepted)),
                    "kf_local": int(bool(out.kf_local)),
                    "map_collision_drops": int(out.map_collision_drops),
                    "map_full_drops": int(out.map_full_drops),
                    "onLidar_time_ms": 1e3 * self.profiler.last("onLidar"),
                }
            )

    # -- outputs (reference :1425-1435, 1865-1904) -------------------------
    def estimated_trajectory(self) -> Dict[str, np.ndarray]:
        if not self.trajectory:
            return {"stamps": np.zeros(0), "t": np.zeros((0, 3)), "quat_xyzw": np.zeros((0, 4))}
        return {
            "stamps": np.asarray([e["stamp"] for e in self.trajectory]),
            "t": np.stack([e["t"] for e in self.trajectory]),
            "quat_xyzw": np.stack([e["quat_xyzw"] for e in self.trajectory]),
        }

    def save_trajectory_tum(self, path: Union[str, Path]) -> None:
        tr = self.estimated_trajectory()
        tum.save_tum(path, tr["stamps"], tr["t"], tr["quat_xyzw"])

    def reconstructed_map(self) -> List[SimpleMapKeyframe]:
        return self.simplemap

    def save_simplemap(self, path: Union[str, Path]) -> None:
        from mola_lidar_odometry_tpu.utils.serialization import save_simplemap

        save_simplemap(path, self.simplemap, lazy_load=self.spec.simplemap.generate_lazy_load_scan_files)

    def local_map_pointcloud(
        self, capacity: int = 1 << 20, layer: Optional[str] = None
    ) -> np.ndarray:
        """Materialize a live local-map layer as an (N, 3) numpy array."""
        from mola_lidar_odometry_tpu.ops import maps as maps_ops

        name = layer or self.spec.map_layers[0].name
        # anchor the wrapped-key unwrap at the current pose: the sliding map
        # always lives near the robot, never necessarily near the origin
        pc = maps_ops.as_pointcloud(
            self.carry.maps[name], capacity, anchor=self.carry.pose_t
        )
        v = np.asarray(pc.valid)
        return np.asarray(pc.xyz)[v]

    def save_local_map(self, path: Union[str, Path]) -> None:
        """Persist all local-map layers (the '.mm' analogue)."""
        from mola_lidar_odometry_tpu.utils.serialization import save_metric_map

        save_metric_map(path, self.carry.maps)

    def load_local_map(self, path: Union[str, Path]) -> None:
        """Preload an existing local map (multi-session / localization-only,
        reference LidarOdometry.cpp:465-476)."""
        from mola_lidar_odometry_tpu.utils.serialization import load_metric_map

        loaded = load_metric_map(path)
        has_content = any(not bool(m.is_empty()) for m in loaded.values())
        self.carry = self.carry._replace(
            maps=loaded, map_has_content=jnp.asarray(has_content)
        )

    def save_debug_traces(self, path: Union[str, Path]) -> None:
        if not self.traces:
            return
        keys = list(self.traces[0].keys())
        with open(path, "w") as f:
            f.write(",".join(keys) + "\n")
            for row in self.traces:
                f.write(",".join(str(row[k]) for k in keys) + "\n")

    # -- publisher subscriptions (mola_kernel advertise* interfaces) --------
    def subscribe_localization_updates(self, cb) -> None:
        """``cb(entry)`` per accepted pose (advertiseUpdatedLocalization)."""
        self._localization_subscribers.append(cb)

    def subscribe_map_updates(self, cb) -> None:
        """``cb(points)`` every ``publish_map_updates_every_n`` keyframes
        (advertiseUpdatedMap; anyUpdateMapSubscriber gating included)."""
        self._map_subscribers.append(cb)

    def is_busy(self) -> bool:
        return False  # synchronous host API; the async runtime lives in utils/runtime.py
