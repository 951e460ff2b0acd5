"""The per-scan odometry step as one jitted XLA program.

TPU rebuild of the reference's per-scan worker ``onLidarImpl``
(module/src/LidarOdometry.cpp:627-1314, call stack SURVEY.md §3.3):
``step(carry, scan) -> (carry, out)``, where ``carry`` holds all persistent
state (pose, navstate window, adaptive sigma, sensor-range filter, the
hash-voxel local map, keyframe rings) and everything — dynamic-variable
realization, filter pipelines, the ICP loop with twist re-optimization,
quality gating, state fusion, keyframing, map update — happens as masked
fixed-shape array ops.  Sequences run as a host loop or ``lax.scan`` over
steps; fleets of instances are ``vmap`` over carries (parallel/batch.py).

Stage map (reference line numbers in parentheses):
  1. min_time_between_scans drop                      (:643-657)
  2. sensor-range init / IIR update                   (:662, :744, :1487-1546)
  3. dynamic-variable environment                     (:691, :1571-1635)
  4. generators -> 'raw' layer + timestamp adjust     (:697-721)
  5. filter pass 1 (decimate/range/bbox) + 2 (deskew) (:732-741)
  6. observation validity check                       (:749-755, :1548-1569)
  7. motion-model prior from navstate                 (:807-815)
  8. first-scan seed | ICP + twist-reopt loop         (:817-1024)
  9. quality gate -> fuse | reset; trajectory         (:1026-1045)
 10. adaptive sigma (KISS-ICP)                        (:1051-1063, :1437-1485)
 11. KF deciders + ring pruning                       (:1065-1144)
 12. bad-first-ICP map restart                        (:1150-1158)
 13. local-map merge + voxel pruning                  (:1161-1206)

Deviation notes:
  * the twist-reopt correction counter enforces ``optimize_twist_max_
    corrections`` as a true bound (the reference increments the *maximum*
    inside the hook — LidarOdometry.cpp:946 — which effectively unbounds it;
    we implement the documented intent).
  * sensor-range IIR reads the ICP layer's bounding radius (the reference
    takes the alphabetically-first point layer of the filtered map, which is
    ``decimated_for_icp`` for the default pipeline).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mola_lidar_odometry_tpu.models import keyframes, navstate as ns
from mola_lidar_odometry_tpu.models.filter_graph import apply_pipeline, deskew_ops
from mola_lidar_odometry_tpu.models.spec import OdometrySpec
from mola_lidar_odometry_tpu.ops import icp as icp_ops, maps as maps_ops, se3
from mola_lidar_odometry_tpu.ops.pointcloud import PointCloud
from mola_lidar_odometry_tpu.ops.se3 import Pose
from mola_lidar_odometry_tpu.ops.solver import PosePrior


class Scan(NamedTuple):
    """One (padded) LiDAR frame in sensor coordinates."""

    xyz: jax.Array  # (N, 3) f32
    time: jax.Array  # (N,) f32 per-point stamp (relative, any origin)
    intensity: jax.Array  # (N,) f32
    ring: jax.Array  # (N,) i32
    valid: jax.Array  # (N,) bool
    stamp: jax.Array  # () f32 — scan timestamp (sequence-relative seconds)

    @staticmethod
    def from_cloud(pc: PointCloud, stamp) -> "Scan":
        return Scan(pc.xyz, pc.time, pc.intensity, pc.ring, pc.valid, jnp.asarray(stamp, jnp.float32))


class Carry(NamedTuple):
    """All persistent odometry state (a pytree of fixed-shape arrays)."""

    pose_R: jax.Array  # (3,3) last accepted lidar pose
    pose_t: jax.Array  # (3,)
    last_time: jax.Array  # () f32 — stamp of last processed scan (-inf none)
    first_time: jax.Array  # () f32 — stamp of first scan (for rel. timestamp)
    frame_idx: jax.Array  # () i32 — processed frames
    traj_len: jax.Array  # () i32 — accepted trajectory poses

    sigma: jax.Array  # () f32 adaptive threshold (0 = uninitialized)
    last_icp_quality: jax.Array  # () f32
    last_icp_iters: jax.Array  # () f32 (dynamic var "icp_iterations")
    twist_corr_count: jax.Array  # () f32 (dynamic var)

    est_range: jax.Array  # () f32 ESTIMATED_SENSOR_MAX_RANGE (0 = unset)
    inst_range: jax.Array  # () f32 INSTANTANEOUS_... (0 = unset)

    nav: ns.NavStateBuffer
    maps: Dict[str, Any]  # local-map layers (static keys from spec.map_layers)
    lm_kfs: keyframes.PoseRing
    sm_kfs: keyframes.PoseRing
    removal_counter: jax.Array  # () i32

    last_twist: jax.Array  # (6,) motion-model twist of last frame
    has_twist: jax.Array  # () bool
    # tracked "any map layer has content" flag: computing it from the
    # tables (is_empty) streams the whole multi-hundred-MB table set every
    # step (~3.3 ms/step at B=8); inserts/restarts keep this flag exact
    map_has_content: jax.Array  # () bool
    # runtime mapping toggle (reference GUI "generate map" checkbox,
    # LidarOdometry.cpp:1944-1961): False = localization-only, the local
    # map stops updating but matching continues
    mapping_enabled: jax.Array  # () bool


class StepOutput(NamedTuple):
    """Per-scan results surfaced to the host (trajectory, simplemap, stats)."""

    pose_R: jax.Array
    pose_t: jax.Array
    stamp: jax.Array
    quality: jax.Array
    sigma: jax.Array
    iterations: jax.Array  # i32 total ICP iterations
    twist: jax.Array  # (6,) fused twist estimate for this frame
    processed: jax.Array  # bool — False if dropped (min time / invalid scan)
    accepted: jax.Array  # bool — icpIsGood: pose entered the trajectory
    kf_local: jax.Array  # bool — local map updated
    kf_simplemap: jax.Array  # bool — simple-map keyframe (with observation)
    sm_insert: jax.Array  # bool — any simple-map insert (incl. non-KF poses)
    map_restarted: jax.Array  # bool — bad-first-ICP wipe happened
    est_range: jax.Array
    n_raw: jax.Array  # i32 valid raw points
    n_icp_layer: jax.Array  # i32 valid points in the ICP layer
    n_map_layer: jax.Array  # i32 valid points in the first map-insert layer
    corrections: jax.Array  # i32 twist re-opt corrections
    # capacity-pressure counters (SURVEY §7 hard-part #1): hash-slot
    # collision drops and per-voxel-cap drops summed over this step's map
    # inserts — nonzero collision counts mean map_slots is undersized.
    map_collision_drops: jax.Array  # i32
    map_full_drops: jax.Array  # i32
    deferred_drops: jax.Array  # i32 — storable points past the insert budget


def init_carry(spec: OdometrySpec) -> Carry:
    p0 = spec.initial_localization.fixed_initial_pose
    if spec.initial_localization.enabled and any(abs(v) > 0 for v in p0):
        R0 = se3.ypr_to_rot(
            jnp.float32(p0[3]), jnp.float32(p0[4]), jnp.float32(p0[5])
        )
        t0 = jnp.asarray(p0[:3], jnp.float32)
    else:
        R0, t0 = jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32)
    return Carry(
        pose_R=R0,
        pose_t=t0,
        last_time=jnp.float32(-jnp.inf),
        first_time=jnp.float32(0.0),
        frame_idx=jnp.int32(0),
        traj_len=jnp.int32(0),
        sigma=jnp.float32(0.0),
        last_icp_quality=jnp.float32(1.0),
        last_icp_iters=jnp.float32(0.0),
        twist_corr_count=jnp.float32(0.0),
        est_range=jnp.float32(0.0),
        inst_range=jnp.float32(0.0),
        nav=ns.NavStateBuffer.empty(),
        maps={d.name: d.create(1.0) for d in spec.map_layers},
        lm_kfs=keyframes.PoseRing.empty(spec.kf_ring_capacity),
        sm_kfs=keyframes.PoseRing.empty(spec.kf_ring_capacity),
        removal_counter=jnp.int32(0),
        last_twist=jnp.zeros(6, jnp.float32),
        has_twist=jnp.asarray(False),
        map_has_content=jnp.asarray(False),
        mapping_enabled=jnp.asarray(True),
    )


def _dynamic_env(spec: OdometrySpec, c: Carry, stamp) -> Dict[str, jax.Array]:
    """updatePipelineDynamicVariables (reference LidarOdometry.cpp:1581-1635)."""
    tw = jnp.where(c.has_twist, c.last_twist, 0.0)
    yaw, pitch, roll = se3.rot_to_ypr(c.pose_R)
    at = spec.adaptive_threshold
    return {
        "vx": tw[0], "vy": tw[1], "vz": tw[2],
        "wx": tw[3], "wy": tw[4], "wz": tw[5],
        "robot_x": c.pose_t[0], "robot_y": c.pose_t[1], "robot_z": c.pose_t[2],
        "robot_yaw": yaw, "robot_pitch": pitch, "robot_roll": roll,
        "ADAPTIVE_THRESHOLD_SIGMA": jnp.where(c.sigma != 0, c.sigma, at.initial_sigma),
        "ICP_ITERATION": jnp.float32(0.0),
        "icp_iterations": c.last_icp_iters,
        "SENSOR_TIME_OFFSET": jnp.float32(0.0),
        "twistCorrectionCount": c.twist_corr_count,
        "ESTIMATED_SENSOR_MAX_RANGE": c.est_range,
        "INSTANTANEOUS_SENSOR_MAX_RANGE": jnp.where(c.inst_range > 0, c.inst_range, 20.0),
        "current_relative_timestamp": stamp - c.first_time,
    }


def _model_error(rel: Pose, max_range) -> jax.Array:
    """computeModelError (reference LidarOdometry.cpp:1440-1448)."""
    theta = jnp.linalg.norm(se3.so3_log(rel.R))
    return jnp.linalg.norm(rel.t) + 2.0 * max_range * jnp.sin(theta / 2.0)


def make_step(spec: OdometrySpec) -> Callable[[Carry, Scan], Tuple[Carry, StepOutput]]:
    """Compile the spec into the scan-step function (jit it or lax.scan it)."""

    dsk_ops = deskew_ops(spec.filter2)
    hook_rot = math.radians(spec.optimize_twist_rerun_min_rot_deg)
    sm_generate = spec.simplemap.generate

    def redeskew(layers, twist):
        env = {k: twist[i] for i, k in enumerate(("vx", "vy", "vz", "wx", "wy", "wz"))}
        layers = dict(layers)
        for op in dsk_ops:
            op(layers, env)
        return layers

    def run_icp_with_corrections(c: Carry, layers, nav_est: ns.NavStateEstimate, env, dt_scan):
        """ICP driver incl. the twist re-optimization restart loop
        (reference LidarOdometry.cpp:916-1024)."""
        cfg = spec.icp_with_vel  # selected per align_kind below
        cfg_nomm = spec.icp_without_vel

        init_pose = Pose(
            jnp.where(nav_est.valid, nav_est.pose.R, c.pose_R),
            jnp.where(nav_est.valid, nav_est.pose.t, c.pose_t),
        )
        prior = nav_est.prior  # info zeroed already when !valid
        if spec.pin_se2:
            # 2D scan: pin z/pitch/roll with 1e6 information around the guess
            # (reference LidarOdometry.cpp:863-876); tangent order [rho, phi]
            pin = jnp.zeros((6, 6), jnp.float32)
            for i in (2, 3, 4):
                pin = pin.at[i, i].set(1e6)
            prior = PosePrior(
                mean=Pose(init_pose.R, init_pose.t), info=prior.info + pin
            )
        last_kf_pose = Pose(c.pose_R, c.pose_t)

        matcher_layers = sorted(
            {mc.local_layer for cc in (cfg, cfg_nomm) for mc in cc.matchers}
        )

        def get_icp_layers(ly):
            return {
                name: (ly[name].xyz, ly[name].valid) for name in matcher_layers
            }

        def align_once(pose, layers_, budget, kind_with_vel):
            icp_layers = get_icp_layers(layers_)
            res_w = icp_ops.align(c.maps, icp_layers, pose, prior, cfg, env, budget)
            if cfg_nomm is cfg:
                return res_w
            res_n = icp_ops.align(
                c.maps, icp_layers, pose, PosePrior.none(), cfg_nomm, env, budget
            )
            pick = lambda a, b: jax.tree_util.tree_map(
                lambda x, y: jnp.where(kind_with_vel, x, y), a, b
            )
            return pick(res_w, res_n)

        if spec.optimize_twist and dsk_ops:
            max_corr = spec.optimize_twist_max_corrections
            # Only the deskew OUTPUT layers change across correction re-runs
            # (redeskew rewrites them from the immutable skewed sources); the
            # rest of the layer dict rides as a closure.  Keeping raw-sized
            # buffers out of the while state and hoisting the first align
            # out of the loop means a zero-correction frame (the common
            # case: the bench world re-corrects on 0/240 scans) pays NO
            # redeskew, NO layer selects and NO loop-state copies — round-4
            # device profile: the old always-run loop body cost ~5 ms/step
            # exclusive of the align itself.
            vary_names = sorted({op.output for op in dsk_ops})

            def with_vary(vary):
                merged = dict(layers)
                merged.update(vary)
                return merged

            def correction_state(res, twist, remaining, corr):
                new_remaining = jnp.maximum(remaining - res.iterations, 0)
                can_correct = (
                    res.hook_stop & (corr < max_corr) & (dt_scan > 0) & (new_remaining > 0)
                )
                # Re-estimate twist from the incremental pose wrt the last KF
                rel = se3.relative(last_kf_pose, res.pose)
                tw_new = (
                    jnp.concatenate([rel.t, se3.so3_log(rel.R)]) / jnp.maximum(dt_scan, 1e-6)
                )
                twist2 = jnp.where(can_correct, tw_new, twist)
                return new_remaining, can_correct, twist2

            def body(st):
                pose, twist, remaining, corr, vary, _, _, iters = st
                # cond guarantees a pending correction: apply the corrected
                # twist (re-deskew), then re-run the align — unconditionally
                redeskewed = redeskew(with_vary(vary), twist)
                vary2 = {k: redeskewed[k] for k in vary_names}
                res = align_once(pose, with_vary(vary2), remaining, nav_est.valid)
                new_remaining, can_correct, twist2 = correction_state(
                    res, twist, remaining, corr
                )
                return (
                    res.pose, twist2, new_remaining,
                    corr + can_correct.astype(jnp.int32),
                    vary2, res.quality, can_correct, iters + res.iterations,
                )

            def cond(st):
                return st[6]  # pending correction re-run

            res0 = align_once(init_pose, layers, jnp.int32(cfg.max_iterations), nav_est.valid)
            rem0, can0, twist0 = correction_state(
                res0, nav_est.twist, jnp.int32(cfg.max_iterations), jnp.int32(0)
            )
            st0 = (
                res0.pose, twist0, rem0, can0.astype(jnp.int32),
                {k: layers[k] for k in vary_names},
                res0.quality, can0, res0.iterations,
            )
            pose, twist_fin, _, corr, vary_fin, quality, _, iters = jax.lax.while_loop(
                cond, body, st0
            )
            layers_fin = with_vary(vary_fin)
        else:
            res = align_once(init_pose, layers, cfg.max_iterations, nav_est.valid)
            pose, quality, iters = res.pose, res.quality, res.iterations
            twist_fin, corr, layers_fin = nav_est.twist, jnp.int32(0), layers

        return pose, quality, iters, corr, layers_fin, init_pose

    def process(c: Carry, scan: Scan, drop: jax.Array) -> Tuple[Carry, StepOutput]:
        stamp = scan.stamp
        first_ever = c.frame_idx == 0
        first_time = jnp.where(first_ever, stamp, c.first_time)

        # ---- 2. sensor range init (raw bounding radius, first frame) ----
        raw_pc = PointCloud(scan.xyz, scan.time, scan.intensity, scan.ring, scan.valid)
        raw_radius = jnp.maximum(raw_pc.bounding_radius(), spec.absolute_minimum_sensor_range)
        est_range0 = jnp.where(c.est_range > 0, c.est_range, raw_radius)

        # ---- 3. dynamic variables ----
        c1 = c._replace(est_range=est_range0, first_time=first_time)
        env = _dynamic_env(spec, c1, stamp)

        # ---- 4-5. generators + filter pipelines ----
        layers: Dict[str, PointCloud] = {"raw": raw_pc}
        layers = apply_pipeline(spec.generator_pipeline, layers, env)
        layers = apply_pipeline(spec.adjust_pipeline, layers, env)
        layers = apply_pipeline(spec.filter1, layers, env)
        layers = apply_pipeline(spec.filter2, layers, env)

        # ---- 2b. sensor range IIR update (ICP-layer radius) ----
        rng_layer = layers.get(spec.icp_local_layer, layers["raw"])
        inst = jnp.maximum(rng_layer.bounding_radius(), spec.absolute_minimum_sensor_range)
        a = spec.max_sensor_range_filter_coefficient
        est_range = jnp.where(first_ever, est_range0, a * est_range0 + (1 - a) * inst)

        # ---- 6. observation validity ----
        if spec.observation_validity.enabled:
            chk = layers.get(spec.observation_validity.check_layer_name, raw_pc)
            obs_valid = chk.count() > spec.observation_validity.minimum_point_count
        else:
            obs_valid = jnp.asarray(True)
        # One "this frame mutates state" predicate: invalid observation OR
        # min-time drop.  All big-state consumers (map inserts, epoch
        # restarts) are masked by it directly, so the end-of-step rollback
        # select never has to touch the multi-hundred-MB map tables.
        active = obs_valid & ~drop

        # ---- 7. motion model ----
        nav0 = c.nav
        if spec.initial_localization.enabled:
            # fake a short history so the first estimate has a velocity
            p0 = Pose(c.pose_R, c.pose_t)
            seeded = ns.fuse_pose(ns.fuse_pose(ns.NavStateBuffer.empty(), stamp - 0.2, p0), stamp - 0.1, p0)
            nav0 = jax.tree_util.tree_map(
                lambda a, b: jnp.where(first_ever, a, b), seeded, nav0
            )
        nav_est = ns.estimate(nav0, spec.navstate, stamp)

        dt_scan = jnp.where(
            jnp.isfinite(c.last_time), stamp - c.last_time, 0.0
        )

        map_empty = ~c.map_has_content

        # ---- 8. first-scan seed | ICP ----
        def first_branch(_):
            pose = Pose(c.pose_R, c.pose_t)
            return (
                pose, jnp.float32(1.0), jnp.int32(0), jnp.int32(0), layers, pose,
            )

        def icp_branch(_):
            return run_icp_with_corrections(c1._replace(est_range=est_range), layers, nav_est, env, dt_scan)

        pose, quality, iters, corrections, layers_f, init_guess = jax.lax.cond(
            map_empty, first_branch, icp_branch, None
        )

        # ---- 9. gate ----
        accepted = quality >= spec.min_icp_goodness
        new_pose = Pose(
            jnp.where(accepted, pose.R, c.pose_R),
            jnp.where(accepted, pose.t, c.pose_t),
        )
        nav_fused = ns.fuse_pose(nav0, stamp, new_pose)
        nav_reset = ns.NavStateBuffer.empty()
        nav1 = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accepted, a, b), nav_fused, nav_reset
        )
        traj_len = c.traj_len + accepted.astype(jnp.int32)

        # ---- 10. adaptive sigma ----
        at = spec.adaptive_threshold
        if at.enabled:
            rel = se3.relative(init_guess, pose)
            model_err = _model_error(rel, est_range)
            rot_err = jnp.where(
                nav_est.valid, 0.1 * jnp.linalg.norm(nav_est.twist[3:]) * est_range, 0.0
            )
            gain = jnp.clip(at.kp * (1.0 - quality), 0.1, at.kp)
            new_sigma_val = (model_err + rot_err) * gain
            sig0 = jnp.where(c.sigma != 0, c.sigma, at.initial_sigma)
            sigma_upd = jnp.clip(
                at.alpha * sig0 + (1 - at.alpha) * new_sigma_val, at.min_motion, at.maximum_sigma
            )
            sigma = jnp.where(map_empty, c.sigma, sigma_upd)
        else:
            sigma = c.sigma

        # ---- 11. KF deciders ----
        lmu = spec.local_map_updates
        is_first_lm, d_lm, r_lm = keyframes.check(
            c.lm_kfs, new_pose, from_last_only=lmu.measure_from_last_kf_only
        )
        env_kf = dict(env)
        env_kf["ESTIMATED_SENSOR_MAX_RANGE"] = est_range
        min_t = lmu.min_translation_between_keyframes(env_kf)
        min_r = lmu.min_rotation_between_keyframes_deg(env_kf) * (math.pi / 180.0)
        update_local_map = (
            jnp.where(
                map_empty,
                True,
                accepted
                & lmu.enabled
                & nav_est.valid
                & (is_first_lm | (d_lm > min_t) | (r_lm > min_r)),
            )
            & c.mapping_enabled
        )
        lm_kfs = jax.tree_util.tree_map(
            lambda a, b: jnp.where(update_local_map & ~map_empty, a, b),
            keyframes.insert(c.lm_kfs, new_pose),
            c.lm_kfs,
        )
        max_keep = lmu.max_distance_to_keep_keyframes(env_kf)
        do_prune_kfs = (
            update_local_map
            & (max_keep > 0)
            & (c.removal_counter >= lmu.check_for_removal_every_n)
        )
        lm_kfs = jax.tree_util.tree_map(
            lambda a, b: jnp.where(do_prune_kfs, a, b),
            keyframes.remove_farther_than(lm_kfs, new_pose.t, max_keep),
            lm_kfs,
        )
        removal_counter = jnp.where(
            do_prune_kfs, 0, c.removal_counter + update_local_map.astype(jnp.int32)
        )

        smc = spec.simplemap
        is_first_sm, d_sm, r_sm = keyframes.check(
            c.sm_kfs, new_pose, from_last_only=smc.measure_from_last_kf_only
        )
        min_t_sm = smc.min_translation_between_keyframes(env_kf)
        min_r_sm = smc.min_rotation_between_keyframes_deg(env_kf) * (math.pi / 180.0)
        distance_enough_sm = jnp.where(
            map_empty, True, is_first_sm | (d_sm > min_t_sm) | (r_sm > min_r_sm)
        )
        update_simplemap = sm_generate & accepted & (distance_enough_sm | smc.add_non_keyframes_too)
        sm_kfs = jax.tree_util.tree_map(
            lambda a, b: jnp.where(update_simplemap & distance_enough_sm & ~map_empty, a, b),
            keyframes.insert(c.sm_kfs, new_pose),
            c.sm_kfs,
        )

        # ---- 12. bad-first-ICP restart ----
        restart = (~accepted) & (c.traj_len == 1) & active
        traj_len = jnp.where(restart, 0, traj_len)
        update_local_map = update_local_map & ~restart & active

        # ---- 13. local-map update (obs2map_merge graph over all layers) ----
        env_map = dict(env_kf)
        layer_defs = {d.name: d for d in spec.map_layers}
        maps_pre: Dict[str, Any] = {}
        for name, d in layer_defs.items():
            m0 = c.maps[name]
            voxel_size = jnp.where(
                map_empty & active, d.voxel_size(env_map), m0.voxel_size
            )
            m0 = maps_ops.set_voxel_size(m0, voxel_size)
            m0 = jax.tree_util.tree_map(
                lambda a, b: jnp.where(restart, a, b), maps_ops.clear(m0), m0
            )
            maps_pre[name] = m0

        # The merge + prune graph runs UNCONDITIONALLY with masked inserts:
        # non-keyframe scans carry ``valid=False`` points, whose scatter
        # indices all drop (the reference only touches the map on KF frames,
        # LidarOdometry.cpp:1161-1206 — same observable state).  A lax.cond
        # here would not help: under vmap both branches execute anyway, and
        # the cond's whole-table select_n cost ~3 ms/step at B=8 in the
        # round-2 device profile.  Eviction is a rolling-slab sweep (see
        # voxel_hash.prune_farther_than_slab) instead of the full-table
        # column write (~12 ms/step saved).
        maps_post = dict(maps_pre)
        ins_stats = None
        for op in spec.map_inserts:
            insert_pc = layers_f.get(op.input_layer)
            if insert_pc is None:
                insert_pc = layers_f[spec.icp_local_layer]
            insert_global = insert_pc._replace(
                xyz=se3.transform(new_pose, insert_pc.xyz),
                valid=insert_pc.valid & update_local_map,
            )
            maps_post[op.target_map_layer], st = maps_ops.insert_stats(
                maps_post[op.target_map_layer],
                insert_global,
                sensor_origin=new_pose.t,
                layer_def=layer_defs[op.target_map_layer],
            )
            ins_stats = st if ins_stats is None else ins_stats + st
        for name, d in layer_defs.items():
            prune_dist = d.remove_voxels_farther_than(env_map)
            maps_post[name] = maps_ops.prune_farther_than_amortized(
                maps_post[name], new_pose.t, prune_dist, c.frame_idx
            )
        m_final = maps_post
        if ins_stats is None:
            from mola_lidar_odometry_tpu.ops.voxel_hash import InsertStats

            ins_stats = InsertStats.zero()

        icp_layer_pc = layers_f.get(spec.icp_local_layer, raw_pc)
        if spec.map_inserts:
            map_layer_pc = layers_f.get(
                spec.map_inserts[0].input_layer, icp_layer_pc
            )
        else:
            map_layer_pc = icp_layer_pc

        out = StepOutput(
            pose_R=new_pose.R,
            pose_t=new_pose.t,
            stamp=stamp,
            quality=quality,
            sigma=sigma,
            iterations=iters,
            twist=nav_est.twist,
            processed=obs_valid,
            accepted=accepted & obs_valid,
            kf_local=update_local_map & obs_valid,
            kf_simplemap=(update_simplemap & distance_enough_sm) | (map_empty & jnp.asarray(sm_generate)),
            sm_insert=update_simplemap | (map_empty & jnp.asarray(sm_generate)),
            map_restarted=restart,
            est_range=est_range,
            n_raw=raw_pc.count().astype(jnp.int32),
            n_icp_layer=icp_layer_pc.count().astype(jnp.int32),
            n_map_layer=map_layer_pc.count().astype(jnp.int32),
            corrections=corrections,
            map_collision_drops=ins_stats.collision_drops,
            map_full_drops=ins_stats.full_drops,
            deferred_drops=ins_stats.deferred_drops,
        )

        new_carry = Carry(
            pose_R=new_pose.R,
            pose_t=new_pose.t,
            last_time=stamp,
            first_time=first_time,
            frame_idx=c.frame_idx + 1,
            traj_len=traj_len,
            sigma=sigma,
            last_icp_quality=quality,
            last_icp_iters=iters.astype(jnp.float32),
            twist_corr_count=corrections.astype(jnp.float32),
            est_range=est_range,
            inst_range=inst,
            nav=nav1,
            maps=m_final,
            lm_kfs=lm_kfs,
            sm_kfs=sm_kfs,
            removal_counter=removal_counter,
            last_twist=nav_est.twist,
            has_twist=nav_est.valid,
            map_has_content=(c.map_has_content | update_local_map) & ~restart,
            mapping_enabled=c.mapping_enabled,
        )

        # Inactive frame (invalid observation / min-time drop): keep ALL
        # state unchanged (reference discards the scan before any state
        # mutation, :749-755).  The maps are EXCLUDED from this rollback
        # select: their update path is already masked by ``active`` (no-op
        # scatters + unbumped epoch), and selecting over the map tables
        # would cost a whole-table copy chain per step under vmap.
        guarded = jax.tree_util.tree_map(
            lambda a, b: jnp.where(active, a, b),
            new_carry._replace(maps=c.maps),
            c._replace(first_time=first_time),
        )
        new_carry = guarded._replace(maps=new_carry.maps)

        # Dropped frames report the reference's "skipped" output contract.
        drop_out = StepOutput(
            pose_R=c.pose_R, pose_t=c.pose_t, stamp=stamp,
            quality=jnp.float32(0.0), sigma=c.sigma, iterations=jnp.int32(0),
            twist=c.last_twist,
            processed=jnp.asarray(False), accepted=jnp.asarray(False),
            kf_local=jnp.asarray(False), kf_simplemap=jnp.asarray(False),
            sm_insert=jnp.asarray(False), map_restarted=jnp.asarray(False),
            est_range=c.est_range,
            n_raw=jnp.int32(0), n_icp_layer=jnp.int32(0),
            n_map_layer=jnp.int32(0),
            corrections=jnp.int32(0),
            map_collision_drops=jnp.int32(0), map_full_drops=jnp.int32(0),
            deferred_drops=jnp.int32(0),
        )
        out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(~drop, a, b), out, drop_out
        )
        return new_carry, out

    def step(c: Carry, scan: Scan) -> Tuple[Carry, StepOutput]:
        # ---- 1. min-time-between-scans drop (masked whole-step skip;
        # a lax.cond would still execute both branches under vmap and add
        # a whole-carry select over the map tables) ----
        drop = (scan.stamp - c.last_time) < spec.min_time_between_scans
        return process(c, scan, drop)

    return step
