"""The ICP iteration loop as a single XLA program (lax.while_loop).

TPU rebuild of ``mp2p_icp::ICP::align`` as exercised by the reference
odometry (module/src/LidarOdometry.cpp:916-1024; built from YAML by
``icp_pipeline_from_yaml``, :115-123):

  iterate {  matchers (NN / point-to-plane under annealed thresholds)
             -> solver (Horn while coarse, then robust Gauss-Newton)
             -> convergence check (minAbsStep_trans / minAbsStep_rot)  }
  then quality = paired ratio  (QualityEvaluator_PairedRatio)

Multi-matcher semantics follow the pipeline YAMLs: each matcher pairs one
local point layer against one global (local-map) layer with its own runtime
threshold expression and weight (e.g. lidar3d-ndt.yaml:195-211 runs
Matcher_Point2Plane *and* a point-to-point fallback each iteration;
near-far/dual-map configs run several point matchers).  Solver sequencing
follows extras/icp-pipeline_no_motion_model.yaml:24-36: a closed-form Horn
stage handles coarse alignment until its translation correction drops below
``runUntilTranslationCorrectionSmallerThan``, then Gauss-Newton refines.

The per-iteration dynamic variables (``ICP_ITERATION``) feed the annealed
matcher-threshold and robust-kernel expressions exactly like the reference's
ParameterSource re-realization.  The iteration-hook semantics used for twist
re-optimization (LidarOdometry.cpp:923-952) appear as a loop-exit condition:
when the accumulated pose delta from the align() start exceeds the
configured thresholds the loop stops with ``hook_stop=True`` and the caller
(models/step.py) re-deskews and re-enters with the remaining budget.

Everything is fixed-shape; candidates come from the 27-voxel neighborhood
gathers in ops/voxel_hash, ops/ndt, ops/occupancy.  Iteration count is
data-dependent via ``lax.while_loop`` so converged frames exit early.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mola_lidar_odometry_tpu.ops import maps as maps_ops, se3
from mola_lidar_odometry_tpu.ops.se3 import Pose
from mola_lidar_odometry_tpu.ops.solver import (
    PairingBlock,
    PosePrior,
    solve_gauss_newton_blocks,
    solve_horn,
)
from mola_lidar_odometry_tpu.utils.expr import Expr


@dataclass(frozen=True)
class MatcherCfg:
    """One matcher entry (Matcher_Points_DistanceThreshold / Matcher_Point2Plane
    x one pointLayerMatches row)."""

    kind: str = "point2point"  # or "point2plane"
    local_layer: str = "decimated_for_icp"
    global_layer: str = "localmap"
    threshold: Expr = field(default_factory=lambda: Expr("2.0*ADAPTIVE_THRESHOLD_SIGMA"))
    # range-proportional threshold growth: effective threshold for a local
    # point at sensor range r is ``threshold + r*sin(thresholdAngularDeg)``
    # (reference pipelines/lidar3d-default.yaml:199, lidar2d.yaml:155)
    threshold_angular_deg: float = 0.0
    pairings_per_point: int = 1
    weight: float = 1.0
    run_from_iteration: int = 0
    run_up_to_iteration: int = 0  # 0 = unbounded
    # ``allowMatchAlreadyMatchedGlobalPoints: false`` = one-to-one pairing:
    # each global point is claimed by at most one local point (the lowest-
    # index claimant wins, mirroring the reference's in-order greedy pass;
    # reference pipelines/lidar3d-default.yaml:200)
    allow_match_already_matched: bool = True
    # point2plane against point maps (on-the-fly plane fit; rgbd.yaml:143-151)
    search_radius: float = 0.8
    min_plane_points: int = 6
    plane_eigen_threshold: float = 1e-2


@dataclass(frozen=True)
class HornCfg:
    """Closed-form Horn stage ahead of GN (Solver_Horn)."""

    run_until_translation_correction_smaller_than: float = 5e-4


@dataclass(frozen=True)
class IcpConfig:
    """Static ICP configuration compiled from a pipeline YAML block."""

    max_iterations: int = 300
    min_abs_step_trans: float = 1e-4
    min_abs_step_rot: float = 5e-5
    matchers: Tuple[MatcherCfg, ...] = (MatcherCfg(),)
    kernel_param: Expr = field(default_factory=lambda: Expr("0.5*ADAPTIVE_THRESHOLD_SIGMA"))
    gn_inner_iterations: int = 2
    horn: Optional[HornCfg] = None
    # voxel-probe footprint per NN query: 27 = full 3x3x3 (reference-parity,
    # exact within one voxel); 8 = nearest 2x2x2 block (exact within half a
    # voxel, ~3x cheaper gathers; fine once tracking has converged)
    nn_neighbors: int = 27
    # Reduce each probed voxel's K points to the capture-pose nearest,
    # leaving P candidates/query (closest-point-per-voxel; see
    # voxel_hash.capture).  Cuts per-iteration streaming volume K-fold.
    per_voxel_nn: bool = False
    # Pallas fused NN-select kernel for cached point-map candidates
    # (ops/pallas_match.py); MOLA_TPU_PALLAS=1.  Only affects
    # single-pairing point-to-point matchers with capture-once enabled.
    use_pallas: bool = False
    # Anderson acceleration depth over the fixed-point pose iteration
    # (AA-ICP, Pavlov et al., arXiv:1709.05479 — PAPERS.md): 0 = off
    # (reference-parity), m>=2 extrapolates from the last m (pose, update)
    # pairs in the tangent space with a residual-growth safeguard.  Cuts the
    # iteration count roughly in half on the KITTI-like benchmark.
    anderson_m: int = 0
    # iteration-hook (twist re-optimization) thresholds; 0 disables
    hook_min_trans: float = 0.0
    hook_min_rot: float = 0.0


class IcpResult(NamedTuple):
    pose: Pose
    quality: jax.Array  # () f32 in [0, 1]
    iterations: jax.Array  # () i32 — iterations consumed by this align()
    hook_stop: jax.Array  # () bool — stopped by the twist-reopt hook
    converged: jax.Array  # () bool


def _capture_all(
    cfg: IcpConfig,
    maps: Dict[str, Any],
    layers: Dict[str, Tuple[jax.Array, jax.Array]],
    pose: Pose,
) -> Tuple[Any, ...]:
    """One neighborhood capture per matcher at ``pose`` (the only memory-
    bound part of matching: a single fused gather per matcher)."""
    sets = []
    for mc in cfg.matchers:
        xyz, _ = layers[mc.local_layer]
        q = se3.transform(pose, xyz)
        # per-voxel reduction only applies to single-pairing point matchers
        # (2-NN needs at least two candidates per voxel to stay exact)
        pvnn = cfg.per_voxel_nn and mc.kind == "point2point" and mc.pairings_per_point == 1
        sets.append(
            maps_ops.capture(maps[mc.global_layer], q, cfg.nn_neighbors, pvnn)
        )
    return tuple(sets)


def _matcher_blocks(
    cfg: IcpConfig,
    candsets: Tuple[Any, ...],
    layers: Dict[str, Tuple[jax.Array, jax.Array]],
    pose: Pose,
    env_it: Dict[str, jax.Array],
    it: jax.Array,
) -> Tuple[List[PairingBlock], jax.Array, jax.Array]:
    """Match every matcher's cached candidates at ``pose`` (pure compute);
    returns (blocks, paired, n_local)."""
    blocks: List[PairingBlock] = []
    paired = jnp.float32(0.0)
    n_local = jnp.float32(0.0)
    for mc, cand in zip(cfg.matchers, candsets):
        xyz, valid = layers[mc.local_layer]
        thr = jnp.asarray(mc.threshold(env_it), jnp.float32)
        if mc.threshold_angular_deg > 0:
            # thresholdAngularDeg: the matching threshold grows with the
            # local point's sensor range (reference Matcher_Points_
            # DistanceThreshold; pipelines/lidar2d.yaml:155)
            rng_pt = jnp.linalg.norm(xyz, axis=-1)
            thr = thr + rng_pt * math.sin(math.radians(mc.threshold_angular_deg))
        active = it >= mc.run_from_iteration
        if mc.run_up_to_iteration > 0:
            active = active & (it <= mc.run_up_to_iteration)
        q = se3.transform(pose, xyz)
        if mc.kind == "point2plane":
            tgt, nrm, d2, found = maps_ops.match_p2pl(
                cand,
                q,
                valid,
                search_radius=mc.search_radius,
                min_plane_points=mc.min_plane_points,
                plane_eigen_threshold=mc.plane_eigen_threshold,
            )
            pv = found & (d2 < thr * thr) & active
            blocks.append(PairingBlock("p2pl", xyz, tgt, nrm, pv, mc.weight))
        elif mc.pairings_per_point >= 2:
            tgt2, d22, found2 = maps_ops.match_p2p2(cand, q, valid)
            thr2 = thr[..., None] if jnp.ndim(thr) else thr
            pv2 = found2 & (d22 < thr2 * thr2) & active[..., None]
            z = jnp.zeros_like(xyz)
            blocks.append(PairingBlock("p2p", xyz, tgt2[:, 0], z, pv2[:, 0], mc.weight))
            blocks.append(PairingBlock("p2p", xyz, tgt2[:, 1], z, pv2[:, 1], mc.weight))
            pv = pv2[:, 0]
        else:
            tgt, d2, found = maps_ops.match_p2p(cand, q, valid)
            pv = found & (d2 < thr * thr) & active
            if not mc.allow_match_already_matched:
                pv = _one_to_one(tgt, d2, pv)
            blocks.append(PairingBlock("p2p", xyz, tgt, jnp.zeros_like(xyz), pv, mc.weight))
        paired = paired + jnp.sum(pv).astype(jnp.float32)
        n_local = n_local + jnp.sum(valid).astype(jnp.float32)
    return blocks, paired, n_local


def _one_to_one(tgt: jax.Array, d2: jax.Array, pv: jax.Array) -> jax.Array:
    """``allowMatchAlreadyMatchedGlobalPoints: false``: keep at most one
    pairing per global point — the lowest-index local claimant wins (the
    reference's greedy in-order pass over local points).

    Global-point identity comes from quantized coordinates (1 mm cells)
    hashed into a claim table; a hash collision can drop a legitimate pair,
    with the same rarity/impact as the map's own slot collisions."""
    from mola_lidar_odometry_tpu.ops.filters import voxel_coords, voxel_hash

    table = 1 << 16
    key = voxel_hash(voxel_coords(tgt, 1e-3), table)
    n = tgt.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(n)
    claim = jnp.full((table,), big, jnp.int32).at[key].min(
        jnp.where(pv, idx, big), mode="drop"
    )
    return pv & (claim[key] == idx)


def _fused_eligible(cfg: IcpConfig) -> bool:
    """Static eligibility of the fully-fused Pallas align kernel."""
    if len(cfg.matchers) != 1 or cfg.anderson_m >= 2 or cfg.horn is not None:
        return False
    mc = cfg.matchers[0]
    return (
        mc.kind == "point2point"
        and mc.pairings_per_point == 1
        and mc.run_from_iteration == 0
        and mc.run_up_to_iteration == 0
        and mc.allow_match_already_matched
        and mc.threshold_angular_deg == 0.0
    )


# Mid-align candidate refresh: after this many iterations the pose has
# absorbed most of its correction; one recapture there makes the top-2
# per-voxel candidate view effectively exact for the remaining (annealing)
# iterations.  Measured on the 12-frame sim: worst log-norm 0.58 with stale
# top-1, 0.39 with stale top-2, ~exact-path (0.25) with top-2 + refresh.
_FUSED_REFRESH_AT = 8


def _align_fused_call(cfg, maps, layers, init_pose, prior, env, budget) -> IcpResult:
    """Evaluate the per-iteration expression tables and run the fused kernel
    (ops/pallas_icp.align_fused), with one mid-align candidate recapture."""
    from mola_lidar_odometry_tpu.ops import pallas_icp

    mc = cfg.matchers[0]
    xyz, valid = layers[mc.local_layer]
    maxit = cfg.max_iterations
    env_vec = dict(env)
    env_vec["ICP_ITERATION"] = jnp.arange(maxit, dtype=jnp.float32)
    thr_tab = jnp.broadcast_to(
        jnp.asarray(mc.threshold(env_vec), jnp.float32), (maxit,)
    )
    kc_tab = jnp.broadcast_to(
        jnp.asarray(cfg.kernel_param(env_vec), jnp.float32), (maxit,)
    )
    interpret = jax.default_backend() != "tpu"
    budget = jnp.asarray(budget, jnp.int32)

    # Fused Pallas capture (ops/pallas_capture.py): gather + top-2 reduction
    # in one kernel, emitting candidates already in the align kernel's
    # planar VMEM layout.  TPU only (its interpret mode is minutes-slow; the
    # CPU test path keeps the XLA capture, which is semantically identical).
    import os as _os

    _cap_env = _os.environ.get("MOLA_TPU_PALLAS_CAPTURE")
    use_planar_capture = (
        (not interpret) if _cap_env is None else _cap_env == "1"
    )
    from mola_lidar_odometry_tpu.ops.voxel_hash import VoxelHashMap as _VHM

    mc0 = cfg.matchers[0]
    m0 = maps.get(mc0.global_layer)
    use_planar_capture = (
        use_planar_capture
        and isinstance(m0, _VHM)
        and cfg.per_voxel_nn
        and m0.points_per_voxel > 2
        and m0.stride <= 128  # kernel window-select: W = 128 // stride ways
    )

    def capture_at(pose, nbr, return_rows=False):
        if use_planar_capture:
            from mola_lidar_odometry_tpu.ops import pallas_capture

            q = se3.transform(pose, xyz)  # identical to _capture_all's q
            return pallas_capture.capture_planar(
                m0.data, m0.voxel_size, m0.epoch, q, nbr,
                interpret=interpret, K=m0.K, stride=m0.stride, valid=valid,
                return_rows=return_rows,
            )
        cfg_n = (
            cfg
            if nbr == cfg.nn_neighbors
            else dataclasses.replace(cfg, nn_neighbors=nbr)
        )
        return _capture_all(cfg_n, maps, layers, pose)[0]

    def run(cs, pose0, it0, remaining):
        if use_planar_capture:
            return pallas_icp.align_fused(
                None,
                None,
                xyz,
                valid,
                pose0.R,
                pose0.t,
                prior.mean.R,
                prior.mean.t,
                prior.info,
                thr_tab,
                kc_tab,
                remaining,
                min_abs_step_trans=cfg.min_abs_step_trans,
                min_abs_step_rot=cfg.min_abs_step_rot,
                hook_min_trans=cfg.hook_min_trans,
                hook_min_rot=cfg.hook_min_rot,
                weight=mc0.weight,
                gn_inner=cfg.gn_inner_iterations,
                maxit_static=maxit,
                interpret=interpret,
                it0=it0,
                hook_ref_R=init_pose.R,
                hook_ref_t=init_pose.t,
                planar=cs,
            )
        return pallas_icp.align_fused(
            cs.pts,
            cs.mask,
            xyz,
            valid,
            pose0.R,
            pose0.t,
            prior.mean.R,
            prior.mean.t,
            prior.info,
            thr_tab,
            kc_tab,
            remaining,
            min_abs_step_trans=cfg.min_abs_step_trans,
            min_abs_step_rot=cfg.min_abs_step_rot,
            hook_min_trans=cfg.hook_min_trans,
            hook_min_rot=cfg.hook_min_rot,
            weight=mc.weight,
            gn_inner=cfg.gn_inner_iterations,
            maxit_static=maxit,
            interpret=interpret,
            it0=it0,
            hook_ref_R=init_pose.R,
            hook_ref_t=init_pose.t,
        )

    # Phase-1 probe footprint: candidates feed only the COARSE leg (the
    # first _FUSED_REFRESH_AT robust-GN iterations, annealing from 2*sigma);
    # the phase-2 refresh re-captures the full footprint at the settled
    # pose.  A containing-voxel-only (1-probe) phase-1 was A/B'd on device
    # (round 4): +11% throughput (674 vs 606 scans/s/chip at B=8) but the
    # coarse leg loses cross-voxel-face NNs at KITTI speeds and the single
    # refresh cannot absorb the bias (bench GT drift 0.345 vs 0.221, guard
    # ceiling 0.25) — so the default stays the config's full footprint
    # (cfg.nn_neighbors — an explicit MOLA_TPU_NN_NEIGHBORS=27 override
    # keeps all 27 probes in phase 1 too).
    # MOLA_TPU_PHASE1_NEIGHBORS=1/4 narrows the coarse leg for A/B.
    _p1_env = _os.environ.get("MOLA_TPU_PHASE1_NEIGHBORS")
    phase1_nbr = (
        cfg.nn_neighbors if _p1_env is None else min(cfg.nn_neighbors, int(_p1_env))
    )
    # Refresh-by-reselect (default): keep the phase-1 gathered bucket rows
    # alive and let phase 2 re-run only the top-2 selection kernel against
    # the settled pose — the hook bound guarantees the phase-1 footprint
    # still covers the moved queries, so this both SKIPS the refresh row
    # gather (the step's dominant instruction class) and re-ranks over the
    # FULL 8-probe footprint instead of a narrowed re-gather.
    # MOLA_TPU_REFRESH_RESELECT=0 falls back to a fresh phase-2 gather.
    reselect_on = (
        use_planar_capture
        and _os.environ.get("MOLA_TPU_REFRESH_RESELECT", "1") == "1"
    )
    if reselect_on:
        cx0, cy0, cz0, cm0, rows0 = capture_at(
            init_pose, phase1_nbr, return_rows=True
        )
        cs0 = (cx0, cy0, cz0, cm0)
    else:
        cs0 = capture_at(init_pose, phase1_nbr)
    b1 = jnp.minimum(budget, _FUSED_REFRESH_AT)
    R1, t1, it1, hook1, conv1, q1 = run(cs0, init_pose, jnp.int32(0), b1)
    pose1 = Pose(R1, t1)

    def phase2(_):
        if reselect_on:
            from mola_lidar_odometry_tpu.ops import pallas_capture

            cs1 = pallas_capture.capture_planar_reselect(
                rows0, m0.voxel_size, m0.epoch,
                se3.transform(pose1, xyz), se3.transform(init_pose, xyz),
                phase1_nbr, interpret=interpret, K=m0.K, stride=m0.stride,
                valid=valid,
            )
        else:
            # Fresh phase-2 gather (reselect off): narrow to the 4-probe
            # footprint (containing voxel + the 3 face neighbors on the
            # query's octant side) for the dense 8-probe default — phase 2
            # starts within the hook bound (<= ~0.15 m) of the settled pose
            # and the annealed threshold is small by iteration >=
            # _FUSED_REFRESH_AT.  Device A/B (B=8, 131k pts): 8-probe 731.5
            # scans/s GT 0.137, 4-probe 784.7 GT 0.143 (guard 0.20), 1-probe
            # 852.7 GT 0.189 (rejected — accuracy).  Wider footprints
            # (27-probe configs) keep their full footprint on the refresh.
            # MOLA_TPU_REFRESH_NEIGHBORS overrides for device A/B.
            _refresh_default = 4 if phase1_nbr == 8 else phase1_nbr
            refresh_nbr = min(
                cfg.nn_neighbors,
                int(
                    _os.environ.get(
                        "MOLA_TPU_REFRESH_NEIGHBORS", str(_refresh_default)
                    )
                ),
            )
            cs1 = capture_at(pose1, refresh_nbr)
        R2, t2, it2, hook2, conv2, q2 = run(cs1, pose1, it1, budget - it1)
        return R2, t2, it1 + it2, hook2, conv2, q2

    def keep(_):
        return R1, t1, it1, hook1, conv1, q1

    # Phase 2 runs even when phase 1 "converged": a stale-candidate fixed
    # point is exactly where the top-2 approximation errs, and confirming /
    # correcting it against FRESH candidates costs 1-2 extra iterations.
    # Only a hook stop (caller re-deskews and re-enters) or an exhausted
    # budget skips the refresh.  (Under vmap the cond lowers to both
    # branches, so the refresh capture gather is paid on EVERY batched
    # step; MOLA_TPU_FUSED_REFRESH=0 disables phase 2 statically for A/B
    # measurement — the refresh leg is ~2 ms of the B=8 step.)
    import os as _os

    # Static single-phase: a config whose own iteration budget never
    # extends past the refresh point runs the plain capture-once
    # algorithm — identical to the XLA loop (tests/test_pallas_icp.py::
    # test_fused_matches_xla_path_single_phase gates this equivalence;
    # with the narrowed 4-probe refresh footprint a post-convergence
    # re-capture is no longer a numerical no-op, so it must not fire on
    # budgets that end at the refresh point).
    single_phase = cfg.max_iterations <= _FUSED_REFRESH_AT
    if single_phase or _os.environ.get("MOLA_TPU_FUSED_REFRESH", "1") == "0":
        R, t, iters, hook, converged, quality = keep(None)
    else:
        need2 = (~hook1) & (budget > it1)
        R, t, iters, hook, converged, quality = jax.lax.cond(
            need2, phase2, keep, None
        )
    return IcpResult(
        pose=Pose(R, t),
        quality=quality,
        iterations=iters,
        hook_stop=hook,
        converged=converged,
    )


def align(
    maps: Dict[str, Any],  # name -> map-layer state (voxel/ndt/occupancy)
    layers: Dict[str, Tuple[jax.Array, jax.Array]],  # name -> (xyz, valid)
    init_pose: Pose,
    prior: PosePrior,
    cfg: IcpConfig,
    env: Dict[str, jax.Array],
    max_iterations=None,  # traced remaining-budget override (optional)
) -> IcpResult:
    """Run the matcher->solver loop from ``init_pose`` until convergence,
    budget exhaustion, or an iteration-hook stop."""

    budget = jnp.asarray(
        cfg.max_iterations if max_iterations is None else max_iterations, jnp.int32
    )
    hook_on = cfg.hook_min_trans > 0 or cfg.hook_min_rot > 0
    m_aa = cfg.anderson_m

    # Capture-once matching: when the twist-reopt hook bounds the in-align
    # pose correction (<= hook_min_trans ~ 0.15 m, far below the probe
    # margin), the neighborhood candidate set gathered at the ENTRY pose
    # stays a superset of the true neighborhood for the whole align(), so
    # the gather leaves the iteration loop entirely (iterations become pure
    # compute).  Without the hook (and with a Horn coarse stage) corrections
    # can exceed a voxel, so candidates are re-captured every iteration.
    cache_ok = hook_on and cfg.horn is None

    # Fully-fused Pallas align (ops/pallas_icp.py): the whole while-loop in
    # one kernel with the candidates VMEM-resident.  Covers the shipped hot
    # path (one p2p matcher, 1 pairing, capture-once, no Horn/Anderson) with
    # candidate sets small enough for VMEM (top-2-per-voxel view, C <= 64).
    if cache_ok and cfg.use_pallas and _fused_eligible(cfg):
        from mola_lidar_odometry_tpu.ops.voxel_hash import VoxelHashMap as _VHM

        mc0 = cfg.matchers[0]
        m0 = maps.get(mc0.global_layer)
        n_local = layers[mc0.local_layer][0].shape[-2]
        if isinstance(m0, _VHM) and cfg.per_voxel_nn and m0.points_per_voxel > 2:
            c_static = 2 * cfg.nn_neighbors  # top-2 per probed voxel
            if c_static <= 64 and n_local <= 16384:
                return _align_fused_call(
                    cfg, maps, layers, init_pose, prior, env, budget
                )

    def _maybe_planar(sets):
        if not cfg.use_pallas:
            return sets
        from mola_lidar_odometry_tpu.ops import pallas_match
        from mola_lidar_odometry_tpu.ops.voxel_hash import CandSet as _VCS

        out = []
        for mc, cs in zip(cfg.matchers, sets):
            if (
                isinstance(cs, _VCS)
                and mc.kind == "point2point"
                and mc.pairings_per_point == 1
            ):
                out.append(pallas_match.to_planar(cs))
            else:
                out.append(cs)
        return tuple(out)

    candsets0 = _maybe_planar(_capture_all(cfg, maps, layers, init_pose))

    def get_candsets(pose, it):
        if cache_ok:
            return candsets0
        return _maybe_planar(_capture_all(cfg, maps, layers, pose))

    def solver_update(pose, it, horn_active, env_it):
        """One matcher + solver pass: the fixed-point map G(pose)."""
        kernel_c = cfg.kernel_param(env_it)
        blocks, _, _ = _matcher_blocks(
            cfg, get_candsets(pose, it), layers, pose, env_it, it
        )
        gn_pose, _ = solve_gauss_newton_blocks(
            pose, blocks, kernel_c, prior, cfg.gn_inner_iterations
        )
        if cfg.horn is not None and not any(b.kind == "p2p" for b in blocks):
            # Horn needs point-to-point pairings; a pipeline configuring
            # Solver_Horn with only point2plane matchers would otherwise
            # concatenate an empty list at trace time.  Skip the stage.
            return gn_pose, jnp.asarray(False)
        if cfg.horn is not None:
            p2p = [b for b in blocks if b.kind == "p2p"]
            p_all = jnp.concatenate([b.p_local for b in p2p], axis=0)
            q_all = jnp.concatenate([b.q_global for b in p2p], axis=0)
            v_all = jnp.concatenate([b.valid for b in p2p], axis=0)
            horn_pose = solve_horn(p_all, q_all, v_all)
            new_pose = Pose(
                jnp.where(horn_active, horn_pose.R, gn_pose.R),
                jnp.where(horn_active, horn_pose.t, gn_pose.t),
            )
            horn_step = jnp.linalg.norm(horn_pose.t - pose.t)
            horn_active = horn_active & (
                horn_step >= cfg.horn.run_until_translation_correction_smaller_than
            )
        else:
            new_pose = gn_pose
        return new_pose, horn_active

    def body(state):
        pose, it, _, _, horn_active, X, Fh, hlen = state
        env_it = dict(env)
        env_it["ICP_ITERATION"] = it.astype(jnp.float32)

        new_pose, horn_active = solver_update(pose, it, horn_active, env_it)

        if m_aa >= 2:
            # Anderson acceleration in the tangent space at init_pose
            # (AA-ICP): x = log(init^-1 pose), f = G(x) - x; extrapolate
            # x+ = sum_i a_i (X_i + F_i) with sum a = 1 minimizing |F a|.
            x_cur = se3.se3_log(se3.relative(init_pose, pose))
            x_new = se3.se3_log(se3.relative(init_pose, new_pose))
            f_cur = x_new - x_cur
            # shift history (newest last)
            X2 = jnp.concatenate([X[1:], x_cur[None]], axis=0)
            F2 = jnp.concatenate([Fh[1:], f_cur[None]], axis=0)
            hlen2 = jnp.minimum(hlen + 1, m_aa)
            hmask = (jnp.arange(m_aa) >= (m_aa - hlen2)).astype(jnp.float32)
            # solve min |F a|^2 s.t. 1'a = 1 via normal equations + Lagrange:
            # a = M^-1 1 / (1' M^-1 1), M = F F' (+ reg), masked rows pinned
            M = (F2 * hmask[:, None]) @ (F2 * hmask[:, None]).T
            M = M + 1e-10 * jnp.trace(M) * jnp.eye(m_aa) + 1e-12 * jnp.eye(m_aa)
            # pin unused history slots to a=0 by giving them huge diagonal
            M = M + (1.0 - hmask)[:, None] * (1.0 - hmask)[None, :] * 1e12 * jnp.eye(m_aa)
            ones = hmask  # only live rows participate in the sum-to-1
            Minv_1 = jnp.linalg.solve(M, ones)
            denom = jnp.sum(ones * Minv_1)
            alpha = Minv_1 / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
            x_aa = jnp.sum(alpha[:, None] * (X2 + F2) * hmask[:, None], axis=0)
            aa_pose = se3.compose(init_pose, se3.se3_exp(x_aa))
            # Safeguards (AA-ICP §III): require >=2 usable residuals, finite
            # well-conditioned mixing (bounded coefficients), monotone
            # residuals, and an extrapolation that stays within the scale of
            # the plain update — otherwise take the un-accelerated step.
            prev_f = Fh[-1]
            fn = jnp.linalg.norm(f_cur)
            ok = (
                (hlen2 >= 2)
                & jnp.all(jnp.isfinite(x_aa))
                & (jnp.max(jnp.abs(alpha * hmask)) <= 2.0)
                & (fn <= jnp.linalg.norm(prev_f) * 1.5 + 1e-6)
                & (jnp.linalg.norm(x_aa - x_new) <= 3.0 * fn)
                & ~horn_active
            )
            new_pose = Pose(
                jnp.where(ok, aa_pose.R, new_pose.R),
                jnp.where(ok, aa_pose.t, new_pose.t),
            )
            X, Fh, hlen = X2, F2, hlen2

        dt, dr = se3.pose_error_norms(pose, new_pose)
        converged = (dt < cfg.min_abs_step_trans) & (dr < cfg.min_abs_step_rot)

        if hook_on:
            ht, hr = se3.pose_error_norms(init_pose, new_pose)
            hook = (ht > cfg.hook_min_trans) | (hr > cfg.hook_min_rot)
        else:
            hook = jnp.asarray(False)
        return new_pose, it + 1, converged, hook, horn_active, X, Fh, hlen

    def cond(state):
        _, it, converged, hook = state[:4]
        return (~converged) & (~hook) & (it < budget)

    m_hist = max(m_aa, 1)
    state0 = (
        init_pose,
        jnp.int32(0),
        jnp.asarray(False),
        jnp.asarray(False),
        jnp.asarray(cfg.horn is not None),
        jnp.zeros((m_hist, 6), jnp.float32),
        jnp.zeros((m_hist, 6), jnp.float32),
        jnp.int32(0),
    )
    pose, it, converged, hook = jax.lax.while_loop(cond, body, state0)[:4]

    # Quality: paired ratio at the final pose/threshold
    env_q = dict(env)
    env_q["ICP_ITERATION"] = it.astype(jnp.float32)
    _, paired, n_local = _matcher_blocks(
        cfg, get_candsets(pose, it), layers, pose, env_q, it
    )
    quality = paired / jnp.maximum(n_local, 1.0)

    return IcpResult(pose=pose, quality=quality, iterations=it, hook_stop=hook, converged=converged)
