"""Robust SE(3) alignment solvers: Gauss-Newton and Horn closed form.

TPU equivalents of ``mp2p_icp::Solver_GaussNewton`` (robust kernel
GemanMcClure, inner ``maxIterations``, optional Gaussian pose prior —
reference pipelines/lidar3d-default.yaml:184-190, prior path
module/src/LidarOdometry.cpp:859-877) and ``mp2p_icp::Solver_Horn``
(pipelines/extras/icp-pipeline_no_motion_model.yaml:24-29).

The normal equations are built as one batched einsum reduction over all
(padded) pairings — J is (N, 3, 6), H = sum w J^T J collapses to a matmul
that XLA tiles onto the MXU — and solved as a damped 6x6 system.  The prior
enters as an extra quadratic term ``|log(prior^-1 T)|^2_Info`` with identity
Jacobian approximation (valid for the small residuals the motion model
produces).

Tangent ordering everywhere: [rho(3) translation, phi(3) rotation], with
left-multiplicative updates ``T <- exp(eps) T``.  A prior information matrix
with large entries at indices 2/3/4 (z, rot_x, rot_y) realizes the
reference's SE(2) pinning for 2D scans (LidarOdometry.cpp:863-876).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

from mola_lidar_odometry_tpu.ops import se3
from mola_lidar_odometry_tpu.ops.se3 import Pose


class PosePrior(NamedTuple):
    """Gaussian prior on the solved pose: mean + 6x6 information (tangent)."""

    mean: Pose
    info: jax.Array  # (6, 6) f32; zeros = no prior

    @staticmethod
    def none() -> "PosePrior":
        return PosePrior(Pose.identity(), jnp.zeros((6, 6), jnp.float32))


def geman_mcclure_weight(r2: jax.Array, c) -> jax.Array:
    """IRLS weight of the Geman-McClure kernel with scale ``c``.

    rho(r) = r^2 / (r^2 + c^2)  =>  w(r) = (c^2 / (r^2 + c^2))^2.
    """
    c2 = c * c
    t = c2 / (r2 + c2)
    return t * t


class PairingBlock(NamedTuple):
    """One matcher's pairings for the solver.

    ``kind`` is static: "p2p" (3-dim residual ``Tp - q``) or "p2pl" (scalar
    residual ``n . (Tp - q)``, normals in ``nrm``).  ``weight`` is the
    matcher's layer weight (pointLayerMatches ``weight`` field).
    """

    kind: str
    p_local: jax.Array  # (N, 3)
    q_global: jax.Array  # (N, 3)
    nrm: jax.Array  # (N, 3); zeros for p2p
    valid: jax.Array  # (N,) bool
    weight: float


def _block_normal_equations(pose: Pose, blk: PairingBlock, kernel_c):
    """H, b, and robust-weight stats for one pairing block at ``pose``."""
    tp = se3.transform(pose, blk.p_local)  # (N, 3)
    n = blk.p_local.shape[0]
    K = se3.hat(tp)  # (N, 3, 3)
    I = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    J3 = jnp.concatenate([I, -K], axis=-1)  # (N, 3, 6) d(Tp)/d eps

    if blk.kind == "p2p":
        r = tp - blk.q_global
        r2 = jnp.sum(r * r, axis=-1)
        w = geman_mcclure_weight(r2, kernel_c) * blk.valid * blk.weight
        Jw = J3 * w[:, None, None]
        H = jnp.einsum("nij,nik->jk", Jw, J3, precision=_HI)
        b = jnp.einsum("nij,ni->j", Jw, r, precision=_HI)
    elif blk.kind == "p2pl":
        r = jnp.sum(blk.nrm * (tp - blk.q_global), axis=-1)  # (N,)
        J = jnp.einsum("ni,nij->nj", blk.nrm, J3, precision=_HI)  # (N, 6)
        w = geman_mcclure_weight(r * r, kernel_c) * blk.valid * blk.weight
        Jw = J * w[:, None]
        H = jnp.einsum("ni,nj->ij", Jw, J, precision=_HI)
        b = jnp.einsum("ni,n->i", Jw, r, precision=_HI)
    else:
        raise ValueError(blk.kind)
    return H, b


def gauss_newton_step_blocks(
    pose: Pose,
    blocks: Sequence[PairingBlock],
    kernel_c,
    prior: PosePrior,
    damping: float = 1e-8,
) -> Tuple[Pose, jax.Array]:
    """One robust GN update over heterogeneous pairing blocks + prior."""
    H = jnp.zeros((6, 6), jnp.float32)
    b = jnp.zeros((6,), jnp.float32)
    any_pair = jnp.asarray(False)
    for blk in blocks:
        Hb, bb = _block_normal_equations(pose, blk, kernel_c)
        H, b = H + Hb, b + bb
        any_pair = any_pair | (jnp.sum(blk.valid) > 0)

    rp = se3.se3_log(se3.relative(prior.mean, pose))
    H = H + prior.info
    b = b + prior.info @ rp

    scale = jnp.trace(H) / 6.0 + 1.0
    Hd = H + (damping * scale) * jnp.eye(6, dtype=jnp.float32)
    eps = -jnp.linalg.solve(Hd, b)
    ok = any_pair | (jnp.trace(prior.info) > 0)
    eps = jnp.where(ok, eps, 0.0)
    return se3.compose(se3.se3_exp(eps), pose), eps


def solve_gauss_newton_blocks(
    pose: Pose,
    blocks: Sequence[PairingBlock],
    kernel_c,
    prior: PosePrior,
    inner_iterations: int = 2,
) -> Tuple[Pose, jax.Array]:
    """The solver's inner loop over fixed pairings (Solver_GaussNewton
    ``maxIterations``)."""
    total = jnp.zeros((6,), jnp.float32)
    for _ in range(inner_iterations):
        pose, eps = gauss_newton_step_blocks(pose, blocks, kernel_c, prior)
        total = total + eps
    return pose, total


def gauss_newton_step(
    pose: Pose,
    p_local: jax.Array,  # (N, 3) local points (vehicle frame)
    q_global: jax.Array,  # (N, 3) paired map points
    pair_valid: jax.Array,  # (N,) bool
    kernel_c,  # robust kernel scale (traced scalar)
    prior: PosePrior,
    damping: float = 1e-8,
) -> Tuple[Pose, jax.Array]:
    """One Gauss-Newton update; returns (new pose, tangent increment)."""
    tp = se3.transform(pose, p_local)  # (N, 3)
    r = tp - q_global
    r2 = jnp.sum(r * r, axis=-1)
    w = geman_mcclure_weight(r2, kernel_c) * pair_valid

    # J_i = [ I | -[tp_i]x ]  (3x6); build H/b without materializing J:
    # H = [[ S*I3_weighted, -sum w [tp]x ], [ sum w [tp]x, -sum w [tp]x^2 ]]
    # Simpler and still fused: materialize J as (N, 3, 6) — XLA folds it.
    n = p_local.shape[0]
    K = se3.hat(tp)  # (N, 3, 3)
    I = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    J = jnp.concatenate([I, -K], axis=-1)  # (N, 3, 6)

    Jw = J * w[:, None, None]
    H = jnp.einsum("nij,nik->jk", Jw, J, precision=_HI)
    b = jnp.einsum("nij,ni->j", Jw, r, precision=_HI)

    # Prior term: residual log(prior_mean^{-1} pose), Jacobian ~ I
    rp = se3.se3_log(se3.relative(prior.mean, pose))
    H = H + prior.info
    b = b + prior.info @ rp

    scale = jnp.trace(H) / 6.0 + 1.0
    Hd = H + (damping * scale) * jnp.eye(6, dtype=jnp.float32)
    eps = -jnp.linalg.solve(Hd, b)
    # Guard: if there were no valid pairings and no prior, don't move.
    ok = (jnp.sum(pair_valid) > 0) | (jnp.trace(prior.info) > 0)
    eps = jnp.where(ok, eps, 0.0)
    new_pose = se3.compose(se3.se3_exp(eps), pose)
    return new_pose, eps


def solve_gauss_newton(
    pose: Pose,
    p_local: jax.Array,
    q_global: jax.Array,
    pair_valid: jax.Array,
    kernel_c,
    prior: PosePrior,
    inner_iterations: int = 2,
) -> Tuple[Pose, jax.Array]:
    """Run the solver's inner loop (re-linearize, keep pairings fixed).

    Matches Solver_GaussNewton ``maxIterations`` (2 in the default pipeline).
    Returns (pose, total tangent increment).
    """
    total = jnp.zeros((6,), jnp.float32)
    for _ in range(inner_iterations):
        pose, eps = gauss_newton_step(pose, p_local, q_global, pair_valid, kernel_c, prior)
        total = total + eps
    return pose, total


def solve_horn(
    p_local: jax.Array,
    q_global: jax.Array,
    pair_valid: jax.Array,
    weights: Optional[jax.Array] = None,
) -> Pose:
    """Closed-form weighted rigid alignment (Horn / Kabsch via SVD).

    Finds T minimizing sum w |T p - q|^2 — the coarse-init stage used by
    ``Solver_Horn`` in the no-motion-model ICP pipeline.
    """
    w = pair_valid.astype(jnp.float32)
    if weights is not None:
        w = w * weights
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    pc = jnp.sum(w[:, None] * p_local, axis=0) / wsum
    qc = jnp.sum(w[:, None] * q_global, axis=0) / wsum
    P = (p_local - pc) * w[:, None]
    Q = q_global - qc
    C = jnp.einsum("ni,nj->ij", P, Q, precision=_HI)  # (3,3) cross-covariance
    U, _, Vt = jnp.linalg.svd(C)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], jnp.float32)).at[2, 2].set(d)
    R = Vt.T @ D @ U.T
    t = qc - R @ pc
    ok = jnp.sum(pair_valid) >= 3
    R = jnp.where(ok, R, jnp.eye(3, dtype=jnp.float32))
    t = jnp.where(ok, t, 0.0)
    return Pose(R, t)
