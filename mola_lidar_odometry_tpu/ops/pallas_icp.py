"""Pallas TPU kernel: the ENTIRE ICP align loop fused into one kernel.

Round-1 profiling showed the per-iteration cost was not the NN select
(0.07 ms in Pallas) but the ~10 small XLA ops around it — transform,
masks, normal-equation einsums, 6x6 solve, pose update, convergence norms —
each carrying a ~30-60 us issue overhead on this chip, totalling ~0.3 ms x
~34 iterations per scan.  This kernel removes that floor by running the
WHOLE ``mp2p_icp::ICP::align`` loop (reference module/src/LidarOdometry.cpp:
916-1024 semantics, as structured in ops/icp.py) inside one ``pallas_call``:

  * candidates (the capture-once per-voxel-NN view, C <= 32 per query) sit
    in VMEM for the whole align — ZERO HBM traffic per iteration;
  * the matcher pass is (C, N) lane-parallel VPU math; the winning
    candidate is extracted with a sublane one-hot sum;
  * the robust Gauss-Newton normal equations collapse to 17 row reductions
    (Sw, Sw*tp, Sw*tp_i*tp_j, Sw*r, Sw*(tp x r), pair count);
  * the 6x6 solve, SE(3) exp/log/compose, and the annealed-threshold /
    kernel-param schedules (pre-evaluated per-iteration expression tables)
    run as SMEM scalar math;
  * convergence (minAbsStep_trans/rot) and the twist-reoptimization hook
    exit (optimize_twist_rerun_min_*) are the loop condition.

Semantics are bit-compatible in structure with ops/icp.align for the case
it covers: a single point-to-point matcher, pairingsPerPoint=1, capture-once
(hook enabled, no Horn stage), no Anderson acceleration — i.e. the shipped
``lidar3d-default`` hot path.  Everything else falls back to the XLA loop.

Tested against the XLA path in interpret mode on CPU
(tests/test_pallas_icp.py): identical pose trajectories to f32 tolerance.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BIG = 3.4e38  # python float: jnp constants would be captured consts in-kernel

# params vector layout (SMEM (1, 32) f32)
_P_LIMIT = 0  # absolute iteration limit = it0 + remaining budget (traced)
_P_MINT = 1  # minAbsStep_trans^2
_P_MINR = 2  # sin^2(minAbsStep_rot)
_P_HOOKT = 3  # hook_min_trans^2 (BIG = leg disabled)
_P_HOOKR = 4  # sin^2(hook_min_rot) (BIG = leg disabled)
_P_DAMP = 5  # GN damping
_P_WEIGHT = 6  # matcher layer weight
_P_IT0 = 7  # starting iteration index (mid-align recapture resumes here)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# scalar SE(3) helpers (tuples of traced 0-d f32; run on the TPU scalar unit)
# ---------------------------------------------------------------------------


def _mat_vec(R, v):
    return (
        R[0] * v[0] + R[1] * v[1] + R[2] * v[2],
        R[3] * v[0] + R[4] * v[1] + R[5] * v[2],
        R[6] * v[0] + R[7] * v[1] + R[8] * v[2],
    )


def _mat_t_vec(R, v):
    return (
        R[0] * v[0] + R[3] * v[1] + R[6] * v[2],
        R[1] * v[0] + R[4] * v[1] + R[7] * v[2],
        R[2] * v[0] + R[5] * v[1] + R[8] * v[2],
    )


def _mat_mul(A, B):
    out = []
    for i in range(3):
        for j in range(3):
            out.append(
                A[3 * i + 0] * B[j] + A[3 * i + 1] * B[3 + j] + A[3 * i + 2] * B[6 + j]
            )
    return tuple(out)


def _compose(Ra, ta, Rb, tb):
    R = _mat_mul(Ra, Rb)
    t = _mat_vec(Ra, tb)
    return R, (t[0] + ta[0], t[1] + ta[1], t[2] + ta[2])


def _inverse(R, t):
    Rt = (R[0], R[3], R[6], R[1], R[4], R[7], R[2], R[5], R[8])
    ti = _mat_vec(Rt, t)
    return Rt, (-ti[0], -ti[1], -ti[2])


def _sinc_coeffs(theta2):
    """A=sin/t, B=(1-cos)/t^2, C=(1-A)/t^2 as pure polynomials.

    Mosaic TC has no trig primitives; the Taylor expansions below are exact
    to f32 precision for |theta| <= ~0.9 rad, far beyond the in-align
    rotation domain (the hook/convergence bounds keep per-align rotations
    to fractions of a degree; capture-once is equally domain-limited)."""
    t2 = theta2
    t4 = t2 * t2
    t6 = t4 * t2
    A = 1.0 - t2 / 6.0 + t4 / 120.0 - t6 / 5040.0
    B = 0.5 - t2 / 24.0 + t4 / 720.0 - t6 / 40320.0
    C = 1.0 / 6.0 - t2 / 120.0 + t4 / 5040.0 - t6 / 362880.0
    return A, B, C


def _axes_mats(w):
    """K = hat(w) and K2 = K @ K as 9-tuples."""
    x, y, z = w
    zero = x * 0.0
    K = (zero, -z, y, z, zero, -x, -y, x, zero)
    xx, yy, zz = x * x, y * y, z * z
    K2 = (
        -(yy + zz), x * y, x * z,
        x * y, -(xx + zz), y * z,
        x * z, y * z, -(xx + yy),
    )
    return K, K2


def _so3_exp(w):
    theta2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
    A, B, _ = _sinc_coeffs(theta2)
    K, K2 = _axes_mats(w)
    I = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    return tuple(I[i] + A * K[i] + B * K2[i] for i in range(9))


def _se3_exp(xi):
    rho, phi = xi[:3], xi[3:]
    theta2 = phi[0] * phi[0] + phi[1] * phi[1] + phi[2] * phi[2]
    A, B, C = _sinc_coeffs(theta2)
    K, K2 = _axes_mats(phi)
    I = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    R = tuple(I[i] + A * K[i] + B * K2[i] for i in range(9))
    V = tuple(I[i] + B * K[i] + C * K2[i] for i in range(9))
    return R, _mat_vec(V, rho)


def _so3_log(R):
    """Axis-angle of R without inverse trig (Mosaic has none).

    With u = (1-cos)/2 = sin^2(theta/2):  theta = 2*asin(sqrt(u)), so
    theta/sin(theta) = asin_series(u) / sqrt(1-u), where asin_series is the
    Maclaurin expansion of asin(s)/s in u.  Exact to f32 for theta <= ~1 rad
    (the in-align domain; see _sinc_coeffs)."""
    trace = R[0] + R[4] + R[8]
    u = jnp.clip((1.0 - (trace - 1.0) * 0.5) * 0.5, 0.0, 0.9999)
    wx = (R[7] - R[5]) * 0.5
    wy = (R[2] - R[6]) * 0.5
    wz = (R[3] - R[1]) * 0.5
    ser = 1.0 + u / 6.0 + 3.0 * u * u / 40.0 + 15.0 * u * u * u / 336.0
    scale = ser * jax.lax.rsqrt(1.0 - u)
    return (scale * wx, scale * wy, scale * wz)


def _se3_log(R, t):
    phi = _so3_log(R)
    theta2 = phi[0] * phi[0] + phi[1] * phi[1] + phi[2] * phi[2]
    A, B, _ = _sinc_coeffs(theta2)
    K, K2 = _axes_mats(phi)
    I = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    eps = jnp.float32(1e-8)
    small = theta2 < eps
    safe_t2 = jnp.where(small, 1.0, theta2)
    coef = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - A / (2.0 * B)) / safe_t2)
    Vinv = tuple(I[i] - 0.5 * K[i] + coef * K2[i] for i in range(9))
    rho = _mat_vec(Vinv, t)
    return rho + phi


def _sin_angle2(R):
    """Squared sine of the rotation angle, from the antisymmetric part.

    f32-stable for tiny angles (the trace form 3-tr cancels catastrophically
    below ~1e-3 rad — far above the 5e-5 rad convergence threshold);
    compared against host-precomputed sin^2(threshold)."""
    wx = (R[7] - R[5]) * 0.5
    wy = (R[2] - R[6]) * 0.5
    wz = (R[3] - R[1]) * 0.5
    return wx * wx + wy * wy + wz * wz


def _solve6(H, b, damp):
    """Solve (H + damp*scale*I) x = b, H 36-tuple row-major, b 6-tuple.

    Gaussian elimination without pivoting — valid for the damped SPD normal
    equations (same system jnp.linalg.solve handles in the XLA path).
    """
    scale = (H[0] + H[7] + H[14] + H[21] + H[28] + H[35]) / 6.0 + 1.0
    A = [[H[6 * i + j] + jnp.where(i == j, damp * scale, 0.0) for j in range(6)] for i in range(6)]
    x = list(b)
    for k in range(6):
        inv = 1.0 / A[k][k]
        for i in range(k + 1, 6):
            f = A[i][k] * inv
            for j in range(k + 1, 6):
                A[i][j] = A[i][j] - f * A[k][j]
            x[i] = x[i] - f * x[k]
    for k in range(5, -1, -1):
        s = x[k]
        for j in range(k + 1, 6):
            s = s - A[k][j] * x[j]
        x[k] = s / A[k][k]
    return tuple(x)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _make_kernel(C: int, npad: int, gn_inner: int, maxit: int):
    sub_iota = None  # built lazily inside (needs kernel context)

    def kernel(
        params_ref,  # (1, 32) f32 SMEM
        pose_ref,  # (1, 40) f32 SMEM: init R(9) t(3), prior R(9) t(3), hook-ref R(9) t(3), pad
        info_ref,  # (6, 6) f32 SMEM prior information
        thr2_ref,  # (maxit, 1) f32 SMEM: squared matcher threshold per iter
        kc_ref,  # (maxit, 1) f32 SMEM: robust kernel param per iter
        pts_ref,  # (8, npad) f32 VMEM: rows x, y, z, valid
        cx_ref, cy_ref, cz_ref, cm_ref,  # (C, npad) f32 VMEM candidates
        out_ref,  # (1, 32) f32 SMEM
    ):
        limit = params_ref[0, _P_LIMIT].astype(jnp.int32)
        min_t = params_ref[0, _P_MINT]
        min_r = params_ref[0, _P_MINR]
        hook_t = params_ref[0, _P_HOOKT]
        hook_r = params_ref[0, _P_HOOKR]
        damp = params_ref[0, _P_DAMP]
        weight = params_ref[0, _P_WEIGHT]
        it0 = params_ref[0, _P_IT0].astype(jnp.int32)

        R0 = tuple(pose_ref[0, i] for i in range(9))
        t0 = tuple(pose_ref[0, 9 + i] for i in range(3))
        Rp = tuple(pose_ref[0, 12 + i] for i in range(9))
        tp_prior = tuple(pose_ref[0, 21 + i] for i in range(3))
        # hook reference pose: the ORIGINAL align entry (differs from R0/t0
        # when a mid-align recapture resumed the loop at it0 > 0)
        Rh = tuple(pose_ref[0, 24 + i] for i in range(9))
        th_ref = tuple(pose_ref[0, 33 + i] for i in range(3))
        info = tuple(info_ref[i, j] for i in range(6) for j in range(6))
        info_trace = info[0] + info[7] + info[14] + info[21] + info[28] + info[35]

        px = pts_ref[0:1, :]
        py = pts_ref[1:2, :]
        pz = pts_ref[2:3, :]
        pvalid = pts_ref[3:4, :]
        n_valid = jnp.sum(pvalid)

        cx = cx_ref[:]
        cy = cy_ref[:]
        cz = cz_ref[:]
        cmask = cm_ref[:] > 0
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (C, npad), 0)

        def match(R, t, thr2):
            """NN within threshold at pose -> (tx, ty, tz, pair, npair)."""
            qx = R[0] * px + R[1] * py + R[2] * pz + t[0]
            qy = R[3] * px + R[4] * py + R[5] * pz + t[1]
            qz = R[6] * px + R[7] * py + R[8] * pz + t[2]
            dx = cx - qx
            dy = cy - qy
            dz = cz - qz
            d2 = dx * dx + dy * dy + dz * dz
            d2 = jnp.where(cmask, d2, BIG)
            dmin = jnp.min(d2, axis=0, keepdims=True)  # (1, npad)
            first = jnp.min(
                jnp.where(d2 <= dmin, lane_c, jnp.int32(C)), axis=0, keepdims=True
            )
            oh = (lane_c == first).astype(jnp.float32)
            tx = jnp.sum(cx * oh, axis=0, keepdims=True)
            ty = jnp.sum(cy * oh, axis=0, keepdims=True)
            tz = jnp.sum(cz * oh, axis=0, keepdims=True)
            pair = pvalid * (dmin < thr2).astype(jnp.float32) * (dmin < BIG).astype(jnp.float32)
            return tx, ty, tz, pair, jnp.sum(pair)

        def gn_step(R, t, tx, ty, tz, pair, kc, any_pair):
            """One robust GN update on fixed pairings (solver inner iter).

            All 16 weighted moments the 6x6 normal equations need come from
            ONE 7x7 Gram matrix M M^T with M = sqrt(w) * [1, tp, r] — a
            single MXU contraction instead of 16 serialized scalar
            reductions (which dominated the first kernel's runtime)."""
            tpx = R[0] * px + R[1] * py + R[2] * pz + t[0]
            tpy = R[3] * px + R[4] * py + R[5] * pz + t[1]
            tpz = R[6] * px + R[7] * py + R[8] * pz + t[2]
            rx = tpx - tx
            ry = tpy - ty
            rz = tpz - tz
            r2 = rx * rx + ry * ry + rz * rz
            c2 = kc * kc
            gm = c2 / (r2 + c2)
            w = gm * gm * pair * weight

            sw = jnp.sqrt(w)
            M = jnp.concatenate(
                [sw, sw * tpx, sw * tpy, sw * tpz, sw * rx, sw * ry, sw * rz, sw * 0.0],
                axis=0,
            )  # (8, npad)
            G = jax.lax.dot_general(
                M, M, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # (8, 8): G[i,j] = sum w * m_i * m_j

            S = G[0, 0]
            Sx, Sy, Sz = G[0, 1], G[0, 2], G[0, 3]
            Sxx, Syy, Szz = G[1, 1], G[2, 2], G[3, 3]
            Sxy, Sxz, Syz = G[1, 2], G[1, 3], G[2, 3]
            brx, bry, brz = G[0, 4], G[0, 5], G[0, 6]
            # tp x r from the tp_i * r_j blocks
            bkx = G[2, 6] - G[3, 5]
            bky = G[3, 4] - G[1, 6]
            bkz = G[1, 5] - G[2, 4]

            zero = S * 0.0
            # H = [[S*I, -SK], [SK, Sxx+Syy+Szz*I - tp tp^T]] (row-major 6x6)
            SK = (zero, -Sz, Sy, Sz, zero, -Sx, -Sy, Sx, zero)
            trS = Sxx + Syy + Szz
            KtK = (
                trS - Sxx, -Sxy, -Sxz,
                -Sxy, trS - Syy, -Syz,
                -Sxz, -Syz, trS - Szz,
            )
            H = [zero] * 36
            for i in range(3):
                H[6 * i + i] = S
                for j in range(3):
                    H[6 * i + (3 + j)] = -SK[3 * i + j]
                    H[6 * (3 + i) + j] = SK[3 * i + j]
                    H[6 * (3 + i) + (3 + j)] = KtK[3 * i + j]
            b = [brx, bry, brz, bkx, bky, bkz]

            # prior: r_p = log(prior^-1 pose); H += info; b += info @ r_p
            Ri, ti = _inverse(Rp, tp_prior)
            Rrel, trel = _compose(Ri, ti, R, t)
            rp = _se3_log(Rrel, trel)
            for i in range(6):
                for j in range(6):
                    H[6 * i + j] = H[6 * i + j] + info[6 * i + j]
                    b[i] = b[i] + info[6 * i + j] * rp[j]

            eps = _solve6(tuple(H), tuple(b), damp)
            ok = (any_pair > 0) | (info_trace > 0)
            eps = tuple(jnp.where(ok, -e, 0.0) for e in eps)
            Re, te = _se3_exp(eps)
            return _compose(Re, te, R, t)

        def body(state):
            R, t, it, _, _ = state
            thr2 = thr2_ref[jnp.minimum(it, maxit - 1), 0]
            kc = kc_ref[jnp.minimum(it, maxit - 1), 0]
            tx, ty, tz, pair, npair = match(R, t, thr2)
            Rn, tn = R, t
            for _ in range(gn_inner):
                Rn, tn = gn_step(Rn, tn, tx, ty, tz, pair, kc, npair)
            # convergence: step norms of this iteration (squared compares
            # against host-precomputed squared thresholds; rotation via the
            # f32-stable sin^2 form)
            dRt = _mat_mul((R[0], R[3], R[6], R[1], R[4], R[7], R[2], R[5], R[8]), Rn)
            dt2 = (tn[0] - t[0]) ** 2 + (tn[1] - t[1]) ** 2 + (tn[2] - t[2]) ** 2
            converged = (dt2 < min_t) & (_sin_angle2(dRt) < min_r)
            # twist-reopt hook: total correction since the ORIGINAL entry
            hRt = _mat_mul((Rh[0], Rh[3], Rh[6], Rh[1], Rh[4], Rh[7], Rh[2], Rh[5], Rh[8]), Rn)
            ht2 = (
                (tn[0] - th_ref[0]) ** 2
                + (tn[1] - th_ref[1]) ** 2
                + (tn[2] - th_ref[2]) ** 2
            )
            # disabled hook legs arrive as BIG thresholds (host-side)
            hook = (ht2 > hook_t) | (_sin_angle2(hRt) > hook_r)
            return Rn, tn, it + 1, converged, hook

        def cond(state):
            _, _, it, converged, hook = state
            return (~converged) & (~hook) & (it < limit)

        state0 = (
            R0,
            t0,
            it0,
            jnp.asarray(False),
            jnp.asarray(False),
        )
        R, t, it, converged, hook = jax.lax.while_loop(cond, body, state0)

        # quality: paired ratio at the final pose / final threshold
        thr2_q = thr2_ref[jnp.minimum(it, maxit - 1), 0]
        _, _, _, _, npair_q = match(R, t, thr2_q)
        quality = npair_q / jnp.maximum(n_valid, 1.0)

        for i in range(9):
            out_ref[0, i] = R[i]
        for i in range(3):
            out_ref[0, 9 + i] = t[i]
        out_ref[0, 12] = it.astype(jnp.float32)
        out_ref[0, 13] = hook.astype(jnp.float32)
        out_ref[0, 14] = converged.astype(jnp.float32)
        out_ref[0, 15] = quality

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "min_abs_step_trans",
        "min_abs_step_rot",
        "hook_min_trans",
        "hook_min_rot",
        "weight",
        "damping",
        "gn_inner",
        "maxit_static",
        "interpret",
    ),
)
def align_fused(
    cand_pts: jax.Array,  # (N, C, 3) capture-once candidates (C <= 64)
    cand_mask: jax.Array,  # (N, C)
    pts: jax.Array,  # (N, 3) local points (sensor frame)
    valid: jax.Array,  # (N,)
    init_R: jax.Array,  # (3, 3)
    init_t: jax.Array,  # (3,)
    prior_R: jax.Array,
    prior_t: jax.Array,
    prior_info: jax.Array,  # (6, 6)
    thr_tab: jax.Array,  # (maxit,) matcher threshold per iteration
    kc_tab: jax.Array,  # (maxit,) robust kernel param per iteration
    budget: jax.Array,  # () i32 — remaining iteration budget
    min_abs_step_trans: float,
    min_abs_step_rot: float,
    hook_min_trans: float,
    hook_min_rot: float,
    weight: float = 1.0,
    damping: float = 1e-8,
    gn_inner: int = 2,
    maxit_static: int = 300,
    interpret: bool = False,
    it0=None,  # () i32 — resume iteration index (mid-align recapture)
    hook_ref_R: jax.Array = None,  # original align-entry pose for the hook
    hook_ref_t: jax.Array = None,
    planar=None,  # optional (cx, cy, cz, cm) each (C, npad) — pre-planar
    #              candidates from ops/pallas_capture (skips the transpose;
    #              cand_pts/cand_mask are ignored and may be None)
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Run the fused align loop.  Returns (R, t, iters, hook, converged, q);
    ``iters`` counts from ``it0`` (iterations consumed by THIS call)."""
    if it0 is None:
        it0 = jnp.int32(0)
    if hook_ref_R is None:
        hook_ref_R, hook_ref_t = init_R, init_t
    n = pts.shape[0]
    if planar is not None:
        cxp, cyp, czp, cmp_ = planar
        C, npad = cxp.shape
        assert npad >= n and npad % LANES == 0
    else:
        _, C = cand_mask.shape
        npad = _round_up(max(n, LANES), LANES)

    # prep in as FEW XLA ops as possible (each carries ~30-60 us issue
    # overhead on this chip): one stack+pad for the query rows, one
    # transpose+pad for all four candidate planes
    pts_rows = jnp.pad(
        jnp.stack(
            [pts[:, 0], pts[:, 1], pts[:, 2], valid.astype(jnp.float32)], axis=0
        ),
        [(0, 4), (0, npad - n)],
    )  # (8, npad)

    if planar is None:
        cand4 = jnp.concatenate(
            [cand_pts, cand_mask.astype(jnp.float32)[..., None]], axis=-1
        )  # (N, C, 4)
        planes = jnp.pad(
            jnp.transpose(cand4, (2, 1, 0)), [(0, 0), (0, 0), (0, npad - n)]
        )  # (4, C, npad)
        cxp, cyp, czp, cmp_ = planes[0], planes[1], planes[2], planes[3]

    # thresholds enter pre-squared (translation) / as sin^2 (rotation, the
    # f32-stable compare — see _sin_angle2); disabled hook legs become BIG.
    # These are static python floats, transformed before tracing.
    import math as _math

    def _rot2(x):
        return _math.sin(x) ** 2 if 0.0 <= x < _math.pi / 2 else BIG

    hook_enabled = hook_min_trans > 0 or hook_min_rot > 0
    hook_t2 = hook_min_trans**2 if hook_enabled else BIG
    hook_r2 = _rot2(hook_min_rot) if hook_enabled else BIG

    static_params = jnp.asarray(
        [
            min_abs_step_trans**2,
            _rot2(min_abs_step_rot),
            hook_t2,
            hook_r2,
            damping,
            weight,
        ]
        + [0.0] * 24,
        jnp.float32,
    )  # indices 1..6 match _P_*; slot 7 (_P_IT0) appended below
    it0f = jnp.asarray(it0, jnp.float32)
    limit = jnp.asarray(it0 + budget, jnp.float32)
    params = jnp.concatenate(
        [limit[None], static_params[:6], it0f[None], static_params[6:]]
    ).reshape(1, 32)

    pose_v = jnp.concatenate(
        [
            init_R.reshape(-1),
            init_t.reshape(-1),
            prior_R.reshape(-1),
            prior_t.reshape(-1),
            hook_ref_R.reshape(-1),
            hook_ref_t.reshape(-1),
            jnp.zeros(4, jnp.float32),
        ]
    ).reshape(1, 40)

    maxit = int(thr_tab.shape[0])
    thr2 = (thr_tab * thr_tab).reshape(maxit, 1).astype(jnp.float32)
    kc = kc_tab.reshape(maxit, 1).astype(jnp.float32)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _make_kernel(C, npad, gn_inner, maxit),
        out_shape=jax.ShapeDtypeStruct((1, 32), jnp.float32),
        in_specs=[smem(), smem(), smem(), smem(), smem(), vmem(), vmem(), vmem(), vmem(), vmem()],
        out_specs=smem(),
        interpret=interpret,
    )(
        params,
        pose_v,
        prior_info.astype(jnp.float32),
        thr2,
        kc,
        pts_rows,
        cxp,
        cyp,
        czp,
        cmp_,
    )

    R = out[0, :9].reshape(3, 3)
    t = out[0, 9:12]
    iters = out[0, 12].astype(jnp.int32) - jnp.asarray(it0, jnp.int32)
    hook = out[0, 13] > 0
    converged = out[0, 14] > 0
    quality = out[0, 15]
    return R, t, iters, hook, converged, quality
