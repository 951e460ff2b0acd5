"""SO(3)/SE(3) Lie-group operations on (batched) JAX arrays.

TPU-native replacement for the pose algebra the reference consumes from MRPT
(`mrpt::poses::CPose3D`, `Lie::SO<3>::log` / `Lie::SE<3>` — used e.g. at
reference module/src/LidarOdometry.cpp:936,1080,1442).  All functions are pure,
jit/vmap-friendly, float32, and use series expansions near theta=0 so they are
safe to differentiate and numerically stable on TPU.

Poses are represented as a pair ``(R, t)`` with ``R: (..., 3, 3)`` rotation
matrices and ``t: (..., 3)`` translations; tangent vectors are ``(..., 6)``
ordered ``[rho(3), phi(3)]`` = [translation part, rotation part].
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# TPU f32 matmul/einsum defaults to reduced-precision MXU passes; geometry
# transforms must stay exact f32 (residual accuracy ~ convergence floor).
_HI = jax.lax.Precision.HIGHEST

# Series switch-over point: below this angle use Taylor expansions.
_EPS = 1e-6


class Pose(NamedTuple):
    """An SE(3) element (optionally batched): rotation matrix + translation."""

    R: jax.Array  # (..., 3, 3)
    t: jax.Array  # (..., 3)

    @staticmethod
    def identity(batch: Tuple[int, ...] = (), dtype=jnp.float32) -> "Pose":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))
        t = jnp.zeros(batch + (3,), dtype=dtype)
        return Pose(R, t)

    def matrix(self) -> jax.Array:
        """Return the (..., 4, 4) homogeneous matrix."""
        batch = self.t.shape[:-1]
        M = jnp.zeros(batch + (4, 4), dtype=self.t.dtype)
        M = M.at[..., :3, :3].set(self.R)
        M = M.at[..., :3, 3].set(self.t)
        M = M.at[..., 3, 3].set(1.0)
        return M


def hat(phi: jax.Array) -> jax.Array:
    """so(3) hat operator: (..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zero = jnp.zeros_like(x)
    rows = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def vee(M: jax.Array) -> jax.Array:
    """Inverse of :func:`hat`: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([M[..., 2, 1], M[..., 0, 2], M[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta2: jax.Array):
    """Stable A = sin(t)/t, B = (1-cos(t))/t^2, C = (1-A)/t^2 given t^2."""
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    small = theta2 < _EPS
    # Taylor: A ~ 1 - t2/6, B ~ 1/2 - t2/24, C ~ 1/6 - t2/120
    safe_t2 = jnp.where(small, 1.0, theta2)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe_t2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / safe_t2)
    return A, B, C


def _hat_sq(phi: jax.Array, theta2: jax.Array) -> jax.Array:
    """hat(phi)^2 computed analytically as phi phi^T - |phi|^2 I.

    Avoids a 3x3 matmul, which on TPU would run at the (bf16-by-default)
    MXU precision; the outer-product form is exact VPU arithmetic.
    """
    outer = phi[..., :, None] * phi[..., None, :]
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), outer.shape)
    return outer - theta2[..., None, None] * I


def so3_exp(phi: jax.Array) -> jax.Array:
    """Rodrigues formula: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    A, B, _ = _sinc_coeffs(theta2)
    K = hat(phi)
    K2 = _hat_sq(phi, theta2)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return I + A[..., None, None] * K + B[..., None, None] * K2


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix -> axis-angle (..., 3).  Stable near 0 and near pi."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # vee of the antisymmetric part
    w = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    sin_theta = jnp.sin(theta)

    near_pi = cos_theta < -1.0 + 1e-5
    small = theta < 1e-4

    # Generic: phi = theta / sin(theta) * w
    scale = jnp.where(small, 1.0 + theta * theta / 6.0, theta / jnp.where(sin_theta == 0, 1.0, sin_theta))
    phi_generic = scale[..., None] * w

    # Near pi: axis from the diagonal of (R + I)/2 = axis axis^T (1+cos)/... :
    # R + I = 2 * (axis axis^T) * (1 + cos)/2 ... use largest diagonal element.
    Rp = R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    diag = jnp.stack([Rp[..., 0, 0], Rp[..., 1, 1], Rp[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(Rp, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    axis = col / jnp.maximum(jnp.linalg.norm(col, axis=-1, keepdims=True), 1e-12)
    # Fix sign so it matches w (sin may be tiny but its sign is informative)
    sign = jnp.where(jnp.sum(axis * w, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    phi_pi = sign * axis * theta[..., None]

    return jnp.where(near_pi[..., None], phi_pi, phi_generic)


def se3_exp(xi: jax.Array) -> Pose:
    """se(3) exp: (..., 6) [rho, phi] -> Pose.  Uses the left Jacobian V."""
    rho, phi = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(phi * phi, axis=-1)
    A, B, C = _sinc_coeffs(theta2)
    K = hat(phi)
    K2 = _hat_sq(phi, theta2)
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    R = I + A[..., None, None] * K + B[..., None, None] * K2
    V = I + B[..., None, None] * K + C[..., None, None] * K2
    t = jnp.einsum("...ij,...j->...i", V, rho, precision=_HI)
    return Pose(R, t)


def se3_log(pose: Pose) -> jax.Array:
    """SE(3) log: Pose -> (..., 6) [rho, phi]."""
    phi = so3_log(pose.R)
    theta2 = jnp.sum(phi * phi, axis=-1)
    A, B, _ = _sinc_coeffs(theta2)
    K = hat(phi)
    K2 = _hat_sq(phi, theta2)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    # V^{-1} = I - K/2 + (1/theta^2)(1 - A/(2B)) K^2
    small = theta2 < _EPS
    safe_t2 = jnp.where(small, 1.0, theta2)
    coef = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - A / (2.0 * B)) / safe_t2)
    Vinv = I - 0.5 * K + coef[..., None, None] * K2
    rho = jnp.einsum("...ij,...j->...i", Vinv, pose.t, precision=_HI)
    return jnp.concatenate([rho, phi], axis=-1)


def compose(a: Pose, b: Pose) -> Pose:
    """a ∘ b (apply b first, then a)."""
    return Pose(
        jnp.matmul(a.R, b.R, precision=_HI),
        jnp.einsum("...ij,...j->...i", a.R, b.t, precision=_HI) + a.t,
    )


def inverse(p: Pose) -> Pose:
    Rt = jnp.swapaxes(p.R, -1, -2)
    return Pose(Rt, -jnp.einsum("...ij,...j->...i", Rt, p.t, precision=_HI))


def relative(a: Pose, b: Pose) -> Pose:
    """a^{-1} ∘ b: pose of b expressed in frame a (MRPT's ``b - a``)."""
    return compose(inverse(a), b)


def transform(p: Pose, pts: jax.Array) -> jax.Array:
    """Apply pose to points: (..., N, 3) -> (..., N, 3)."""
    return jnp.einsum("...ij,...nj->...ni", p.R, pts, precision=_HI) + p.t[..., None, :]


def pose_error_norms(a: Pose, b: Pose) -> Tuple[jax.Array, jax.Array]:
    """(translation-norm, rotation-angle) of the relative pose a^{-1} b."""
    rel = relative(a, b)
    dt = jnp.linalg.norm(rel.t, axis=-1)
    dr = jnp.linalg.norm(so3_log(rel.R), axis=-1)
    return dt, dr


def quat_to_rot(q: jax.Array) -> jax.Array:
    """Unit quaternion (..., 4) [qx, qy, qz, qw] (TUM order) -> (..., 3, 3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = jnp.sqrt(x * x + y * y + z * z + w * w)
    x, y, z, w = x / n, y / n, z / n, w / n
    rows = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], axis=-1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], axis=-1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )
    return rows


def rot_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion (..., 4) [qx, qy, qz, qw] (TUM order).

    Shepperd's method, branch-free via selecting the numerically largest of the
    four candidate constructions.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates (w-major, x-major, y-major, z-major), each scaled later.
    qw0 = jnp.stack([m21 - m12, m02 - m20, m10 - m01, 1.0 + tr], axis=-1)
    qx0 = jnp.stack([1.0 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12], axis=-1)
    qy0 = jnp.stack([m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21, m02 - m20], axis=-1)
    qz0 = jnp.stack([m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22, m10 - m01], axis=-1)

    scores = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1
    )
    best = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([qw0, qx0, qy0, qz0], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    # Canonical sign: qw >= 0
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    return q


def ypr_to_rot(yaw: jax.Array, pitch: jax.Array, roll: jax.Array) -> jax.Array:
    """MRPT yaw/pitch/roll (Z-Y-X intrinsic) -> rotation matrix."""
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    rows = jnp.stack(
        [
            jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1),
            jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1),
            jnp.stack([-sp, cp * sr, cp * cr], axis=-1),
        ],
        axis=-2,
    )
    return rows


def rot_to_ypr(R: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Rotation matrix -> MRPT yaw/pitch/roll (Z-Y-X intrinsic)."""
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return yaw, pitch, roll
