"""Unit tests for the SE(3)/SO(3) geometry core (ops/se3.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mola_lidar_odometry_tpu.ops import se3


def rand_phi(rng, scale=1.0, n=()):
    return jnp.asarray(rng.normal(size=n + (3,)) * scale, dtype=jnp.float32)


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    phi = rand_phi(rng, 1.0, (64,))
    # keep angles < pi so log is the exact inverse of exp
    n = np.linalg.norm(np.asarray(phi), axis=-1, keepdims=True)
    phi = jnp.asarray(np.asarray(phi) * np.minimum(1.0, 2.9 / n), dtype=jnp.float32)
    R = se3.so3_exp(phi)
    phi2 = se3.so3_log(R)
    np.testing.assert_allclose(np.asarray(phi2), np.asarray(phi), atol=2e-5)


def test_so3_exp_small_angle():
    phi = jnp.array([[1e-9, -2e-9, 3e-9], [0.0, 0.0, 0.0]], dtype=jnp.float32)
    R = se3.so3_exp(phi)
    np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-7)
    phi2 = se3.so3_log(R)
    assert np.all(np.isfinite(np.asarray(phi2)))


def test_so3_log_near_pi():
    axis = np.array([1.0, 2.0, -0.5])
    axis /= np.linalg.norm(axis)
    theta = np.pi - 1e-4
    phi = jnp.asarray(axis * theta, dtype=jnp.float32)
    R = se3.so3_exp(phi)
    phi2 = np.asarray(se3.so3_log(R))
    np.testing.assert_allclose(phi2, np.asarray(phi), atol=5e-3)


def test_so3_known_rotation():
    # 90 deg about z
    phi = jnp.array([0.0, 0.0, np.pi / 2], dtype=jnp.float32)
    R = np.asarray(se3.so3_exp(phi))
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(1)
    xi = rng.normal(size=(32, 6))
    # keep rotation angles < pi so log is the exact inverse of exp
    n = np.linalg.norm(xi[:, 3:], axis=-1, keepdims=True)
    xi[:, 3:] *= np.minimum(1.0, 2.8 / n)
    xi = jnp.asarray(xi, dtype=jnp.float32)
    p = se3.se3_exp(xi)
    xi2 = se3.se3_log(p)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=5e-5)


def test_se3_exp_zero():
    p = se3.se3_exp(jnp.zeros(6, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(p.R), np.eye(3), atol=1e-7)
    np.testing.assert_allclose(np.asarray(p.t), np.zeros(3), atol=1e-7)


def test_compose_inverse():
    rng = np.random.default_rng(2)
    a = se3.se3_exp(jnp.asarray(rng.normal(size=6), dtype=jnp.float32))
    b = se3.se3_exp(jnp.asarray(rng.normal(size=6), dtype=jnp.float32))
    ab = se3.compose(a, b)
    b2 = se3.compose(se3.inverse(a), ab)
    np.testing.assert_allclose(np.asarray(b2.R), np.asarray(b.R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b2.t), np.asarray(b.t), atol=1e-5)


def test_transform_matches_matrix():
    rng = np.random.default_rng(3)
    p = se3.se3_exp(jnp.asarray(rng.normal(size=6), dtype=jnp.float32))
    pts = jnp.asarray(rng.normal(size=(10, 3)), dtype=jnp.float32)
    out = np.asarray(se3.transform(p, pts))
    M = np.asarray(p.matrix())
    expected = (M[:3, :3] @ np.asarray(pts).T).T + M[:3, 3]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_quat_roundtrip():
    rng = np.random.default_rng(4)
    phi = rand_phi(rng, 1.5, (100,))
    R = se3.so3_exp(phi)
    q = se3.rot_to_quat(R)
    R2 = se3.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    # unit norm
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-6)


def test_ypr_roundtrip():
    rng = np.random.default_rng(5)
    yaw = jnp.asarray(rng.uniform(-3, 3, 50), dtype=jnp.float32)
    pitch = jnp.asarray(rng.uniform(-1.4, 1.4, 50), dtype=jnp.float32)
    roll = jnp.asarray(rng.uniform(-3, 3, 50), dtype=jnp.float32)
    R = se3.ypr_to_rot(yaw, pitch, roll)
    y2, p2, r2 = se3.rot_to_ypr(R)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(yaw), atol=1e-4)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(pitch), atol=1e-4)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(roll), atol=1e-4)


def test_pose_error_norms():
    a = se3.Pose.identity()
    b = se3.se3_exp(jnp.array([1.0, 0, 0, 0, 0, 0.5], dtype=jnp.float32))
    dt, dr = se3.pose_error_norms(a, b)
    assert float(dr) == pytest.approx(0.5, abs=1e-5)
    rel = se3.relative(a, b)
    assert float(jnp.linalg.norm(rel.t)) == pytest.approx(float(dt), abs=1e-6)
