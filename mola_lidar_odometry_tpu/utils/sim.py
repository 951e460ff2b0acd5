"""Synthetic spinning-LiDAR world simulator (host-side, numpy).

The reference's tests replay tiny recorded dataset fragments with known
ground truth (test/test_lidar_odometry_rawlog.cpp, GT
test/kitti_00_fragment_gt.tum).  Those fragments live in an external data
package that is not available here, so the golden end-to-end tests ray-cast
a synthetic structured world (ground plane + random boxes) along a known
smooth trajectory instead: same test shape (TUM GT + SE(3) log-norm
tolerance), fully self-contained and deterministic.

The sensor spins one revolution per scan; each azimuth column is cast from
the interpolated vehicle pose at its own sub-scan time, so scans exhibit
real motion distortion and the deskew path is exercised end-to-end.
Per-point timestamps are column times relative to mid-scan (matching
``FilterAdjustTimestamps(MiddleIsZero)`` conventions).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np


@dataclass
class SimWorld:
    """Ground plane + yaw-rotated boxes (diverse surface normals so
    point-to-point ICP is well-conditioned in every direction)."""

    centers: np.ndarray  # (B, 3) box centers (z = center of height)
    half: np.ndarray  # (B, 3) half sizes
    yaw: np.ndarray  # (B,) rotation about z
    ground_z: float = 0.0


def make_world(seed: int = 0, extent: float = 60.0, n_boxes: int = 50, n_plates: int = 30) -> SimWorld:
    """Buildings (tall rotated boxes, clear of the path) + ground 'plates'
    (large thin slabs: curbs, ramps, sidewalk steps).  A glass-flat ground
    plane makes point-to-point ICP degenerate — the sensor-anchored ring
    pattern pulls the solution toward zero motion — so the plates give the
    ground real, world-anchored texture like actual streets have."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-extent, extent, (n_boxes, 2))
    # keep a clear corridor near the origin path
    centers = centers[np.abs(centers[:, 1]) > 5.0]
    b = centers.shape[0]
    sizes = rng.uniform([1.0, 1.0, 2.0], [8.0, 8.0, 9.0], (b, 3))
    c3 = np.concatenate([centers, sizes[:, 2:3] / 2], axis=1)
    # thin plates anywhere (incl. under the path; <=25 cm tall)
    pc = rng.uniform(-extent, extent, (n_plates, 2))
    ps = rng.uniform([4.0, 4.0, 0.1], [18.0, 18.0, 0.25], (n_plates, 3))
    pc3 = np.concatenate([pc, ps[:, 2:3] / 2], axis=1)
    return SimWorld(
        centers=np.concatenate([c3, pc3]).astype(np.float64),
        half=np.concatenate([sizes / 2, ps / 2]).astype(np.float64),
        yaw=np.concatenate([rng.uniform(0, np.pi, b), rng.uniform(0, np.pi, n_plates)]),
        ground_z=0.0,
    )


def _ray_world(origins: np.ndarray, dirs: np.ndarray, world: SimWorld, max_range: float):
    """Closest hit distance per ray (inf = miss). origins/dirs: (N, 3)."""
    n = origins.shape[0]
    t_best = np.full(n, np.inf)

    # ground plane z = ground_z (hit only from above, ray pointing down)
    dz = dirs[:, 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        t_g = (world.ground_z - origins[:, 2]) / dz
    ok = (dz < -1e-9) & (t_g > 0.05)
    t_best = np.where(ok, np.minimum(t_best, t_g), t_best)

    # rotated boxes: slab test in each box's frame
    for b in range(world.centers.shape[0]):
        cy, sy = np.cos(world.yaw[b]), np.sin(world.yaw[b])
        Rb = np.array([[cy, sy, 0], [-sy, cy, 0], [0, 0, 1]])  # world -> box
        o = (origins - world.centers[b]) @ Rb.T
        d = dirs @ Rb.T
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / d
            t0 = (-world.half[b] - o) * inv
            t1 = (world.half[b] - o) * inv
        tmin = np.minimum(t0, t1).max(axis=1)
        tmax = np.maximum(t0, t1).min(axis=1)
        hit = (tmax >= tmin) & (tmax > 0) & (tmin > 0.05)
        t_best = np.where(hit, np.minimum(t_best, tmin), t_best)

    t_best = np.where(t_best <= max_range, t_best, np.inf)
    return t_best


def _so3_exp(phi: np.ndarray) -> np.ndarray:
    th = np.linalg.norm(phi)
    if th < 1e-12:
        return np.eye(3)
    a = phi / th
    K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K


def _pose_advance(R, t, twist, dt):
    """Advance pose by constant body twist over dt (rotation+translation split,
    matching the deskew model)."""
    v, w = twist[:3], twist[3:]
    Rd = _so3_exp(w * dt)
    return R @ Rd, t + R @ (v * dt)


@dataclass
class SimTrajectory:
    stamps: np.ndarray  # (F,)
    R: np.ndarray  # (F, 3, 3) pose at scan stamp (mid-scan)
    t: np.ndarray  # (F, 3)
    twists: np.ndarray  # (F, 6) body twist during each scan interval


def make_trajectory(
    n_frames: int,
    dt: float = 0.1,
    seed: int = 1,
    speed: float = 3.0,
    yaw_rate: float = 0.25,
    z: float = 1.5,
) -> SimTrajectory:
    """Smooth forward trajectory with slowly varying yaw rate."""
    rng = np.random.default_rng(seed)
    stamps = np.arange(n_frames) * dt
    R = np.eye(3)
    t = np.array([0.0, 0.0, z])
    Rs, ts, tws = [], [], []
    wz = 0.0
    ramp = max(3, n_frames // 3)  # accelerate from rest (vehicles start slow)
    for k in range(n_frames):
        v = speed * min(1.0, k / ramp)
        wz = 0.9 * wz + 0.1 * rng.normal(0, yaw_rate * 3)
        wz = np.clip(wz, -yaw_rate * 2, yaw_rate * 2) * min(1.0, k / ramp)
        tw = np.array([v, 0.0, 0.0, 0.0, 0.0, wz])
        Rs.append(R.copy())
        ts.append(t.copy())
        tws.append(tw)
        R, t = _pose_advance(R, t, tw, dt)
    return SimTrajectory(stamps, np.stack(Rs), np.stack(ts), np.stack(tws))


def simulate_scan(
    world: SimWorld,
    R: np.ndarray,
    t: np.ndarray,
    twist: np.ndarray,
    *,
    n_rings: int = 16,
    n_azimuth: int = 512,
    fov_up_deg: float = 10.0,
    fov_down_deg: float = -25.0,
    spin_period: float = 0.1,
    max_range: float = 80.0,
    noise: float = 0.01,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """One motion-distorted scan from pose (R, t) at mid-scan.

    Returns (xyz_sensor (N,3) f32, times (N,) f32, rings (N,) i32,
    valid (N,) bool) with N = n_rings * n_azimuth.
    """
    rng = np.random.default_rng(seed)
    az = np.linspace(-np.pi, np.pi, n_azimuth, endpoint=False)
    el = np.deg2rad(np.linspace(fov_down_deg, fov_up_deg, n_rings))
    az_g, el_g = np.meshgrid(az, el)  # (H, W)
    dirs_sensor = np.stack(
        [np.cos(el_g) * np.cos(az_g), np.cos(el_g) * np.sin(az_g), np.sin(el_g)], axis=-1
    )  # (H, W, 3)
    col_time = (az / (2 * np.pi)) * spin_period  # in [-T/2, T/2)

    # per-column sensor pose (motion distortion), then one batched raycast
    Rcols = np.empty((n_azimuth, 3, 3))
    tcols = np.empty((n_azimuth, 3))
    for j in range(n_azimuth):
        Rcols[j], tcols[j] = _pose_advance(R, t, twist, col_time[j])
    d_w = np.einsum("jab,hjb->hja", Rcols, dirs_sensor)  # (H, W, 3)
    o_w = np.broadcast_to(tcols[None], (n_rings, n_azimuth, 3))
    trng = _ray_world(o_w.reshape(-1, 3), d_w.reshape(-1, 3), world, max_range)
    trng = trng.reshape(n_rings, n_azimuth)
    valid = np.isfinite(trng)
    rngs = np.where(valid, trng, 0.0) + rng.normal(0, noise, (n_rings, n_azimuth))
    # store in SENSOR frame at each column's own time (raw skewed scan)
    xyz = (dirs_sensor * rngs[..., None]).astype(np.float32)

    times = np.broadcast_to(col_time[None, :], (n_rings, n_azimuth))
    rings = np.broadcast_to(np.arange(n_rings)[:, None], (n_rings, n_azimuth))
    return (
        xyz.reshape(-1, 3).astype(np.float32),
        times.reshape(-1).astype(np.float32),
        rings.reshape(-1).astype(np.int32),
        valid.reshape(-1),
    )


def simulate_sequence(
    n_frames: int = 20,
    *,
    world_seed: int = 0,
    traj_seed: int = 1,
    dt: float = 0.1,
    speed: float = 3.0,
    n_rings: int = 24,
    n_azimuth: int = 1024,
    noise: float = 0.01,
    max_range: float = 60.0,
    fov_up_deg: float = 15.0,
    fov_down_deg: float = -16.0,
) -> Tuple[SimTrajectory, List[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]]:
    """Convenience: world + trajectory + all scans.

    Default FOV keeps the featureless-ground fraction moderate: a perfectly
    planar synthetic ground with sparse rings is *harder* for point-to-point
    ICP than real streets (the sensor-anchored ring pattern pulls toward zero
    motion, with none of the texture real ground has), so the defaults aim
    for realistic structure fractions rather than worst-case glass floor.
    """
    world = make_world(world_seed, extent=45.0, n_boxes=80, n_plates=40)
    traj = make_trajectory(n_frames, dt=dt, seed=traj_seed, speed=speed)
    scans = []
    for k in range(n_frames):
        scans.append(
            simulate_scan(
                world,
                traj.R[k],
                traj.t[k],
                traj.twists[k],
                n_rings=n_rings,
                n_azimuth=n_azimuth,
                fov_up_deg=fov_up_deg,
                fov_down_deg=fov_down_deg,
                spin_period=dt,
                noise=noise,
                max_range=max_range,
                seed=1000 + k,
            )
        )
    return traj, scans
