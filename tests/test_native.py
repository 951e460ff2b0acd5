"""Tests for the native host runtime (scan decode, prefetch, blob IO).

Builds the library on the fly if it's missing (cheap: one TU)."""

import math
import os
import subprocess

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    from mola_lidar_odometry_tpu.utils import native

    if not native.available():
        subprocess.run(["make", "-C", NATIVE_DIR], check=True, capture_output=True)
        native._TRIED = False  # re-probe
    assert native.available(), "native library failed to build"
    return native


def write_bin(path, pts):
    pts.astype(np.float32).tofile(path)


def test_decode_matches_numpy(tmp_path, built_lib):
    native = built_lib
    rng = np.random.default_rng(0)
    raw = rng.uniform(-20, 20, (500, 4)).astype(np.float32)
    p = tmp_path / "scan.bin"
    write_bin(p, raw)

    xyz, inten, times, n = native.decode_bin(str(p), 1000, 0.0, 0.1)
    assert n == 500
    np.testing.assert_allclose(xyz[:n], raw[:, :3], rtol=1e-6)
    np.testing.assert_allclose(inten[:n], raw[:, 3], rtol=1e-6)
    # azimuth timestamp model
    az = np.arctan2(raw[:, 1], raw[:, 0])
    np.testing.assert_allclose(times[:n], az / (2 * np.pi) * 0.1, atol=1e-6)
    # padding is zeros
    assert np.all(xyz[n:] == 0)


def test_decode_vertical_correction(tmp_path, built_lib):
    native = built_lib
    raw = np.asarray([[10.0, 0.0, 0.0, 1.0]], np.float32)
    p = tmp_path / "one.bin"
    write_bin(p, raw)
    corr = math.radians(0.205)
    xyz, _, _, n = native.decode_bin(str(p), 10, corr, 0.0)
    # the point rotates up by corr: z = 10*sin(corr)
    assert abs(float(xyz[0, 2]) - 10.0 * math.sin(corr)) < 1e-5
    # range preserved
    assert abs(np.linalg.norm(xyz[0]) - 10.0) < 1e-5


def test_decode_capacity_trim(tmp_path, built_lib):
    native = built_lib
    raw = np.random.default_rng(1).normal(size=(100, 4)).astype(np.float32)
    p = tmp_path / "big.bin"
    write_bin(p, raw)
    xyz, _, _, n = native.decode_bin(str(p), 40, 0.0, 0.0)
    assert n == 40
    np.testing.assert_allclose(xyz[:40], raw[:40, :3], rtol=1e-6)


def test_prefetcher_in_order(tmp_path, built_lib):
    native = built_lib
    paths = []
    for k in range(6):
        raw = np.full((10, 4), float(k), np.float32)
        p = tmp_path / f"s{k}.bin"
        write_bin(p, raw)
        paths.append(str(p))
    pf = native.Prefetcher(paths, capacity=16, lookahead=2)
    for k in range(6):
        out = pf.next()
        assert out is not None
        xyz, inten, times, n = out
        assert n == 10
        assert float(xyz[0, 0]) == float(k)
    assert pf.next() is None
    pf.close()


def test_write_f32(tmp_path, built_lib):
    native = built_lib
    data = np.arange(12, dtype=np.float32).reshape(4, 3)
    p = tmp_path / "blob.bin"
    native.write_f32(str(p), data)
    back = np.fromfile(p, np.float32).reshape(4, 3)
    np.testing.assert_array_equal(back, data)


def test_decode_missing_file(built_lib):
    native = built_lib
    with pytest.raises(IOError):
        native.decode_bin("/no/such/file.bin", 100)
