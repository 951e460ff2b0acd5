"""Design study: hash-row gather/scatter throughput on this TPU.

The capture/insert/decimate stages are all built from row gathers and
element scatters at hot shapes (880k rows of 64 f32 at B=8).  This measures
the achievable bandwidth of each realistic implementation choice so the
kernel design follows the hardware, not folklore:

  - flat row gather vs ROW WIDTH (8..256 f32) at fixed row count
  - flat row gather vs INDEX ORDER (random / sorted / iota=linear)
  - linear full-table stream (the bandwidth ceiling for comparison)
  - scatter-add/min at decimate/insert shapes
  - XLA sort at dedup-relevant sizes (u32 keys)
  - Pallas manual row-DMA gather (per-row async copies, k in flight)

Usage: python eval/micro_gather.py [--quick]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

INNER = 10


def bench(f, *args, repeats=5):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def body(c, _):
            out = f(c, *a)
            return jnp.sum(out.astype(jnp.float32)) * 1e-30 + c * 0.5, None

        c, _ = jax.lax.scan(body, jnp.float32(1e-30), None, length=INNER)
        return c

    float(run(*args))  # compile
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / INNER


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)

    V = 1 << 17  # table rows (per instance)
    M = 880_000  # gathered rows (N=4096 q x 27 probes x B=8)

    # --- row gather vs width ---
    print("\n-- flat row gather, M=880k random indices, vs row width --")
    idx = jnp.asarray(rng.integers(0, V, M, dtype=np.int32))
    for W in [8, 16, 32, 64, 128]:
        tbl = jnp.asarray(rng.standard_normal((V, W), dtype=np.float32))
        t = bench(lambda c, tbl, idx: tbl[idx] + c, tbl, idx)
        gb = M * W * 4 / t / 1e9
        print(f"  W={W:4d} f32: {1e3 * t:7.2f} ms  {gb:7.1f} GB/s")

    # --- index order ---
    print("\n-- row gather W=64, vs index order --")
    tbl = jnp.asarray(rng.standard_normal((V, 64), dtype=np.float32))
    orders = {
        "random": idx,
        "sorted": jnp.sort(idx),
        "iota(mod)": jnp.arange(M, dtype=jnp.int32) % V,
    }
    for name, ix in orders.items():
        t = bench(lambda c, tbl, ix: tbl[ix] + c, tbl, ix)
        gb = M * 64 * 4 / t / 1e9
        print(f"  {name:10s}: {1e3 * t:7.2f} ms  {gb:7.1f} GB/s")

    # --- ceiling: linear stream of the same total bytes ---
    print("\n-- linear stream ceiling --")
    big = jnp.asarray(rng.standard_normal((M, 64), dtype=np.float32))
    t = bench(lambda c, b: jnp.sum(b, axis=1) + c, big)
    print(f"  sum-reduce (M,64): {1e3 * t:7.2f} ms  {M * 64 * 4 / t / 1e9:7.1f} GB/s")

    # --- scatters at decimate/insert shapes ---
    print("\n-- scatters --")
    N = 131_072 * 8  # B=8 decimate input
    T = (1 << 15) * 8
    sl = jnp.asarray(rng.integers(0, T, N, dtype=np.int32))
    vals = jnp.asarray(rng.standard_normal(N, dtype=np.float32))
    zt = jnp.zeros((T,), jnp.float32)
    t = bench(lambda c, zt, sl, v: zt.at[sl].add(v + c, mode="drop"), zt, sl, vals)
    print(f"  scatter-add 1M -> 256k: {1e3 * t:7.2f} ms  {N / t / 1e6:6.0f} M elems/s")
    t = bench(lambda c, zt, sl, v: zt.at[sl].min(v + c, mode="drop"), zt, sl, vals)
    print(f"  scatter-min 1M -> 256k: {1e3 * t:7.2f} ms  {N / t / 1e6:6.0f} M elems/s")

    # --- gather M-sweep: fixed overhead vs per-row cost ---
    print("\n-- row gather W=64 vs M --")
    tbl64 = jnp.asarray(rng.standard_normal((V, 64), dtype=np.float32))
    for Msw in [55_000, 110_000, 220_000, 440_000, 880_000]:
        ix = jnp.asarray(rng.integers(0, V, Msw, dtype=np.int32))
        t = bench(lambda c, tbl, ix: tbl[ix] + c, tbl64, ix)
        print(f"  M={Msw:7d}: {1e3 * t:7.2f} ms  ({1e9 * t / Msw:5.1f} ns/row)")

    # --- ROW scatter (windows of 4/16/64 f32 at row-aligned indices) ---
    print("\n-- row scatter-set (unique-ish indices), 131k rows --")
    NR = 131_072
    for W in [1, 4, 16, 64]:
        TT = 1 << 18
        tblW = jnp.zeros((TT, W), jnp.float32) if W > 1 else jnp.zeros((TT,), jnp.float32)
        ixr = jnp.asarray(rng.integers(0, TT, NR, dtype=np.int32))
        valsW = (
            jnp.asarray(rng.standard_normal((NR, W), dtype=np.float32))
            if W > 1
            else jnp.asarray(rng.standard_normal(NR, dtype=np.float32))
        )
        t = bench(
            lambda c, tb, ix, v: tb.at[ix].set(v + c, mode="drop"), tblW, ixr, valsW
        )
        print(f"  W={W:3d}: {1e3 * t:7.2f} ms  ({1e9 * t / NR:5.1f} ns/row)")

    # --- multi-operand sort (decimate ingredient: key + 3 payload lanes) ---
    print("\n-- sort with payload, 1M --")
    NP_ = 1 << 20
    keys = jnp.asarray(rng.integers(0, 1 << 30, NP_, dtype=np.int32))
    pay = jnp.asarray(rng.standard_normal((NP_, 3), dtype=np.float32))
    px, py, pz = pay[:, 0], pay[:, 1], pay[:, 2]
    t = bench(
        lambda c, k, x, y, z: jax.lax.sort([k, x + c, y, z], num_keys=1)[1],
        keys, px, py, pz,
    )
    print(f"  sort_key + 3 f32 lanes: {1e3 * t:7.2f} ms")
    t = bench(
        lambda c, k, x: jax.lax.sort([k, x + c], num_keys=1)[1], keys, px
    )
    print(f"  sort_key + 1 f32 lane:  {1e3 * t:7.2f} ms")
    idx32 = jnp.arange(NP_, dtype=jnp.int32)
    t = bench(
        lambda c, k, i: jax.lax.sort([k, i], num_keys=1)[1] + jnp.int32(c * 0),
        keys, idx32,
    )
    print(f"  sort_key + i32 idx:     {1e3 * t:7.2f} ms")

    # --- cumsum + compact (the decimate tail) ---
    print("\n-- compact 1M -> 131k --")
    flags = jnp.asarray(rng.random(NP_) < 0.12)
    ptsP = jnp.asarray(rng.standard_normal((NP_, 3), dtype=np.float32))

    def compact(c, fl, p):
        pos = jnp.cumsum(fl.astype(jnp.int32)) - 1
        dst = jnp.where(fl, pos, NR)
        out = jnp.zeros((NR, 3), jnp.float32).at[dst].set(p + c, mode="drop")
        return out

    t = bench(compact, flags, ptsP)
    print(f"  cumsum+scatter-rows:    {1e3 * t:7.2f} ms")

    # --- sort (dedup ingredient) ---
    print("\n-- sort u32 --")
    for n in [131_072, 880_000]:
        keys = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
        t = bench(lambda c, k: jnp.sort(k) + jnp.int32(c * 0), keys)
        print(f"  sort {n}: {1e3 * t:7.2f} ms")
        t = bench(
            lambda c, k: jax.lax.sort_key_val(k, k)[1] + jnp.int32(c * 0), keys
        )
        print(f"  sort_key_val {n}: {1e3 * t:7.2f} ms")

    # --- Pallas manual row-DMA gather ---
    print("\n-- pallas row-DMA gather (W=64) --")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = 64
    TILE = 1024  # rows gathered per grid step
    NFLIGHT = 16

    def gather_kernel(idx_ref, tbl_ref, out_ref, buf, sems):
        # idx_ref: (n_tiles, TILE) SMEM int32 (whole scalar-prefetch arg);
        # tbl_ref: (V, W) HBM ("ANY"); buf: (TILE, W) VMEM scratch
        i = pl.program_id(0)

        def issue(j):
            return pltpu.make_async_copy(
                tbl_ref.at[idx_ref[i, j]], buf.at[j], sems.at[j % NFLIGHT]
            )

        def body(j, _):
            issue(j).start()

            @pl.when(j >= NFLIGHT - 1)
            def _():
                # wait for the copy NFLIGHT-1 behind (same semaphore slot
                # ordering: one outstanding copy per slot)
                k = j - (NFLIGHT - 1)
                issue(k).wait()

            return 0

        jax.lax.fori_loop(0, TILE, body, 0)

        def drain(j, _):
            issue(j).wait()
            return 0

        jax.lax.fori_loop(TILE - (NFLIGHT - 1), TILE, drain, 0)
        out_ref[...] = buf[...]

    n_tiles = (args.quick and 8) or 64
    MM = TILE * n_tiles
    idx_s = jnp.asarray(rng.integers(0, V, MM, dtype=np.int32))

    gather_p = pl.pallas_call(
        gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
            out_specs=pl.BlockSpec((TILE, W), lambda i, idx: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((TILE, W), jnp.float32),
                pltpu.SemaphoreType.DMA((NFLIGHT,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((MM, W), jnp.float32),
    )

    def pallas_gather(c, tbl, idx):
        # reshape scalar-prefetch idx per tile inside index closure
        return gather_p(idx, tbl) + c

    try:
        t = bench(pallas_gather, tbl, idx_s.reshape(n_tiles, TILE))
        gb = MM * W * 4 / t / 1e9
        print(f"  {MM} rows: {1e3 * t:7.2f} ms  {gb:7.1f} GB/s  "
              f"({1e9 * t / MM:.0f} ns/row)")
    except Exception as e:  # noqa: BLE001
        print(f"  FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
