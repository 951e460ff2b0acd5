"""Microbenchmarks of the primitive ops the hot path is built from.

Times individual XLA instructions (gather, scatter flavors, sort, cumsum,
nonzero-compact) at hot-path shapes so kernel work targets the real cost.
Each op runs INNER times inside one lax.scan dispatch with a REAL data
dependency through the loop carry (a tiny f32 perturbation of an operand)
so neither constant folding nor loop-invariant hoisting can elide it; the
per-call host dispatch (~2.5 ms through the TPU tunnel) is measured once by
an empty scan and subtracted.

Usage: python eval/micro_ops.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

INNER = 20


def main():
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)

    def bench(name, f, *args, repeats=5):
        """f(c, *args) -> array; c is a traced f32 scalar to fold in."""

        @jax.jit
        def run(*a):
            def body(c, _):
                out = f(c, *a)
                return jnp.sum(out.astype(jnp.float32)) * 1e-30 + c * 0.5, None

            c, _ = jax.lax.scan(body, jnp.float32(1e-30), None, length=INNER)
            return c

        float(run(*args))  # compile + host read (the only reliable sync here)
        best = np.inf
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(*args))
            best = min(best, time.perf_counter() - t0)
        ms = 1e3 * (best - base) / INNER
        print(f"{name:55s} {ms:8.3f} ms")
        return ms

    # dispatch floor: empty scan
    @jax.jit
    def empty():
        def body(c, _):
            return c * 0.5 + 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(1e-30), None, length=INNER)
        return c

    float(empty())
    base = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        float(empty())
        base = min(base, time.perf_counter() - t0)
    print(f"dispatch floor (empty scan): {1e3*base:.3f} ms/call", file=sys.stderr)

    N = 1 << 17  # raw points
    M = 1 << 16  # map-insert batch
    Q = 1 << 13  # ICP queries
    V = 1 << 17  # map slots
    T = 1 << 19  # decimation table
    ROW = 64  # packed slot row f32 (4 + 3*20)

    idxN = jnp.asarray(rng.integers(0, T, N), jnp.int32)
    idxM = jnp.asarray(rng.integers(0, V, M), jnp.int32)
    idxQ = jnp.asarray(rng.integers(0, V, Q * 27), jnp.int32)
    data = jnp.asarray(rng.random((V, ROW), np.float32))
    valsM = jnp.asarray(rng.random((M, 3), np.float32))

    def ji(c):
        # data-dependent 0/1 int derived from the carry (unfoldable)
        return (c > 2.0).astype(jnp.int32)

    bench(f"gather rows (Q*27={Q*27} x {ROW}f32 = {Q*27*ROW*4/1e6:.0f} MB)",
          lambda c, d, i: d[i + ji(c)], data, idxQ)
    bench(f"gather rows (Q*8 x {ROW}f32 = {Q*8*ROW*4/1e6:.0f} MB)",
          lambda c, d, i: d[i + ji(c)], data, idxQ[: Q * 8])
    g4 = jnp.asarray(rng.random((V, 4), np.float32))
    bench(f"gather rows (M={M} x 4f32 = {M*16/1e6:.1f} MB)",
          lambda c, d, i: d[i + ji(c)], g4, idxM)
    bench(f"scatter-min N={N} -> table {T}",
          lambda c, i: jnp.zeros((T,), jnp.int32)
          .at[i + ji(c)].min(jnp.arange(N, dtype=jnp.int32), mode="drop"), idxN)
    bench(f"scatter-add N={N} -> table {T}",
          lambda c, i: jnp.zeros((T,), jnp.float32).at[i + ji(c)].add(1.0, mode="drop"),
          idxN)
    bench(f"scatter-add M={M} -> data[slot,3] (in table {V}x{ROW})",
          lambda c, d, i: d.at[i + ji(c), 3].add(1.0, mode="drop"), data, idxM)
    flat = data.reshape(-1)
    base_idx = idxM * ROW + 4
    bench(f"scatter-set M={M} x3 flat ({V*ROW} elems)",
          lambda c, fl, b, v: fl.at[
              b[:, None] + jnp.arange(3, dtype=jnp.int32)[None] + ji(c)
          ].set(v, mode="drop"), flat, base_idx, valsM)
    bench(f"argsort M={M} i32", lambda c, i: jnp.argsort(i + ji(c)), idxM)
    bench(f"argsort N={N} i32", lambda c, i: jnp.argsort(i + ji(c)), idxN)
    bench(f"cumsum N={N}", lambda c, i: jnp.cumsum(i + ji(c)), idxN)
    valid = jnp.asarray(rng.random(N) < 0.5)
    bench(f"nonzero(N={N}, size={M})",
          lambda c, v: jnp.nonzero(v ^ (ji(c) > 0), size=M, fill_value=N)[0], valid)
    pk = jnp.asarray(rng.random((N, 7), np.float32))
    gidx = jnp.asarray(rng.integers(0, N, M), jnp.int32)
    bench(f"gather packed (M={M} x 7f32)", lambda c, d, i: d[i + ji(c)], pk, gidx)

    cand = jnp.asarray(rng.random((Q, 27 * 20, 3), np.float32))
    qq = jnp.asarray(rng.random((Q, 3), np.float32))
    bench(f"dense d2+min (Q x540 x3 = {Q*540*3*4/1e6:.0f} MB)",
          lambda c, cd, q: jnp.min(jnp.sum((cd - (q[:, None, :] + c)) ** 2, -1), -1),
          cand, qq)
    a = jnp.asarray(rng.random((4096, 4096), np.float32))
    bench(f"matmul 4096^3 bf16-pass (~{2*4096**3/1e12:.2f} TF)",
          lambda c, x: (x + c) @ x, a)
    bench("transpose (8192, 576) -> planar pad",
          lambda c, cd: jnp.pad((cd + c)[..., 0].reshape(Q, 540), [(0, 0), (0, 36)]),
          cand)


if __name__ == "__main__":
    main()
