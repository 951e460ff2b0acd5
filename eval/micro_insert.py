"""Design study: map-insert write-path variants at the bench shapes.

Round-2 profile: the single-instruction insert scatter costs 5.9 ms/step
plus a 2.5 ms layout round-trip (reshape of the (V, 65)-row table to flat
and back — 65 f32 rows are physically padded to 128 lanes, so the flat
view must be materialized).  This measures the candidate replacements at
the exact bench shapes (B=8 stacked slabs, V=2^17 slots/instance,
n=13312 insert points/instance) so the round-3 layout follows data:

  - current: (B*V, 65) table, flat-elem scatter of n*8 elements + reshape
  - R=128 rows (flat view should be layout-free): same scatter
  - fused meta (4 elements/point instead of 8)
  - row-granular scatter (one index per point, whole-row update)
  - split tables: meta rows (B*V, 8) + point rows (B*V*K', 4)
  - pure reshape round-trip cost at both widths

Usage: python eval/micro_insert.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

INNER = 10


def bench_state(f, state, *args, repeats=5):
    """Time f(state, *args) -> state chained through a scan (dependency-true).

    IMPORTANT (axon tunnel): block_until_ready returns at dispatch-ack, not
    at compute completion — only a device->host transfer truly waits, so the
    run returns a scalar slice of the final state and the host float()s it.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(state, *a):
        def body(c, _):
            return f(c, *a), None

        c, _ = jax.lax.scan(body, state, None, length=INNER)
        leaf = jax.tree_util.tree_leaves(c)[0]
        return jnp.asarray(leaf).ravel()[0].astype(jnp.float32)

    float(run(state, *args))  # compile + settle
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(state, *args))
        best = min(best, time.perf_counter() - t0)
    return best / INNER


def main():
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)

    B = 8
    V = 1 << 17
    n = 13312  # insert points per instance
    K = 20

    rows_i = rng.integers(0, V, (B, n), dtype=np.int32)
    rows = jnp.asarray(rows_i + (np.arange(B, dtype=np.int32) * V)[:, None]).reshape(-1)

    def report(name, t, extra=""):
        print(f"  {name:42s} {1e3 * t:8.3f} ms {extra}")

    # --- element scatters at R=65 (current) vs R=128, 8 vs 4 els/point ---
    for R in (65, 128):
        tbl = jnp.zeros((B * V, R), jnp.float32)
        for els in (8, 4, 2):
            # element offsets spread across the row like the real insert
            cols = (rng.integers(0, R, (B, n, els))).astype(np.int32)
            flat_idx = jnp.asarray(
                rows_i[..., None].astype(np.int64) * R + cols
                + (np.arange(B, dtype=np.int64) * V * R)[:, None, None]
            ).astype(jnp.int32).reshape(-1)
            vals = jnp.asarray(
                rng.standard_normal(flat_idx.shape[0]).astype(np.float32)
            )

            def f_elem(t, idx, v):
                flat = t.reshape(-1).at[idx].set(v, mode="drop")
                return flat.reshape(t.shape)

            t = bench_state(f_elem, tbl, flat_idx, vals)
            report(f"elem scatter R={R} els/pt={els} (+reshape)", t,
                   f"({B * n * els} els)")

    # --- pure reshape round-trip cost ---
    for R in (65, 128):
        tbl = jnp.zeros((B * V, R), jnp.float32)

        def f_resh(t):
            return (t.reshape(-1) + 0.0).reshape(t.shape)

        t = bench_state(f_resh, tbl)
        report(f"reshape->flat->+0->reshape R={R}", t)

    # --- row-granular scatter: one index per point, full-row update ---
    for R in (8, 65, 128):
        tbl = jnp.zeros((B * V, R), jnp.float32)
        vals = jnp.asarray(rng.standard_normal((B * n, R)).astype(np.float32))

        def f_row(t, r, v):
            return t.at[r].set(v, mode="drop")

        t = bench_state(f_row, tbl, rows, vals)
        report(f"row scatter R={R} (n rows/pt=1)", t, f"({B * n} rows)")

    # --- split point table: rows of 4 at (B*V*Kp, 4) ---
    for Kp in (K,):
        ptbl = jnp.zeros((B * V * Kp, 4), jnp.float32)
        dest = rng.integers(0, Kp, (B, n), dtype=np.int32)
        prow = jnp.asarray(
            (rows_i.astype(np.int64) + (np.arange(B, dtype=np.int64) * V)[:, None])
            * Kp
            + dest
        ).astype(jnp.int32).reshape(-1)
        pvals = jnp.asarray(rng.standard_normal((B * n, 4)).astype(np.float32))

        def f_prow(t, r, v):
            return t.at[r].set(v, mode="drop")

        t = bench_state(f_prow, ptbl, prow, pvals)
        report(f"pts-row scatter (B*V*{Kp}, 4)", t, f"({B * n} rows)")

    # --- gather width check at the same table shapes ---
    gidx = jnp.asarray(
        rng.integers(0, B * V, B * n * 8, dtype=np.int32)
    )
    for R in (65, 128):
        tbl = jnp.asarray(rng.standard_normal((B * V, R)).astype(np.float32))

        def f_g(c, t, i):
            return c + jnp.sum(t[i][:, :5]) * 1e-30

        t = bench_state(f_g, jnp.float32(0.0), tbl, gidx)
        report(f"row gather R={R} ({B * n * 8} rows)", t)


if __name__ == "__main__":
    main()
