"""Row-granularity scatter/gather microbench (round-4 hardware fact).

The measured cost model says element scatters cost ~6-10 ns per STATIC
element and row gathers ~10-12 ns per row (width-free).  The map insert
writes 5 WORDS per stored point as an element scatter — but all 5 land in
ONE 128-lane bucket row, so a row-level read-modify-write (gather rows,
merge lanes, scatter whole rows back) would replace 5*C element writes
with ~C/points-per-voxel row writes.  Whether that wins hinges on the
UNMEASURED cost of a row-windowed scatter: indices (n,), updates (n,128),
one update window per row.  This bench measures it.

Usage: python eval/micro_rowrmw.py  (runs on the default backend; use the
real TPU for decisions).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, repeats=20):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    V = 524288  # bench-shaped table: (V, 128) i32 = 256 MB
    B = 8
    key = jax.random.PRNGKey(0)
    table = jnp.zeros((V, 128), jnp.int32)

    print(f"backend: {jax.default_backend()}  table {table.shape} i32")
    for n in (4096, 8192, 32768, 196608):
        idx = jax.random.randint(key, (n,), 0, V, jnp.int32)
        upd = jnp.ones((n, 128), jnp.int32)

        # row gather baseline (the measured ~10-12 ns/row fact)
        gat = jax.jit(lambda t, i: t[i])
        tg = timeit(gat, table, idx)

        # row-windowed scatter, unique indices (sorted-unique per batch in
        # the real insert; random here — measures the descriptor path)
        def row_set(t, i, u):
            return t.at[i].set(u, mode="drop", unique_indices=True)

        ts = timeit(jax.jit(row_set), table, idx, upd)

        # element scatter reference at the same total element count (n*128)
        flat = table.reshape(-1)
        eidx = jax.random.randint(key, (n * 128,), 0, V * 128, jnp.int32)
        evals = jnp.ones((n * 128,), jnp.int32)

        def el_set(t, i, v):
            return t.at[i].set(v, mode="drop", unique_indices=True)

        te = timeit(jax.jit(el_set), flat, eidx, evals)

        print(
            f"n={n:7d}: row-gather {tg*1e3:7.3f} ms ({tg/n*1e9:6.1f} ns/row)  "
            f"row-scatter {ts*1e3:7.3f} ms ({ts/n*1e9:6.1f} ns/row)  "
            f"elem-scatter(x128) {te*1e3:7.3f} ms ({te/(n*128)*1e9:5.1f} ns/el)"
        )


if __name__ == "__main__":
    main()
