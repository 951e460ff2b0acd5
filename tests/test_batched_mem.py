"""Batch-native gather/scatter rules must be bit-equivalent to plain vmap.

ops/batched_mem rewrites vmapped gathers/scatters as flat ops over stacked
slabs (the TPU lowers batched scatter/gather ~4-9x slower).  Equivalence
with the naive batched op — including out-of-range drop/clamp semantics and
slab isolation — is the entire correctness contract.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mola_lidar_odometry_tpu.ops import batched_mem as BM

rng = np.random.default_rng(0)
B, V, R, M = 3, 64, 5, 40


def test_gather_rows_batched():
    data = jnp.asarray(rng.random((B, V, R)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, V, (B, M)), jnp.int32)
    out = jax.vmap(BM.gather_rows)(data, idx)
    ref = jax.vmap(lambda d, i: d[i])(data, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_gather_rows_clamps_per_slab():
    data = jnp.asarray(rng.random((B, V, R)), jnp.float32)
    idx = jnp.asarray([[0, V - 1, V, V + 5]] * B, jnp.int32)  # oob rows
    out = jax.vmap(BM.gather_rows)(data, idx)
    ref = jax.vmap(lambda d, i: d[i])(data, idx)  # XLA clamps per instance
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_gather_rows_broadcast_table():
    data = jnp.asarray(rng.random((V,)), jnp.float32)  # shared 1-D table
    idx = jnp.asarray(rng.integers(0, V, (B, M)), jnp.int32)
    out = jax.vmap(BM.gather_rows, in_axes=(None, 0))(data, idx)
    ref = jax.vmap(lambda i: data[i])(idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_scatter_set_drop_semantics():
    L = V * R
    flat = jnp.asarray(rng.random((B, L)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, L + 10, (B, M)), jnp.int32)  # some oob
    vals = jnp.asarray(rng.random((B, M)), jnp.float32)
    out = jax.vmap(BM.scatter_set)(flat, idx, vals)
    ref = jax.vmap(lambda f, i, v: f.at[i].set(v, mode="drop"))(flat, idx, vals)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_scatter_add_2d_indices():
    L = V * 3
    flat = jnp.zeros((B, L), jnp.float32)
    base = jnp.asarray(rng.integers(0, V, (B, M)), jnp.int32) * 3
    idx = base[..., None] + jnp.arange(3, dtype=jnp.int32)
    vals = jnp.asarray(rng.random((B, M, 3)), jnp.float32)
    out = jax.vmap(BM.scatter_add)(flat, idx, vals)
    ref = jax.vmap(lambda f, i, v: f.at[i].add(v, mode="drop"))(flat, idx, vals)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_table_min_batched():
    tbl = jnp.full((B, V), 10_000, jnp.int32)
    idx = jnp.asarray(rng.integers(0, V, (B, M)), jnp.int32)
    vals = jnp.asarray(rng.integers(0, 1000, (B, M)), jnp.int32)
    out = jax.vmap(BM.table_min)(tbl, idx, vals)
    ref = jax.vmap(lambda t, i, v: t.at[i].min(v, mode="drop"))(tbl, idx, vals)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_unbatched_paths_unchanged():
    data = jnp.asarray(rng.random((V, R)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, V, (M,)), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(BM.gather_rows(data, idx)), np.asarray(data[idx])
    )
    flat = jnp.zeros((V,), jnp.float32)
    vals = jnp.asarray(rng.random((M,)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(BM.scatter_add(flat, idx, vals)),
        np.asarray(flat.at[idx].add(vals, mode="drop")),
    )
