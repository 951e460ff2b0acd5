"""Batch-native gather/scatter primitives for the hash-map hot path.

``jax.vmap`` of a gather/scatter adds a leading batch dimension to the
operand and turns the op into a *batched* XLA gather/scatter — which TPU
lowers an order of magnitude slower than the flat form (measured at B=8:
capture gathers 9x, insert scatters 4-6x slower per element than their
unbatched equivalents).  The fleet path (parallel/batch.py vmaps the whole
scan step) hits exactly this.

These helpers wrap the three memory shapes the voxel maps use with
``jax.custom_batching.custom_vmap`` rules that REWRITE the batched op as a
single FLAT gather/scatter over the stacked array with offset indices —
identical semantics (each instance's indices stay inside its own slab,
enforced with the same ``mode="drop"`` the per-instance ops use), flat-op
speed.  Unbatched callers get the plain op; nested vmap recurses into the
same rule.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap


def _bcast(x, axis_size, batched):
    """Give ``x`` a leading batch axis (broadcast when it wasn't batched)."""
    if batched:
        return x
    return jax.lax.broadcast(x, (axis_size,))


# -- row gather: data (V, R)[idx (M,)] -> (M, R) ----------------------------


@custom_vmap
def gather_rows(data: jax.Array, idx: jax.Array) -> jax.Array:
    """``data[idx]`` with out-of-range rows clamped (XLA default)."""
    return data[idx]


@gather_rows.def_vmap
def _gather_rows_vmap(axis_size, in_batched, data, idx):
    data_b, idx_b = in_batched
    data = _bcast(data, axis_size, data_b)
    idx = _bcast(idx, axis_size, idx_b)
    B, V = data.shape[0], data.shape[1]
    flat = data.reshape((B * V,) + data.shape[2:])
    # reproduce the unbatched clamp semantics PER SLAB (an oob index must
    # not leak into the next instance's rows)
    idx_c = jnp.clip(idx, 0, V - 1)
    off = jnp.arange(B, dtype=idx.dtype) * V
    out = flat[(idx_c + off.reshape((B,) + (1,) * (idx.ndim - 1))).reshape(-1)]
    return out.reshape(idx.shape + data.shape[2:]), True


# -- flat scatter-set: flat (L,).at[idx (...,)].set(vals) mode=drop ----------


@custom_vmap
def scatter_set(flat: jax.Array, idx: jax.Array, vals: jax.Array) -> jax.Array:
    """``flat.at[idx].set(vals, mode='drop')`` (idx/vals same shape)."""
    return flat.at[idx].set(vals, mode="drop")


@scatter_set.def_vmap
def _scatter_set_vmap(axis_size, in_batched, flat, idx, vals):
    f_b, i_b, v_b = in_batched
    flat = _bcast(flat, axis_size, f_b)
    idx = _bcast(idx, axis_size, i_b)
    vals = _bcast(vals, axis_size, v_b)
    B, L = flat.shape
    off = jnp.arange(B, dtype=idx.dtype).reshape((B,) + (1,) * (idx.ndim - 1)) * L
    # out-of-slab (dropped) indices stay dropped: oob values are >= L, and
    # adding the slab offset keeps them outside [0, B*L) for every slab but
    # the last — clamp them to B*L explicitly so drop semantics hold there.
    gidx = jnp.where(idx < L, idx + off, B * L)
    out = flat.reshape(-1).at[gidx.reshape(-1)].set(vals.reshape(-1), mode="drop")
    return out.reshape(B, L), True


# -- flat scatter-set, caller-promised unique indices ------------------------
#
# XLA lowers a TPU scatter with potentially-duplicate indices through a
# sort + segmented-combine phase (measured: +0.5 ms sort + a second fusion
# on the map-insert scatter).  When the caller guarantees every non-dropped
# index is distinct, `unique_indices=True` skips that machinery.  Dropped
# (out-of-range) entries may still repeat: they never land, so the promise
# only covers indices that actually write.


@custom_vmap
def scatter_set_unique(flat: jax.Array, idx: jax.Array, vals: jax.Array) -> jax.Array:
    """``flat.at[idx].set(vals, mode='drop', unique_indices=True)``."""
    return flat.at[idx].set(vals, mode="drop", unique_indices=True)


@scatter_set_unique.def_vmap
def _scatter_set_unique_vmap(axis_size, in_batched, flat, idx, vals):
    f_b, i_b, v_b = in_batched
    flat = _bcast(flat, axis_size, f_b)
    idx = _bcast(idx, axis_size, i_b)
    vals = _bcast(vals, axis_size, v_b)
    B, L = flat.shape
    off = jnp.arange(B, dtype=idx.dtype).reshape((B,) + (1,) * (idx.ndim - 1)) * L
    gidx = jnp.where(idx < L, idx + off, B * L)
    out = (
        flat.reshape(-1)
        .at[gidx.reshape(-1)]
        .set(vals.reshape(-1), mode="drop", unique_indices=True)
    )
    return out.reshape(B, L), True


# -- flat scatter-add ---------------------------------------------------------


@custom_vmap
def scatter_add(flat: jax.Array, idx: jax.Array, vals: jax.Array) -> jax.Array:
    """``flat.at[idx].add(vals, mode='drop')``."""
    return flat.at[idx].add(vals, mode="drop")


@scatter_add.def_vmap
def _scatter_add_vmap(axis_size, in_batched, flat, idx, vals):
    f_b, i_b, v_b = in_batched
    flat = _bcast(flat, axis_size, f_b)
    idx = _bcast(idx, axis_size, i_b)
    vals = _bcast(vals, axis_size, v_b)
    B, L = flat.shape
    off = jnp.arange(B, dtype=idx.dtype).reshape((B,) + (1,) * (idx.ndim - 1)) * L
    gidx = jnp.where(idx < L, idx + off, B * L)
    out = flat.reshape(-1).at[gidx.reshape(-1)].add(vals.reshape(-1), mode="drop")
    return out.reshape(B, L), True


# -- table scatter-min (the claim tables; caller supplies the filled table) --


@custom_vmap
def table_min(table: jax.Array, idx: jax.Array, vals: jax.Array) -> jax.Array:
    """``table.at[idx].min(vals, mode='drop')``."""
    return table.at[idx].min(vals, mode="drop")


@table_min.def_vmap
def _table_min_vmap(axis_size, in_batched, table, idx, vals):
    t_b, i_b, v_b = in_batched
    table = _bcast(table, axis_size, t_b)
    idx = _bcast(idx, axis_size, i_b)
    vals = _bcast(vals, axis_size, v_b)
    B, L = table.shape
    off = jnp.arange(B, dtype=idx.dtype).reshape((B,) + (1,) * (idx.ndim - 1)) * L
    gidx = jnp.where((idx >= 0) & (idx < L), idx + off, B * L)
    out = (
        table.reshape(-1).at[gidx.reshape(-1)].min(vals.reshape(-1), mode="drop")
    )
    return out.reshape(B, L), True
