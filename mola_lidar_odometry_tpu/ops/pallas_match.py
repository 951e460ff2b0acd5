"""Pallas TPU kernel: fused nearest-candidate selection for the ICP loop.

The per-iteration hot op of the odometry is "for each scan point, find the
nearest cached candidate and its distance" (ops/voxel_hash.nn_from).  The
XLA version materializes the (N, P*K) distance matrix through HBM between
the subtract/reduce/select stages; this kernel keeps a query tile's whole
candidate block in VMEM and produces the selected target + distance in one
pass — the distance matrix never leaves the chip's vector memory.

Layout: candidates arrive PLANAR — per-coordinate (N, C) planes padded to a
lane multiple — built once per align() from the cached AoS candidate set
(a cheap transpose amortized over all ICP iterations).  Inside the kernel
everything is (TILE, C) lane-aligned VPU math; the winning candidate is
extracted with a one-hot sum (no in-kernel gather).

Auto-enabled when the default backend is TPU; MOLA_TPU_PALLAS=0/1 forces.
Tests run the same kernel in interpreter mode on CPU (tiny shapes only —
the interpreter is orders of magnitude slower than compiled execution).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128  # queries per grid step
LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class PlanarCands(NamedTuple):
    """Planar candidate planes, lane-padded: (N, Cpad) each."""

    x: jax.Array
    y: jax.Array
    z: jax.Array
    mask: jax.Array  # f32 0/1


def to_planar(cand) -> PlanarCands:
    """AoS CandSet (ops/voxel_hash, pts (N,C,3) / mask (N,C)) -> padded
    planar planes.  One transpose per align(), amortized over iterations."""
    n, c = cand.mask.shape
    cpad = _round_up(c, LANES)
    pad = [(0, 0), (0, cpad - c)]

    def pp(a):
        return jnp.pad(a.reshape(n, c), pad)

    return PlanarCands(
        x=pp(cand.pts[..., 0]),
        y=pp(cand.pts[..., 1]),
        z=pp(cand.pts[..., 2]),
        mask=pp(cand.mask.astype(jnp.float32)),
    )


def _nn_kernel(qx_ref, qy_ref, qz_ref, cx_ref, cy_ref, cz_ref, m_ref, out_ref):
    dx = cx_ref[:] - qx_ref[:]  # (T, C) - (T, 1)
    dy = cy_ref[:] - qy_ref[:]
    dz = cz_ref[:] - qz_ref[:]
    d2 = dx * dx + dy * dy + dz * dz
    big = jnp.float32(3.4e38)
    d2 = jnp.where(m_ref[:] > 0, d2, big)
    dmin = jnp.min(d2, axis=1, keepdims=True)  # (T, 1)
    # first-match one-hot of the winner (ties resolved by lowest lane index)
    C = d2.shape[1]
    is_min = d2 <= dmin
    lane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    first = jnp.min(jnp.where(is_min, lane, jnp.int32(C)), axis=1, keepdims=True)
    oh = (lane == first).astype(jnp.float32)
    out_ref[:, 0:1] = jnp.sum(cx_ref[:] * oh, axis=1, keepdims=True)
    out_ref[:, 1:2] = jnp.sum(cy_ref[:] * oh, axis=1, keepdims=True)
    out_ref[:, 2:3] = jnp.sum(cz_ref[:] * oh, axis=1, keepdims=True)
    out_ref[:, 3:4] = dmin


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_select(
    planar: PlanarCands, queries: jax.Array, interpret: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """Fused nearest-candidate select: returns (tgt (N,3), d2min (N,)).

    ``d2min`` is +big (not inf) for queries with no candidate; callers
    threshold on it exactly like the XLA path.
    """
    n, cpad = planar.mask.shape
    npad = _round_up(n, TILE)
    rpad = [(0, npad - n), (0, 0)]
    qpad = jnp.pad(queries, [(0, npad - n), (0, 0)])
    qx, qy, qz = (qpad[:, i : i + 1] for i in range(3))  # (Np, 1)
    cx = jnp.pad(planar.x, rpad)
    cy = jnp.pad(planar.y, rpad)
    cz = jnp.pad(planar.z, rpad)
    mk = jnp.pad(planar.mask, rpad)

    grid = (npad // TILE,)
    qspec = pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((TILE, cpad), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _nn_kernel,
        out_shape=jax.ShapeDtypeStruct((npad, 4), jnp.float32),
        grid=grid,
        in_specs=[qspec, qspec, qspec, cspec, cspec, cspec, cspec],
        out_specs=pl.BlockSpec((TILE, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qx, qy, qz, cx, cy, cz, mk)

    out = out[:n]
    return out[:, :3], out[:, 3]
