"""Pallas TPU kernel: fused neighborhood-capture reduction.

Capture is the dominant memory mover of the whole odometry step: one
(N*P)-row gather of packed slot windows (~MBs per scan at production
shapes) followed by the per-voxel top-2 reduction.  The XLA formulation of
that reduction re-streams the (N, P, K, 3) candidate tensor from HBM 2-3
times and was measured at ~17 ms of the ~19.6 ms capture total (B=8, v5e).

This kernel keeps the gather in XLA (measured at the hardware's random-row
floor — a manual per-row DMA loop cannot beat it) and fuses EVERYTHING
after it into one pass: window select, key check, live/count masking,
point dequantization, squared distances, and the top-2-per-voxel one-hot
selection, reading each gathered row from HBM exactly once.

Layout is everything on this VPU: with queries on LANES and the K point
slots on SUBLANES every op runs at full 128-lane width.  The gathered row
block arrives query-major ``(TQ, 128)`` and is transposed in-kernel (the
XLU transpose is cheap: the naive query-on-sublanes variant measured
20.7 ms, this one 3.4 ms for identical math).  Rows are gathered in
probe-major order ``(P, npad, 128)`` and results are written straight into
the planar ``(plane, P, npad)`` arrangement the fused align kernel
(ops/pallas_icp.py) keeps in VMEM — no transposes outside the kernel.

Data layout contract (ops/voxel_hash.py, round-4 packed storage): the
table is ``(rows, 128) int32`` with ``W = 128 // stride`` slot windows per
physical row = one W-way BUCKET.  A slot window is ``[pkey | state |
packed_pt * K]`` where ``pkey`` is the wrapped 12|12|8-bit voxel key,
``state`` packs ``epoch<<16 | count``, and each point is ONE i32 lane: the
within-voxel offset quantized 10|10|10 (x|y|z).  The kernel gathers full
bucket rows, selects the way whose live pkey matches the probe's expected
key, and dequantizes offsets against the probe's own voxel coords (already
in registers) — bit-exact vs ``voxel_hash.unpack_points`` (same op order).

Semantics match ``voxel_hash.capture(..., per_voxel_nn=True)`` exactly:
the reference behavior served is the KD-tree NN search inside
``mp2p_icp::Matcher_Points_DistanceThreshold`` (reference
pipelines/lidar3d-default.yaml:196-204) under the capture-once regime.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.4e38
_QBITS = 10
_Q = 1 << _QBITS
_INV_Q = 1.0 / _Q


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(K: int, P: int, TQ: int, neighbors: int, stride: int,
                 reselect: bool = False):
    W = 128 // stride

    def kernel(sp_ref, g_ref, q_ref, out_ref):
        # sp_ref: (1, 8) f32 SMEM [voxel_size, inv_voxel_size, epoch16, ...]
        # g_ref:  (P, TQ, 128) VMEM i32 — bucket rows, all probes of tile
        # q_ref:  (8, TQ) VMEM f32 — query planes [x; y; z; pad...];
        #         in reselect mode rows 3:6 carry the CAPTURE-TIME query
        #         positions the rows in g_ref were gathered for
        # out_ref:(8, P, TQ) VMEM f32 — planes [x1,y1,z1,m1,x2,y2,z2,m2]
        vs = sp_ref[0, 0]
        inv_vs = sp_ref[0, 1]
        epoch16 = sp_ref[0, 2]

        qx = q_ref[0:1, :]  # (1, TQ)
        qy = q_ref[1:2, :]
        qz = q_ref[2:3, :]
        # Probe-derivation coords: in reselect mode the bucket rows were
        # gathered for the capture-time positions, so expected keys MUST
        # re-derive from those (rows 3:6) — the live query (rows 0:3) only
        # ranks distances.  Same op order as the original capture, so the
        # key derivation is bit-exact vs the gather's.
        if reselect:
            cxq = q_ref[3:4, :]
            cyq = q_ref[4:5, :]
            czq = q_ref[5:6, :]
        else:
            cxq, cyq, czq = qx, qy, qz
        # expected probe key: floor(q / vs) + offset(p)  (reproduces
        # voxel_coords + neighbor_coords bit-exactly — same op order)
        bx = jnp.floor(cxq * inv_vs)
        by = jnp.floor(cyq * inv_vs)
        bz = jnp.floor(czq * inv_vs)
        if neighbors in (4, 8):
            sx = jnp.where(cxq * inv_vs - (bx + 0.5) >= 0, 1.0, -1.0)
            sy = jnp.where(cyq * inv_vs - (by + 0.5) >= 0, 1.0, -1.0)
            sz = jnp.where(czq * inv_vs - (bz + 0.5) >= 0, 1.0, -1.0)

        sub_k = jax.lax.broadcasted_iota(jnp.int32, (K, TQ), 0)
        k_iota = sub_k.astype(jnp.float32)  # tpu.iota is integer-only

        # STATIC unrolled probe loop: every slice below is compile-time
        for p in range(P):
            rt = jnp.transpose(g_ref[p])  # (128, TQ) i32 — XLU transpose

            if neighbors == 27:
                # _OFFS27 order: dx major, dz minor
                ex = bx + float(p // 9 - 1)
                ey = by + float((p // 3) % 3 - 1)
                ez = bz + float(p % 3 - 1)
            elif neighbors == 8:
                # _CORNERS8 order: i major, k minor; corner * step(side)
                ex = bx + float(p // 4) * sx
                ey = by + float((p // 2) % 2) * sy
                ez = bz + float(p % 2) * sz
            elif neighbors == 4:
                # containing voxel + 3 single-axis face neighbors on the
                # query's side (voxel_hash.neighbor_coords neighbors==4)
                ex = bx + float(p == 1) * sx
                ey = by + float(p == 2) * sy
                ez = bz + float(p == 3) * sz
            elif neighbors == 1:
                ex, ey, ez = bx, by, bz
            else:  # pragma: no cover - guarded by the wrapper
                raise ValueError(neighbors)

            # wrapped 12|12|8 packed key (bit-exact vs voxel_hash.pack_key)
            ix = ex.astype(jnp.int32) & 4095
            iy = ey.astype(jnp.int32) & 4095
            iz = ez.astype(jnp.int32) & 255
            pk_exp = (ix << 20) | (iy << 8) | iz

            # W-way bucket: pick the stride-lane way whose live pkey
            # matches (insert keeps live pkeys unique within a bucket, so
            # at most one way matches and the select order is irrelevant)
            ways = [rt[w * stride : (w + 1) * stride] for w in range(W)]

            def way_ok(h):
                ep = ((h[1:2] >> 16) & 0xFFFF).astype(jnp.float32) == epoch16
                return (h[0:1] == pk_exp) & ep

            oks = [way_ok(h) for h in ways]
            half = ways[0]
            any_ok = oks[0]
            for h, ok in zip(ways[1:], oks[1:]):
                half = jnp.where(ok, h, half)
                any_ok = any_ok | ok
            state = half[1:2]
            cnt = (state & 0xFFFF).astype(jnp.float32)
            # dequantize the packed 10|10|10 within-voxel offsets against
            # the probe's voxel coords — same op order as unpack_points
            pp = half[2 : 2 + K]  # (K, TQ) i32
            px = ((pp >> (2 * _QBITS)) & (_Q - 1)).astype(jnp.float32)
            py = ((pp >> _QBITS) & (_Q - 1)).astype(jnp.float32)
            pz = (pp & (_Q - 1)).astype(jnp.float32)
            xs = (ex + (px + 0.5) * _INV_Q) * vs
            ys = (ey + (py + 0.5) * _INV_Q) * vs
            zs = (ez + (pz + 0.5) * _INV_Q) * vs
            live = any_ok & (cnt > 0)
            kmask = live & (k_iota < cnt)

            dx = xs - qx
            dy = ys - qy
            dz = zs - qz
            d2 = jnp.where(kmask, dx * dx + dy * dy + dz * dz, BIG)

            def pick(d2m):
                dmin = jnp.min(d2m, axis=0, keepdims=True)  # (1, TQ)
                first = jnp.min(
                    jnp.where(d2m <= dmin, sub_k, jnp.int32(K)),
                    axis=0,
                    keepdims=True,
                )
                oh = (sub_k == first).astype(jnp.float32)
                x = jnp.sum(xs * oh, axis=0)
                y = jnp.sum(ys * oh, axis=0)
                z = jnp.sum(zs * oh, axis=0)
                m = (dmin < BIG).astype(jnp.float32)[0]
                return x, y, z, m, oh

            x1, y1, z1, m1, oh1 = pick(d2)
            x2, y2, z2, m2, _ = pick(jnp.where(oh1 > 0, BIG, d2))

            for c, v in enumerate((x1, y1, z1, m1, x2, y2, z2, m2)):
                out_ref[c, p, :] = v

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "neighbors", "interpret", "tile_q", "K", "stride", "return_rows"
    ),
)
def capture_planar(
    data: jax.Array,  # (rows, 128) i32 packed slot windows
    voxel_size: jax.Array,  # () f32
    epoch: jax.Array,  # () i32 — slot-liveness tag (see voxel_hash docstring)
    queries: jax.Array,  # (N, 3) world-frame query points
    neighbors: int = 27,
    interpret: bool = False,
    tile_q: int = 256,
    K: int = 20,
    stride: int = 32,
    valid: jax.Array | None = None,  # (N,) bool — see spread-pad note below
    return_rows: bool = False,  # also return the gathered bucket rows
) -> Tuple[jax.Array, ...]:
    """Fused capture: returns planar candidates ``(cx, cy, cz, cm)``, each
    ``(2P, npad)`` f32 — exactly the layout ops/pallas_icp.align_fused keeps
    in VMEM, so no transposes exist anywhere on the fused path."""
    from mola_lidar_odometry_tpu.ops.filters import voxel_coords, voxel_hash
    from mola_lidar_odometry_tpu.ops.voxel_hash import neighbor_coords
    from mola_lidar_odometry_tpu.ops import batched_mem as BM

    if 128 % stride or not 2 + K <= stride <= 128:  # pragma: no cover
        raise ValueError((K, stride))
    NB = data.shape[0]  # one W-way bucket per physical row (stride <= 128)
    n = queries.shape[0]
    TQ = min(tile_q, _round_up(max(n, 128), 128))
    npad = _round_up(max(n, TQ), TQ)
    q = jnp.pad(queries, [(0, npad - n), (0, 0)])

    base = voxel_coords(q, voxel_size)
    cand = neighbor_coords(q, base, voxel_size, neighbors)  # (npad, P, 3)
    P = cand.shape[1]
    buckets = voxel_hash(cand, NB)  # (npad, P)
    # Spread-pad: INVALID queries (dead layer slots + the npad tail) are
    # all-zero points, so every one of them probes the SAME 8 rows around
    # voxel (0,0,0) — and duplicated gather rows are measurably SLOWER
    # than unique ones on this hardware (eval/micro_gather.py: 50% dups
    # 15.2 ms vs 11.9 ms at 880k rows).  Route them to consecutive
    # (iota) rows instead; their candidate mask is zeroed below so the
    # spread rows never produce a pairing.
    if valid is not None:
        vmask = jnp.pad(valid.astype(bool), (0, npad - n))
        spread = (
            jnp.arange(npad, dtype=jnp.int32)[:, None] * P
            + jnp.arange(P, dtype=jnp.int32)[None]
        ) % jnp.int32(NB)
        buckets = jnp.where(vmask[:, None], buckets, spread)
    buckets_pm = jnp.swapaxes(buckets, 0, 1)  # (P, npad) probe-major
    # probe-major gather: rows arrive grouped by p, queries contiguous
    g = BM.gather_rows(data, buckets_pm.reshape(-1)).reshape(P, npad, 128)
    q8 = jnp.pad(jnp.swapaxes(q, 0, 1), [(0, 5), (0, 0)])  # (8, npad)

    sp = jnp.stack(
        [
            jnp.asarray(voxel_size, jnp.float32),
            1.0 / jnp.asarray(voxel_size, jnp.float32),
            (jnp.asarray(epoch, jnp.int32) & 0xFFFF).astype(jnp.float32),
        ]
    )
    sp = jnp.pad(sp, (0, 5)).reshape(1, 8)

    ntiles = npad // TQ
    out = pl.pallas_call(
        _make_kernel(K, P, TQ, neighbors, stride),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((P, TQ, 128), lambda j: (0, j, 0)),
            pl.BlockSpec((8, TQ), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((8, P, TQ), lambda j: (0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((8, P, npad), jnp.float32),
        interpret=interpret,
    )(sp, g, q8)

    # planes -> (2P, npad): top-1 block over top-2 block, plain concats
    cx = jnp.concatenate([out[0], out[4]], axis=0)
    cy = jnp.concatenate([out[1], out[5]], axis=0)
    cz = jnp.concatenate([out[2], out[6]], axis=0)
    cm = jnp.concatenate([out[3], out[7]], axis=0)
    if valid is not None:
        # spread-pad rows must never pair (see note above)
        cm = cm * vmask[None].astype(cm.dtype)
    if return_rows:
        return cx, cy, cz, cm, g
    return cx, cy, cz, cm


@functools.partial(
    jax.jit,
    static_argnames=("neighbors", "interpret", "tile_q", "K", "stride"),
)
def capture_planar_reselect(
    rows: jax.Array,  # (P, npad, 128) i32 — gathered by capture_planar
    voxel_size: jax.Array,
    epoch: jax.Array,
    queries_live: jax.Array,  # (N, 3) — positions to rank distances from
    queries_cap: jax.Array,  # (N, 3) — positions the rows were gathered for
    neighbors: int = 8,
    interpret: bool = False,
    tile_q: int = 256,
    K: int = 20,
    stride: int = 32,
    valid: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Re-run the top-2 per-voxel selection on ALREADY-GATHERED bucket rows
    with moved query positions — no new HBM row gather.

    The mid-align refresh (ops/icp.py phase 2) starts within the hook
    bound (<= ~0.15 m) of the capture pose, so the 8-probe half-voxel-exact
    footprint gathered at the ENTRY pose is still a superset of the
    neighborhood at the settled pose — what changes is WHICH candidates are
    the top-2 per voxel.  Re-ranking the same rows against the moved
    queries recovers exactly that, for the cost of one kernel pass (~0.14
    ms at B=8) instead of a fresh (N*P)-row gather (~0.8-1.6 ms, the
    step's dominant instruction).  Probe keys re-derive from
    ``queries_cap`` (bit-exact vs the original gather's bucket choice);
    distances rank against ``queries_live``."""
    if 128 % stride or not 2 + K <= stride <= 128:  # pragma: no cover
        raise ValueError((K, stride))
    P, npad, _ = rows.shape
    n = queries_live.shape[0]
    TQ = min(tile_q, npad)
    ql = jnp.pad(queries_live, [(0, npad - n), (0, 0)])
    qc = jnp.pad(queries_cap, [(0, npad - n), (0, 0)])
    q8 = jnp.concatenate(
        [jnp.swapaxes(ql, 0, 1), jnp.swapaxes(qc, 0, 1)], axis=0
    )
    q8 = jnp.pad(q8, [(0, 2), (0, 0)])  # (8, npad)

    sp = jnp.stack(
        [
            jnp.asarray(voxel_size, jnp.float32),
            1.0 / jnp.asarray(voxel_size, jnp.float32),
            (jnp.asarray(epoch, jnp.int32) & 0xFFFF).astype(jnp.float32),
        ]
    )
    sp = jnp.pad(sp, (0, 5)).reshape(1, 8)

    ntiles = npad // TQ
    out = pl.pallas_call(
        _make_kernel(K, P, TQ, neighbors, stride, reselect=True),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((P, TQ, 128), lambda j: (0, j, 0)),
            pl.BlockSpec((8, TQ), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((8, P, TQ), lambda j: (0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((8, P, npad), jnp.float32),
        interpret=interpret,
    )(sp, rows, q8)

    cx = jnp.concatenate([out[0], out[4]], axis=0)
    cy = jnp.concatenate([out[1], out[5]], axis=0)
    cz = jnp.concatenate([out[2], out[6]], axis=0)
    cm = jnp.concatenate([out[3], out[7]], axis=0)
    if valid is not None:
        vmask = jnp.pad(valid.astype(bool), (0, npad - n))
        cm = cm * vmask[None].astype(cm.dtype)
    return cx, cy, cz, cm
