"""Fused projection-window matcher as a Pallas TPU kernel.

The XLA formulation of SearchByProjection (models/kernels.projection_matcher)
materializes several (M,N) intermediates in HBM — the Hamming matrix, the
window/octave/validity masks, the masked copy for the second-best pass —
~10 full-matrix HBM sweeps per frame (measured 6.6 ms of the 8.5 ms frame
step at M=4096, N≈1.3k on TPU v5e). This kernel keeps one (TR,N) row-tile of
the distance matrix in VMEM and produces only the per-row reductions
(best index, best distance, second-best distance): a single pass over the
pair space, compute-bound on the VPU's XOR+popcount.

Row tile TR=128; N and M are padded to multiples of (128, TR) by the wrapper.
The cross-row duplicate resolution (one winner per feature column) stays in
XLA on the (M,) outputs — it is O(M), not O(M·N).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 10_000   # plain int: a jnp scalar would be a captured constant in the kernel
_TR = 128


def _kernel(octave_lo: int, octave_hi: int,
            mp_desc, uv, rad, lvl, row_ok,
            feat_desc, feat_xy, feat_oct, feat_ok,
            idx_ref, best_ref, second_ref):
    a = mp_desc[:]                       # (TR, 8) uint32
    b = feat_desc[:]                     # (N, 8) uint32
    TR = a.shape[0]
    N = b.shape[0]
    dist = jnp.zeros((TR, N), jnp.int32)
    for k in range(8):
        x = jax.lax.bitwise_xor(a[:, k][:, None], b[:, k][None, :])
        dist = dist + jax.lax.population_count(x).astype(jnp.int32)
    du = jnp.abs(uv[:, 0][:, None] - feat_xy[:, 0][None, :])
    dv = jnp.abs(uv[:, 1][:, None] - feat_xy[:, 1][None, :])
    r = rad[:, 0][:, None]
    m = (du <= r) & (dv <= r)
    doct = feat_oct[:, 0][None, :] - lvl[:, 0][:, None]
    m &= (doct >= -octave_lo) & (doct <= octave_hi)
    m &= (feat_ok[:, 0] != 0)[None, :]
    m &= (row_ok[:, 0] != 0)[:, None]
    d = jnp.where(m, dist, _BIG)
    # argmin is unsupported for int32 in mosaic: pack (distance, column) into
    # one int32 key — min over keys gives the best distance AND the lowest
    # column among ties (same tie-break as XLA argmin). d ≤ 10000, col <
    # 8192 → key < 2^31.
    col = jax.lax.broadcasted_iota(jnp.int32, (TR, N), 1)
    key = d * 8192 + col
    kmin = jnp.min(key, axis=1)
    best = kmin // 8192
    idx = kmin - best * 8192
    d2 = jnp.where(col == idx[:, None], _BIG, d)
    second = jnp.min(d2, axis=1)
    idx_ref[:] = idx[:, None]
    best_ref[:] = best[:, None]
    second_ref[:] = second[:, None]


@functools.partial(jax.jit,
                   static_argnames=("octave_lo", "octave_hi", "interpret"))
def match_rows(mp_desc, uv, rad, lvl, row_ok, feat_desc, feat_xy, feat_oct,
               feat_ok, octave_lo: int = 1, octave_hi: int = 1,
               interpret: bool = False):
    """Row-wise best/second-best masked Hamming match.

    mp_desc (M,8) u32, uv (M,2) f32, rad (M,) f32, lvl (M,) i32,
    row_ok (M,) bool; feat_desc (N,8) u32, feat_xy (N,2) f32,
    feat_oct (N,) i32, feat_ok (N,) bool.
    Returns idx (M,), best (M,), second (M,)  (distances; BIG where no
    candidate).
    """
    M = mp_desc.shape[0]
    N = feat_desc.shape[0]
    Mp = -(-M // _TR) * _TR
    Np = -(-N // 128) * 128

    def pad(x, n, fill=0):
        if x.shape[0] == n:
            return x
        pw = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pw, constant_values=fill)

    mp_desc = pad(mp_desc, Mp)
    uv = pad(uv, Mp)
    rad = pad(rad, Mp)[:, None]
    lvl = pad(lvl, Mp)[:, None]
    row_ok = pad(row_ok.astype(jnp.int32), Mp)[:, None]
    feat_desc = pad(feat_desc, Np)
    feat_xy = pad(feat_xy, Np, fill=-1e9)
    feat_oct = pad(feat_oct, Np, fill=-100)[:, None]
    feat_ok = pad(feat_ok.astype(jnp.int32), Np)[:, None]

    grid = (Mp // _TR,)
    row = lambda i: (i, 0)
    full = lambda i: (0, 0)
    idx, best, second = pl.pallas_call(
        functools.partial(_kernel, octave_lo, octave_hi),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TR, 8), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TR, 2), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TR, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TR, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TR, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, 8), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, 2), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, 1), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, 1), full, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TR, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TR, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TR, 1), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Mp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Mp, 1), jnp.int32),
        ],
        interpret=interpret,
    )(mp_desc, uv, rad, lvl, row_ok, feat_desc, feat_xy, feat_oct, feat_ok)
    return idx[:M, 0], best[:M, 0], second[:M, 0]
