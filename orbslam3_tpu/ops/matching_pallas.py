"""Fused projection-window matcher as a Pallas TPU kernel.

The XLA formulation of SearchByProjection (models/kernels.projection_matcher)
materializes several (M,N) intermediates in HBM — the Hamming matrix, the
window/octave/validity masks, the masked copy for the second-best pass —
~10 full-matrix HBM sweeps per frame. This kernel streams (TR,TN) tiles of
the pair space through VMEM and keeps only per-row running reductions
(best packed key, second-best distance): a single pass, no (M,N) HBM
intermediates.

Grid is 2-D (row tiles × column tiles) with a streaming top-2 merge across
column tiles in scratch — tiling both axes keeps every live temporary at
(TR,TN), bounding scoped VMEM (a single-row-tile popcount variant at N≈1.2k
exceeded the 16 MB scoped-VMEM limit because the unrolled popcount chain kept
~90 (TR,N) temporaries live).

Negative result, measured on TPU v5e at 4096×1152: computing the distance on
the MXU via the ±1-expansion identity hamming = (256 − a·b)/2 (descriptors
pre-expanded to (K,256) bf16, one (TR,256)×(256,TN) matmul per tile — exact,
since ±1 products and ≤256-term f32 accumulation are exact) is 40x SLOWER
end-to-end (1.73 ms vs 0.043 ms): the XOR+popcount chain on packed uint32
lanes is already compute-speed-of-light on the VPU (~113M int-ops at this
size), while the MXU route pays a 32x-larger descriptor stream plus an XLA
bit-expansion prologue and layout copies at the custom-call boundary. Packed
popcount stays.

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
_TR = 128       # row (map-point) tile
_TN = 256       # column (feature) tile — Mosaic keeps ~90 (TR,TN) temporaries
                # live through the popcount/mask/merge chain, so 128×256 is
                # the largest tile under the 16 MB scoped-VMEM limit (256×512
                # OOMed at 47.6 MB)


def _kernel(octave_lo: int, octave_hi: int, n_j: int,
            mp_desc, uv, rad, lvl, row_ok,
            feat_desc, feat_xy, feat_oct, feat_ok,
            idx_ref, best_ref, second_ref,
            runk_ref, rund2_ref):
    j = pl.program_id(1)
    a = mp_desc[:]                       # (TR, 8) uint32
    b = feat_desc[:]                     # (TN, 8) uint32
    TR = a.shape[0]
    TN = b.shape[0]
    dist = jnp.zeros((TR, TN), jnp.int32)
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
    # argmin is unsupported for int32 in mosaic: pack (distance, GLOBAL column)
    # into one int32 key — min over keys gives the best distance AND the lowest
    # column among ties (same tie-break as XLA argmin). d ≤ 10000, col < 8192
    # → key < 2^31.
    col_l = jax.lax.broadcasted_iota(jnp.int32, (TR, TN), 1)
    col = col_l + j * TN
    key = d * 8192 + col
    tile_k = jnp.min(key, axis=1)                            # (TR,)
    tile_best = tile_k // 8192
    tile_col = tile_k - tile_best * 8192
    d2 = jnp.where(col == tile_col[:, None], _BIG, d)
    tile_d2 = jnp.min(d2, axis=1)                            # (TR,)

    @pl.when(j == 0)
    def _init():
        runk_ref[:] = tile_k[:, None]
        rund2_ref[:] = tile_d2[:, None]

    @pl.when(j > 0)
    def _merge():
        # streaming top-2 over disjoint column sets: the loser of the two
        # best keys is, by distance, a second-best candidate
        prev_k = runk_ref[:, 0]
        prev_d2 = rund2_ref[:, 0]
        new_k = jnp.minimum(prev_k, tile_k)
        loser_d = jnp.maximum(prev_k, tile_k) // 8192
        new_d2 = jnp.minimum(jnp.minimum(prev_d2, tile_d2), loser_d)
        runk_ref[:] = new_k[:, None]
        rund2_ref[:] = new_d2[:, None]

    @pl.when(j == n_j - 1)
    def _emit():
        k = runk_ref[:, 0]
        best = k // 8192
        idx_ref[:] = (k - best * 8192)[:, None]
        best_ref[:] = best[:, None]
        second_ref[:] = rund2_ref[:]


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
    Np = -(-N // _TN) * _TN

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

    n_i, n_j = Mp // _TR, Np // _TN
    row = lambda i, j: (i, 0)
    colb = lambda i, j: (j, 0)
    idx, best, second = pl.pallas_call(
        functools.partial(_kernel, octave_lo, octave_hi, n_j),
        grid=(n_i, n_j),
        in_specs=[
            pl.BlockSpec((_TR, 8), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TR, 2), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TR, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TR, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TR, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, 8), colb, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, 2), colb, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, 1), colb, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, 1), colb, memory_space=pltpu.VMEM),
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
        scratch_shapes=[
            pltpu.VMEM((_TR, 1), jnp.int32),
            pltpu.VMEM((_TR, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(mp_desc, uv, rad, lvl, row_ok, feat_desc, feat_xy, feat_oct, feat_ok)
    return idx[:M, 0], best[:M, 0], second[:M, 0]
