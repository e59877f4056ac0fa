"""Pallas fused projection matcher vs the XLA formulation (interpret mode on
CPU; the same kernel lowers natively on TPU — see bench notes)."""
import numpy as np
import jax
import jax.numpy as jnp

from orbslam3_tpu.ops import matching, matching_pallas


def test_match_rows_equals_xla_path():
    rng = np.random.default_rng(3)
    M, N = 300, 200   # deliberately NOT multiples of the tile sizes
    mp_desc = jnp.asarray(rng.integers(0, 2**32, (M, 8), dtype=np.uint32))
    uv = jnp.asarray(rng.uniform([0, 0], [752, 480], (M, 2)).astype(np.float32))
    rad = jnp.asarray(rng.uniform(5, 40, M).astype(np.float32))
    lvl = jnp.asarray(rng.integers(0, 8, M, dtype=np.int32))
    row_ok = jnp.asarray(rng.random(M) < 0.7)
    feat_desc = jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32))
    feat_xy = jnp.asarray(rng.uniform([0, 0], [752, 480], (N, 2)).astype(np.float32))
    feat_oct = jnp.asarray(rng.integers(0, 8, N, dtype=np.int32))
    feat_ok = jnp.asarray(rng.random(N) < 0.9)

    dist = matching.hamming_matrix(mp_desc, feat_desc)
    mask = (row_ok[:, None] & feat_ok[None, :]
            & matching.window_mask(uv, feat_xy, rad)
            & matching.octave_mask(lvl, feat_oct, 1, 1))
    d = jnp.where(mask, dist, matching.BIG)
    ri = np.asarray(jnp.argmin(d, axis=1))
    rb = np.asarray(jnp.min(d, axis=1))
    d2 = np.asarray(d).copy()
    d2[np.arange(M), ri] = 10000
    rs = d2.min(1)

    pi, pb, ps = matching_pallas.match_rows(
        mp_desc, uv, rad, lvl, row_ok, feat_desc, feat_xy, feat_oct, feat_ok,
        interpret=True)
    pi, pb, ps = map(np.asarray, (pi, pb, ps))
    valid = rb < 10000
    assert np.array_equal(rb[valid], pb[valid])
    assert np.array_equal(ri[valid], pi[valid])
    assert np.array_equal(np.minimum(rs, 10000), np.minimum(ps, 10000))
    # empty rows report no candidate
    assert (pb[~valid] >= 10000).all()
