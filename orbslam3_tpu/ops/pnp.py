"""Batched PnP RANSAC for relocalization.

Replaces the reference's ``MLPnPsolver`` (reference src/MLPnPsolver.cpp:
maximum-likelihood PnP on bearing vectors + RANSAC, used for relocalization at
src/Tracking.cc:4178-4264 with 6-point models) with a TPU-native batched
formulation: every RANSAC hypothesis solves a 6-point linear PnP (DLT on the
3x4 projection matrix via a 12x12 eigendecomposition) **in one batch**, is
orthonormalized onto SE(3), and scored by reprojection chi2 against all
matches at once. Bearing-vector (normalized-coordinate) formulation keeps it
camera-model agnostic like MLPnP — fisheye rays work unchanged.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PnPResult(NamedTuple):
    success: jax.Array
    R: jax.Array
    t: jax.Array
    inliers: jax.Array
    n_inliers: jax.Array


def _dlt_pnp(xw: jax.Array, xn: jax.Array):
    """Batched 6-point DLT: xw (B,6,3) world, xn (B,6,2) normalized image.
    Returns (R (B,3,3), t (B,3)) projected onto SE(3)."""
    B, n, _ = xw.shape
    ones = jnp.ones((B, n, 1), xw.dtype)
    Xh = jnp.concatenate([xw, ones], axis=-1)            # (B,6,4)
    zeros = jnp.zeros_like(Xh)
    u = xn[..., 0:1]
    v = xn[..., 1:2]
    r1 = jnp.concatenate([Xh, zeros, -u * Xh], axis=-1)  # (B,6,12)
    r2 = jnp.concatenate([zeros, Xh, -v * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=1)                # (B,12,12)
    AtA = jnp.einsum("bni,bnj->bij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    P = vecs[..., :, 0].reshape(B, 3, 4)
    M = P[:, :, :3]
    # sign: points should be in front (positive depth for the centroid)
    cen = jnp.mean(Xh, axis=1)
    depth = jnp.einsum("bij,bj->bi", P, cen)[:, 2]
    P = P * jnp.where(depth < 0, -1.0, 1.0)[:, None, None]
    M = P[:, :, :3]
    # orthonormalize M → R via SVD; scale = mean singular value
    uS, sS, vtS = jnp.linalg.svd(M)
    det = jnp.linalg.det(uS @ vtS)
    fix = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = (uS * fix[:, None, :]) @ vtS
    scale = jnp.mean(sS * fix, axis=-1)
    t = P[:, :, 3] / jnp.maximum(scale, 1e-12)[:, None]
    return R, t


def pnp_ransac(
    xw: jax.Array, rays: jax.Array, valid: jax.Array, rand_sets: jax.Array,
    inv_sigma2: jax.Array, chi2_th: float = 5.991, focal: float = 458.0,
    min_inliers: int = 10,
) -> PnPResult:
    """RANSAC PnP. xw: (N,3) world points; rays: (N,3) unit-z bearing rays;
    rand_sets: (B,6) indices of valid matches; chi2 gated in pixel² via focal.
    (Reference MLPnP RANSAC: 0.99 prob, ≥10 inliers, 6-point model,
    χ²=5.991 — src/Tracking.cc:4216-4221.)"""
    xn = rays[..., :2] / rays[..., 2:3]
    s_w = xw[rand_sets]
    s_n = xn[rand_sets]
    R, t = _dlt_pnp(s_w, s_n)

    xc = jnp.einsum("bij,nj->bni", R, xw) + t[:, None, :]
    z = jnp.maximum(xc[..., 2], 1e-6)
    pred = xc[..., :2] / z[..., None]
    err2 = jnp.sum((pred - xn[None]) ** 2, axis=-1) * (focal * focal)
    chi2 = err2 * inv_sigma2[None]
    inl = (chi2 < chi2_th) & valid[None] & (xc[..., 2] > 0.05)
    counts = jnp.sum(inl.astype(jnp.int32), axis=-1)
    best = jnp.argmax(counts)
    return PnPResult(
        success=counts[best] >= min_inliers,
        R=R[best], t=t[best], inliers=inl[best], n_inliers=counts[best],
    )
