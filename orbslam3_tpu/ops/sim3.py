"""Sim(3) estimation between keyframes: batched Horn RANSAC.

Replaces the reference ``Sim3Solver`` (reference src/Sim3Solver.cc: RANSAC over
3-point samples, Horn closed-form similarity, reprojection-error inlier gating,
fixed-scale mode for stereo/inertial) with a fully batched kernel: all RANSAC
hypotheses are computed and scored in one pass.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def horn_sim3(x: jax.Array, y: jax.Array, fix_scale: bool = False):
    """Closed-form similarity y ≈ s R x + t from (...,N,3) point sets (Horn 1987,
    the reference's ComputeSim3). Batched over leading dims."""
    mx = jnp.mean(x, axis=-2, keepdims=True)
    my = jnp.mean(y, axis=-2, keepdims=True)
    xc = x - mx
    yc = y - my
    W = jnp.einsum("...ni,...nj->...ij", yc, xc)
    u, sv, vt = jnp.linalg.svd(W)
    det = jnp.linalg.det(u @ vt)
    fix = jnp.concatenate(
        [jnp.ones(det.shape + (2,), x.dtype), det[..., None]], axis=-1)
    R = (u * fix[..., None, :]) @ vt
    if fix_scale:
        s = jnp.ones(det.shape, x.dtype)
    else:
        num = jnp.sum(sv * fix, axis=-1)
        den = jnp.sum(xc * xc, axis=(-2, -1))
        s = num / jnp.maximum(den, 1e-12)
    t = my[..., 0, :] - s[..., None] * jnp.einsum("...ij,...j->...i", R, mx[..., 0, :])
    return s, R, t


class Sim3Result(NamedTuple):
    success: jax.Array
    s: jax.Array
    R: jax.Array
    t: jax.Array
    inliers: jax.Array
    n_inliers: jax.Array


def sim3_ransac(
    x1: jax.Array, x2: jax.Array, valid: jax.Array, rand_sets: jax.Array,
    th1_sq: jax.Array, th2_sq: jax.Array,
    cam_params: jax.Array, fix_scale: bool = False, min_inliers: int = 20,
) -> Sim3Result:
    """RANSAC similarity between matched 3D point sets in two KF camera frames.

    x1, x2: (N,3) matched points in camera-1 / camera-2 frames; valid: (N,);
    rand_sets: (iters,3) indices of valid matches; th*_sq: per-point squared
    pixel gates (reference uses 9.21·sigma2); cam_params: pinhole (fx,fy,cx,cy)
    used for the reprojection check in both frames.
    Returns Sim3 (s,R,t): x2 ≈ s R x1 + t (i.e. T21, reference's mT12 inverse
    convention aside).
    """
    s1 = x1[rand_sets]                      # (B,3,3)
    s2 = x2[rand_sets]
    s_h, R_h, t_h = horn_sim3(s1, s2, fix_scale=fix_scale)   # batched hypotheses

    fx, fy, cx, cy = cam_params[0], cam_params[1], cam_params[2], cam_params[3]

    def project(p):
        z = jnp.maximum(p[..., 2], 1e-6)
        return jnp.stack([fx * p[..., 0] / z + cx, fy * p[..., 1] / z + cy], axis=-1)

    # transform all points by each hypothesis: (B,N,3)
    x1h = s_h[:, None, None] * jnp.einsum("bij,nj->bni", R_h, x1) + t_h[:, None, :]
    # inverse transform of x2 into frame 1
    s_i = 1.0 / s_h
    R_i = jnp.swapaxes(R_h, -1, -2)
    t_i = -s_i[:, None] * jnp.einsum("bij,bj->bi", R_i, t_h)
    x2h = s_i[:, None, None] * jnp.einsum("bij,nj->bni", R_i, x2) + t_i[:, None, :]

    e2 = jnp.sum((project(x1h) - project(x2[None])) ** 2, axis=-1)   # (B,N)
    e1 = jnp.sum((project(x2h) - project(x1[None])) ** 2, axis=-1)
    inl = (e1 < th1_sq[None]) & (e2 < th2_sq[None]) & valid[None]
    counts = jnp.sum(inl.astype(jnp.int32), axis=-1)
    best = jnp.argmax(counts)
    n_best = counts[best]

    # refine on the best hypothesis' inliers (weighted Horn)
    w = inl[best].astype(x1.dtype)
    mx = jnp.sum(x1 * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    my = jnp.sum(x2 * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    xc = (x1 - mx) * w[:, None]
    yc = (x2 - my) * w[:, None]
    W = jnp.einsum("ni,nj->ij", yc, xc)
    u, sv, vt = jnp.linalg.svd(W)
    det = jnp.linalg.det(u @ vt)
    fix = jnp.asarray([1.0, 1.0, 0.0], x1.dtype) + jnp.asarray([0.0, 0.0, 1.0], x1.dtype) * det
    Rr = (u * fix[None, :]) @ vt
    if fix_scale:
        sr = jnp.ones((), x1.dtype)
    else:
        sr = jnp.sum(sv * fix) / jnp.maximum(jnp.sum(xc * xc), 1e-12)
    tr = my - sr * Rr @ mx

    return Sim3Result(
        success=n_best >= min_inliers,
        s=sr, R=Rr, t=tr, inliers=inl[best], n_inliers=n_best,
    )
