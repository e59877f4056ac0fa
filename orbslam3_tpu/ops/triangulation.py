"""Batched two-view triangulation + acceptance checks.

Replaces the reference's per-pair DLT ``Triangulate`` (reference
src/TwoViewReconstruction.cc and LocalMapping::CreateNewMapPoints
src/LocalMapping.cc:487-497 triangulation loop) with one batched kernel:
N candidate matches are triangulated and gated at once (cheirality, parallax,
reprojection chi2, scale consistency are all masks).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import lie


def triangulate_dlt(R1, t1, rays1, R2, t2, rays2):
    """Batched DLT triangulation in world frame.

    (R*, t*): world→camera poses; rays*: (N,3) unit-z bearing rays (normalized
    image coords). Returns (N,3) world points (least-squares DLT via 4x4
    normal equations — static shapes, no SVD needed on the hot path).
    """
    def rows(R, t, ray):
        P = jnp.concatenate([R, t[..., None]], axis=-1)  # (3,4) broadcast over N
        P = jnp.broadcast_to(P, ray.shape[:-1] + (3, 4))
        r1 = ray[..., 0:1] * P[..., 2, :] - P[..., 0, :]
        r2 = ray[..., 1:2] * P[..., 2, :] - P[..., 1, :]
        return r1, r2

    a1, a2 = rows(R1, t1, rays1)
    a3, a4 = rows(R2, t2, rays2)
    A = jnp.stack([a1, a2, a3, a4], axis=-2)             # (N,4,4)
    # homogeneous least squares: x = argmin |A x|, |x|=1 → smallest eigvec of
    # A^T A (batched 4x4 symmetric eigendecomposition; ascending eigenvalues).
    AtA = jnp.einsum("nij,nik->njk", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    x = vecs[..., :, 0]
    w = x[..., 3:4]
    return x[..., :3] / jnp.where(jnp.abs(w) < 1e-10, jnp.sign(w) * 1e-10 + 1e-20, w)


def check_triangulation(
    xw, R1, t1, rays1, R2, t2, rays2, sigma2_1, sigma2_2,
    min_parallax_cos: float = 0.9998, chi2_th: float = 5.991,
):
    """Acceptance mask for triangulated points (reference CheckRT
    src/TwoViewReconstruction.cc and the gates in LocalMapping::CreateNewMapPoints):
    positive depth in both views, parallax above threshold, reprojection chi2
    below gate in both views. Returns (ok (N,), depths (N,2))."""
    xc1 = lie.se3_apply(R1, t1, xw)
    xc2 = lie.se3_apply(R2, t2, xw)
    z1, z2 = xc1[..., 2], xc2[..., 2]
    # parallax between rays from the two camera centers
    c1 = lie.se3_inverse(R1, t1)[1]
    c2 = lie.se3_inverse(R2, t2)[1]
    d1 = xw - c1
    d2 = xw - c2
    cosp = jnp.sum(d1 * d2, axis=-1) / (
        jnp.linalg.norm(d1, axis=-1) * jnp.linalg.norm(d2, axis=-1) + 1e-12)
    # reprojection error in normalized coords, whitened by pixel sigma via focal-
    # scaled sigma2 (caller passes sigma2 in normalized units)
    e1 = xc1[..., :2] / jnp.maximum(z1[..., None], 1e-9) - rays1[..., :2]
    e2 = xc2[..., :2] / jnp.maximum(z2[..., None], 1e-9) - rays2[..., :2]
    chi1 = jnp.sum(e1 * e1, axis=-1) / jnp.maximum(sigma2_1, 1e-20)
    chi2_ = jnp.sum(e2 * e2, axis=-1) / jnp.maximum(sigma2_2, 1e-20)
    ok = (z1 > 0) & (z2 > 0) & (cosp < min_parallax_cos) & (chi1 < chi2_th) & (chi2_ < chi2_th)
    return ok, jnp.stack([z1, z2], axis=-1)
