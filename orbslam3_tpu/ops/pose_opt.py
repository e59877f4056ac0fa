"""Pose-only optimization (motion-only bundle adjustment).

Replaces the reference's g2o ``Optimizer::PoseOptimization`` (reference
src/Optimizer.cc:943: BlockSolver_6_3 + LinearSolverDense + Levenberg, 4
rounds x 10 iterations, chi2 outlier reclassification at 5.991 mono / 7.815
stereo between rounds, Huber delta sqrt(5.991)) with a fixed-shape batched
Levenberg-Marquardt on SE(3):

- residual r_i = uv_i - project(R x_i + t), information = invSigma2 of the
  keypoint octave (reference src/Optimizer.cc:988-1010).
- 6x6 normal equations accumulated over a static-capacity observation set
  with a validity mask; one `jnp.linalg.solve` per LM step.
- outliers toggled by chi2 between rounds exactly like the reference's
  ``setLevel(0|1)`` scheme, but branchlessly via the weight mask.

Everything is jit-compatible: `lax.fori_loop` outer rounds, fixed iteration
counts, no data-dependent shapes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import camera as cam_ops
from . import lie

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class PoseOptResult(NamedTuple):
    R: jax.Array          # (3,3)
    t: jax.Array          # (3,)
    inlier: jax.Array     # (N,) bool — final chi2 classification
    n_inliers: jax.Array  # () int32
    chi2: jax.Array       # () float32 total inlier chi2


def _residuals(R, t, pts_w, uv, cam_type, cam_params):
    xc = lie.se3_apply(R, t, pts_w)
    pred = cam_ops.project(cam_type, cam_params, xc)
    return uv - pred, xc


def _build_normal_eq(R, t, pts_w, uv, inv_sigma2, w_mask, cam_type, cam_params,
                     huber_delta):
    """One linearization: H (6,6), b (6,), per-obs chi2."""
    r, xc = _residuals(R, t, pts_w, uv, cam_type, cam_params)
    Jproj = cam_ops.project_jac(cam_type, cam_params, xc)          # (N,2,3)
    # d xc / d xi with update T <- Exp([w v]) T : [-hat(xc) | I]
    Jse3 = jnp.concatenate([-lie.hat(xc), jnp.broadcast_to(jnp.eye(3, dtype=xc.dtype), xc.shape[:-1] + (3, 3))], axis=-1)  # (N,3,6)
    # With r = obs - pred and step dx solving  JᵀWJ dx = JᵀW r,  J must be
    # +dpred/dxi (r(dx) ≈ r − J dx).
    J = jnp.einsum("nij,njk->nik", Jproj, Jse3)                    # (N,2,6)
    chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2                     # (N,)
    # Huber IRLS weight on the whitened norm
    rn = jnp.sqrt(chi2 + 1e-12)
    w_huber = jnp.where(rn <= huber_delta, 1.0, huber_delta / rn)
    w = w_mask * inv_sigma2 * w_huber                               # (N,)
    H = jnp.einsum("nik,n,nil->kl", J, w, J)
    b = jnp.einsum("nik,n,ni->k", J, w, r)
    return H, b, chi2


def pose_optimize(
    R0: jax.Array, t0: jax.Array,
    pts_w: jax.Array, uv: jax.Array, inv_sigma2: jax.Array, valid: jax.Array,
    cam_params: jax.Array, cam_type: int = cam_ops.PINHOLE,
    rounds: int = 4, iters: int = 10, chi2_th: float = CHI2_MONO,
    chi2_schedule: jax.Array | None = None,
) -> PoseOptResult:
    """4x10 LM with between-round chi2 reclassification.

    pts_w: (N,3) world points; uv: (N,2) observations; valid: (N,) mask.
    chi2_schedule: optional (rounds,) per-round outlier gates (the inertial
    variants use annealed gates {12, 7.5, 5.991, 5.991}, reference
    src/Optimizer.cc:7493-7530); default = constant chi2_th.
    """
    dtype = pts_w.dtype
    huber = jnp.sqrt(jnp.asarray(chi2_th, dtype))
    if chi2_schedule is None:
        schedule = jnp.full((rounds,), chi2_th, dtype)
    else:
        schedule = jnp.asarray(chi2_schedule, dtype)

    def lm_iters(R, t, w_mask):
        def body(_, carry):
            R, t, lam = carry
            H, b, _ = _build_normal_eq(R, t, pts_w, uv, inv_sigma2, w_mask,
                                       cam_type, cam_params, huber)
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6, dtype=dtype)
            dx = jnp.linalg.solve(Hd, b)
            Rn_, tn_ = lie.se3_exp(dx)
            Rn, tn = lie.se3_compose(Rn_, tn_, R, t)
            # accept if chi2 decreased
            _, _, c_old = _build_normal_eq(R, t, pts_w, uv, inv_sigma2, w_mask,
                                           cam_type, cam_params, huber)
            _, _, c_new = _build_normal_eq(Rn, tn, pts_w, uv, inv_sigma2, w_mask,
                                           cam_type, cam_params, huber)
            old = jnp.sum(jnp.minimum(c_old, chi2_th * 4) * w_mask)
            new = jnp.sum(jnp.minimum(c_new, chi2_th * 4) * w_mask)
            good = new < old
            R = jnp.where(good, Rn, R)
            t = jnp.where(good, tn, t)
            lam = jnp.where(good, lam * 0.5, lam * 4.0)
            return R, t, lam

        R, t, _ = jax.lax.fori_loop(0, iters, body, (R, t, jnp.asarray(1e-3, dtype)))
        return R, t

    def round_body(i, carry):
        R, t, inlier = carry
        w_mask = (valid & inlier).astype(dtype)
        R, t = lm_iters(R, t, w_mask)
        _, _, chi2 = _build_normal_eq(R, t, pts_w, uv, inv_sigma2,
                                      jnp.ones_like(w_mask), cam_type, cam_params, huber)
        inlier = chi2 < schedule[i]
        return R, t, inlier

    R, t, inlier = jax.lax.fori_loop(
        0, rounds, round_body, (R0, t0, jnp.ones(pts_w.shape[0], bool))
    )
    inlier = inlier & valid
    _, _, chi2 = _build_normal_eq(R, t, pts_w, uv, inv_sigma2,
                                  inlier.astype(dtype), cam_type, cam_params, huber)
    return PoseOptResult(
        R=R, t=t, inlier=inlier,
        n_inliers=jnp.sum(inlier.astype(jnp.int32)),
        chi2=jnp.sum(jnp.where(inlier, chi2, 0.0)),
    )
