"""Sim(3) estimation between keyframes: batched Horn RANSAC + GN refinement.

Replaces the reference ``Sim3Solver`` (reference src/Sim3Solver.cc: RANSAC over
3-point samples, Horn closed-form similarity, reprojection-error inlier gating,
fixed-scale mode for stereo/inertial) with a fully batched kernel: all RANSAC
hypotheses are computed and scored in one pass. ``optimize_sim3`` is the
reference ``Optimizer::OptimizeSim3`` (src/Optimizer.cc:3555: g2o graph with
one VertexSim3Expmap and paired EdgeSim3ProjectXYZ / EdgeInverseSim3ProjectXYZ
reprojection edges, Huber, chi2 gate 10) as a dense Gauss-Newton on the 7-dof
similarity with autodiff Jacobians.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import camera as cam_ops


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
    cam_type: int = cam_ops.PINHOLE,
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

    def project(p):
        # exact camera model (pinhole or KB8 — reference Sim3Solver checks
        # reprojection through the keyframes' GeometricCamera)
        return cam_ops.project(cam_type, cam_params,
                               p.reshape(-1, 3)).reshape(p.shape[:-1] + (2,))

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


class Sim3OptResult(NamedTuple):
    s: jax.Array
    R: jax.Array
    t: jax.Array
    inliers: jax.Array      # (N,) both-direction chi2 < th
    n_inliers: jax.Array


def _exp_so3(w: jax.Array) -> jax.Array:
    # lie.so3_exp: NaN-safe at w=0 INCLUDING the derivative (the GN step
    # linearizes at zero increment — a norm-based Rodrigues would give NaN
    # Jacobians there and silently zero every update)
    from . import lie
    return lie.so3_exp(w)


def optimize_sim3(
    x1: jax.Array, x2: jax.Array, uv1: jax.Array, uv2: jax.Array,
    inv_sigma2_1: jax.Array, inv_sigma2_2: jax.Array, valid: jax.Array,
    s0: jax.Array, R0: jax.Array, t0: jax.Array, cam_params: jax.Array,
    valid21: jax.Array | None = None,
    cam_params2: jax.Array | None = None, fix_scale: bool = False,
    iters: int = 10, chi2_th: float = 10.0,
    cam_type: int = cam_ops.PINHOLE, cam_type2: int | None = None,
) -> Sim3OptResult:
    """GN refinement of S21 (x2 ≈ s R x1 + t) from matched 3D↔feature pairs.

    x1/x2: (N,3) matched points in cam-1 / cam-2 frames; uv1/uv2: (N,2) their
    observed keypoints in image 1 / image 2; residuals are the two reference
    edge types: project2(S21·x1) − uv2 and project1(S21⁻¹·x2) − uv1 (reference
    EdgeSim3ProjectXYZ / EdgeInverseSim3ProjectXYZ with the opposite S12
    convention), Huber δ=√chi2_th, per-point information inv_sigma2.
    ``valid`` gates the →cam1 rows; ``valid21`` (default = valid) gates the
    →cam2 rows — the reference adds e21 only when the matched point is
    actually observed in KF2 (src/Optimizer.cc:3670 area).
    """
    dtype = x1.dtype
    if valid21 is None:
        valid21 = valid
    if cam_params2 is None:
        cam_params2 = cam_params
    if cam_type2 is None:
        cam_type2 = cam_type
    delta = jnp.sqrt(jnp.asarray(chi2_th, dtype))

    def project(p, cp, ct):
        return cam_ops.project(ct, cp, p)

    def residuals(params, s, R, t):
        ls, w, v = params[0], params[1:4], params[4:7]
        s_c = s * jnp.exp(ls)
        R_c = _exp_so3(w) @ R
        t_c = t + v
        x1_in2 = s_c * (x1 @ R_c.T) + t_c
        r21 = project(x1_in2, cam_params2, cam_type2) - uv2   # (N,2)
        x2_in1 = (x2 - t_c) @ R_c / s_c
        r12 = project(x2_in1, cam_params, cam_type) - uv1     # (N,2)
        return r21, r12

    def chi2_of(r21, r12):
        return (jnp.sum(r21 * r21, -1) * inv_sigma2_2,
                jnp.sum(r12 * r12, -1) * inv_sigma2_1)

    def hw(c):
        rn = jnp.sqrt(jnp.maximum(c, 1e-12))
        return jnp.where(rn <= delta, 1.0, delta / rn)

    def robust_cost(s, R, t):
        c21, c12 = chi2_of(*residuals(jnp.zeros(7, dtype), s, R, t))
        # Huber rho, gated by the per-direction validity
        def rho(c):
            rn = jnp.sqrt(jnp.maximum(c, 1e-12))
            return jnp.where(rn <= delta, c, 2.0 * delta * rn - delta * delta)
        m21 = (valid & valid21).astype(dtype)
        m12 = valid.astype(dtype)
        return jnp.sum(rho(c21) * m21) + jnp.sum(rho(c12) * m12)

    def step(carry, _):
        s, R, t, lam = carry
        p0 = jnp.zeros(7, dtype)

        def flat_res(p):
            r21, r12 = residuals(p, s, R, t)
            return jnp.concatenate([r21.reshape(-1), r12.reshape(-1)])

        r = flat_res(p0)
        J = jax.jacfwd(flat_res)(p0)                      # (4N,7)
        c21, c12 = chi2_of(*residuals(p0, s, R, t))
        # robust (Huber) weights x information, per 2-row block
        w21 = hw(c21) * inv_sigma2_2 * (valid & valid21)
        w12 = hw(c12) * inv_sigma2_1 * valid
        wrow = jnp.concatenate([jnp.repeat(w21, 2), jnp.repeat(w12, 2)])
        H = J.T @ (J * wrow[:, None])
        g = J.T @ (r * wrow)
        if fix_scale:
            mask = jnp.zeros(7, dtype).at[0].set(1.0)
            H = H + jnp.diag(mask * 1e12)
        # Levenberg damping with accept/reject (the reference's g2o LM; a
        # plain GN step can overshoot the scale into a degenerate basin and
        # the Huber weights then pin it there)
        H = H + lam * jnp.diag(jnp.diagonal(H)) + 1e-8 * jnp.eye(7, dtype=dtype)
        d = -jnp.linalg.solve(H, g)
        d = jnp.where(jnp.isfinite(d), d, 0.0)
        # trust-region style clamps: the refinement is small by construction
        d = d.at[0].set(jnp.clip(d[0], -0.3, 0.3))
        s_n = s * jnp.exp(d[0])
        R_n = _exp_so3(d[1:4]) @ R
        t_n = t + d[4:7]
        better = robust_cost(s_n, R_n, t_n) < robust_cost(s, R, t)
        s_o = jnp.where(better, s_n, s)
        R_o = jnp.where(better, R_n, R)
        t_o = jnp.where(better, t_n, t)
        lam_o = jnp.where(better, jnp.maximum(lam * 0.5, 1e-6),
                          jnp.minimum(lam * 4.0, 1e4))
        return (s_o, R_o, t_o, lam_o), None

    (s, R, t, _lam), _ = jax.lax.scan(
        step, (jnp.asarray(s0, dtype), R0.astype(dtype), t0.astype(dtype),
               jnp.asarray(1e-3, dtype)), None, length=iters)
    c21, c12 = chi2_of(*residuals(jnp.zeros(7, dtype), s, R, t))
    inl = ((c21 < chi2_th) | ~valid21) & (c12 < chi2_th) & valid
    return Sim3OptResult(s=s, R=R, t=t, inliers=inl,
                         n_inliers=jnp.sum(inl.astype(jnp.int32)))
