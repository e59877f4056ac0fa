"""Visual-inertial windowed optimization (sliding-window smoother).

Covers the pose/velocity/bias side of the reference's ``LocalInertialBA``
(reference src/Optimizer.cc:4314: temporal window of keyframes linked by
mPrevKF preintegration edges + visual reprojection edges, Huber kernels,
fixed boundary) and its frame-rate cousins ``PoseInertialOptimizationLast*``
(:7207/:7785): a GN smoother over K body poses, K velocities and a shared
gyro/acc bias, with

- visual residuals against *fixed* map landmarks (the landmark refinement
  itself is handled by the visual Schur BA in ops/ba.py — a joint
  landmark+inertial Schur solve is the round-2 extension),
- 9-dim preintegration residuals between consecutive keyframes, whitened by
  the preintegration covariance,
- bias priors (the reference's EdgePriorAcc/Gyro).

Jacobians come from autodiff of the packed parameter vector; the dense system
is ~(9K+6)² — tiny. Everything jits with static shapes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import camera as cam_ops
from . import imu as imu_ops
from . import lie


class VIBAResult(NamedTuple):
    R: jax.Array       # (K,3,3) world→cam
    t: jax.Array       # (K,3)
    vels: jax.Array    # (K,3)
    bg: jax.Array
    ba: jax.Array
    cost: jax.Array


def vi_window_optimize(
    R0, t0, vels0, bg0, ba0,
    pts_w, obs_kf, obs_uv, obs_inv_sigma2, obs_valid,
    dT, dR, dV, dP, JRg, JVg, JVa, JPg, JPa, pre_cov, pair_valid,
    cam_params, fixed_pose, cam_type: int = 0, iters: int = 8,
    huber_chi2: float = 5.991, prior_g: float = 1e2, prior_a: float = 1e5,
) -> VIBAResult:
    """Optimize K poses + velocities + shared bias.

    Shapes: poses (K,...); visual obs (O,) indexing pts_w (O,3) gathered per
    observation (landmarks fixed); inertial terms (K-1,...). fixed_pose: (K,)
    bool — fixed nodes contribute residuals but don't move (reference fixes
    the window boundary keyframe, src/Optimizer.cc:4375).
    """
    K = R0.shape[0]
    dtype = t0.dtype
    huber = jnp.sqrt(jnp.asarray(huber_chi2, dtype))

    C = pre_cov + 1e-10 * jnp.eye(9, dtype=dtype)
    L = jnp.linalg.cholesky(C)
    Linv = jax.vmap(lambda Lk: jax.scipy.linalg.solve_triangular(
        Lk, jnp.eye(9, dtype=dtype), lower=True))(L)

    n_pose = 6 * K
    n_vel = 3 * K

    def unpack(p):
        xi = p[:n_pose].reshape(K, 6)
        dRp, dtp = lie.se3_exp(xi)
        Rn, tn = lie.se3_compose(dRp, dtp, R0, t0)
        Rn = jnp.where(fixed_pose[:, None, None], R0, Rn)
        tn = jnp.where(fixed_pose[:, None], t0, tn)
        vels = p[n_pose:n_pose + n_vel].reshape(K, 3)
        bg = p[n_pose + n_vel: n_pose + n_vel + 3]
        ba = p[n_pose + n_vel + 3:]
        return Rn, tn, vels, bg, ba

    def residuals(p):
        Rn, tn, vels, bg, ba = unpack(p)
        # visual
        Rk = Rn[obs_kf]
        tk = tn[obs_kf]
        xc = jnp.einsum("oij,oj->oi", Rk, pts_w) + tk
        pos = xc[..., 2] > 1e-3
        xc = jnp.concatenate([xc[..., :2], jnp.maximum(xc[..., 2:3], 1e-2)], axis=-1)
        pred = cam_ops.project(cam_type, cam_params, xc)
        rv = (obs_uv - pred) * jnp.sqrt(obs_inv_sigma2)[:, None]
        chi = jnp.sum(rv * rv, axis=-1)
        w_h = jnp.sqrt(jnp.where(chi > huber * huber,
                                 huber / jnp.sqrt(chi + 1e-12), 1.0))
        rv = rv * (w_h * obs_valid.astype(dtype) * pos.astype(dtype))[:, None]

        # inertial: body = camera here (Tbc = I), body pose = inverse cam pose
        R_wb = jnp.swapaxes(Rn, -1, -2)
        p_wb = -jnp.einsum("kij,kj->ki", R_wb, tn)
        dbg = bg - bg0
        dba = ba - ba0
        dR_c = jnp.einsum("kij,kjl->kil", dR,
                          lie.so3_exp(jnp.einsum("kij,j->ki", JRg, dbg)))
        dV_c = dV + jnp.einsum("kij,j->ki", JVg, dbg) + jnp.einsum("kij,j->ki", JVa, dba)
        dP_c = dP + jnp.einsum("kij,j->ki", JPg, dbg) + jnp.einsum("kij,j->ki", JPa, dba)
        g = jnp.asarray([0.0, 0.0, -imu_ops.GRAVITY], dtype)
        R1 = R_wb[:-1]
        R2 = R_wb[1:]
        p1 = p_wb[:-1]
        p2 = p_wb[1:]
        v1 = vels[:-1]
        v2 = vels[1:]
        tt = dT[:, None]
        er = lie.so3_log(jnp.einsum("kij,kli,klm->kjm", dR_c, R1, R2))
        ev = jnp.einsum("kji,kj->ki", R1, v2 - v1 - g[None] * tt) - dV_c
        ep = jnp.einsum("kji,kj->ki", R1, p2 - p1 - v1 * tt - 0.5 * g[None] * tt * tt) - dP_c
        ri = jnp.concatenate([er, ev, ep], axis=-1)
        ri = jnp.einsum("kij,kj->ki", Linv, ri) * pair_valid[:, None].astype(dtype)

        # bias priors
        rb = jnp.concatenate([jnp.sqrt(jnp.asarray(prior_g, dtype)) * dbg,
                              jnp.sqrt(jnp.asarray(prior_a, dtype)) * dba])
        return jnp.concatenate([rv.reshape(-1), ri.reshape(-1), rb])

    n = n_pose + n_vel + 6
    p = jnp.concatenate([jnp.zeros(n_pose + 0, dtype),
                         vels0.reshape(-1), bg0, ba0])
    # parameters are DELTAS for poses but absolutes for vels/bias; rebuild the
    # packing so GN updates everything uniformly
    p = jnp.concatenate([jnp.zeros(n_pose, dtype), vels0.reshape(-1), bg0, ba0])

    def gn(carry, _):
        p, lam = carry
        r = residuals(p)
        J = jax.jacfwd(residuals)(p)
        H = J.T @ J + lam * jnp.eye(n, dtype=dtype)
        b = -J.T @ r
        dp = jnp.linalg.solve(H, b)
        p_new = p + dp
        good = jnp.sum(residuals(p_new) ** 2) < jnp.sum(r ** 2)
        p = jnp.where(good, p_new, p)
        lam = jnp.where(good, lam * 0.5, lam * 5.0)
        return (p, lam), jnp.sum(r ** 2)

    (p, _), costs = jax.lax.scan(gn, (p, jnp.asarray(1e-4, dtype)), None,
                                 length=iters)
    Rn, tn, vels, bg, ba = unpack(p)
    return VIBAResult(R=Rn, t=tn, vels=vels, bg=bg, ba=ba,
                      cost=jnp.sum(residuals(p) ** 2))


class PoseInertialResult(NamedTuple):
    R: jax.Array
    t: jax.Array
    v: jax.Array
    inlier: jax.Array
    n_inliers: jax.Array


def pose_inertial_optimize(
    R0, t0, v0, R1_wb, p1_wb, v1,
    bg, ba, dT, dR, dV, dP, JRg, JVg, JVa, JPg, JPa, pre_cov,
    pts_w, obs_uv, obs_inv_sigma2, obs_valid, cam_params,
    cam_type: int = 0, iters: int = 12, chi2_th: float = 5.991,
) -> PoseInertialResult:
    """Frame-rate visual-inertial pose optimization (reference
    PoseInertialOptimizationLastFrame src/Optimizer.cc:7785: current frame
    pose+velocity against the previous state through a preintegration edge +
    visual mono edges; 4×10 schedule with annealed chi2 gates
    {12, 7.5, 5.991, 5.991}). Biases stay at the tracker's estimates (the
    reference's bias random-walk edges barely move them at frame rate).

    The previous state (R1_wb body→world? no — body pose R_wb (3,3), p_wb,
    v1) is FIXED; the reference's marginalized ConstraintPoseImu prior is
    approximated by fixing it (the prior's information would let it move
    slightly — a refinement once frame-to-frame marginalization lands).
    """
    dtype = t0.dtype
    huber = jnp.sqrt(jnp.asarray(chi2_th, dtype))
    C = pre_cov + jnp.diag(jnp.asarray([1e-8] * 3 + [1e-6] * 3 + [1e-7] * 3,
                                       dtype))
    L = jnp.linalg.cholesky(C)
    Linv = jax.scipy.linalg.solve_triangular(L, jnp.eye(9, dtype=dtype),
                                             lower=True)
    g = jnp.asarray([0.0, 0.0, -imu_ops.GRAVITY], dtype)
    dbg = jnp.zeros(3, dtype)   # biases fixed: corrected deltas precomputed
    dR_c = dR
    dV_c = dV
    dP_c = dP

    def unpack(p):
        dRp, dtp = lie.se3_exp(p[:6])
        R, t = lie.se3_compose(dRp, dtp, R0, t0)
        return R, t, p[6:9]

    def residuals(p, w_in):
        R, t, v = unpack(p)
        xc = jnp.einsum("ij,oj->oi", R, pts_w) + t
        pos = xc[..., 2] > 1e-3
        xc = jnp.concatenate([xc[..., :2],
                              jnp.maximum(xc[..., 2:3], 1e-2)], axis=-1)
        pred = cam_ops.project(cam_type, cam_params, xc)
        rv = (obs_uv - pred) * jnp.sqrt(obs_inv_sigma2)[:, None]
        chi = jnp.sum(rv * rv, axis=-1)
        w_h = jnp.sqrt(jnp.where(chi > huber * huber,
                                 huber / jnp.sqrt(chi + 1e-12), 1.0))
        rv = rv * (w_h * w_in * obs_valid.astype(dtype)
                   * pos.astype(dtype))[:, None]
        # inertial edge to the fixed previous state
        R_wb = R.T
        p_wb = -R.T @ t
        tt = dT
        er = lie.so3_log(dR_c.T @ (R1_wb.T @ R_wb))
        ev = R1_wb.T @ (v - v1 - g * tt) - dV_c
        ep = R1_wb.T @ (p_wb - p1_wb - v1 * tt - 0.5 * g * tt * tt) - dP_c
        ri = Linv @ jnp.concatenate([er, ev, ep])
        return jnp.concatenate([rv.reshape(-1), ri])

    def chi2_of(p):
        R, t, v = unpack(p)
        xc = jnp.einsum("ij,oj->oi", R, pts_w) + t
        pos = xc[..., 2] > 1e-3
        xc = jnp.concatenate([xc[..., :2],
                              jnp.maximum(xc[..., 2:3], 1e-2)], axis=-1)
        pred = cam_ops.project(cam_type, cam_params, xc)
        rv = (obs_uv - pred)
        chi = jnp.sum(rv * rv, axis=-1) * obs_inv_sigma2
        return jnp.where(pos, chi, 1e9)

    schedule = jnp.asarray([12.0, 7.5, chi2_th, chi2_th], dtype)
    p = jnp.concatenate([jnp.zeros(6, dtype), v0])
    inlier = jnp.ones(pts_w.shape[0], bool)

    def round_body(i, carry):
        p, inlier = carry
        w_in = inlier.astype(dtype)

        def gn(carry2, _):
            pp, lam = carry2
            r = residuals(pp, w_in)
            J = jax.jacfwd(lambda q: residuals(q, w_in))(pp)
            H = J.T @ J + lam * jnp.eye(9, dtype=dtype)
            b = -J.T @ r
            dp = jnp.linalg.solve(H, b)
            p_new = pp + dp
            good = jnp.sum(residuals(p_new, w_in) ** 2) < jnp.sum(r ** 2)
            pp = jnp.where(good, p_new, pp)
            lam = jnp.where(good, lam * 0.5, lam * 5.0)
            return (pp, lam), None

        (p, _), _ = jax.lax.scan(gn, (p, jnp.asarray(1e-4, dtype)), None,
                                 length=iters // 3)
        inlier = chi2_of(p) < schedule[i]
        return p, inlier

    p, inlier = jax.lax.fori_loop(0, 4, round_body, (p, inlier))
    inlier = inlier & obs_valid
    R, t, v = unpack(p)
    return PoseInertialResult(
        R=R, t=t, v=v, inlier=inlier,
        n_inliers=jnp.sum(inlier.astype(jnp.int32)))
