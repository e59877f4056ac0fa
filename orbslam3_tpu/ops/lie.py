"""Lie-group operations: SO(3), SE(3), Sim(3).

Replaces the reference's scattered SO(3) helpers (reference include/ImuTypes.h:270-279
``ExpSO3/LogSO3/RightJacobianSO3``, include/G2oTypes.h:56-68) and g2o's
``se3quat.h`` / ``sim3.h`` (reference Thirdparty/g2o/g2o/types/) with one batched,
dtype-generic, jit-friendly module.

Conventions:
- Rotations are 3x3 matrices ``R`` with trailing dims ``(..., 3, 3)``; tangent
  vectors ``(..., 3)``. All functions broadcast over leading batch dims.
- SE(3) is carried as ``(R, t)`` pairs (``(...,3,3)``, ``(...,3)``), world→camera
  ``x_c = R @ x_w + t`` like the reference's ``Tcw``.
- Sim(3) adds a scalar scale ``s``: ``x' = s * R @ x + t``.
- Taylor fallbacks near ``theta ~ 0`` are branchless (``jnp.where``) so the code
  is safe under ``jit``/``vmap`` and differentiable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of (...,3) vector: hat(w) @ v == cross(w, v)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """Inverse of hat: (...,3,3) skew matrix → (...,3) vector."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta2: jax.Array):
    """Branchless (A, B, C) = (sinθ/θ, (1-cosθ)/θ², (θ-sinθ)/θ³) with Taylor fallback."""
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - a) / theta2)
    return a, b, c


def so3_exp(w: jax.Array) -> jax.Array:
    """Exponential map so(3) → SO(3) (Rodrigues), batched."""
    theta2 = jnp.sum(w * w, axis=-1)
    a, b, _ = _sinc_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jax.Array) -> jax.Array:
    """Log map SO(3) → so(3), batched; stable up to theta slightly below pi.

    The arccos argument is clipped strictly inside (−1, 1) so the function is
    differentiable at the identity (arccos' diverges at ±1 — pose-graph
    residual Jacobians are taken by autodiff exactly there); the ~4e-4 rad
    bias this adds at theta≈0 is far below optimization tolerances.
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_t)
    w_skew = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    sin_t = jnp.sin(theta)
    # scale = theta / (2 sin theta) * 2 -> w = theta/sin(theta) * w_skew (safe near 0)
    small = theta < 1e-4
    scale = jnp.where(small, 1.0 + theta * theta / 6.0, theta / jnp.where(small, 1.0, sin_t))
    w = scale[..., None] * w_skew
    # Near theta = pi, sin(theta) ~ 0 and the skew part vanishes: recover the axis
    # from the diagonal of R = I + 2*sin^2(theta/2) * (aa^T - I) -> aa^T = (R+I)/2 approx.
    near_pi = theta > 3.1
    Rp = (R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)) * 0.5
    diag = jnp.stack([Rp[..., 0, 0], Rp[..., 1, 1], Rp[..., 2, 2]], axis=-1)
    axis = jnp.sqrt(jnp.clip(diag, 0.0, None) + 1e-12)
    # fix signs from off-diagonal terms (largest-axis heuristic)
    k = jnp.argmax(diag, axis=-1)
    sgn_src = jnp.stack(
        [
            jnp.stack([Rp[..., 0, 0], Rp[..., 0, 1], Rp[..., 0, 2]], axis=-1),
            jnp.stack([Rp[..., 1, 0], Rp[..., 1, 1], Rp[..., 1, 2]], axis=-1),
            jnp.stack([Rp[..., 2, 0], Rp[..., 2, 1], Rp[..., 2, 2]], axis=-1),
        ],
        axis=-2,
    )
    row = jnp.take_along_axis(sgn_src, k[..., None, None].repeat(3, axis=-1), axis=-2)[..., 0, :]
    axis = axis * jnp.where(jnp.signbit(row), -1.0, 1.0).astype(R.dtype)
    # Resolve the global sign from the skew part (sin(theta) > 0 below pi); at
    # exactly pi both signs are equivalent so the arbitrary choice is fine.
    dot = jnp.sum(axis * w_skew, axis=-1)
    axis = axis * jnp.where(dot < 0, -1.0, 1.0).astype(R.dtype)[..., None]
    w_pi = axis * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w)


def so3_right_jacobian(w: jax.Array) -> jax.Array:
    """Right Jacobian Jr(w) of SO(3): Exp(w + dw) ≈ Exp(w) Exp(Jr dw)."""
    theta2 = jnp.sum(w * w, axis=-1)
    _, b, c = _sinc_coeffs(theta2)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - b[..., None, None] * W + c[..., None, None] * (W @ W)


def so3_right_jacobian_inv(w: jax.Array) -> jax.Array:
    """Inverse right Jacobian of SO(3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    a, b, _ = _sinc_coeffs(theta2)
    small = theta2 < 1e-8
    # d = 1/theta^2 - (1+cos)/(2 theta sin) = (1/theta^2)(1 - a/(2b))
    d = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 / jnp.where(small, 1.0, theta2)) * (1.0 - a / (2.0 * b)),
    )
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + 0.5 * W + d[..., None, None] * (W @ W)


def normalize_rotation(R: jax.Array) -> jax.Array:
    """Project near-rotation onto SO(3) via SVD (reference src/ImuTypes.cc NormalizeRotation)."""
    u, _, vt = jnp.linalg.svd(R)
    Rn = u @ vt
    det = jnp.linalg.det(Rn)
    # Fix improper rotations (det=-1) by flipping the last singular direction.
    fix = jnp.concatenate(
        [jnp.ones(R.shape[:-2] + (2,), R.dtype), det[..., None]], axis=-1
    )
    return (u * fix[..., None, :]) @ vt


# ---------------------------------------------------------------------------
# quaternions (x, y, z, w) — used for trajectory export (reference src/System.cc:625-640)
# ---------------------------------------------------------------------------

def quat_from_mat(R: jax.Array) -> jax.Array:
    """Rotation matrix → unit quaternion (x,y,z,w), batched, branchless."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate computations, pick numerically best
    qw_ = jnp.sqrt(jnp.clip(1.0 + tr, 1e-12, None)) * 0.5
    q0 = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01)], axis=-1) / (4.0 * qw_)[..., None]
    q0 = jnp.concatenate([q0, qw_[..., None]], axis=-1)

    qx_ = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, 1e-12, None)) * 0.5
    q1 = jnp.stack([qx_, (m01 + m10) / (4 * qx_), (m02 + m20) / (4 * qx_), (m21 - m12) / (4 * qx_)], axis=-1)

    qy_ = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, 1e-12, None)) * 0.5
    q2 = jnp.stack([(m01 + m10) / (4 * qy_), qy_, (m12 + m21) / (4 * qy_), (m02 - m20) / (4 * qy_)], axis=-1)

    qz_ = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, 1e-12, None)) * 0.5
    q3 = jnp.stack([(m02 + m20) / (4 * qz_), (m12 + m21) / (4 * qz_), qz_, (m10 - m01) / (4 * qz_)], axis=-1)

    cand = jnp.stack([q0, q1, q2, q3], axis=-2)  # (...,4,4)
    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def mat_from_quat(q: jax.Array) -> jax.Array:
    """Unit quaternion (x,y,z,w) → rotation matrix, batched."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    s = 2.0 / jnp.where(n > 0, n, 1.0)
    xx, yy, zz = x * x * s, y * y * s, z * z * s
    xy, xz, yz = x * y * s, x * z * s, y * z * s
    wx, wy, wz = w * x * s, w * y * s, w * z * s
    return jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

def se3_exp(xi: jax.Array):
    """Exp map se(3) → SE(3). xi = (...,6) with rotation part first [w | v] → (R, t)."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    theta2 = jnp.sum(w * w, axis=-1)
    a, b, c = _sinc_coeffs(theta2)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = eye + b[..., None, None] * W + c[..., None, None] * (W @ W)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return R, t


def se3_log(R: jax.Array, t: jax.Array) -> jax.Array:
    """Log map SE(3) → se(3), returns (...,6) = [w | v]."""
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    a, b, _ = _sinc_coeffs(theta2)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), W.shape)
    small = theta2 < 1e-8
    coef = jnp.where(
        small,
        1.0 / 12.0,
        (1.0 / jnp.where(small, 1.0, theta2)) * (1.0 - a / (2.0 * b)),
    )
    Vinv = eye - 0.5 * W + coef[..., None, None] * (W @ W)
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([w, v], axis=-1)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra,ta) ∘ (Rb,tb): x → Ra(Rb x + tb) + ta."""
    R = Ra @ Rb
    t = jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return R, t


def se3_inverse(R, t):
    Rinv = jnp.swapaxes(R, -1, -2)
    return Rinv, -jnp.einsum("...ij,...j->...i", Rinv, t)


def se3_apply(R, t, x):
    """Apply (R,t) to points x (...,3)."""
    return jnp.einsum("...ij,...j->...i", R, x) + t


# ---------------------------------------------------------------------------
# Sim(3) — used by loop closing / map merge (reference Thirdparty/g2o/g2o/types/sim3.h)
# ---------------------------------------------------------------------------

def sim3_apply(s, R, t, x):
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, x) + t


def sim3_compose(sa, Ra, ta, sb, Rb, tb):
    """x → sa Ra (sb Rb x + tb) + ta."""
    s = sa * sb
    R = Ra @ Rb
    t = sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return s, R, t


def sim3_inverse(s, R, t):
    si = 1.0 / s
    Ri = jnp.swapaxes(R, -1, -2)
    ti = -si[..., None] * jnp.einsum("...ij,...j->...i", Ri, t)
    return si, Ri, ti


def sim3_exp(xi: jax.Array):
    """Exp map sim(3) → Sim(3). xi = (...,7) = [w | v | sigma] → (s, R, t).

    Uses the closed-form V matrix from Strasdat's thesis (as in g2o sim3.h).
    """
    w, v, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(w)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)

    sig2 = sigma * sigma
    small_sig = jnp.abs(sigma) < 1e-5
    small_th = theta2 < 1e-8
    X = jnp.where(small_sig, 1.0 + sigma / 2.0 + sig2 / 6.0, (s - 1.0) / jnp.where(small_sig, 1.0, sigma))

    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    denom = jnp.where(small_sig & small_th, 1.0, sig2 + theta2)
    # general-case coefficients (A for W, B for W^2, C for I)
    a_gen = (s * sin_t * sigma + (1.0 - s * cos_t) * theta) / (jnp.where(small_th, 1.0, theta) * denom)
    b_gen = (X - ((s * cos_t - 1.0) * sigma + s * sin_t * theta) / denom) / jnp.where(small_th, 1.0, theta2)
    # sigma→0 limits: A → (1-cosθ)/θ², B → (θ-sinθ)/θ³ (the SE3 V matrix)
    a0, b0, c0 = _sinc_coeffs(theta2)
    a_sig0 = b0
    b_sig0 = c0
    A = jnp.where(small_sig, a_sig0, a_gen)
    B = jnp.where(small_sig, b_sig0, b_gen)
    C = X
    # θ→0 limit handled: a_gen/b_gen guarded; for small θ use A→ ~C·0 terms
    A = jnp.where(small_th, jnp.where(small_sig, 0.5, a_gen * 0 + ((sigma - 1.0) * s + 1.0) / jnp.where(small_sig, 1.0, sig2)), A)
    B = jnp.where(small_th, 1.0 / 6.0, B)

    V = C[..., None, None] * eye + A[..., None, None] * W + B[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, v)
    return s, R, t


def sim3_log(s, R, t) -> jax.Array:
    """Log map Sim(3) → sim(3) via solving V x = t (3x3 solve, batched)."""
    sigma = jnp.log(s)
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), W.shape)
    sig2 = sigma * sigma
    small_sig = jnp.abs(sigma) < 1e-5
    small_th = theta2 < 1e-8
    X = jnp.where(small_sig, 1.0 + sigma / 2.0 + sig2 / 6.0, (s - 1.0) / jnp.where(small_sig, 1.0, sigma))
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    denom = jnp.where(small_sig & small_th, 1.0, sig2 + theta2)
    a_gen = (s * sin_t * sigma + (1.0 - s * cos_t) * theta) / (jnp.where(small_th, 1.0, theta) * denom)
    b_gen = (X - ((s * cos_t - 1.0) * sigma + s * sin_t * theta) / denom) / jnp.where(small_th, 1.0, theta2)
    a0, b0, c0 = _sinc_coeffs(theta2)
    A = jnp.where(small_sig, b0, a_gen)
    B = jnp.where(small_sig, c0, b_gen)
    A = jnp.where(small_th, jnp.where(small_sig, 0.5, ((sigma - 1.0) * s + 1.0) / jnp.where(small_sig, 1.0, sig2)), A)
    B = jnp.where(small_th, 1.0 / 6.0, B)
    V = X[..., None, None] * eye + A[..., None, None] * W + B[..., None, None] * W2
    v = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([w, v, sigma[..., None]], axis=-1)
