"""Camera models: Pinhole (+ radial-tangential distortion) and Kannala-Brandt-8 fisheye.

Rebuilds the reference's ``GeometricCamera`` hierarchy (reference
include/CameraModels/GeometricCamera.h:37-95, src/CameraModels/Pinhole.cpp,
src/CameraModels/KannalaBrandt8.cpp) as batched functional kernels.

Parameter layouts (all float arrays, broadcastable leading batch dims on points):
- pinhole K: ``(fx, fy, cx, cy)`` → shape (4,)
- radtan distortion D: ``(k1, k2, p1, p2, k3)`` → shape (5,) (k3 may be 0)
- KB8: ``(fx, fy, cx, cy, k0, k1, k2, k3)`` → shape (8,)

Projection maps camera-frame 3D points ``(...,3)`` to pixels ``(...,2)``;
unprojection maps pixels to unit-z rays ``(...,3)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Pinhole
# ---------------------------------------------------------------------------

def pinhole_project(K: jax.Array, xc: jax.Array) -> jax.Array:
    """Project camera-frame points (...,3) → pixels (...,2). No distortion
    (matches reference Pinhole::project, src/CameraModels/Pinhole.cpp:37-47 behavior:
    keypoints are pre-undistorted once at extraction)."""
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    z = xc[..., 2]
    inv_z = 1.0 / z
    u = fx * xc[..., 0] * inv_z + cx
    v = fy * xc[..., 1] * inv_z + cy
    return jnp.stack([u, v], axis=-1)


def pinhole_unproject(K: jax.Array, uv: jax.Array) -> jax.Array:
    """Pixels (...,2) → unit-z rays (...,3)."""
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def pinhole_project_jac(K: jax.Array, xc: jax.Array) -> jax.Array:
    """Jacobian d(u,v)/d(xc): (...,2,3) (reference Pinhole::projectJac)."""
    fx, fy = K[0], K[1]
    x, y, z = xc[..., 0], xc[..., 1], xc[..., 2]
    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z
    zero = jnp.zeros_like(x)
    row0 = jnp.stack([fx * inv_z, zero, -fx * x * inv_z2], axis=-1)
    row1 = jnp.stack([zero, fy * inv_z, -fy * y * inv_z2], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def radtan_distort(D: jax.Array, xn: jax.Array) -> jax.Array:
    """Apply radial-tangential distortion to normalized coords (...,2)."""
    k1, k2, p1, p2, k3 = D[0], D[1], D[2], D[3], D[4]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xy2 = 2.0 * x * y
    xd = x * radial + p1 * xy2 + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p2 * xy2 + p1 * (r2 + 2.0 * y * y)
    return jnp.stack([xd, yd], axis=-1)


def radtan_undistort(D: jax.Array, xd: jax.Array, iters: int = 10) -> jax.Array:
    """Invert radtan distortion via the compensated fixed-point iteration
    x ← (xd − tangential(x)) / radial(x) (cv::undistortPoints semantics;
    replaces reference Frame::UndistortKeyPoints src/Frame.cc:924)."""
    k1, k2, p1, p2, k3 = D[0], D[1], D[2], D[3], D[4]
    x = xd[..., 0]
    y = xd[..., 1]
    x0, y0 = x, y
    for _ in range(iters):
        r2 = x * x + y * y
        inv_radial = 1.0 / (1.0 + r2 * (k1 + r2 * (k2 + r2 * k3)))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (x0 - dx) * inv_radial
        y = (y0 - dy) * inv_radial
    return jnp.stack([x, y], axis=-1)


def pinhole_undistort_pixels(K: jax.Array, D: jax.Array, uv: jax.Array) -> jax.Array:
    """Distorted pixels → undistorted pixels under the same K."""
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    xn = jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)
    xu = radtan_undistort(D, xn)
    return jnp.stack([xu[..., 0] * fx + cx, xu[..., 1] * fy + cy], axis=-1)


# ---------------------------------------------------------------------------
# Kannala-Brandt 8 (equidistant polynomial fisheye)
# ---------------------------------------------------------------------------

def kb8_project(P: jax.Array, xc: jax.Array) -> jax.Array:
    """KB8 projection (reference KannalaBrandt8::project,
    src/CameraModels/KannalaBrandt8.cpp:42-65): r(θ) = θ + k0 θ³ + k1 θ⁵ + k2 θ⁷ + k3 θ⁹."""
    fx, fy, cx, cy = P[0], P[1], P[2], P[3]
    k0, k1, k2, k3 = P[4], P[5], P[6], P[7]
    x, y, z = xc[..., 0], xc[..., 1], xc[..., 2]
    r2 = x * x + y * y
    r = jnp.sqrt(r2 + 1e-18)
    theta = jnp.arctan2(r, z)
    t2 = theta * theta
    d = theta * (1.0 + t2 * (k0 + t2 * (k1 + t2 * (k2 + t2 * k3))))
    scale = d / r
    u = fx * x * scale + cx
    v = fy * y * scale + cy
    return jnp.stack([u, v], axis=-1)


def kb8_unproject(P: jax.Array, uv: jax.Array, iters: int = 10) -> jax.Array:
    """KB8 unprojection to unit-z rays via Newton on r(θ)=d (reference
    KannalaBrandt8::unproject Newton iteration, precision 1e-6)."""
    fx, fy, cx, cy = P[0], P[1], P[2], P[3]
    k0, k1, k2, k3 = P[4], P[5], P[6], P[7]
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    d = jnp.sqrt(mx * mx + my * my + 1e-18)
    d_clip = jnp.minimum(d, jnp.pi / 2.0 + 0.6)  # keep Newton in basin
    theta = d_clip
    for _ in range(iters):
        t2 = theta * theta
        f = theta * (1.0 + t2 * (k0 + t2 * (k1 + t2 * (k2 + t2 * k3)))) - d_clip
        fp = 1.0 + t2 * (3 * k0 + t2 * (5 * k1 + t2 * (7 * k2 + t2 * 9 * k3)))
        theta = theta - f / jnp.where(jnp.abs(fp) < 1e-8, 1.0, fp)
    scale = jnp.tan(theta) / d
    return jnp.stack([mx * scale, my * scale, jnp.ones_like(mx)], axis=-1)


def kb8_project_jac(P: jax.Array, xc: jax.Array) -> jax.Array:
    """Analytic Jacobian d(u,v)/d(xc): (...,2,3) (reference KannalaBrandt8::projectJac)."""
    fx, fy = P[0], P[1]
    k0, k1, k2, k3 = P[4], P[5], P[6], P[7]
    x, y, z = xc[..., 0], xc[..., 1], xc[..., 2]
    r2 = x * x + y * y
    r = jnp.sqrt(r2 + 1e-18)
    R2 = r2 + z * z
    theta = jnp.arctan2(r, z)
    t2 = theta * theta
    f = theta * (1.0 + t2 * (k0 + t2 * (k1 + t2 * (k2 + t2 * k3))))
    fp = 1.0 + t2 * (3 * k0 + t2 * (5 * k1 + t2 * (7 * k2 + t2 * 9 * k3)))

    # d theta / d(x,y,z): theta = atan2(r, z)
    dt_dx = z * x / (R2 * r)
    dt_dy = z * y / (R2 * r)
    dt_dz = -r / R2
    # u = fx * f * x / r + cx
    inv_r = 1.0 / r
    inv_r3 = inv_r / r2
    du_dx = fx * (fp * dt_dx * x * inv_r + f * (y * y) * inv_r3)
    du_dy = fx * (fp * dt_dy * x * inv_r - f * x * y * inv_r3)
    du_dz = fx * fp * dt_dz * x * inv_r
    dv_dx = fy * (fp * dt_dx * y * inv_r - f * x * y * inv_r3)
    dv_dy = fy * (fp * dt_dy * y * inv_r + f * (x * x) * inv_r3)
    dv_dz = fy * fp * dt_dz * y * inv_r
    row0 = jnp.stack([du_dx, du_dy, du_dz], axis=-1)
    row1 = jnp.stack([dv_dx, dv_dy, dv_dz], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


# ---------------------------------------------------------------------------
# Generic dispatch helpers (static camera-type tag → concrete kernel)
# ---------------------------------------------------------------------------

PINHOLE = 0
KB8 = 1


def project(cam_type: int, params: jax.Array, xc: jax.Array) -> jax.Array:
    """Static dispatch on camera type (resolved at trace time)."""
    if cam_type == PINHOLE:
        return pinhole_project(params, xc)
    return kb8_project(params, xc)


def unproject(cam_type: int, params: jax.Array, uv: jax.Array) -> jax.Array:
    if cam_type == PINHOLE:
        return pinhole_unproject(params, uv)
    return kb8_unproject(params, uv)


def project_jac(cam_type: int, params: jax.Array, xc: jax.Array) -> jax.Array:
    if cam_type == PINHOLE:
        return pinhole_project_jac(params, xc)
    return kb8_project_jac(params, xc)
