"""Rectified stereo feature matching.

Rebuilds the reference ``Frame::ComputeStereoMatches`` (reference
src/Frame.cc:1027: per-row candidate lists, descriptor gate
thOrbDist=(TH_HIGH+TH_LOW)/2=75, disparity range (0, bf/minZ], SAD subpixel
refinement) as one masked all-pairs kernel:

- candidate mask: same row band (|yL−yR| ≤ 2·scale of the left octave),
  disparity within range, octave within ±1;
- Hamming argmin under the 75 gate;
- subpixel: parabola fit over the distance profile of the three nearest-x
  right candidates (a descriptor-space stand-in for the reference's image-SAD
  refinement — image-patch SAD on the blurred pyramid is a later optimization).

RGB-D uses `depth_to_virtual_ur` (reference Frame::ComputeStereoFromRGBD
src/Frame.cc:1279): ur = u − bf/z.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import matching

TH_ORB = (matching.TH_HIGH + matching.TH_LOW) // 2  # 75


def stereo_match(
    xy_l, desc_l, oct_l, valid_l,
    xy_r, desc_r, oct_r, valid_r,
    scale_factors, bf: jax.Array, min_z: jax.Array,
):
    """Returns (ur (N,), depth (N,), ok (N,)) for the left features.

    scale_factors: (L,) per-octave scale; bf = baseline*fx; min_z: closest
    depth (maxD = bf/min_z).
    """
    sf_l = scale_factors[oct_l]
    dy = jnp.abs(xy_l[:, None, 1] - xy_r[None, :, 1])
    row_ok = dy <= 2.0 * sf_l[:, None]
    disp = xy_l[:, None, 0] - xy_r[None, :, 0]
    max_d = bf / min_z
    disp_ok = (disp > 0.1) & (disp <= max_d)
    o_ok = matching.octave_mask(oct_l, oct_r, 1, 1)
    mask = valid_l[:, None] & valid_r[None, :] & row_ok & disp_ok & o_ok

    dist = matching.hamming_matrix(desc_l, desc_r)
    d = jnp.where(mask, dist, matching.BIG)
    idx = jnp.argmin(d, axis=1)
    best = jnp.take_along_axis(d, idx[:, None], axis=1)[:, 0]
    ok = best <= TH_ORB

    ur = xy_r[idx, 0]
    disparity = xy_l[:, 0] - ur
    ok = ok & (disparity > 0.1) & (disparity <= max_d)
    depth = bf / jnp.maximum(disparity, 1e-6)
    return ur, depth, ok


def subpixel_refine(img_l: jax.Array, img_r: jax.Array, xy_l: jax.Array,
                    ur: jax.Array, ok: jax.Array, w: int = 5, search: int = 5):
    """Image-SAD subpixel disparity refinement (reference src/Frame.cc:1087-1130:
    11x11 window slid ±5 px on the right image, parabola fit over the SAD
    minimum). Batched gathers — one kernel for all N features.

    Returns refined ur (N,) and a validity mask (parabola minimum in range).
    """
    H, W = img_l.shape
    n = xy_l.shape[0]
    xl = jnp.round(xy_l[:, 0]).astype(jnp.int32)
    yl = jnp.round(xy_l[:, 1]).astype(jnp.int32)
    xr0 = jnp.round(ur).astype(jnp.int32)

    dy, dx = jnp.meshgrid(jnp.arange(-w, w + 1), jnp.arange(-w, w + 1), indexing="ij")

    def gather(img, cx, cy):
        ix = jnp.clip(cx[:, None, None] + dx[None], 0, W - 1)
        iy = jnp.clip(cy[:, None, None] + dy[None], 0, H - 1)
        return img.reshape(-1)[(iy * W + ix).reshape(n, -1)].reshape(n, 2 * w + 1, 2 * w + 1)

    patch_l = gather(img_l, xl, yl)
    # center-normalized SAD like the reference (subtract center pixel)
    patch_l = patch_l - patch_l[:, w:w + 1, w:w + 1]
    sads = []
    for off in range(-search, search + 1):
        patch_r = gather(img_r, xr0 + off, yl)
        patch_r = patch_r - patch_r[:, w:w + 1, w:w + 1]
        sads.append(jnp.sum(jnp.abs(patch_l - patch_r), axis=(1, 2)))
    sad = jnp.stack(sads, axis=1)                      # (N, 2*search+1)
    best = jnp.argmin(sad, axis=1)
    best_in = (best > 0) & (best < 2 * search)
    bc = jnp.clip(best, 1, 2 * search - 1)
    s_m = jnp.take_along_axis(sad, (bc - 1)[:, None], axis=1)[:, 0]
    s_0 = jnp.take_along_axis(sad, bc[:, None], axis=1)[:, 0]
    s_p = jnp.take_along_axis(sad, (bc + 1)[:, None], axis=1)[:, 0]
    denom = s_m + s_p - 2.0 * s_0
    delta = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (s_m - s_p) / denom, 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    ur_ref = xr0.astype(jnp.float32) + (bc - search).astype(jnp.float32) + delta
    ok = ok & best_in
    # median-SAD outlier cut (reference src/Frame.cc:1130-1160: sort best SADs,
    # reject matches with SAD > 1.5*1.4*median) — kills the descriptor-gate
    # survivors that are geometric mismatches
    best_sad = s_0
    med = jnp.median(jnp.where(ok, best_sad, jnp.nan))
    med = jnp.nan_to_num(med, nan=1e9)
    ok = ok & (best_sad <= 1.5 * 1.4 * med)
    return jnp.where(ok, ur_ref, ur), ok


def depth_to_virtual_ur(xy, depth_map_vals, bf: jax.Array):
    """RGB-D → virtual right coordinate (reference src/Frame.cc:1279)."""
    z = depth_map_vals
    ok = z > 0
    ur = xy[:, 0] - bf / jnp.maximum(z, 1e-6)
    return jnp.where(ok, ur, -1.0), jnp.where(ok, z, -1.0), ok


def fisheye_stereo_match(
    xy_l, desc_l, oct_l, valid_l,
    xy_r, desc_r, oct_r, valid_r,
    cam_l, cam_r, R_rl, t_rl,
    lap_l, lap_r, level_sigma2,
    ratio: jax.Array = 0.7, max_dist: jax.Array = 50,
    min_parallax_cos: float = 0.9998, chi2_th: float = 5.991,
):
    """Two-camera fisheye (Kannala-Brandt-8) stereo matching + triangulation
    (reference Frame::ComputeStereoFishEyeMatches src/Frame.cc:1440-1480:
    BFMatcher knn over the lapping-area features, Lowe ratio 0.7, accept when
    KannalaBrandt8::TriangulateMatches returns depth > 0.0001 — which itself
    gates on parallax and per-eye reprojection χ², KannalaBrandt8.cpp:89).

    cam_l/cam_r: (8,) KB8 parameter vectors; (R_rl, t_rl): right←left rig
    extrinsics; lap_l/lap_r: (2,) pixel-u lapping intervals per eye
    (reference Camera.lappingBegin/End, mvLappingArea).

    Returns (idx (N,), ok (N,), depth_l (N,), xl (N,3)) for left features:
    matched right index, acceptance, z-depth and 3D point in the LEFT camera.
    """
    from . import camera as cam_ops
    from . import triangulation
    rays_l = cam_ops.kb8_unproject(cam_l, xy_l)
    rays_r = cam_ops.kb8_unproject(cam_r, xy_r)

    in_lap_l = (xy_l[:, 0] >= lap_l[0]) & (xy_l[:, 0] <= lap_l[1])
    in_lap_r = (xy_r[:, 0] >= lap_r[0]) & (xy_r[:, 0] <= lap_r[1])
    mask = (valid_l & in_lap_l)[:, None] & (valid_r & in_lap_r)[None, :]
    mask = mask & matching.octave_mask(oct_l, oct_r, 1, 1)

    dist = matching.hamming_matrix(desc_l, desc_r)
    idx, best, ok = matching.masked_match(dist, mask, max_dist, ratio)
    ok = matching.resolve_duplicates(idx, best, ok, desc_r.shape[0])

    # triangulate: left camera is the anchor (T_l = I), right = (R_rl, t_rl)
    eye = jnp.eye(3, dtype=rays_l.dtype)
    zero = jnp.zeros(3, rays_l.dtype)
    r2m = rays_r[idx]
    xl = triangulation.triangulate_dlt(eye, zero, rays_l, R_rl, t_rl, r2m)
    # χ² gates in normalized-ray units scaled by the fisheye focal
    f2 = cam_l[0] * cam_l[0]
    sig_l = level_sigma2[oct_l] / f2
    sig_r = level_sigma2[oct_r[idx]] / f2
    tri_ok, depths = triangulation.check_triangulation(
        xl, eye, zero, rays_l, R_rl, t_rl, r2m, sig_l, sig_r,
        min_parallax_cos=min_parallax_cos, chi2_th=chi2_th)
    z = xl[..., 2]
    ok = ok & tri_ok & (z > 1e-4)
    return idx, ok, jnp.where(ok, z, -1.0), xl
