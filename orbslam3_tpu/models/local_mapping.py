"""Local mapping: keyframe processing, triangulation, local BA, culling.

Rebuilds the reference ``LocalMapping`` thread (reference src/LocalMapping.cc:77-339
Run() loop: ProcessNewKeyFrame → MapPointCulling → CreateNewMapPoints →
SearchInNeighbors → LocalBundleAdjustment → KeyFrameCulling) as a host driver
over batched kernels. In this framework the mapper can run synchronously
(called per new keyframe) or asynchronously (see system.py); the algorithms are
identical — the reference's queue/mutex machinery (src/LocalMapping.cc:342-346)
is unnecessary because map mutation happens in one host thread and device
kernels consume immutable snapshots.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import ba as ba_ops
from . import kernels
from .map import MapState


class LocalMapper:
    def __init__(self, map_state: MapState, K: np.ndarray, orb_cfg,
                 wh=(752, 480), ba_window: int = 16, ba_max_fixed: int = 8,
                 ba_point_cap: int = 4096, ba_obs_cap: int = 16384,
                 cam_type: int = 0):
        self.map = map_state
        self.K = np.asarray(K, np.float32)
        self.wh = np.asarray(wh, np.float32)
        self.orb_cfg = orb_cfg
        self.bf = 0.0  # set by the system for stereo/RGB-D rigs
        self.ba_window = ba_window
        self.ba_max_fixed = ba_max_fixed
        self.ba_point_cap = ba_point_cap
        self.ba_obs_cap = ba_obs_cap
        self.cam_type = int(cam_type)
        self.tri_match = kernels.triangulation_matcher(
            self.cam_type, orb_cfg.n_levels, orb_cfg.scale)
        self._ba_jit = None
        self.recent_mp: list[tuple[int, np.ndarray]] = []  # (created_at_kf, ids)
        self.stats = {"triangulated": 0, "culled_mp": 0, "ba_runs": 0}
        # async hook: called with the anchor SE3 correction after a
        # propagated global BA so the tracker can shift its live frame
        self.on_poses_corrected = None

    # ------------------------------------------------------------------
    def process_keyframe(self, kf_id: int, initial: bool = False,
                         abort_check=None):
        """One mapper round (reference LocalMapping::Run body,
        src/LocalMapping.cc:77-339). ``abort_check`` implements the
        reference's run-BA-only-when-idle rule (:153: LBA runs only if the
        keyframe queue is empty and no stop was requested)."""
        m = self.map
        with m.lock:
            m.refresh_map_points(
                np.unique(m.kf_feat_mp[kf_id][m.kf_feat_mp[kf_id] >= 0]))
            if initial:
                # initial map: global BA over the 2 bootstrap KFs (reference
                # CreateInitialMapMonocular runs GlobalBundleAdjustemnt(20))
                self.local_ba(kf_id, iters=(10, 20))
                self._renormalize_initial_scale(kf_id)
                return
            self.cull_map_points(kf_id)
            self.create_new_map_points(kf_id)
            self.search_in_neighbors(kf_id)
        if abort_check is None or not abort_check():
            self.local_ba(kf_id)
            with m.lock:
                self.cull_keyframes(kf_id)

    def _renormalize_initial_scale(self, kf_id: int):
        """After init BA, re-fix median depth to 1 (the BA may drift the gauge
        scale since only pose 0 is fixed)."""
        m = self.map
        mps = m.valid_mp_ids()
        if len(mps) == 0:
            return
        depths = (m.mp_xyz[mps] @ m.kf_R[0].T + m.kf_t[0])[:, 2]
        med = np.median(depths)
        if med <= 1e-6:
            return
        m.mp_xyz[mps] /= med
        for k in range(m.n_kf):
            m.kf_t[k] /= med

    # ------------------------------------------------------------------
    def cull_map_points(self, kf_id: int):
        """Reference MapPointCulling (src/LocalMapping.cc:430-471): cull recent
        points with found/visible < 0.25 or too few observations 2 KFs after
        creation; release from probation after 3 KFs."""
        m = self.map
        survivors = []
        to_cull = []
        for created_kf, ids in self.recent_mp:
            ids = ids[m.mp_valid[ids]]
            if len(ids) == 0:
                continue
            age = kf_id - created_kf
            ratio = m.mp_found[ids] / np.maximum(m.mp_visible[ids], 1)
            bad = ratio < 0.25
            if age >= 2:
                bad |= m.obs_count(ids) <= 2
            to_cull.append(ids[bad])
            keep = ids[~bad]
            if age < 3 and len(keep):
                survivors.append((created_kf, keep))
        self.recent_mp = survivors
        if to_cull:
            allc = np.concatenate(to_cull)
            m.remove_map_points(allc)
            self.stats["culled_mp"] += len(allc)

    # ------------------------------------------------------------------
    def create_new_map_points(self, kf_id: int, n_neighbors: int = 10):
        """Reference CreateNewMapPoints (src/LocalMapping.cc:487): epipolar
        search + triangulation against best covisible KFs."""
        m = self.map
        neighbors = m.best_covisible(kf_id, n_neighbors, min_weight=15)
        if len(neighbors) == 0 and m.n_kf >= 2:
            neighbors = np.array([kf_id - 1], np.int32)
        R1, t1 = m.kf_R[kf_id], m.kf_t[kf_id]
        c1 = -R1.T @ t1
        new_ids_all = []
        for k2 in neighbors:
            k2 = int(k2)
            R2, t2 = m.kf_R[k2], m.kf_t[k2]
            c2 = -R2.T @ t2
            baseline = np.linalg.norm(c1 - c2)
            # baseline/median-depth check (reference :520-540 area)
            mps2 = m.kf_feat_mp[k2]
            mps2 = mps2[mps2 >= 0]
            if len(mps2):
                depths = (m.mp_xyz[mps2] @ R2.T + t2)[:, 2]
                med = np.median(depths[depths > 0]) if (depths > 0).any() else 1.0
                if baseline / max(med, 1e-9) < 0.01:
                    continue
            elif baseline < 1e-6:
                continue
            un1 = m.kf_feat_valid[kf_id] & (m.kf_feat_mp[kf_id] < 0)
            un2 = m.kf_feat_valid[k2] & (m.kf_feat_mp[k2] < 0)
            if un1.sum() < 10 or un2.sum() < 10:
                continue
            idx, ok, xw, depths = self.tri_match(
                jnp.asarray(R1), jnp.asarray(t1), jnp.asarray(R2), jnp.asarray(t2),
                jnp.asarray(self.K),
                jnp.asarray(m.kf_feat_xy[kf_id]), jnp.asarray(m.kf_feat_desc[kf_id]),
                jnp.asarray(un1), jnp.asarray(m.kf_feat_octave[kf_id]),
                jnp.asarray(m.kf_feat_xy[k2]), jnp.asarray(m.kf_feat_desc[k2]),
                jnp.asarray(un2), jnp.asarray(m.kf_feat_octave[k2]),
                # no best/second ratio (reference SearchForTriangulation gates only
                # on TH_LOW + epipolar + rotation, src/ORBmatcher.cc:1107): the
                # same landmark at adjacent octaves makes second-best ≈ best
                jnp.asarray(1.0, jnp.float32), jnp.asarray(50, jnp.int32),
                jnp.asarray(1.0 / float(self.K[0]), jnp.float32))
            okn = np.asarray(ok)
            idxn = np.asarray(idx)
            f1 = np.nonzero(okn)[0]
            if len(f1) == 0:
                continue
            f2 = idxn[f1]
            xw_np = np.asarray(xw)[f1]
            # create points
            dirs = xw_np - c1
            dist = np.linalg.norm(dirs, axis=1)
            normals = dirs / np.maximum(dist[:, None], 1e-9)
            sf = m.scale_factors
            lvl = m.kf_feat_octave[kf_id, f1]
            maxd = dist * sf[lvl]
            mind = maxd / sf[-1]
            ids = m.add_map_points(xw_np, m.kf_feat_desc[kf_id, f1], kf_id,
                                   normals, mind, maxd, first_kf=kf_id)
            m.kf_feat_mp[kf_id, f1] = ids
            m.kf_feat_mp[k2, f2] = ids
            # seed counters so culling's found-ratio starts neutral
            m.mp_visible[ids] = 1
            m.mp_found[ids] = 1
            new_ids_all.append(ids)
        if new_ids_all:
            allnew = np.concatenate(new_ids_all)
            self.recent_mp.append((kf_id, allnew))
            self.stats["triangulated"] += len(allnew)

    # ------------------------------------------------------------------
    def search_in_neighbors(self, kf_id: int, n_neighbors: int = 10, cap: int = 4096):
        """Fuse duplicated landmarks & add missing observations (reference
        SearchInNeighbors src/LocalMapping.cc:925 + ORBmatcher::Fuse :1823):
        project the new KF's points into its covisible neighbors (and the
        union of neighbor points into the new KF); a projected point matching
        an existing feature either merges with that feature's point (keep the
        more-observed one) or claims the free feature as a new observation."""
        m = self.map
        if not hasattr(self, "_fuse_match"):
            self._fuse_match = kernels.projection_matcher(
                self.cam_type, self.orb_cfg.n_levels, self.orb_cfg.scale)
        neighbors = [int(k) for k in m.best_covisible(kf_id, n_neighbors, min_weight=15)]
        if not neighbors:
            return
        kf_mps = m.kf_feat_mp[kf_id]
        kf_mps = np.unique(kf_mps[kf_mps >= 0])
        # direction 1: this KF's points into each neighbor
        for t in neighbors:
            self._fuse_into(kf_mps, t, cap)
        # direction 2: neighbor points into this KF
        neigh_mps = m.local_map_points(np.asarray(neighbors, np.int32))
        self._fuse_into(neigh_mps, kf_id, cap)
        m.refresh_map_points(kf_mps)

    def _fuse_into(self, mp_ids: np.ndarray, target_kf: int, cap: int):
        import jax.numpy as jnp
        m = self.map
        mp_ids = mp_ids[m.mp_valid[mp_ids]][:cap]
        if len(mp_ids) == 0:
            return
        n = len(mp_ids)
        pad = cap - n
        def pk(a, fill=0.0):
            out = a[mp_ids]
            if pad:
                out = np.concatenate([out, np.full((pad,) + out.shape[1:], fill, out.dtype)])
            return out
        valid = np.zeros(cap, bool)
        valid[:n] = True
        idx, ok, uv, lvl, frustum = self._fuse_match(
            jnp.asarray(pk(m.mp_xyz)), jnp.asarray(pk(m.mp_desc)),
            jnp.asarray(pk(m.mp_normal)), jnp.asarray(pk(m.mp_min_dist)),
            jnp.asarray(pk(m.mp_max_dist, 1.0)), jnp.asarray(valid),
            jnp.asarray(m.kf_R[target_kf]), jnp.asarray(m.kf_t[target_kf]),
            jnp.asarray(self.K), jnp.asarray(m.kf_feat_xy[target_kf]),
            jnp.asarray(m.kf_feat_desc[target_kf]),
            jnp.asarray(m.kf_feat_octave[target_kf]),
            jnp.asarray(m.kf_feat_valid[target_kf]), jnp.asarray(self.wh),
            jnp.asarray(3.0, jnp.float32),   # fuse radius 3*scale (reference Fuse th=3)
            jnp.asarray(1.0, jnp.float32),   # no ratio test in Fuse
            jnp.asarray(50, jnp.int32),      # TH_LOW
            jnp.asarray(0.5, jnp.float32))
        okn = np.asarray(ok)[:n]
        idxn = np.asarray(idx)[:n]
        src = np.nonzero(okn)[0]
        if len(src) == 0:
            return
        mp_src = mp_ids[src]
        feat_tgt = idxn[src]
        cur = m.kf_feat_mp[target_kf, feat_tgt]
        obs_cnt = m.obs_count()
        for mp, ft, existing in zip(mp_src, feat_tgt, cur):
            if existing == mp:
                continue
            if existing < 0:
                m.kf_feat_mp[target_kf, ft] = mp
            else:
                if not m.mp_valid[existing]:
                    m.kf_feat_mp[target_kf, ft] = mp
                    continue
                # merge: keep the more-observed point (reference MapPoint::Replace)
                if obs_cnt[mp] >= obs_cnt[existing]:
                    m.replace_map_points(np.asarray([existing]), np.asarray([mp]))
                else:
                    m.replace_map_points(np.asarray([mp]), np.asarray([existing]))

    # ------------------------------------------------------------------
    def cull_keyframes(self, kf_id: int, redundancy: float = 0.9,
                       max_cull_per_run: int = 2):
        """Redundant-keyframe culling (reference KeyFrameCulling
        src/LocalMapping.cc:1218: a covisible KF whose ≥90% of map points are
        observed by ≥3 other keyframes is removed; the scale-consistency
        refinement and the inertial temporal-chain protections are later-round
        items — the first two keyframes are always kept)."""
        if getattr(self, "preserve_temporal_chain", False):
            # inertial maps: culling breaks the mPrevKF preintegration chain
            # (the reference's KeyFrameCulling has dedicated inertial
            # protections + preintegration merging; until those land, keep all)
            return
        m = self.map
        candidates = [int(k) for k in m.best_covisible(kf_id, 20, min_weight=15)]
        obs = m.obs_count()
        n_culled = 0
        for k in candidates:
            if k <= 1 or k == kf_id or not m.kf_valid[k]:
                continue
            row = m.kf_feat_mp[k]
            mps = row[row >= 0]
            mps = mps[m.mp_valid[mps]]
            if len(mps) < 20:
                continue
            redundant = (obs[mps] >= 4).mean()   # self + ≥3 others
            if redundant > redundancy:
                m.remove_keyframe(k)
                self.stats["culled_kf"] = self.stats.get("culled_kf", 0) + 1
                n_culled += 1
                if n_culled >= max_cull_per_run:
                    break

    # ------------------------------------------------------------------
    def local_ba(self, kf_id: int, iters: tuple[int, int] = (5, 10)):
        """Reference LocalBundleAdjustment (src/Optimizer.cc:1858): window =
        KF + covisibles; fixed = other observers (min 2); two-phase schedule.
        The problem is gathered and written back under the map lock; the
        device solve runs on the gathered (immutable) snapshot outside it."""
        m = self.map
        with m.lock:
            prob_data = self._gather_local_ba(kf_id)
        if prob_data is None:
            return
        prob, all_kfs, fixed_mask, pts, o_src_kf, o_src_feat, n_obs = prob_data
        res = self._run_ba(prob, iters)
        with m.lock:
            # write back
            Rn = np.asarray(res.R)[: len(all_kfs)]
            tn = np.asarray(res.t)[: len(all_kfs)]
            for i, k in enumerate(all_kfs):
                if not fixed_mask[i] and m.kf_valid[k]:
                    m.kf_R[k] = Rn[i]
                    m.kf_t[k] = tn[i]
            keep = m.mp_valid[pts]
            m.mp_xyz[pts[keep]] = np.asarray(res.pts)[: len(pts)][keep]
            # erase outlier observations (reference :2270 area)
            inl = np.asarray(res.obs_inlier)[: n_obs]
            bad = ~inl
            if bad.any():
                m.kf_feat_mp[o_src_kf[bad], o_src_feat[bad]] = -1
        self.stats["ba_runs"] += 1

    def _gather_local_ba(self, kf_id: int):
        m = self.map
        window = [kf_id] + [int(k) for k in m.best_covisible(kf_id, self.ba_window - 1, min_weight=15)]
        window = list(dict.fromkeys(window))
        pts = m.local_map_points(np.asarray(window, np.int32))[: self.ba_point_cap]
        if len(pts) < 20 or len(window) < 2:
            return None
        kf_idx, feat_idx = m.observations_of(pts)
        obs_mp_global = m.kf_feat_mp[kf_idx, feat_idx]
        # fixed KFs: observers outside the window (cap), else fix the oldest in window
        outside = np.setdiff1d(np.unique(kf_idx), np.asarray(window))
        fixed_kfs = [int(k) for k in outside[: self.ba_max_fixed]]
        all_kfs = window + fixed_kfs
        fixed_mask = np.zeros(len(all_kfs), bool)
        fixed_mask[len(window):] = True
        # the reference guarantees >= 2 fixed cameras (src/Optimizer.cc:1929-1964):
        # with fewer, monocular BA has a free scale gauge and LM wanders along
        # the zero-cost scale direction
        n_need = 2 - int(fixed_mask.sum())
        if n_need > 0:
            order = np.argsort([m.kf_frame_id[k] for k in all_kfs])
            for idx in order:
                if n_need == 0:
                    break
                if not fixed_mask[idx]:
                    fixed_mask[idx] = True
                    n_need -= 1

        kf_lut = np.full(m.cfg.max_keyframes, -1, np.int32)
        kf_lut[np.asarray(all_kfs)] = np.arange(len(all_kfs))
        mp_lut = np.full(m.cfg.max_map_points, -1, np.int32)
        mp_lut[pts] = np.arange(len(pts))

        sel = (kf_lut[kf_idx] >= 0) & (mp_lut[obs_mp_global] >= 0)
        o_kf = kf_lut[kf_idx[sel]]
        o_mp = mp_lut[obs_mp_global[sel]]
        o_uv = m.kf_feat_xy[kf_idx[sel], feat_idx[sel]]
        o_ur = m.kf_feat_ur[kf_idx[sel], feat_idx[sel]]
        o_is2 = m.inv_level_sigma2[m.kf_feat_octave[kf_idx[sel], feat_idx[sel]]]
        o_src_kf = kf_idx[sel]
        o_src_feat = feat_idx[sel]

        # pad to static buckets
        Kb = self._bucket(len(all_kfs), [4, 8, 12, 16, 24, 32])
        Pb = self._bucket(len(pts), [256, 512, 1024, 2048, 4096])
        Ob = self._bucket(len(o_kf), [1024, 2048, 4096, 8192, 16384, 32768])
        if Kb is None or Pb is None or Ob is None:
            return None

        def pad(a, n, fill=0):
            out = np.full((n,) + a.shape[1:], fill, a.dtype)
            out[: len(a)] = a
            return out

        eye_pad = np.zeros((Kb, 3, 3), np.float32)
        eye_pad[:] = np.eye(3)
        eye_pad[: len(all_kfs)] = m.kf_R[all_kfs]
        prob = ba_ops.BAProblem(
            R=jnp.asarray(eye_pad),
            t=jnp.asarray(pad(m.kf_t[all_kfs], Kb)),
            pts=jnp.asarray(pad(m.mp_xyz[pts], Pb)),
            obs_kf=jnp.asarray(pad(o_kf.astype(np.int32), Ob)),
            obs_mp=jnp.asarray(pad(o_mp.astype(np.int32), Ob)),
            obs_uv=jnp.asarray(pad(o_uv.astype(np.float32), Ob)),
            obs_inv_sigma2=jnp.asarray(pad(o_is2.astype(np.float32), Ob, 1.0)),
            obs_valid=jnp.asarray(pad(np.ones(len(o_kf), bool), Ob, False)),
            fixed_pose=jnp.asarray(pad(fixed_mask, Kb, True)),
            obs_ur=jnp.asarray(pad(o_ur.astype(np.float32), Ob, -1.0)),
            bf=jnp.asarray(self.bf, jnp.float32),
        )
        return prob, all_kfs, fixed_mask, pts, o_src_kf, o_src_feat, len(o_kf)

    def global_ba(self, iters: tuple[int, int] = (4, 6), abort_check=None,
                  propagate: bool = False) -> bool:
        """Full-map BA (reference GlobalBundleAdjustemnt, 10 iterations at loop
        closure, src/LoopClosing.cc:2598). Runs in bounded device chunks so a
        background runner can abort between them (the reference's mbStopGBA
        polled per g2o iteration); with ``propagate=True``, keyframes and map
        points created while the BA ran are corrected through their
        reference keyframe (the reference's spanning-tree propagation,
        src/LoopClosing.cc:2640-2830). Returns True if results were applied."""
        m = self.map
        with m.lock:
            kfs = [int(k) for k in m.valid_kf_ids()]
            if len(kfs) < 3:
                return False
            snap_n_kf = m.n_kf
            snap_n_mp = m.n_mp
            old_R = m.kf_R.copy()
            old_t = m.kf_t.copy()
            pts = m.valid_mp_ids()[: self.ba_point_cap]
            kf_idx, feat_idx = m.observations_of(pts)
            obs_mp_global = m.kf_feat_mp[kf_idx, feat_idx]
            kf_lut = np.full(m.cfg.max_keyframes, -1, np.int32)
            kf_lut[np.asarray(kfs)] = np.arange(len(kfs))
            mp_lut = np.full(m.cfg.max_map_points, -1, np.int32)
            mp_lut[pts] = np.arange(len(pts))
            sel = (kf_lut[kf_idx] >= 0) & (mp_lut[obs_mp_global] >= 0)
            o_kf = kf_lut[kf_idx[sel]]
            o_mp = mp_lut[obs_mp_global[sel]]
            o_uv = m.kf_feat_xy[kf_idx[sel], feat_idx[sel]]
            o_ur = m.kf_feat_ur[kf_idx[sel], feat_idx[sel]]
            o_is2 = m.inv_level_sigma2[m.kf_feat_octave[kf_idx[sel], feat_idx[sel]]]

        Kb = self._bucket(len(kfs), [16, 32, 64, 96, 128, 192, 256, 384, 512])
        Pb = self._bucket(len(pts), [1024, 2048, 4096])
        Ob = self._bucket(len(o_kf), [4096, 8192, 16384, 32768, 65536])
        if Kb is None or Pb is None or Ob is None:
            return False

        def pad(a, n, fill=0):
            out = np.full((n,) + a.shape[1:], fill, a.dtype)
            out[: len(a)] = a
            return out

        eye_pad = np.zeros((Kb, 3, 3), np.float32)
        eye_pad[:] = np.eye(3)
        eye_pad[: len(kfs)] = old_R[kfs]
        fixed_mask = np.zeros(len(kfs), bool)
        fixed_mask[:2] = True
        prob = ba_ops.BAProblem(
            R=jnp.asarray(eye_pad),
            t=jnp.asarray(pad(old_t[kfs], Kb)),
            pts=jnp.asarray(pad(m.mp_xyz[pts], Pb)),
            obs_kf=jnp.asarray(pad(o_kf.astype(np.int32), Ob)),
            obs_mp=jnp.asarray(pad(o_mp.astype(np.int32), Ob)),
            obs_uv=jnp.asarray(pad(o_uv.astype(np.float32), Ob)),
            obs_inv_sigma2=jnp.asarray(pad(o_is2.astype(np.float32), Ob, 1.0)),
            obs_valid=jnp.asarray(pad(np.ones(len(o_kf), bool), Ob, False)),
            fixed_pose=jnp.asarray(pad(fixed_mask, Kb, True)),
            obs_ur=jnp.asarray(pad(o_ur.astype(np.float32), Ob, -1.0)),
            bf=jnp.asarray(self.bf, jnp.float32),
        )
        # phase 1 (outlier classification happens inside), then phase 2 in
        # abortable chunks of 2 LM iterations
        if abort_check is not None and abort_check():
            return False
        res = self._run_ba(prob, (iters[0], 0))
        prob = prob._replace(R=res.R, t=res.t, pts=res.pts,
                             obs_valid=prob.obs_valid & res.obs_inlier)
        done = 0
        while done < iters[1]:
            if abort_check is not None and abort_check():
                return False
            res = self._run_ba(prob, (2, 0))
            prob = prob._replace(R=res.R, t=res.t, pts=res.pts)
            done += 2

        with m.lock:
            Rn = np.asarray(res.R)[: len(kfs)]
            tn = np.asarray(res.t)[: len(kfs)]
            for i, k in enumerate(kfs):
                if not fixed_mask[i] and m.kf_valid[k]:
                    m.kf_R[k] = Rn[i]
                    m.kf_t[k] = tn[i]
            in_ba = np.zeros(m.cfg.max_map_points, bool)
            keep = m.mp_valid[pts]
            m.mp_xyz[pts[keep]] = np.asarray(res.pts)[: len(pts)][keep]
            in_ba[pts[keep]] = True
            if propagate:
                # keyframes created during the run: T_k_new = T_k_old ∘
                # (T_a_old⁻¹ ∘ T_a_new) with anchor a = last snapshot KF.
                # Their pre-correction (old-world) poses live in the pool NOW —
                # capture them before overwriting so the map-point re-anchoring
                # below can use the right "old" pose.
                a = kfs[-1]
                Ra_rel = old_R[a].T @ m.kf_R[a]
                ta_rel = old_R[a].T @ (m.kf_t[a] - old_t[a])
                for k in range(snap_n_kf, m.n_kf):
                    old_R[k] = m.kf_R[k]
                    old_t[k] = m.kf_t[k]
                    if not m.kf_valid[k]:
                        continue
                    m.kf_R[k] = (old_R[k] @ Ra_rel).astype(np.float32)
                    m.kf_t[k] = (old_R[k] @ ta_rel + old_t[k]).astype(np.float32)
                # map points not directly solved: re-anchor through their
                # reference KF (x stays fixed in the ref-KF camera frame)
                all_mp = m.valid_mp_ids()
                rest = all_mp[~in_ba[all_mp]]
                if len(rest):
                    ref = np.clip(m.mp_ref_kf[rest], 0, m.cfg.max_keyframes - 1)
                    x = m.mp_xyz[rest]
                    x_cam = np.einsum("nij,nj->ni", old_R[ref], x) + old_t[ref]
                    newR = m.kf_R[ref]
                    newt = m.kf_t[ref]
                    x_new = np.einsum("nij,nj->ni",
                                      newR.transpose(0, 2, 1), x_cam - newt)
                    m.mp_xyz[rest] = x_new.astype(np.float32)
                # expose the anchor correction for the tracker's live frame
                if self.on_poses_corrected is not None:
                    self.on_poses_corrected(Ra_rel.astype(np.float32),
                                            ta_rel.astype(np.float32))
        self.stats["gba_runs"] = self.stats.get("gba_runs", 0) + 1
        return True

    def _run_ba(self, prob, iters):
        if self._ba_jit is None:
            import functools
            import jax
            self._ba_jit = jax.jit(
                functools.partial(ba_ops.local_ba, cam_type=self.cam_type,
                                  chi2_th=ba_ops.CHI2_MONO),
                static_argnames=("iters1", "iters2"))
        return self._ba_jit(prob, jnp.asarray(self.K), iters1=iters[0], iters2=iters[1])

    @staticmethod
    def _bucket(n: int, buckets):
        for b in buckets:
            if n <= b:
                return b
        return None
