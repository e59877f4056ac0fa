"""Loop closing: place recognition, Sim3 verification, pose-graph correction.

Rebuilds the reference ``LoopClosing`` thread + ``KeyFrameDatabase`` (reference
src/LoopClosing.cc:58-325 Run, NewDetectCommonRegions :351,
DetectCommonRegionsFromBoW :730, CorrectLoop :1253; src/KeyFrameDatabase.cc
candidate scheme) as a host driver over batched kernels:

- Database: dense BoW matrix (K_cap, W); a query scores against every stored
  keyframe in one kernel (ops/vocab.l1_scores) — the inverted file of the
  reference is unnecessary at this width.
- Candidate gating follows the reference: exclude covisible keyframes, exclude
  recent ones, require score ≥ min score among covisible neighbors, take the
  3 best (DetectNBestCandidates).
- Geometric verification: descriptor matching between the two keyframes'
  map-point features (≥20, reference nBoWMatches), batched Horn Sim3 RANSAC
  (ops/sim3, ≥15 inliers), projection confirmation (≥40 matched reprojections,
  reference nProjMatches=50 with guided matching).
- Correction (CorrectLoop): pose graph over all keyframes — odometry +
  high-covisibility (≥100 shared points) + loop edges — optimized over Sim(3)
  (ops/posegraph), then keyframe poses and map points updated via their
  reference keyframe's correction (the reference's spanning-tree propagation).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import lie, matching, sim3 as sim3_ops, vocab as vocab_ops
from ..ops import posegraph
from .map import MapState


class LoopCloser:
    def __init__(self, map_state: MapState, K: np.ndarray, wh,
                 vocab: vocab_ops.BinaryVocabulary | None = None,
                 fix_scale: bool = False, min_kfs: int = 12,
                 exclude_recent: int = 8, seed: int = 0):
        self.map = map_state
        # pinhole intrinsics (fx fy cx cy); for fisheye rigs this is the
        # model's focal block — projection checks here are near-axis
        # approximations (exact model projection is a later refinement)
        self.K = np.asarray(K, np.float32)[:4]
        self.wh = np.asarray(wh, np.float32)
        self.fix_scale = fix_scale
        self.min_kfs = min_kfs
        self.exclude_recent = exclude_recent
        self.rng = np.random.default_rng(seed)
        if vocab is None:
            vocab = vocab_ops.BinaryVocabulary(k=8, levels=3).train(
                vocab_ops.random_descriptors(20000, seed=1), seed=1)
        self.vocab = vocab
        self.transform = vocab.transform_fn()
        self.bow = vocab.bow_fn()
        self.bow_db = np.zeros((map_state.cfg.max_keyframes, vocab.n_words), np.float32)
        self.bow_filled = np.zeros(map_state.cfg.max_keyframes, bool)
        self.stats = {"loops_detected": 0, "loops_corrected": 0, "candidates_checked": 0}
        self.last_loop_kf = -1
        # bound by the system to the tracker's IMU state; an IMU-initialized
        # (gravity-aligned, metric) map corrects with the 4DoF essential graph
        # (reference OptimizeEssentialGraph4DoF, src/LoopClosing.cc:1524-1533)
        self.is_inertial = lambda: False
        map_state.on_remap["loop_closer"] = self._on_map_remap

    def _on_map_remap(self, kf_remap: np.ndarray, mp_remap: np.ndarray):
        """Map pools compacted/grown: reorder the BoW database rows and remap
        held keyframe ids (under the map lock)."""
        new_cap = self.map.cfg.max_keyframes
        new_db = np.zeros((new_cap, self.vocab.n_words), np.float32)
        new_filled = np.zeros(new_cap, bool)
        old = np.nonzero(self.bow_filled)[0]
        old = old[old < len(kf_remap)]
        tgt = kf_remap[old]
        keep = tgt >= 0
        new_db[tgt[keep]] = self.bow_db[old[keep]]
        new_filled[tgt[keep]] = True
        self.bow_db = new_db
        self.bow_filled = new_filled
        if self.last_loop_kf >= 0:
            r = int(kf_remap[self.last_loop_kf])
            if r < 0:   # culled: nearest surviving position keeps the recency gate
                r = int(np.searchsorted(np.nonzero(kf_remap >= 0)[0],
                                        self.last_loop_kf)) - 1
            self.last_loop_kf = r

    # ------------------------------------------------------------------
    def process_keyframe(self, kf_id: int, pre_correct=None,
                         post_correct=None) -> bool:
        """Detect + verify + correct for one keyframe (reference LoopClosing
        Run body). ``pre_correct``/``post_correct`` bracket the map mutation —
        the async runtime uses them to pause the mapper and kill a running
        global BA (reference CorrectLoop step 1, src/LoopClosing.cc:1259-1289)
        and to release the mapper afterwards."""
        m = self.map
        with m.lock:
            snap_epoch = m.remap_epoch
            if not m.kf_valid[kf_id]:
                return False
            words = self.transform(jnp.asarray(m.kf_feat_desc[kf_id]),
                                   jnp.asarray(m.kf_feat_valid[kf_id]))
            self.bow_db[kf_id] = np.asarray(self.bow(words))
            self.bow_filled[kf_id] = True

            if m.n_kf < self.min_kfs:
                return False
            if (self.last_loop_kf >= 0
                    and kf_id - self.last_loop_kf < self.exclude_recent):
                return False
            cands = self._detect_candidates(kf_id)
            hit = None
            for c in cands:
                self.stats["candidates_checked"] += 1
                ok, S21 = self._verify_candidate(kf_id, int(c))
                if ok:
                    self.stats["loops_detected"] += 1
                    hit = (int(c), S21)
                    break
        if hit is None:
            return False
        if pre_correct is not None:
            pre_correct()   # outside the map lock (the mapper may hold it)
        try:
            with m.lock:
                if m.remap_epoch != snap_epoch:
                    # pools compacted between detection and correction: the
                    # candidate ids are stale — drop (re-detected next KF)
                    return False
                self._correct_loop(kf_id, hit[0], hit[1])
            self.stats["loops_corrected"] += 1
            self.last_loop_kf = kf_id
        finally:
            if post_correct is not None:
                post_correct()
        return True

    # ------------------------------------------------------------------
    def detect_relocalization_candidates(self, desc: np.ndarray,
                                         valid: np.ndarray,
                                         n_best: int = 5) -> np.ndarray:
        """Reference KeyFrameDatabase::DetectRelocalizationCandidates
        (src/KeyFrameDatabase.cc:107-249 scheme, used at src/Tracking.cc:4153):
        same common-words>0.8·max + group-score>0.75·best scheme as loop
        detection, but for a lost frame — no covisible-group or recency
        exclusions. Returns candidate KF ids, best first."""
        m = self.map
        valid_ids = np.nonzero(self.bow_filled[: m.n_kf] & m.kf_valid[: m.n_kf])[0]
        if len(valid_ids) == 0:
            return np.zeros(0, np.int64)
        words = self.transform(jnp.asarray(desc), jnp.asarray(valid))
        q = self.bow(words)
        db = jnp.asarray(self.bow_db[valid_ids])
        scores = np.asarray(vocab_ops.l1_scores(q, db))
        common = np.asarray(jnp.sum((db > 0) & (q > 0)[None, :], axis=-1))
        eligible = common > 0
        if not eligible.any():
            return np.zeros(0, np.int64)
        eligible &= common > 0.8 * common[eligible].max()
        cand = valid_ids[eligible]
        if len(cand) == 0:
            return np.zeros(0, np.int64)
        sc = np.zeros(m.n_kf, np.float32)
        sc[valid_ids] = scores
        acc = np.zeros(len(cand), np.float32)
        leads = np.zeros(len(cand), np.int64)
        for i, c in enumerate(cand):
            group = [int(c)] + [int(g) for g in m.best_covisible(int(c), 10,
                                                                 min_weight=15)]
            gsc = [sc[g] for g in group]
            acc[i] = float(np.sum(gsc))
            leads[i] = group[int(np.argmax(gsc))]
        keep = acc > 0.75 * acc.max()
        order = np.argsort(-acc[keep])
        out: list[int] = []
        for lead in leads[keep][order]:
            if lead not in out:
                out.append(int(lead))
            if len(out) >= n_best:
                break
        return np.asarray(out, np.int64)

    # ------------------------------------------------------------------
    def _detect_candidates(self, kf_id: int, n_best: int = 3) -> np.ndarray:
        """Reference DetectNBestCandidates (src/KeyFrameDatabase.cc:67 +
        candidate scheme :107-249): count keyframes sharing words (excluding
        the query's covisible group), keep > 0.8·maxCommonWords, accumulate
        covisibility-group scores, keep > 0.75·bestAccScore, return the
        n-best group leads. With a dense BoW database both the common-word
        counts and the L1 scores are single matmul-like kernels — the
        inverted file is unnecessary."""
        m = self.map
        covis = m.covisibility_row(kf_id)
        neighbors = np.nonzero(covis >= 15)[0]
        q = jnp.asarray(self.bow_db[kf_id])
        valid_ids = np.nonzero(self.bow_filled[: m.n_kf] & m.kf_valid[: m.n_kf])[0]
        if len(valid_ids) == 0:
            return np.zeros(0, np.int64)
        db = jnp.asarray(self.bow_db[valid_ids])
        scores = np.asarray(vocab_ops.l1_scores(q, db))
        # common-word counts: boolean intersection sizes (one matvec)
        common = np.asarray(jnp.sum((db > 0) & (q > 0)[None, :], axis=-1))

        eligible = np.ones(len(valid_ids), bool)
        eligible &= ~np.isin(valid_ids, neighbors)
        eligible &= valid_ids != kf_id
        eligible &= valid_ids < kf_id - self.exclude_recent
        eligible &= common > 0
        if not eligible.any():
            return np.zeros(0, np.int64)
        max_common = common[eligible].max()
        eligible &= common > 0.8 * max_common
        cand = valid_ids[eligible]
        if len(cand) == 0:
            return np.zeros(0, np.int64)
        sc = np.zeros(m.n_kf, np.float32)
        sc[valid_ids] = scores
        shares = np.zeros(m.n_kf, bool)
        shares[valid_ids[common > 0]] = True
        # accumulate scores over each candidate's top-10 covisible group;
        # the group lead is its best-scoring member
        acc_scores = np.zeros(len(cand), np.float32)
        leads = np.zeros(len(cand), np.int64)
        neighbor_set = set(int(x) for x in neighbors)
        for i, c in enumerate(cand):
            group = [int(c)] + [int(g) for g in m.best_covisible(int(c), 10,
                                                                 min_weight=15)]
            # group members must satisfy the query's own exclusions, or the
            # lead can degenerate to a covisible keyframe (a self-loop whose
            # Sim3 is a no-op but which blocks real detections)
            group = [g for g in group if g < kf_id - self.exclude_recent
                     and g not in neighbor_set and g != kf_id]
            gsc = [(sc[g] if shares[g] else 0.0) for g in group]
            acc_scores[i] = float(np.sum(gsc))
            leads[i] = group[int(np.argmax(gsc))] if group else int(c)
        best_acc = acc_scores.max()
        keep = acc_scores > 0.75 * best_acc
        order = np.argsort(-acc_scores[keep])
        out = []
        for lead in leads[keep][order]:
            if lead not in out:
                out.append(int(lead))
            if len(out) >= n_best:
                break
        return np.asarray(out, np.int64)

    # ------------------------------------------------------------------
    def _verify_candidate(self, kf1: int, kf2: int, map1=None, map2=None):
        """BoW-style match + Sim3 RANSAC + projection confirmation
        (reference DetectCommonRegionsFromBoW src/LoopClosing.cc:730).
        map1/map2 default to this closer's map; passing a different map2
        verifies a cross-map (Atlas merge) candidate."""
        m = map1 if map1 is not None else self.map
        m2 = map2 if map2 is not None else self.map
        has1 = m.kf_feat_valid[kf1] & (m.kf_feat_mp[kf1] >= 0)
        has2 = m2.kf_feat_valid[kf2] & (m2.kf_feat_mp[kf2] >= 0)
        if has1.sum() < 20 or has2.sum() < 20:
            return False, None
        idx, best, ok = matching.search_by_descriptor(
            jnp.asarray(m.kf_feat_desc[kf1]), jnp.asarray(has1),
            jnp.asarray(m2.kf_feat_desc[kf2]), jnp.asarray(has2),
            max_dist=matching.TH_LOW, ratio=0.9)
        okn = np.asarray(ok)
        if okn.sum() < 20:   # nBoWMatches (reference 20)
            return False, None
        f1 = np.nonzero(okn)[0]
        f2 = np.asarray(idx)[f1]
        mp1 = m.kf_feat_mp[kf1][f1]
        mp2 = m2.kf_feat_mp[kf2][f2]
        sel = m.mp_valid[mp1] & m2.mp_valid[mp2]
        f1, f2, mp1, mp2 = f1[sel], f2[sel], mp1[sel], mp2[sel]
        n = len(mp1)
        if n < 15:
            return False, None
        # degenerate guard: a same-map "loop" whose matches are mostly the
        # SAME landmarks carries no closure information (its Sim3 is a no-op)
        if m is m2 and n and (mp1 == mp2).mean() > 0.5:
            return False, None
        # camera-frame 3D positions
        x1 = m.mp_xyz[mp1] @ m.kf_R[kf1].T + m.kf_t[kf1]
        x2 = m2.mp_xyz[mp2] @ m2.kf_R[kf2].T + m2.kf_t[kf2]
        sig1 = m.level_sigma2[m.kf_feat_octave[kf1, f1]]
        sig2 = m2.level_sigma2[m2.kf_feat_octave[kf2, f2]]
        rand = self.rng.integers(0, n, (100, 3)).astype(np.int32)
        res = sim3_ops.sim3_ransac(
            jnp.asarray(x1.astype(np.float32)), jnp.asarray(x2.astype(np.float32)),
            jnp.ones(n, bool), jnp.asarray(rand),
            jnp.asarray(9.21 * sig1, jnp.float32), jnp.asarray(9.21 * sig2, jnp.float32),
            jnp.asarray(self.K), fix_scale=self.fix_scale, min_inliers=15)
        if not bool(res.success):
            return False, None
        S21 = (float(res.s), np.asarray(res.R), np.asarray(res.t))

        # projection confirmation: map kf2's local points into kf1 via S21⁻¹
        nproj = self._count_projected_matches(kf1, kf2, S21, map1=m, map2=m2)
        if nproj < 40:   # reference nProjMatches=50 with guided search
            return False, None
        return True, S21

    def _count_projected_matches(self, kf1: int, kf2: int, S21,
                                 map1=None, map2=None) -> int:
        m = map1 if map1 is not None else self.map
        m2 = map2 if map2 is not None else self.map
        s, R, t = S21
        locals2 = m2.local_map_points(np.concatenate(
            [[kf2], m2.best_covisible(kf2, 5, min_weight=15)]).astype(np.int32))
        if len(locals2) == 0:
            return 0
        # world → kf2 cam → (S21⁻¹) → kf1 cam
        xc2 = m2.mp_xyz[locals2] @ m2.kf_R[kf2].T + m2.kf_t[kf2]
        xc1 = (xc2 - t) @ R / s
        z = xc1[:, 2]
        ok = z > 0.1
        fx, fy, cx, cy = self.K
        u = fx * xc1[:, 0] / np.maximum(z, 1e-6) + cx
        v = fy * xc1[:, 1] / np.maximum(z, 1e-6) + cy
        ok &= (u >= 0) & (u < self.wh[0]) & (v >= 0) & (v < self.wh[1])
        if ok.sum() < 10:
            return 0
        # descriptor match against kf1 features within a window
        dist = np.asarray(matching.hamming_matrix(
            jnp.asarray(m2.mp_desc[locals2]), jnp.asarray(m.kf_feat_desc[kf1])))
        du = np.abs(u[:, None] - m.kf_feat_xy[kf1][None, :, 0])
        dv = np.abs(v[:, None] - m.kf_feat_xy[kf1][None, :, 1])
        win = (du <= 8.0) & (dv <= 8.0)
        mask = ok[:, None] & win & m.kf_feat_valid[kf1][None, :]
        d = np.where(mask, dist, 10000)
        bd = d.min(axis=1)
        return int((bd <= matching.TH_HIGH).sum())

    # ------------------------------------------------------------------
    def _correct_loop(self, kf1: int, kf2: int, S21):
        """Pose-graph correction (reference CorrectLoop + OptimizeEssentialGraph)."""
        m = self.map
        kfs = m.valid_kf_ids()
        K = len(kfs)
        lut = np.full(m.cfg.max_keyframes, -1, np.int32)
        lut[kfs] = np.arange(K)

        s0 = np.ones(K, np.float32)
        R0 = m.kf_R[kfs].copy()
        t0 = m.kf_t[kfs].copy()

        edges_i, edges_j, ms, mR, mt, wts = [], [], [], [], [], []

        def add_edge(a, b, w=1.0):
            ia, ib = lut[a], lut[b]
            if ia < 0 or ib < 0:
                return
            # measured relative from current estimates: S_ab = S_a ∘ S_b⁻¹
            Ra, ta = m.kf_R[a], m.kf_t[a]
            Rb, tb = m.kf_R[b], m.kf_t[b]
            Rab = Ra @ Rb.T
            tab = ta - Rab @ tb
            edges_i.append(ia); edges_j.append(ib)
            ms.append(1.0); mR.append(Rab); mt.append(tab); wts.append(w)

        # odometry chain + covisibility (≥100 shared) edges
        for a, b in zip(kfs[1:], kfs[:-1]):
            add_edge(int(a), int(b))
        for a in kfs:
            row = m.covisibility_row(int(a))
            for b in np.nonzero(row >= 100)[0]:
                if b > a:
                    add_edge(int(a), int(b), w=1.0)
        # the loop edge with the MEASURED Sim3: S_12 = S21⁻¹ relates nodes
        # S_kf1 ∘ S_kf2⁻¹
        s21, R21, t21 = S21
        s12 = 1.0 / s21
        R12 = R21.T
        t12 = -s12 * (R12 @ t21)
        edges_i.append(lut[kf1]); edges_j.append(lut[kf2])
        ms.append(s12); mR.append(R12); mt.append(t12); wts.append(5.0)

        fixed = np.zeros(K, bool)
        fixed[lut[kf2]] = True   # reference fixes the loop keyframe

        if self.is_inertial():
            # yaw + translation only: gravity pins roll/pitch, IMU pins scale
            dof = np.array([0, 0, 1, 1, 1, 1, 0], bool)
        elif self.fix_scale:
            dof = np.array([1, 1, 1, 1, 1, 1, 0], bool)
        else:
            dof = np.ones(7, bool)
        s_n, R_n, t_n, costs = posegraph.optimize_pose_graph(
            jnp.asarray(s0), jnp.asarray(R0), jnp.asarray(t0),
            jnp.ones(K, bool), jnp.asarray(fixed),
            jnp.asarray(edges_i, jnp.int32), jnp.asarray(edges_j, jnp.int32),
            jnp.asarray(ms, jnp.float32), jnp.asarray(np.stack(mR), jnp.float32),
            jnp.asarray(np.stack(mt), jnp.float32),
            jnp.ones(len(ms), bool), jnp.asarray(wts, jnp.float32), iters=15,
            dof_mask=jnp.asarray(dof))
        s_n = np.asarray(s_n); R_n = np.asarray(R_n); t_n = np.asarray(t_n)

        # correct map points via their reference KF (reference :1318-1444):
        # x' = S_new⁻¹( S_old(x) )
        mp_ids = m.valid_mp_ids()
        ref = m.mp_ref_kf[mp_ids]
        ref = np.where((ref >= 0) & (lut[np.clip(ref, 0, None)] >= 0), ref, kfs[0])
        ri = lut[ref]
        x = m.mp_xyz[mp_ids]
        x_old_cam = np.einsum("nij,nj->ni", m.kf_R[ref], x) + m.kf_t[ref]
        Rn = R_n[ri]; tn = t_n[ri]; sn = s_n[ri]
        x_new = np.einsum("nij,nj->ni", Rn.transpose(0, 2, 1),
                          (x_old_cam - tn) / sn[:, None])
        m.mp_xyz[mp_ids] = x_new.astype(np.float32)

        # recover SE3 keyframe poses: R, t/s (reference :2361 recovery)
        m.kf_R[kfs] = R_n
        m.kf_t[kfs] = (t_n / s_n[:, None]).astype(np.float32)
