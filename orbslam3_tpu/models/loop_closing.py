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
- Geometric verification (reference DetectCommonRegionsFromBoW :730 with the
  A.5 gates): descriptor matching between the two keyframes' map-point
  features (≥20 nBoWMatches), batched Horn Sim3 RANSAC (≥15 nBoWInliers),
  OptimizeSim3 GN refinement (≥20 nSim3Inliers, reference Optimizer.cc:3555),
  guided projection matching through the refined Sim3 (≥50 nProjMatches,
  reference SearchBySim3 src/ORBmatcher.cc:2201), re-optimization and a final
  tight-window projection count (≥80 nProjOptMatches).
- Temporal consistency (reference :398-551): a verified candidate is held
  PENDING; each subsequent keyframe re-verifies the propagated Sim3 against
  the same region (DetectAndReffineSim3FromLastKF) — correction fires only
  after 3 consecutive successes (:427), pending resets after 2 misses (:448).
- Correction (CorrectLoop): pose graph over all keyframes — odometry +
  high-covisibility (≥100 shared points) + the new loop edge + every stored
  loop edge from earlier corrections (:1526-1528) — optimized over Sim(3)
  (ops/posegraph), then keyframe poses and map points updated via their
  reference keyframe's correction, followed by SearchAndFuse of the loop-side
  landmarks into the corrected current group (:1462).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import lie, matching, sim3 as sim3_ops, vocab as vocab_ops
from ..ops import posegraph
from ..utils.timing import StageTimer
from .map import MapState

_DEFAULT_VOCAB = None


def _pair_bucket(n: int, caps=(64, 128, 256, 512, 1024, 2048)) -> int:
    """Static-shape bucket for a matched-pair count: the Sim3 verification
    kernels are jitted, so their input lengths must come from a small fixed
    set or every candidate with a new match count triggers a recompile."""
    for c in caps:
        if n <= c:
            return c
    return caps[-1]


def _pad_to(a: np.ndarray, cap: int, fill: float = 0.0,
            fill_z1: bool = False) -> np.ndarray:
    """Pad axis 0 of ``a`` to ``cap`` (truncating if longer). With
    ``fill_z1`` pad 3D points with (0,0,1) so camera projection of masked
    rows stays finite."""
    a = np.asarray(a, np.float32)[:cap]
    if len(a) == cap:
        return a
    pad = np.full((cap - len(a),) + a.shape[1:], fill, np.float32)
    if fill_z1:
        pad[..., -1] = 1.0
    return np.concatenate([a, pad])


import functools


@functools.lru_cache(maxsize=None)
def _db_score_fn(db_shape, n_words):
    """L1 similarity + common-word counts of row ``k`` against the whole
    device-resident SPARSE BoW DB ((K,T) word ids + weights — the reference's
    BowVector is sparse too, Thirdparty/DBoW2/DBoW2/BowVector.h), packed into
    ONE int32 pull: [bitcast(scores) (K,), common (K,)]. The query is
    scattered to a dense (W,) scratch once, then every row scores by a (K,T)
    gather — exact L1 (min(q,d) is supported on d's support), O(K·T) memory,
    any vocabulary size."""
    import jax

    @jax.jit
    def fn(db_ids, db_w, k):
        q_ids, q_w = db_ids[k], db_w[k]
        qd = jnp.zeros((n_words,), jnp.float32).at[
            jnp.where(q_ids >= 0, q_ids, 0)].set(
            jnp.where(q_ids >= 0, q_w, 0.0))
        valid = db_ids >= 0
        qg = qd[jnp.where(valid, db_ids, 0)]
        scores = 2.0 * jnp.sum(jnp.minimum(qg, db_w) * valid, axis=-1)
        common = jnp.sum((qg > 0) & (db_w > 0) & valid, axis=-1,
                         dtype=jnp.int32)
        return jnp.concatenate([
            jax.lax.bitcast_convert_type(scores.astype(jnp.float32),
                                         jnp.int32),
            common])
    return fn


def _default_vocabulary() -> vocab_ops.BinaryVocabulary:
    """The packaged 10k-word vocabulary trained on rendered-scene ORB
    descriptors with tf-idf weights (scripts/train_vocab.py — the analogue of
    the reference's pre-trained ORBvoc, loaded at System startup,
    src/System.cc:96-106). Falls back to a small random-trained tree only if
    the data file is missing (e.g. a stripped checkout)."""
    global _DEFAULT_VOCAB
    if _DEFAULT_VOCAB is None:
        import os
        data_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "data")
        # a real DBoW2 vocabulary takes precedence when present: point
        # ORBSLAM3_VOCAB at an ORBvoc.txt (reference text format,
        # TemplatedVocabulary::loadFromTextFile) or a trained .npz, or drop
        # ORBvoc.txt into the package data dir. The sparse-BowVector path
        # keeps per-keyframe storage O(features) at any vocabulary size.
        env = os.environ.get("ORBSLAM3_VOCAB", "")
        candidates = ([env] if env else []) + [
            os.path.join(data_dir, "ORBvoc.txt")]
        for c in candidates:
            if c and os.path.exists(c):
                if c.endswith(".npz"):
                    _DEFAULT_VOCAB = vocab_ops.BinaryVocabulary.load(c)
                else:
                    _DEFAULT_VOCAB = vocab_ops.load_dbow2_text(c)
                return _DEFAULT_VOCAB
        path = os.path.join(data_dir, "vocab_synth.npz")
        if os.path.exists(path):
            _DEFAULT_VOCAB = vocab_ops.BinaryVocabulary.load(path)
        else:
            _DEFAULT_VOCAB = vocab_ops.BinaryVocabulary(k=8, levels=3).train(
                vocab_ops.random_descriptors(20000, seed=1), seed=1)
    return _DEFAULT_VOCAB


class LoopCloser:
    def __init__(self, map_state: MapState, K: np.ndarray, wh,
                 vocab: vocab_ops.BinaryVocabulary | None = None,
                 fix_scale: bool = False, min_kfs: int = 12,
                 exclude_recent: int = 8, seed: int = 0,
                 cam_type: int = 0,
                 n_bow_matches: int = 20, n_bow_inliers: int = 15,
                 n_sim3_inliers: int = 20, n_proj_matches: int = 50,
                 n_proj_opt_matches: int = 80, consistency_needed: int = 3):
        self.map = map_state
        # full camera parameters + model (pinhole or KB8): every projection
        # check goes through ops.camera, so fisheye rigs verify exactly
        self.cam_type = int(cam_type)
        self.cam_params = np.asarray(K, np.float32)
        self.K = np.asarray(K, np.float32)[:4]
        self.wh = np.asarray(wh, np.float32)
        # reference A.5 gates (src/LoopClosing.cc:734-738)
        self.n_bow_matches = n_bow_matches
        self.n_bow_inliers = n_bow_inliers
        self.n_sim3_inliers = n_sim3_inliers
        self.n_proj_matches = n_proj_matches
        self.n_proj_opt_matches = n_proj_opt_matches
        self.consistency_needed = consistency_needed
        self.fix_scale = fix_scale
        self.min_kfs = min_kfs
        self.exclude_recent = exclude_recent
        self.rng = np.random.default_rng(seed)
        if vocab is None:
            vocab = _default_vocabulary()
        self.vocab = vocab
        self.transform = vocab.transform_fn()
        # sparse BowVectors: per-KF top-T (word id, tf-idf weight) pairs —
        # O(features) per keyframe, not O(n_words); the requirement for
        # running at real ORBvoc scale (~1M words: a dense row is 4 MB/KF)
        self.bow_t = min(512, map_state.cfg.n_features, vocab.n_words)
        self.sbow = vocab.sparse_bow_fn(self.bow_t)
        cap = map_state.cfg.max_keyframes
        self.bow_ids = np.full((cap, self.bow_t), -1, np.int32)
        self.bow_w = np.zeros((cap, self.bow_t), np.float32)
        self.bow_filled = np.zeros(cap, bool)
        self.stats = {"loops_detected": 0, "loops_corrected": 0, "candidates_checked": 0}
        self.last_loop_kf = -1
        # bound by the system to the tracker's IMU state; an IMU-initialized
        # (gravity-aligned, metric) map corrects with the 4DoF essential graph
        # (reference OptimizeEssentialGraph4DoF, src/LoopClosing.cc:1524-1533)
        self.is_inertial = lambda: False
        self.timer = StageTimer()   # shared pipeline timer (system-injected)
        # temporal-consistency state (reference mnLoopNumCoincidences &co.):
        # a verified candidate pending confirmation by subsequent keyframes
        self.pending = None   # {"cand","kf1","S21","count","misses"}
        # accepted loop edges, fed into every later essential-graph solve
        # (reference AddLoopEdge, src/LoopClosing.cc:1526-1528)
        self.loop_edges: list[tuple[int, int]] = []
        # landmark fuse hook (reference SearchAndFuse → ORBmatcher::Fuse);
        # the system binds this to the mapper's projection-fuse
        self.fuse_fn = None
        self._guided = None   # lazy projection matcher kernel
        # device-resident BoW database (round 3): the dense score/common
        # query runs against a resident (Kc, W) buffer instead of re-uploading
        # the whole database every keyframe (~2 MB/query over the tunnel)
        self._db_dev = None
        self._db_rows = 0     # rows synced from host
        # cross-map merge detection (reference DetectNBestCandidates splits
        # database hits into same-map loop vs other-map merge candidates,
        # src/KeyFrameDatabase.cc:67, used at src/LoopClosing.cc:592):
        # system-injected stored-map source + merge executor; per-stored-map
        # BoW databases are built lazily (stored maps are frozen)
        self.stored_maps_fn = None     # () -> list[MapState]
        self.merge_fn = None           # (kf_id, old_map, kf2, S21) -> bool
        self._merge_dbs: dict = {}     # map_id -> (n_kf, ids, db)
        map_state.on_remap["loop_closer"] = self._on_map_remap

    def _sparse_row(self, desc, valid):
        """(T,) ids + (T,) weights of one keyframe/frame — one transform +
        sparse-BoW dispatch, ONE packed pull."""
        words = self.transform(jnp.asarray(desc), jnp.asarray(valid))
        out = np.asarray(self.sbow(words))
        T = self.bow_t
        return out[:T], out[T:].view(np.float32)

    def _db_sync(self, n_kf: int):
        """Device sparse BoW DB covering rows [0, n_kf); incremental row
        appends. Returns (ids (cap,T) int32, weights (cap,T) f32) device
        arrays."""
        cap = self.bow_ids.shape[0]
        if self._db_dev is None or self._db_dev[0].shape[0] != cap:
            self._db_dev = (jnp.asarray(self.bow_ids),
                            jnp.asarray(self.bow_w))
            self._db_rows = n_kf
        elif self._db_rows < n_kf:
            rows = jnp.asarray(np.arange(self._db_rows, n_kf))
            ids_d, w_d = self._db_dev
            self._db_dev = (
                ids_d.at[rows].set(jnp.asarray(self.bow_ids[self._db_rows:n_kf])),
                w_d.at[rows].set(jnp.asarray(self.bow_w[self._db_rows:n_kf])))
            self._db_rows = n_kf
        return self._db_dev

    def _db_mark_dirty(self, k: int):
        """Row ``k`` (re)written on host after it was already synced: shrink
        the synced prefix so the next query re-uploads from there."""
        self._db_rows = min(self._db_rows, int(k))

    def _db_invalidate(self):
        self._db_dev = None
        self._db_rows = 0

    def _on_map_remap(self, kf_remap: np.ndarray, mp_remap: np.ndarray):
        """Map pools compacted/grown: reorder the BoW database rows and remap
        held keyframe ids (under the map lock)."""
        new_cap = self.map.cfg.max_keyframes
        new_ids = np.full((new_cap, self.bow_t), -1, np.int32)
        new_w = np.zeros((new_cap, self.bow_t), np.float32)
        new_filled = np.zeros(new_cap, bool)
        old = np.nonzero(self.bow_filled)[0]
        old = old[old < len(kf_remap)]
        tgt = kf_remap[old]
        keep = tgt >= 0
        new_ids[tgt[keep]] = self.bow_ids[old[keep]]
        new_w[tgt[keep]] = self.bow_w[old[keep]]
        new_filled[tgt[keep]] = True
        self.bow_ids = new_ids
        self.bow_w = new_w
        self.bow_filled = new_filled
        self._db_invalidate()
        if self.last_loop_kf >= 0:
            r = int(kf_remap[self.last_loop_kf])
            if r < 0:   # culled: nearest surviving position keeps the recency gate
                r = int(np.searchsorted(np.nonzero(kf_remap >= 0)[0],
                                        self.last_loop_kf)) - 1
            self.last_loop_kf = r
        if self.pending is not None:
            c = int(kf_remap[self.pending["cand"]])
            k1 = int(kf_remap[self.pending["kf1"]])
            if c < 0 or k1 < 0:
                self.pending = None
            else:
                self.pending["cand"] = c
                self.pending["kf1"] = k1
        edges = []
        for (a, b) in self.loop_edges:
            a2, b2 = int(kf_remap[a]), int(kf_remap[b])
            if a2 >= 0 and b2 >= 0:
                edges.append((a2, b2))
        self.loop_edges = edges

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
            self.bow_ids[kf_id], self.bow_w[kf_id] = self._sparse_row(
                m.kf_feat_desc[kf_id], m.kf_feat_valid[kf_id])
            self.bow_filled[kf_id] = True
            self._db_mark_dirty(kf_id)
            # backfill keyframes that never passed through this method —
            # bootstrap KFs (inserted with initial=True) and merge-migrated
            # KFs. Without rows the START of every map is invisible to the
            # database, so a revisit of the map origin could only surface
            # mid-lap candidates with marginal view overlap (r4 root cause
            # of the walk-revisit loop-closure failure).
            missing = np.nonzero(m.kf_valid[: m.n_kf]
                                 & ~self.bow_filled[: m.n_kf])[0]
            for k in missing[:8]:
                self.bow_ids[int(k)], self.bow_w[int(k)] = self._sparse_row(
                    m.kf_feat_desc[int(k)], m.kf_feat_valid[int(k)])
                self.bow_filled[int(k)] = True
                self._db_mark_dirty(int(k))

            # a young (e.g. freshly spawned) map cannot close loops on itself
            # yet, but it CAN merge into a stored map — the reference's merge
            # branch has no map-size gate (src/LoopClosing.cc:592)
            merge_only = m.n_kf < self.min_kfs
            if (self.last_loop_kf >= 0
                    and kf_id - self.last_loop_kf < self.exclude_recent):
                return False
            hit = None
            if merge_only:
                self.pending = None
            # temporal consistency (reference :398-551): refine the pending
            # candidate's Sim3 against this keyframe; accept only after
            # `consistency_needed` consecutive verifications (:427)
            if self.pending is not None:
                with self.timer.stage("12.lc_sim3_verify"):
                    ok_ref, S21n = self._refine_pending(kf_id)
                if ok_ref:
                    self.pending["count"] += 1
                    self.pending["misses"] = 0
                    self.pending["kf1"] = kf_id
                    self.pending["S21"] = S21n
                    if self.pending["count"] >= self.consistency_needed:
                        self.stats["loops_detected"] += 1
                        hit = (self.pending["cand"], S21n)
                else:
                    self.pending["misses"] += 1
                    if self.pending["misses"] >= 2:   # reference :448
                        self.pending = None
            if hit is None and self.pending is None and not merge_only:
                with self.timer.stage("11.lc_detect"):
                    cands = self._detect_candidates(kf_id)
                for c in cands:
                    self.stats["candidates_checked"] += 1
                    with self.timer.stage("12.lc_sim3_verify"):
                        ok, S21 = self._verify_candidate(kf_id, int(c))
                    if ok:
                        self.pending = {"cand": int(c), "kf1": kf_id,
                                        "S21": S21, "count": 1, "misses": 0}
                        if self.pending["count"] >= self.consistency_needed:
                            self.stats["loops_detected"] += 1
                            hit = (int(c), S21)
                        break
        if hit is None:
            # no same-map loop: try cross-map place recognition (reference
            # splits DB hits into loop vs merge candidates; merge verification
            # belongs to this thread, never the tracker's)
            if self.stored_maps_fn is not None and self.merge_fn is not None \
                    and self.pending is None:
                self._try_merge(kf_id)
            return False
        if pre_correct is not None:
            pre_correct()   # outside the map lock (the mapper may hold it)
        try:
            with m.lock:
                if m.remap_epoch != snap_epoch:
                    # pools compacted between detection and correction: the
                    # candidate ids are stale — drop (re-detected next KF)
                    return False
                with self.timer.stage("13.lc_correct"):
                    self._correct_loop(kf_id, hit[0], hit[1])
                    # persistent loop edge (reference AddLoopEdge :1526-1528)
                    self.loop_edges.append((int(kf_id), int(hit[0])))
                    self._search_and_fuse(kf_id, hit[0])
            self.stats["loops_corrected"] += 1
            self.last_loop_kf = kf_id
            self.pending = None
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
        q_ids, q_w = self._sparse_row(desc, valid)
        qd = vocab_ops.sparse_to_dense_np(q_ids, q_w, self.vocab.n_words)
        scores, common = vocab_ops.sparse_scores_np(
            qd, self.bow_ids[valid_ids], self.bow_w[valid_ids])
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
    def _stored_map_db(self, old):
        """Sparse BoW database of a STORED map (ids, (n,T) word ids, (n,T)
        weights), built once — stored maps are frozen until a merge retires
        or revives them."""
        key = old.map_id
        ids = old.valid_kf_ids()
        cached = self._merge_dbs.get(key)
        if cached is not None and cached[0] == len(ids) \
                and np.array_equal(cached[1], ids):
            return cached[1], cached[2], cached[3]
        db_ids = np.full((len(ids), self.bow_t), -1, np.int32)
        db_w = np.zeros((len(ids), self.bow_t), np.float32)
        for i, k in enumerate(ids):
            db_ids[i], db_w[i] = self._sparse_row(
                old.kf_feat_desc[int(k)], old.kf_feat_valid[int(k)])
        self._merge_dbs[key] = (len(ids), ids.copy(), db_ids, db_w)
        return ids, db_ids, db_w

    def detect_merge_candidates(self, kf_id: int, n_best: int = 3):
        """Database query of the new keyframe against every STORED map
        (reference DetectNBestCandidates' merge split,
        src/KeyFrameDatabase.cc:67): common-words > 0.8·max gate per map,
        L1-score ranked. Returns [(map, kf2), ...] best first — candidates
        anywhere in a stored map, not just its newest keyframes."""
        if self.stored_maps_fn is None:
            return []
        qd = vocab_ops.sparse_to_dense_np(self.bow_ids[kf_id],
                                          self.bow_w[kf_id],
                                          self.vocab.n_words)
        out = []
        for old in self.stored_maps_fn():
            ids, db_ids, db_w = self._stored_map_db(old)
            if len(ids) == 0:
                continue
            scores, common = vocab_ops.sparse_scores_np(qd, db_ids, db_w)
            if common.max() == 0:
                continue
            eligible = common > 0.8 * common.max()
            scores = np.where(eligible, scores, -np.inf)
            order = np.argsort(-scores)[:n_best]
            for i in order:
                if np.isfinite(scores[i]):
                    out.append((float(scores[i]), old, int(ids[i])))
        out.sort(key=lambda x: -x[0])
        return [(old, k2) for (_, old, k2) in out[:n_best]]

    def _try_merge(self, kf_id: int) -> bool:
        """Merge detection at keyframe rate, in the loop-closing thread (the
        reference's NewDetectCommonRegions merge branch) — replaces the r3
        brute-force scan of each stored map's 10 newest keyframes that ran
        inline in the tracking thread."""
        if self.merge_fn is None:
            return False
        m = self.map
        for old, k2 in self.detect_merge_candidates(kf_id):
            with m.lock, old.lock:
                # snapshot the compaction epoch the Sim3 is verified against:
                # a pool compaction (or a tracker-side CreateMapInAtlas) between
                # detection and execution would make kf_id index a remapped
                # slot and produce a garbage alignment (advisor r4 medium)
                epoch1 = m.remap_epoch
                ok, S21 = self._verify_candidate(kf_id, k2, map1=m, map2=old)
            if not ok:
                continue
            self.stats["merges_detected"] = (
                self.stats.get("merges_detected", 0) + 1)
            if self.merge_fn(kf_id, old, k2, S21,
                             cur_map=m, cur_epoch=epoch1):
                return True
        return False

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
        valid_ids = np.nonzero(self.bow_filled[: m.n_kf] & m.kf_valid[: m.n_kf])[0]
        if len(valid_ids) == 0:
            return np.zeros(0, np.int64)
        # device-resident DB: score + common-word counts in one kernel with
        # ONE packed pull (round 2 re-uploaded the whole DB per query)
        db_ids, db_w = self._db_sync(m.n_kf)
        out = np.asarray(_db_score_fn(db_ids.shape, self.vocab.n_words)(
            db_ids, db_w, kf_id))
        cap = db_ids.shape[0]
        scores = out[:cap].view(np.float32)[valid_ids]
        common = out[cap:][valid_ids]

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
        """Full geometric verification (reference DetectCommonRegionsFromBoW
        src/LoopClosing.cc:730): BoW-style match → Sim3 RANSAC → OptimizeSim3
        → guided projection (SearchBySim3-equivalent) → re-optimize → final
        tight projection count, with the reference A.5 gates. map1/map2
        default to this closer's map; passing a different map2 verifies a
        cross-map (Atlas merge) candidate."""
        from ..ops import camera as cam_ops

        def _fail(stage):
            self.stats[f"lc_vfail_{stage}"] = (
                self.stats.get(f"lc_vfail_{stage}", 0) + 1)
            return False, None

        m = map1 if map1 is not None else self.map
        m2 = map2 if map2 is not None else self.map
        has1 = m.kf_feat_valid[kf1] & (m.kf_feat_mp[kf1] >= 0)
        has2 = m2.kf_feat_valid[kf2] & (m2.kf_feat_mp[kf2] >= 0)
        if has1.sum() < self.n_bow_matches or has2.sum() < self.n_bow_matches:
            return _fail("has")
        idx, best, ok = matching.search_by_descriptor(
            jnp.asarray(m.kf_feat_desc[kf1]), jnp.asarray(has1),
            jnp.asarray(m2.kf_feat_desc[kf2]), jnp.asarray(has2),
            max_dist=matching.TH_LOW, ratio=0.9)
        okn = np.asarray(ok)
        if okn.sum() < self.n_bow_matches:   # nBoWMatches (reference 20)
            return _fail("bow")
        f1 = np.nonzero(okn)[0]
        f2 = np.asarray(idx)[f1]
        mp1 = m.kf_feat_mp[kf1][f1]
        mp2 = m2.kf_feat_mp[kf2][f2]
        sel = m.mp_valid[mp1] & m2.mp_valid[mp2]
        f1, f2, mp1, mp2 = f1[sel], f2[sel], mp1[sel], mp2[sel]
        n = len(mp1)
        if n < self.n_bow_inliers:
            return _fail("pairs")
        # degenerate guard: a same-map "loop" whose matches are mostly the
        # SAME landmarks carries no closure information (its Sim3 is a no-op)
        if m is m2 and n and (mp1 == mp2).mean() > 0.5:
            return _fail("samemp")
        # camera-frame 3D positions
        x1 = m.mp_xyz[mp1] @ m.kf_R[kf1].T + m.kf_t[kf1]
        x2 = m2.mp_xyz[mp2] @ m2.kf_R[kf2].T + m2.kf_t[kf2]
        sig1 = m.level_sigma2[m.kf_feat_octave[kf1, f1]]
        sig2 = m2.level_sigma2[m2.kf_feat_octave[kf2, f2]]
        # pad the pair set to a static bucket: the Sim3 kernels are jitted,
        # and a per-candidate match count would recompile them every call
        # (measured 85 s stalls on first hits) — the masks make padding exact
        cap = _pair_bucket(n)
        n = min(n, cap)
        valid = np.zeros(cap, bool)
        valid[:n] = True
        x1p, x2p = _pad_to(x1, cap, fill_z1=True), _pad_to(x2, cap, fill_z1=True)
        sig1p, sig2p = _pad_to(sig1, cap, 1.0), _pad_to(sig2, cap, 1.0)
        rand = self.rng.integers(0, n, (100, 3)).astype(np.int32)
        res = sim3_ops.sim3_ransac(
            jnp.asarray(x1p), jnp.asarray(x2p),
            jnp.asarray(valid), jnp.asarray(rand),
            jnp.asarray(9.21 * sig1p, jnp.float32),
            jnp.asarray(9.21 * sig2p, jnp.float32),
            jnp.asarray(self.cam_params), fix_scale=self.fix_scale,
            min_inliers=self.n_bow_inliers, cam_type=self.cam_type)
        if not bool(res.success):
            log = self.stats.setdefault("lc_vfail_log", [])
            log.append(
                ("ransac", int(kf1), int(kf2), float(m.kf_ts[kf1]),
                 float(m2.kf_ts[kf2]),
                 dict(has1=int(has1.sum()), has2=int(has2.sum()),
                      raw=int(okn.sum()), pairs=int(n),
                      inl=int(res.n_inliers))))
            # bounded: the stats dict survives map rebinds, so an uncapped
            # log grows for the whole run (advisor r4 low)
            if len(log) > 32:
                del log[:-32]
            return _fail("ransac")
        # OptimizeSim3 on the matched pairs (reference Optimizer.cc:3555)
        opt = sim3_ops.optimize_sim3(
            jnp.asarray(x1p), jnp.asarray(x2p),
            jnp.asarray(_pad_to(m.kf_feat_xy[kf1, f1], cap)),
            jnp.asarray(_pad_to(m2.kf_feat_xy[kf2, f2], cap)),
            jnp.asarray(_pad_to(1.0 / sig1, cap)),
            jnp.asarray(_pad_to(1.0 / sig2, cap)),
            jnp.asarray(valid), res.s, res.R, res.t,
            jnp.asarray(self.cam_params), fix_scale=self.fix_scale,
            cam_type=self.cam_type)
        if int(opt.n_inliers) < self.n_sim3_inliers:   # nSim3Inliers (20)
            return _fail("sim3opt")
        S21 = (float(opt.s), np.asarray(opt.R), np.asarray(opt.t))
        if not np.isfinite(S21[0]) or not np.isfinite(S21[1]).all():
            return _fail("finite")
        # guided projection through the refined Sim3 (SearchBySim3 analogue)
        n_guided, g_mp2, g_feat1 = self._guided_projection(
            kf1, kf2, S21, map1=m, map2=m2, radius=8.0)
        if n_guided < self.n_proj_matches:   # nProjMatches (reference 50)
            return _fail("guided")
        # re-optimize on the extended pair set, then a tight recount
        S21b = self._optimize_pairs(kf1, kf2, S21, g_mp2, g_feat1, m, m2)
        if S21b is None:
            return _fail("optpairs")
        n_final, _, _ = self._guided_projection(
            kf1, kf2, S21b, map1=m, map2=m2, radius=3.0)
        if n_final < self.n_proj_opt_matches:   # nProjOptMatches (80)
            self.stats["lc_vfail_last_n_final"] = int(n_final)
            return _fail("final")
        return True, S21b

    # ------------------------------------------------------------------
    def _guided_matcher(self):
        if self._guided is None:
            from . import kernels
            self._guided = kernels.projection_matcher(
                self.cam_type, self.map.cfg.n_levels, self.map.cfg.scale)
        return self._guided

    def _guided_projection(self, kf1: int, kf2: int, S21, map1=None,
                           map2=None, radius: float = 8.0, cap: int = 2048):
        """Project the candidate-side local landmarks into kf1 through S21⁻¹
        and descriptor-match within a window (reference SearchBySim3 /
        FindMatchesByProjection, src/ORBmatcher.cc:2201, src/LoopClosing.cc:1177).
        Returns (n_matches, matched mp2 ids, matched kf1 feature indices)."""
        m = map1 if map1 is not None else self.map
        m2 = map2 if map2 is not None else self.map
        s, R, t = S21
        locals2 = m2.local_map_points(np.concatenate(
            [[kf2], m2.best_covisible(kf2, 5, min_weight=15)]).astype(np.int32))
        locals2 = locals2[:cap]
        if len(locals2) == 0:
            return 0, np.zeros(0, np.int64), np.zeros(0, np.int64)
        n = len(locals2)
        pad = cap - n
        # candidate points into kf1's CAMERA frame (S21⁻¹ of their cam2 pos);
        # the matcher then runs with an identity frame pose
        xc2 = m2.mp_xyz[locals2] @ m2.kf_R[kf2].T + m2.kf_t[kf2]
        xc1 = (xc2 - t) @ R / s
        n2_cam = m2.mp_normal[locals2] @ m2.kf_R[kf2].T   # world→cam2 rotation
        n1 = n2_cam @ R                                    # cam2→cam1 rotation
        def pk(a, fill=0.0):
            if pad:
                return np.concatenate(
                    [a, np.full((pad,) + a.shape[1:], fill, a.dtype)])
            return a
        valid = np.zeros(cap, bool)
        valid[:n] = True
        idx, ok, uv, lvl, frustum = self._guided_matcher()(
            jnp.asarray(pk(xc1.astype(np.float32))),
            jnp.asarray(pk(m2.mp_desc[locals2])),
            jnp.asarray(pk(n1.astype(np.float32))),
            jnp.asarray(pk((m2.mp_min_dist[locals2] / s).astype(np.float32))),
            jnp.asarray(pk((m2.mp_max_dist[locals2] / s).astype(np.float32), 1.0)),
            jnp.asarray(valid),
            jnp.asarray(np.eye(3, dtype=np.float32)),
            jnp.asarray(np.zeros(3, np.float32)),
            jnp.asarray(self.cam_params),
            jnp.asarray(m.kf_feat_xy[kf1]),
            jnp.asarray(m.kf_feat_desc[kf1]),
            jnp.asarray(m.kf_feat_octave[kf1]),
            jnp.asarray(m.kf_feat_valid[kf1]),
            jnp.asarray(self.wh),
            jnp.asarray(radius, jnp.float32),
            jnp.asarray(1.0, jnp.float32),       # no ratio test (reference)
            jnp.asarray(matching.TH_HIGH, jnp.int32),
            jnp.asarray(-1.0, jnp.float32))      # no view-cos gate
        okn = np.asarray(ok)[:n]
        src_i = np.nonzero(okn)[0]
        return (len(src_i), locals2[src_i].astype(np.int64),
                np.asarray(idx)[:n][src_i].astype(np.int64))

    def _optimize_pairs(self, kf1: int, kf2: int, S21, g_mp2, g_feat1,
                        m, m2, cap: int = 512):
        """OptimizeSim3 on guided-match pairs: kf1 features with map points
        matched to candidate-side landmarks (reference second OptimizeSim3
        after SearchBySim3)."""
        mp1 = m.kf_feat_mp[kf1][g_feat1]
        sel = (mp1 >= 0)
        sel[sel] &= m.mp_valid[mp1[sel]]
        if sel.sum() < 10:
            return S21   # keep the previous estimate
        f1 = g_feat1[sel][:cap]
        mp1 = m.kf_feat_mp[kf1][f1]
        mp2 = g_mp2[sel][:cap]
        x1 = m.mp_xyz[mp1] @ m.kf_R[kf1].T + m.kf_t[kf1]
        x2 = m2.mp_xyz[mp2] @ m2.kf_R[kf2].T + m2.kf_t[kf2]
        uv1 = m.kf_feat_xy[kf1, f1]
        sig1 = m.level_sigma2[m.kf_feat_octave[kf1, f1]]
        # uv2: observation of mp2 in kf2, when it exists (reference adds e21
        # only then, src/Optimizer.cc:3670 area)
        row2 = m2.kf_feat_mp[kf2]
        lut2 = np.full(m2.cfg.max_map_points, -1, np.int64)
        obs_feats = np.nonzero(row2 >= 0)[0]
        lut2[row2[obs_feats]] = obs_feats
        f2 = lut2[mp2]
        has2 = f2 >= 0
        uv2 = np.zeros((len(mp2), 2), np.float32)
        uv2[has2] = m2.kf_feat_xy[kf2, f2[has2]]
        sig2 = np.ones(len(mp2), np.float32)
        sig2[has2] = m2.level_sigma2[m2.kf_feat_octave[kf2, f2[has2]]]
        s, R, t = S21
        # static-bucket padding — same recompile-avoidance as _verify_candidate
        nn = len(mp1)
        capb = _pair_bucket(nn)
        validb = np.zeros(capb, bool)
        validb[:nn] = True
        has2b = np.zeros(capb, bool)
        has2b[:nn] = has2
        opt = sim3_ops.optimize_sim3(
            jnp.asarray(_pad_to(x1, capb, fill_z1=True)),
            jnp.asarray(_pad_to(x2, capb, fill_z1=True)),
            jnp.asarray(_pad_to(uv1, capb)), jnp.asarray(_pad_to(uv2, capb)),
            jnp.asarray(_pad_to(1.0 / sig1, capb)),
            jnp.asarray(_pad_to(1.0 / sig2, capb)),
            jnp.asarray(validb),
            jnp.asarray(s, jnp.float32), jnp.asarray(R, jnp.float32),
            jnp.asarray(t, jnp.float32),
            jnp.asarray(self.cam_params),
            valid21=jnp.asarray(has2b),
            fix_scale=self.fix_scale, cam_type=self.cam_type)
        sN = float(opt.s)
        RN = np.asarray(opt.R)
        tN = np.asarray(opt.t)
        if not (np.isfinite(sN) and np.isfinite(RN).all()
                and np.isfinite(tN).all() and 0.01 < sN < 100.0):
            return None
        # the re-optimization refines an already-verified similarity: a large
        # scale jump means the solve left the basin — reject it
        if abs(np.log(max(sN, 1e-9) / max(s, 1e-9))) > 0.7:
            return None
        return (sN, RN, tN)

    def _refine_pending(self, kf_new: int):
        """Temporal re-verification of the pending candidate against a new
        keyframe (reference DetectAndReffineSim3FromLastKF
        src/LoopClosing.cc:649: propagate the Sim3 by odometry, guided-project
        (≥30), OptimizeSim3 (>50), tight reprojection count (≥100))."""
        m = self.map
        p = self.pending
        kf_prev, cand = p["kf1"], p["cand"]
        if not (m.kf_valid[kf_new] and m.kf_valid[kf_prev]
                and m.kf_valid[cand]):
            return False, None
        s, R, t = p["S21"]
        # S21' = S21 ∘ T_prev_new (points in the new KF's camera frame)
        R_rel = m.kf_R[kf_prev] @ m.kf_R[kf_new].T
        t_rel = m.kf_t[kf_prev] - R_rel @ m.kf_t[kf_new]
        S21g = (s, (R @ R_rel).astype(np.float32),
                (s * (R @ t_rel) + t).astype(np.float32))
        n_guided, g_mp2, g_feat1 = self._guided_projection(
            kf_new, cand, S21g, radius=8.0)
        if n_guided < 30:                      # reference nProjMatches=30
            self.stats["lc_refine_fail_guided"] = (
                self.stats.get("lc_refine_fail_guided", 0) + 1)
            return False, None
        S21b = self._optimize_pairs(kf_new, cand, S21g, g_mp2, g_feat1, m, m)
        if S21b is None:
            self.stats["lc_refine_fail_opt"] = (
                self.stats.get("lc_refine_fail_opt", 0) + 1)
            return False, None
        n_final, _, _ = self._guided_projection(kf_new, cand, S21b, radius=3.0)
        if n_final < min(100, self.n_proj_opt_matches):  # nProjMatchesRep=100
            self.stats["lc_refine_fail_final"] = (
                self.stats.get("lc_refine_fail_final", 0) + 1)
            self.stats["lc_refine_last_n_final"] = int(n_final)
            return False, None
        return True, S21b

    def _posegraph_jit(self, iters: int):
        import functools
        import jax
        if not hasattr(self, "_pg_jit"):
            self._pg_jit = {}
        if iters not in self._pg_jit:
            self._pg_jit[iters] = jax.jit(functools.partial(
                posegraph.optimize_pose_graph, iters=iters))
        return self._pg_jit[iters]

    def _search_and_fuse(self, kf1: int, kf2: int):
        """Fuse the loop-side landmarks into the corrected current covisible
        group (reference SearchAndFuse src/LoopClosing.cc:1462 →
        ORBmatcher::Fuse :2051): after the pose-graph correction both sides
        live in one consistent frame, so duplicated landmarks project onto
        the same features and merge."""
        if self.fuse_fn is None:
            return
        m = self.map
        loop_mps = m.local_map_points(np.concatenate(
            [[kf2], m.best_covisible(kf2, 5, min_weight=15)]).astype(np.int32))
        if len(loop_mps) == 0:
            return
        group1 = [int(kf1)] + [int(g) for g in
                               m.best_covisible(kf1, 10, min_weight=15)]
        for k in group1:
            self.fuse_fn(loop_mps, k)
        fused = m.kf_feat_mp[kf1]
        m.refresh_map_points(np.unique(fused[fused >= 0]))

    # ------------------------------------------------------------------
    def _correct_loop(self, kf1: int, kf2: int, S21):
        """Pose-graph correction (reference CorrectLoop + OptimizeEssentialGraph)."""
        s21, R21, t21 = S21
        s12 = 1.0 / s21
        R12 = R21.T
        t12 = -s12 * (R12 @ t21)
        self._essential_graph(fixed_ids=[int(kf2)],
                              extra_edge=(int(kf1), int(kf2), s12, R12, t12, 5.0))

    def optimize_essential_graph(self, fixed_ids, meas=None):
        """Distribute residual stress over the whole map after a merge
        (reference MergeLocal runs OptimizeEssentialGraph on the keyframes
        outside the welding window, src/LoopClosing.cc:2141): odometry +
        spanning-tree + covisibility + stored loop edges, welding-window
        keyframes fixed.

        ``meas`` = (R (cap,3,3), t (cap,3)) pose snapshot to measure the
        relative edges from. The reference measures edges from the
        NON-corrected poses and initializes nodes at the corrected ones
        (src/Optimizer.cc:3019 merge variant) — measuring from the already-
        corrected current poses would make the solve a zero-residual no-op,
        so the weld BA's correction could never propagate past the welding
        window."""
        self._essential_graph(fixed_ids=[int(k) for k in fixed_ids],
                              meas=meas)

    def _essential_graph(self, fixed_ids, extra_edge=None, meas=None):
        m = self.map
        kfs = m.valid_kf_ids()
        K = len(kfs)
        lut = np.full(m.cfg.max_keyframes, -1, np.int32)
        lut[kfs] = np.arange(K)

        s0 = np.ones(K, np.float32)
        R0 = m.kf_R[kfs].copy()
        t0 = m.kf_t[kfs].copy()

        mRs = m.kf_R if meas is None else meas[0]
        mts = m.kf_t if meas is None else meas[1]
        edges_i, edges_j, ms, mR, mt, wts = [], [], [], [], [], []

        def add_edge(a, b, w=1.0):
            ia, ib = lut[a], lut[b]
            if ia < 0 or ib < 0:
                return
            # measured relative from the measurement poses: S_ab = S_a ∘ S_b⁻¹
            Ra, ta = mRs[a], mts[a]
            Rb, tb = mRs[b], mts[b]
            Rab = Ra @ Rb.T
            tab = ta - Rab @ tb
            edges_i.append(ia); edges_j.append(ib)
            ms.append(1.0); mR.append(Rab); mt.append(tab); wts.append(w)

        # odometry chain + spanning-tree + covisibility (≥100 shared) edges
        # (reference OptimizeEssentialGraph: spanning tree + covis≥100 +
        # loop/merge edges, src/Optimizer.cc:2400-2471)
        for a, b in zip(kfs[1:], kfs[:-1]):
            add_edge(int(a), int(b))
        seen_parent = set()
        for a in kfs:
            pa = int(m.kf_parent[int(a)])
            if pa >= 0 and m.kf_valid[pa] and abs(pa - int(a)) > 1:
                key = (min(int(a), pa), max(int(a), pa))
                if key not in seen_parent:
                    seen_parent.add(key)
                    add_edge(int(a), pa, w=1.0)
        for a in kfs:
            row = m.covisibility_row(int(a))
            for b in np.nonzero(row >= 100)[0]:
                if b > a:
                    add_edge(int(a), int(b), w=1.0)
        # loop edges from earlier corrections (reference :1526-1528: stored
        # edges enter every later essential-graph solve; their measured
        # relative comes from the already-corrected poses)
        for (a, b) in self.loop_edges:
            add_edge(int(a), int(b), w=5.0)
        # the loop edge with the MEASURED Sim3: S_12 = S21⁻¹ relates nodes
        # S_kf1 ∘ S_kf2⁻¹
        if extra_edge is not None:
            e1, e2, s12, R12, t12, w12 = extra_edge
            edges_i.append(lut[e1]); edges_j.append(lut[e2])
            ms.append(s12); mR.append(R12); mt.append(t12); wts.append(w12)

        fixed = np.zeros(K, bool)
        for fk in fixed_ids:       # reference fixes the loop keyframe
            if lut[fk] >= 0:
                fixed[lut[fk]] = True
        if not fixed.any():
            fixed[0] = True

        if self.is_inertial():
            # yaw + translation only: gravity pins roll/pitch, IMU pins scale
            dof = np.array([0, 0, 1, 1, 1, 1, 0], bool)
        elif self.fix_scale:
            dof = np.array([1, 1, 1, 1, 1, 1, 0], bool)
        else:
            dof = np.ones(7, bool)
        # bucket node/edge counts to a few static shapes: the solve reuses
        # one XLA compilation across corrections instead of recompiling per
        # (K, E) pair (unbounded compile churn in long runs); edges beyond
        # the largest bucket drop lowest-weight-first (never the loop edges)
        E = len(ms)
        Kb = next((b for b in (16, 32, 64, 96, 128, 192, 256, 384, 512,
                               1024) if K <= b), None)
        Eb = next((b for b in (256, 512, 1024, 2048, 4096, 8192) if E <= b),
                  8192)
        if Kb is None:
            return
        edges_i = np.asarray(edges_i, np.int32)
        edges_j = np.asarray(edges_j, np.int32)
        ms_a = np.asarray(ms, np.float32)
        mR_a = np.stack(mR).astype(np.float32)
        mt_a = np.stack(mt).astype(np.float32)
        wts_a = np.asarray(wts, np.float32)
        if E > Eb:
            keep = np.argsort(-wts_a)[:Eb]
            edges_i, edges_j = edges_i[keep], edges_j[keep]
            ms_a, mR_a, mt_a, wts_a = (ms_a[keep], mR_a[keep], mt_a[keep],
                                       wts_a[keep])
            E = Eb

        def padn(a, n, fill=0):
            out = np.full((n,) + a.shape[1:], fill, a.dtype)
            out[: len(a)] = a
            return out

        eyeK = np.tile(np.eye(3, dtype=np.float32), (Kb, 1, 1))
        eyeK[:K] = R0
        eyeE = np.tile(np.eye(3, dtype=np.float32), (Eb, 1, 1))
        eyeE[:E] = mR_a
        s_n, R_n, t_n, costs = self._posegraph_jit(iters=15)(
            jnp.asarray(padn(s0, Kb, 1.0)), jnp.asarray(eyeK),
            jnp.asarray(padn(t0, Kb)),
            jnp.asarray(padn(np.ones(K, bool), Kb, False)),
            jnp.asarray(padn(fixed, Kb, True)),
            jnp.asarray(padn(edges_i, Eb)), jnp.asarray(padn(edges_j, Eb)),
            jnp.asarray(padn(ms_a, Eb, 1.0)), jnp.asarray(eyeE),
            jnp.asarray(padn(mt_a, Eb)),
            jnp.asarray(padn(np.ones(E, bool), Eb, False)),
            jnp.asarray(padn(wts_a, Eb)),
            dof_mask=jnp.asarray(dof))
        s_n = np.asarray(s_n)[:K]
        R_n = np.asarray(R_n)[:K]
        t_n = np.asarray(t_n)[:K]

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
        m.touch()

        # recover SE3 keyframe poses: R, t/s (reference :2361 recovery)
        m.kf_R[kfs] = R_n
        m.kf_t[kfs] = (t_n / s_n[:, None]).astype(np.float32)
