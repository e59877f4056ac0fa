"""System facade: wires tracking + local mapping (+ later loop closing, atlas).

The reference ``System`` (reference src/System.cc:41-181 ctor spawning
LocalMapping/LoopClosing/Viewer threads, TrackMonocular :313, Shutdown :421,
trajectory savers :457-750). Here the pipeline runs in one host thread driving
asynchronous device dispatch; `mapping_mode='sync'` runs the mapper inline per
keyframe (deterministic, test-friendly), `'async'` defers it (future rounds).
"""
from __future__ import annotations

import time

import numpy as np

from ..ops import features as feat_ops
from .local_mapping import LocalMapper
from .map import MapConfig, MapState
from .tracking import Tracker, TrackingParams, TrackState


class SlamSystem:
    def __init__(self, K, D, wh, n_features: int = 1024,
                 tracking_params: TrackingParams | None = None,
                 map_cfg: MapConfig | None = None, seed: int = 0,
                 bf: float = 0.0, th_depth: float = 0.0,
                 enable_loop_closing: bool = True):
        self.orb_cfg = feat_ops.OrbConfig(n_features=n_features)
        cap = self.orb_cfg.total_capacity
        self.map_cfg = map_cfg or MapConfig(n_features=cap)
        if self.map_cfg.n_features != cap:
            self.map_cfg.n_features = cap
        self.map = MapState(self.map_cfg)
        self.tracker = Tracker(K, D, wh, self.orb_cfg, self.map,
                               params=tracking_params, seed=seed,
                               bf=bf, th_depth=th_depth)
        self.mapper = LocalMapper(self.map, K, self.orb_cfg, wh=wh)
        self.mapper.bf = float(bf)
        self.loop_closer = None
        if enable_loop_closing:
            from .loop_closing import LoopCloser
            self.loop_closer = LoopCloser(self.map, K, wh, fix_scale=bf > 0)

        def on_kf(kf_id, initial=False):
            self.mapper.process_keyframe(kf_id, initial=initial)
            if self.loop_closer is not None and not initial:
                self.loop_closer.process_keyframe(kf_id)

        self.tracker.on_new_keyframe = on_kf
        self.frame_times: list[float] = []

    def track_monocular(self, img: np.ndarray, ts: float) -> dict:
        t0 = time.perf_counter()
        info = self.tracker.process_frame(img, ts)
        self.frame_times.append(time.perf_counter() - t0)
        return info

    def track_stereo(self, img_l: np.ndarray, img_r: np.ndarray, ts: float) -> dict:
        t0 = time.perf_counter()
        info = self.tracker.process_stereo_frame(img_l, img_r, ts)
        self.frame_times.append(time.perf_counter() - t0)
        return info

    def track_rgbd(self, img: np.ndarray, depth_map: np.ndarray, ts: float) -> dict:
        """RGB-D: depth sampled at keypoints → virtual right coords (reference
        GrabImageRGBD src/Tracking.cc:1330 + ComputeStereoFromRGBD)."""
        t0 = time.perf_counter()
        info = self.tracker.process_rgbd_frame(img, depth_map, ts)
        self.frame_times.append(time.perf_counter() - t0)
        return info

    @property
    def state(self) -> TrackState:
        return self.tracker.state

    def export_trajectory(self):
        return self.tracker.export_trajectory()

    def save_trajectory_tum(self, path: str):
        """TUM format: ts tx ty tz qx qy qz qw (reference SaveTrajectoryTUM)."""
        import jax.numpy as jnp
        from ..ops import lie
        ts, R_wc, t_wc, lost = self.export_trajectory()
        q = np.asarray(lie.quat_from_mat(jnp.asarray(R_wc)))
        with open(path, "w") as f:
            for i in range(len(ts)):
                f.write(f"{ts[i]:.6f} " + " ".join(f"{v:.7f}" for v in t_wc[i])
                        + " " + " ".join(f"{v:.7f}" for v in q[i]) + "\n")

    def stats(self) -> dict:
        ft = np.array(self.frame_times) if self.frame_times else np.zeros(1)
        out = {
            "n_frames": len(self.frame_times),
            "n_keyframes": int(self.map.kf_valid.sum()),
            "n_map_points": int(self.map.mp_valid.sum()),
            "mean_frame_ms": float(ft.mean() * 1e3),
            "median_frame_ms": float(np.median(ft) * 1e3),
            "fps": float(1.0 / max(ft.mean(), 1e-9)),
            **self.mapper.stats,
        }
        if self.loop_closer is not None:
            out.update(self.loop_closer.stats)
        return out
