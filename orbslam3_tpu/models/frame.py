"""Per-image frame: extracted features + pose + map-point assignments.

The reference's ``Frame`` (reference include/Frame.h, src/Frame.cc) bundles
extraction, undistortion, grid assignment and stereo matching. Here a Frame is
a plain host-side SoA snapshot of the jitted extractor output (undistortion is
applied once, immediately; the grid is unnecessary — matching uses masked
all-pairs kernels, see ops/matching.py).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from ..ops import camera as cam_ops
from ..ops import features as feat_ops


@dataclass
class Frame:
    frame_id: int
    ts: float
    xy: np.ndarray        # (N,2) float32 — undistorted level-0 pixel coords
    angle: np.ndarray     # (N,)
    octave: np.ndarray    # (N,) int32
    desc: np.ndarray      # (N,8) uint32
    valid: np.ndarray     # (N,) bool
    # pose (world→cam); None until tracked
    R: np.ndarray | None = None
    t: np.ndarray | None = None
    # map-point id per feature (-1 = none)
    feat_mp: np.ndarray = field(default=None)
    # stereo right-x / depth per feature (<0 = mono)
    ur: np.ndarray = field(default=None)
    depth: np.ndarray = field(default=None)
    # two-camera rigs: right-eye pixel of the stereo match (<0 = none)
    uvr: np.ndarray = field(default=None)
    # whether tracking succeeded for this frame (pose is trustworthy)
    tracked: bool = False

    def __post_init__(self):
        n = len(self.valid)
        if self.feat_mp is None:
            self.feat_mp = np.full(n, -1, np.int32)
        if self.ur is None:
            self.ur = np.full(n, -1.0, np.float32)
        if self.depth is None:
            self.depth = np.full(n, -1.0, np.float32)

    @property
    def n_valid(self) -> int:
        return int(self.valid.sum())

    def n_matched(self) -> int:
        return int(((self.feat_mp >= 0) & self.valid).sum())


def build_frame(frame_id: int, ts: float, feats: feat_ops.OrbFeatures,
                K: np.ndarray, D: np.ndarray | None) -> Frame:
    """Convert extractor output to a host Frame, undistorting keypoints once
    (reference Frame::UndistortKeyPoints src/Frame.cc:924)."""
    xy = np.asarray(feats.xy)
    if D is not None and np.any(np.abs(D) > 1e-12):
        xy = np.asarray(cam_ops.pinhole_undistort_pixels(
            jnp.asarray(K), jnp.asarray(D), jnp.asarray(xy)))
    return Frame(
        frame_id=frame_id, ts=ts,
        xy=xy.astype(np.float32),
        angle=np.asarray(feats.angle),
        octave=np.asarray(feats.octave),
        desc=np.asarray(feats.desc),
        valid=np.asarray(feats.valid),
    )
