"""Dataset loaders and synthetic sequence generation.

The reference is driven by EuRoC / TUM / KITTI datasets (reference
Examples/*); none are present in this environment, so the test pyramid is
built on synthetic sequences with exact ground truth: a textured random
point cloud rendered into a moving pinhole camera. This gives golden values
for every stage (known 3D points, known poses, known associations) — the
unit-level oracle the reference never had (its only oracle is dataset ATE,
reference evaluation/evaluate_ate_scale.py).

Also provides a real EuRoC loader (directory layout cam0/data.csv + data/,
reference Examples/Monocular/mono_euroc.cc LoadImages) for when data exists.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np


@dataclass
class SyntheticScene:
    """Random textured 3D point cloud + IMU-free trajectory generator."""

    n_points: int = 600
    seed: int = 0
    extent: float = 8.0      # lateral world extent
    depth_min: float = 4.0
    depth_max: float = 14.0
    patch: int = 9           # sprite texture size (odd)
    h: int = 480
    w: int = 752
    fx: float = 458.654
    fy: float = 457.296
    cx: float = 376.0
    cy: float = 240.0

    def __post_init__(self):
        rng = np.random.default_rng(self.seed)
        self.points = np.stack(
            [
                rng.uniform(-self.extent, self.extent, self.n_points),
                rng.uniform(-self.extent * 0.6, self.extent * 0.6, self.n_points),
                rng.uniform(self.depth_min, self.depth_max, self.n_points),
            ],
            axis=-1,
        )
        # high-contrast random sprite per point so FAST fires and BRIEF is distinctive
        self.textures = rng.uniform(60.0, 255.0, size=(self.n_points, self.patch, self.patch))
        self.textures *= rng.random(size=(self.n_points, self.patch, self.patch)) > 0.45
        self.background = rng.uniform(20.0, 40.0, size=(self.h, self.w))

    @property
    def K(self) -> np.ndarray:
        return np.array([self.fx, self.fy, self.cx, self.cy], dtype=np.float32)

    def render(self, R_cw: np.ndarray, t_cw: np.ndarray) -> np.ndarray:
        """Render the scene from world→camera pose (R,t). Returns (H,W) float32 image."""
        pc = self.points @ R_cw.T + t_cw
        z = pc[:, 2]
        vis = z > 0.1
        u = self.fx * pc[:, 0] / np.where(vis, z, 1.0) + self.cx
        v = self.fy * pc[:, 1] / np.where(vis, z, 1.0) + self.cy
        img = self.background.copy()
        r = self.patch // 2
        ui = np.round(u).astype(int)
        vi = np.round(v).astype(int)
        inb = vis & (ui >= r) & (ui < self.w - r) & (vi >= r) & (vi < self.h - r)
        # scale sprite brightness mildly with inverse depth for realism
        for i in np.nonzero(inb)[0]:
            y0, x0 = vi[i] - r, ui[i] - r
            img[y0:y0 + self.patch, x0:x0 + self.patch] = np.maximum(
                img[y0:y0 + self.patch, x0:x0 + self.patch], self.textures[i]
            )
        return img.astype(np.float32)

    def project(self, R_cw: np.ndarray, t_cw: np.ndarray):
        """Ground-truth projections: (u, v, z, visible_mask)."""
        pc = self.points @ R_cw.T + t_cw
        z = pc[:, 2]
        vis = z > 0.1
        u = self.fx * pc[:, 0] / np.where(vis, z, 1.0) + self.cx
        v = self.fy * pc[:, 1] / np.where(vis, z, 1.0) + self.cy
        r = self.patch // 2
        inb = vis & (u >= r) & (u < self.w - r) & (v >= r) & (v < self.h - r)
        return u, v, z, inb


def orbit_trajectory(n_frames: int, radius: float = 0.8, forward: float = 0.02,
                     yaw_rate: float = 0.003):
    """A gently translating + yawing camera path. Returns lists of (R_cw, t_cw)
    (world→camera) and the inverse camera-center trajectory for ATE checks."""
    poses = []
    for i in range(n_frames):
        # camera center in world
        c = np.array([radius * np.sin(0.04 * i), 0.15 * np.sin(0.02 * i), forward * i])
        yaw = yaw_rate * i
        cy, sy = np.cos(yaw), np.sin(yaw)
        R_wc = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        R_cw = R_wc.T
        t_cw = -R_cw @ c
        poses.append((R_cw, t_cw))
    return poses


def load_euroc_images(seq_dir: str, cam: str = "cam0"):
    """EuRoC mav0 layout loader → (timestamps (s), image paths). Mirrors the
    reference's LoadImages (Examples/Monocular/mono_euroc.cc:73-107)."""
    csv = os.path.join(seq_dir, "mav0", cam, "data.csv")
    stamps, paths = [], []
    with open(csv) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            ts, name = line.strip().split(",")[:2]
            stamps.append(float(ts) * 1e-9)
            paths.append(os.path.join(seq_dir, "mav0", cam, "data", name))
    return np.array(stamps), paths


def load_euroc_imu(seq_dir: str):
    """EuRoC IMU csv → (timestamps (s), gyro (N,3), acc (N,3))."""
    csv = os.path.join(seq_dir, "mav0", "imu0", "data.csv")
    rows = []
    with open(csv) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            rows.append([float(x) for x in line.strip().split(",")])
    arr = np.array(rows)
    return arr[:, 0] * 1e-9, arr[:, 1:4], arr[:, 4:7]
