"""Headless visualization: map/trajectory rendering + frame overlay.

Covers the reference's Pangolin Viewer / FrameDrawer / MapDrawer capability
(reference src/Viewer.cc:130, src/FrameDrawer.cc, src/MapDrawer.cc) without a
GL dependency: matplotlib renders the map point cloud, keyframe frusta,
covisibility graph and trajectory to PNG; OpenCV draws the per-frame keypoint
overlay with the reference's status-bar text.
"""
from __future__ import annotations

import numpy as np


def render_map(map_state, path: str, trajectory=None, show_covisibility=True,
               max_points: int = 5000, elev: float = -60, azim: float = -90):
    """Save a 3D rendering of the map (MapDrawer parity: points, keyframe
    frusta, covisibility edges, trajectory)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    m = map_state
    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(111, projection="3d")

    mps = m.valid_mp_ids()
    if len(mps) > max_points:
        mps = mps[np.linspace(0, len(mps) - 1, max_points).astype(int)]
    if len(mps):
        P = m.mp_xyz[mps]
        ax.scatter(P[:, 0], P[:, 2], -P[:, 1], s=1, c="k", alpha=0.35,
                   label=f"{len(mps)} map points")

    kfs = m.valid_kf_ids()
    centers = []
    for k in kfs:
        R, t = m.kf_R[k], m.kf_t[k]
        c = -R.T @ t
        centers.append(c)
        # frustum: 4 image-corner rays at depth 0.2
        z = 0.12
        corners = np.array([[-0.16, -0.1, z], [0.16, -0.1, z],
                            [0.16, 0.1, z], [-0.16, 0.1, z]])
        pts = (corners @ R) + c
        for a, b in [(0, 1), (1, 2), (2, 3), (3, 0)]:
            ax.plot([pts[a, 0], pts[b, 0]], [pts[a, 2], pts[b, 2]],
                    [-pts[a, 1], -pts[b, 1]], "b-", lw=0.5)
        for corner in pts:
            ax.plot([c[0], corner[0]], [c[2], corner[2]], [-c[1], -corner[1]],
                    "b-", lw=0.4)
    centers = np.asarray(centers) if len(centers) else np.zeros((0, 3))

    if show_covisibility and len(kfs) > 1:
        for i, k in enumerate(kfs):
            row = m.covisibility_row(int(k))
            for j in np.nonzero(row >= 100)[0]:
                jj = np.nonzero(kfs == j)[0]
                if len(jj) and jj[0] > i:
                    a, b = centers[i], centers[jj[0]]
                    ax.plot([a[0], b[0]], [a[2], b[2]], [-a[1], -b[1]],
                            "g-", lw=0.6, alpha=0.6)

    if trajectory is not None and len(trajectory):
        T = np.asarray(trajectory)
        ax.plot(T[:, 0], T[:, 2], -T[:, 1], "r-", lw=1.2, label="trajectory")

    ax.set_xlabel("x"); ax.set_ylabel("z"); ax.set_zlabel("-y")
    ax.view_init(elev=elev, azim=azim)
    ax.legend(loc="upper right", fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def draw_frame(img: np.ndarray, frame, state_name: str = "OK") -> np.ndarray:
    """Per-frame overlay (FrameDrawer parity): tracked keypoints as green
    squares, untracked as blue dots, reference status bar."""
    import cv2
    vis = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8), cv2.COLOR_GRAY2BGR)
    n_tracked = 0
    for i in np.nonzero(frame.valid)[0]:
        x, y = int(frame.xy[i, 0]), int(frame.xy[i, 1])
        if frame.feat_mp[i] >= 0:
            cv2.rectangle(vis, (x - 3, y - 3), (x + 3, y + 3), (0, 255, 0), 1)
            n_tracked += 1
        else:
            cv2.circle(vis, (x, y), 1, (255, 0, 0), -1)
    bar = np.zeros((22, vis.shape[1], 3), np.uint8)
    txt = f"{state_name} | matches: {n_tracked} | kps: {int(frame.valid.sum())}"
    cv2.putText(bar, txt, (8, 15), cv2.FONT_HERSHEY_PLAIN, 1.0, (255, 255, 255), 1)
    return np.concatenate([vis, bar], axis=0)
