"""Settings loader: reference-compatible OpenCV-YAML configuration.

Parses the reference's per-sensor YAML files (reference
Examples/Monocular-Inertial/EuRoC.yaml etc., read via cv::FileStorage in
src/Tracking.cc:507 ParseCamParamFile / :1040 ParseORBParamFile / :1125
ParseIMUParamFile) with the same key surface and the V0.3 validating-parser
behavior (missing/ill-typed keys are reported and loading fails cleanly,
reference Changelog.md:23 ``b_miss_params``).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class SlamConfig:
    camera_type: str = "PinHole"        # "PinHole" | "KannalaBrandt8"
    K: np.ndarray = None                # (4,) fx fy cx cy
    D: np.ndarray = None                # (5,) k1 k2 p1 p2 k3 (pinhole) / (4,) KB8 k0..k3
    width: int = 752
    height: int = 480
    fps: float = 20.0
    rgb: bool = True
    bf: float = 0.0
    th_depth: float = 0.0
    depth_map_factor: float = 1.0
    # ORB
    n_features: int = 1000
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: int = 20
    min_th_fast: int = 7
    # IMU
    has_imu: bool = False
    imu_freq: float = 200.0
    imu_noise_gyro: float = 1.7e-4
    imu_noise_acc: float = 2e-3
    imu_gyro_walk: float = 1.9e-5
    imu_acc_walk: float = 3e-3
    Tbc: np.ndarray = None              # (4,4) body←camera
    th_far_points: float = 0.0          # reference thFarPoints (src/System.cc:139-147)
    # example-level stereo rectification (reference
    # Examples/Stereo/stereo_euroc.cc:92-118: LEFT./RIGHT. K,D,R,P)
    rect_left: dict = None              # {K,D,R,P,width,height} raw matrices
    rect_right: dict = None
    # two-camera fisheye rig (reference Camera2.* + Tlr + lapping areas)
    K2: np.ndarray = None               # (8,) fx fy cx cy k1..k4 (KB8)
    Tlr: np.ndarray = None              # (4,4) right←left ... (reference Tlr)
    lapping1: tuple = None
    lapping2: tuple = None
    missing: list = field(default_factory=list)

    def stereo_rectify_maps(self):
        """Build undistort+rectify pixel maps from the LEFT./RIGHT. blocks
        (the reference examples rectify EuRoC stereo pairs before feeding
        TrackStereo, Examples/Stereo/stereo_euroc.cc:92-118). Returns
        ((map1x,map1y),(map2x,map2y)) for cv2.remap, or None if the YAML has
        no rectification blocks."""
        if not (self.rect_left and self.rect_right):
            return None
        import cv2
        maps = []
        for r in (self.rect_left, self.rect_right):
            m1, m2 = cv2.initUndistortRectifyMap(
                r["K"], r["D"], r["R"], r["P"][:3, :3],
                (int(r["width"]), int(r["height"])), cv2.CV_32FC1)
            maps.append((m1, m2))
        return tuple(maps)


def load_config(path: str) -> SlamConfig:
    import cv2
    fs = cv2.FileStorage(path, cv2.FILE_STORAGE_READ)
    if not fs.isOpened():
        raise IOError(f"cannot open settings file {path}")
    cfg = SlamConfig()

    def get(key, default=None, required=False):
        node = fs.getNode(key)
        if node.empty():
            if required:
                cfg.missing.append(key)
            return default
        if node.isString():
            return node.string()
        if node.isReal() or node.isInt():
            return node.real()
        return node.mat()

    cam_type = get("Camera.type", "PinHole")
    cfg.camera_type = cam_type
    fx = get("Camera.fx", required=True)
    fy = get("Camera.fy", required=True)
    cx = get("Camera.cx", required=True)
    cy = get("Camera.cy", required=True)
    if cfg.missing:
        raise ValueError(f"missing required camera keys: {cfg.missing}")
    cfg.K = np.asarray([fx, fy, cx, cy], np.float32)
    if cam_type == "KannalaBrandt8":
        ks = [get(f"Camera.k{i+1}", 0.0) for i in range(4)]
        cfg.D = np.asarray(ks, np.float32)
    else:
        cfg.D = np.asarray([
            get("Camera.k1", 0.0), get("Camera.k2", 0.0),
            get("Camera.p1", 0.0), get("Camera.p2", 0.0),
            get("Camera.k3", 0.0)], np.float32)
    cfg.width = int(get("Camera.width", cfg.width))
    cfg.height = int(get("Camera.height", cfg.height))
    cfg.fps = float(get("Camera.fps", cfg.fps))
    cfg.rgb = bool(int(get("Camera.RGB", 1)))
    cfg.bf = float(get("Camera.bf", 0.0))
    th = get("ThDepth", 0.0)
    if th and cfg.bf:
        cfg.th_depth = float(th) * cfg.bf / cfg.K[0]
    cfg.depth_map_factor = float(get("DepthMapFactor", 1.0))

    cfg.n_features = int(get("ORBextractor.nFeatures", cfg.n_features))
    cfg.scale_factor = float(get("ORBextractor.scaleFactor", cfg.scale_factor))
    cfg.n_levels = int(get("ORBextractor.nLevels", cfg.n_levels))
    cfg.ini_th_fast = int(get("ORBextractor.iniThFAST", cfg.ini_th_fast))
    cfg.min_th_fast = int(get("ORBextractor.minThFAST", cfg.min_th_fast))

    cfg.th_far_points = float(get("thFarPoints", 0.0))

    # second (right) camera of a two-camera fisheye rig
    fx2 = get("Camera2.fx")
    if fx2 is not None and cam_type == "KannalaBrandt8":
        cfg.K2 = np.asarray(
            [fx2, get("Camera2.fy", 0.0), get("Camera2.cx", 0.0),
             get("Camera2.cy", 0.0)] +
            [get(f"Camera2.k{i+1}", 0.0) for i in range(4)], np.float32)
        tlr = get("Tlr")
        if tlr is not None and hasattr(tlr, "shape"):
            cfg.Tlr = np.asarray(tlr, np.float32).reshape(-1, 4)
        cfg.lapping1 = (float(get("Camera.lappingBegin", 0.0)),
                        float(get("Camera.lappingEnd", 1e9)))
        cfg.lapping2 = (float(get("Camera2.lappingBegin", 0.0)),
                        float(get("Camera2.lappingEnd", 1e9)))

    # example-level stereo rectification blocks
    def rect_block(prefix):
        K = get(f"{prefix}.K"); D = get(f"{prefix}.D")
        R = get(f"{prefix}.R"); P = get(f"{prefix}.P")
        w = get(f"{prefix}.width"); h = get(f"{prefix}.height")
        if any(v is None for v in (K, D, R, P, w, h)):
            return None
        return {"K": np.asarray(K, np.float64), "D": np.asarray(D, np.float64),
                "R": np.asarray(R, np.float64), "P": np.asarray(P, np.float64),
                "width": int(w), "height": int(h)}

    cfg.rect_left = rect_block("LEFT")
    cfg.rect_right = rect_block("RIGHT")

    tbc = get("Tbc")
    if tbc is not None and hasattr(tbc, "shape"):
        cfg.Tbc = np.asarray(tbc, np.float32).reshape(4, 4)
        cfg.has_imu = True
    freq = get("IMU.Frequency")
    if freq is not None:
        cfg.has_imu = True
        cfg.imu_freq = float(freq)
        cfg.imu_noise_gyro = float(get("IMU.NoiseGyro", cfg.imu_noise_gyro))
        cfg.imu_noise_acc = float(get("IMU.NoiseAcc", cfg.imu_noise_acc))
        cfg.imu_gyro_walk = float(get("IMU.GyroWalk", cfg.imu_gyro_walk))
        cfg.imu_acc_walk = float(get("IMU.AccWalk", cfg.imu_acc_walk))
    fs.release()
    return cfg


def system_from_config(path: str, **kwargs):
    """Build a SlamSystem from a reference-style YAML (the reference
    System ctor path, src/System.cc:41-181)."""
    from ..models.system import SlamSystem
    cfg = load_config(path)
    cam_type = 1 if cfg.camera_type == "KannalaBrandt8" else 0
    K = cfg.K if cam_type == 0 else np.concatenate([cfg.K, cfg.D])
    sys = SlamSystem(K, cfg.D if cam_type == 0 else None,
                     (cfg.width, cfg.height),
                     n_features=cfg.n_features, bf=cfg.bf,
                     th_depth=cfg.th_depth, cam_type=cam_type, **kwargs)
    if cfg.K2 is not None and cfg.Tlr is not None:
        # two-camera fisheye rig (reference Camera2.* + Tlr)
        R_rl = cfg.Tlr[:3, :3].T
        t_rl = -R_rl @ cfg.Tlr[:3, 3]
        sys.set_fisheye_rig(cfg.K2, R_rl, t_rl,
                            lap_l=cfg.lapping1, lap_r=cfg.lapping2)
    if cfg.has_imu:
        sys.enable_imu(freq=cfg.imu_freq,
                       noise=(cfg.imu_noise_gyro, cfg.imu_noise_acc,
                              cfg.imu_gyro_walk, cfg.imu_acc_walk))
    return sys
