"""Fused + pipelined visual-inertial tracking (VERDICT r4 Missing #1).

After IMU initialization the per-frame hot path must remain ONE fused
dispatch (kernels.fused_track_vi_pooled: PredictStateIMU + both matching
stages + the 15-dim pose-inertial solve in a single device call), matching
the reference running its full VI pipeline inside the frame budget
(reference src/Tracking.cc:1794-2479, src/Optimizer.cc:7785). Fixture =
the bench's bounded walk (stereo-inertial, the BASELINE.json north-star
config) — stereo fixes scale so the IMU initializes fast and the walk never
leaves the scene.
"""
import gc

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orbslam3_tpu.models.system import SlamSystem
from orbslam3_tpu.models.tracking import TrackingParams
from orbslam3_tpu.ops import lie
from orbslam3_tpu.utils.datasets import RoomScene
from orbslam3_tpu.utils.evaluation import evaluate_trajectory

G_W = np.array([0.0, 9.81, 0.0])
FPS = 20.0
IMU_HZ = 200
PERIOD = 96.0
B = 0.11

# ~13 min on the 2-core CPU mesh (three 64-80-frame stereo-inertial runs +
# the suite's largest kernel compiles) — excluded from the fast profile;
# the VI e2e subsystem keeps default-profile coverage via test_e2e_inertial
pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _clear_jax_caches_each_test():
    """The fused VI kernel is among the largest compiles in the suite; the
    XLA:CPU LLVM backend segfaults once a process accumulates enough large
    programs (see tests/conftest.py) — per-TEST clearing keeps this module
    under the threshold."""
    yield
    jax.clear_caches()
    gc.collect()


def pose_at(x):
    """Continuous walk (walk_trajectory's formula at fractional frames)."""
    ph = 2 * np.pi * (x % PERIOD) / PERIOD
    c = np.array([2.2 * np.sin(ph), 0.5 * np.sin(2 * ph),
                  2.0 + 1.1 * np.cos(ph)])
    yaw = 0.25 * np.sin(ph + 0.7)
    cy, sy = np.cos(yaw), np.sin(yaw)
    R_wc = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    return R_wc.T, -R_wc.T @ c


def make_imu(n_frames):
    dt = 1.0 / IMU_HZ
    n_steps = int(n_frames * IMU_HZ / FPS)
    xs = np.arange(n_steps + 1) * (FPS / IMU_HZ)
    poses = [pose_at(x) for x in xs]
    R_wb = np.stack([R.T for R, t in poses])
    p = np.stack([-R.T @ t for R, t in poses])
    v = np.gradient(p, dt, axis=0)
    a_w = np.gradient(v, dt, axis=0)
    gyro = np.zeros((n_steps, 3))
    for i in range(n_steps):
        dRm = R_wb[i].T @ R_wb[i + 1]
        gyro[i] = np.asarray(
            lie.so3_log(jnp.asarray(dRm.astype(np.float32)))) / dt
    acc = np.einsum("nji,nj->ni", R_wb[:-1], a_w[:-1] - G_W[None])
    ts = (np.arange(n_steps) + 1) * dt
    return ts, gyro.astype(np.float32), acc.astype(np.float32)


def _run(n_frames, pipeline, fused):
    scene = RoomScene(seed=1, n_clutter=4)
    imu_ts, gyro, acc = make_imu(n_frames)
    sys = SlamSystem(scene.K, None, (scene.w, scene.h), n_features=512,
                     seed=0, bf=B * scene.K[0], th_depth=40.0,
                     tracking_params=TrackingParams(kf_interval_override=5,
                                                    pipeline=pipeline),
                     enable_loop_closing=False)
    sys.enable_imu(freq=IMU_HZ)
    sys.tracker.use_fused_track = fused
    per = IMU_HZ // int(FPS)
    gt = []
    for i in range(n_frames):
        R, t = pose_at(float(i))
        il = scene.render(R, t)
        Rr, tr = scene.stereo_pose(R, t, B)
        ir = scene.render(Rr, tr)
        s0, s1 = (i - 1) * per, i * per
        if i == 0:
            s0 = s1 = 0
        sys.track_stereo_inertial(
            il, ir, ts=i / FPS, imu_ts=imu_ts[s0:s1], imu_gyro=gyro[s0:s1],
            imu_acc=acc[s0:s1])
        gt.append(-R.T @ t)
    sys.tracker.flush_pending()
    return sys, np.array(gt)


def _metric_ate(sys, gt, n_frames):
    ts, R_wc, t_wc, lost = sys.export_trajectory()
    sel = ~lost
    assert sel.sum() > n_frames * 3 // 4, int(lost.sum())
    ate, n = evaluate_trajectory(np.arange(n_frames) / FPS, gt,
                                 ts[sel], t_wc[sel], with_scale=False)
    assert n > n_frames * 3 // 4
    return float(ate)


def test_fused_vi_pipeline_tracks_to_end():
    """Pipelined fused-VI run: IMU initializes, the fused VI path carries
    the post-init frames, and metric (no-scale-alignment) ATE stays tight."""
    n_frames = 80
    sys, gt = _run(n_frames, pipeline=True, fused=True)
    assert sys.tracker.imu_initialized, sys.stats()
    ate = _metric_ate(sys, gt, n_frames)
    # fixture floor: the staged cascade scores ~0.30 metric on this walk at
    # the 512-feature budget; the fused-VI pipeline measures ~0.22 (better —
    # the in-kernel 15-dim prior is carried every frame). Bound = staged
    # floor with headroom, not a precision claim.
    assert ate < 0.35, (ate, sys.stats())
    pc = sys.tracker.path_counts
    # the fused path must carry the run, and the VI variant must have fired
    # for a solid share of the post-init frames
    assert pc["fused"] > n_frames // 2, pc
    assert pc["fused_vi"] > 10, pc


def test_fused_vi_matches_staged_quality():
    """Fused-VI accuracy within a small factor of the staged cascade on the
    same sequence (same fixture, fused on/off)."""
    n_frames = 64
    sys_f, gt = _run(n_frames, pipeline=False, fused=True)
    sys_s, _ = _run(n_frames, pipeline=False, fused=False)
    assert sys_f.tracker.imu_initialized and sys_s.tracker.imu_initialized
    a_f = _metric_ate(sys_f, gt, n_frames)
    a_s = _metric_ate(sys_s, gt, n_frames)
    assert a_f < max(1.5 * a_s, 0.15), (a_f, a_s)
