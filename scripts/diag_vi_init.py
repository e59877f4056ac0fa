"""Diagnose why try_imu_init fails on the mono-inertial E2E fixture."""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from orbslam3_tpu.models.system import SlamSystem
from orbslam3_tpu.ops import lie
from orbslam3_tpu.utils.datasets import RoomScene

G_W = np.array([0.0, 9.81, 0.0])
FPS = 20.0
IMU_HZ = 200


def pose_at(x, radius=0.6, forward=0.03, yaw_rate=0.003):
    c = np.array([radius * np.sin(0.04 * x), 0.15 * np.sin(0.02 * x), forward * x])
    yaw = yaw_rate * x
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
        gyro[i] = np.asarray(lie.so3_log(jnp.asarray(dRm.astype(np.float32)))) / dt
    acc = np.einsum("nji,nj->ni", R_wb[:-1], a_w[:-1] - G_W[None])
    ts = (np.arange(n_steps) + 1) * dt
    return ts, gyro.astype(np.float32), acc.astype(np.float32)


def main(n_frames=40):
    scene = RoomScene(seed=4, depth=6.0, half_w=4.0, half_h=2.5)
    imu_ts, gyro, acc = make_imu(n_frames)
    sys = SlamSystem(scene.K, None, (scene.w, scene.h), n_features=512, seed=0,
                     enable_loop_closing=False)
    sys.enable_imu(freq=IMU_HZ)
    tr = sys.tracker

    orig = tr.try_imu_init

    def instrumented(min_kfs=8, **kw):
        m = tr.map
        kfs = [int(k) for k in m.valid_kf_ids()]
        chain0 = [k for k in kfs if k in tr.kf_preints or k == kfs[0]]
        contig = [True] * len(chain0)
        for i in range(1, len(chain0)):
            dt_kf = float(m.kf_ts[chain0[i]] - m.kf_ts[chain0[i - 1]])
            contig[i] = abs(float(tr.kf_preints[chain0[i]].dT) - dt_kf) < 0.015
        ok = orig(min_kfs=min_kfs, **kw)
        print(f"  try_imu_init(kw={kw}): nkf={len(kfs)} chain0={len(chain0)} "
              f"contig={sum(contig)}/{len(contig)} -> {ok}")
        return ok

    tr.try_imu_init = instrumented
    per = IMU_HZ // int(FPS)
    for i in range(n_frames):
        R, t = pose_at(i)
        img = scene.render(R, t)
        s0, s1 = (i - 1) * per, i * per
        if i == 0:
            s0 = 0; s1 = 0
        sys.track_monocular_inertial(
            img, ts=i / FPS, imu_ts=imu_ts[s0:s1], imu_gyro=gyro[s0:s1],
            imu_acc=acc[s0:s1])
        if i % 5 == 0 or i == n_frames - 1:
            print(f"frame {i}: state={sys.state.name} nKF={len(sys.map.valid_kf_ids())} "
                  f"imu_init={tr.imu_initialized}")
    print("stats:", sys.stats())


if __name__ == "__main__":
    main()
