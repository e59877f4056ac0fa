"""Instrumented reproduction of the bench 120-frame orbit accuracy collapse.

Prints map size / ATE-so-far / tracker state every 10 frames, plus cull
counters, to localize where the map degenerates (VERDICT r3 Weak #2).
Run: JAX_PLATFORMS=cpu python scripts/debug_bench_accuracy.py [n_frames]
"""
import os
import sys
import time

import numpy as np


def _claim_tpu():
    import jax
    try:
        jax.devices()
    except RuntimeError:
        tries = int(os.environ.get("BENCH_TPU_RETRY", "0"))
        if tries < 6:
            time.sleep(45)
            os.environ["BENCH_TPU_RETRY"] = str(tries + 1)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        jax.config.update("jax_platforms", "cpu")


if os.environ.get("JAX_PLATFORMS", "") != "cpu":
    _claim_tpu()

from orbslam3_tpu.models.system import SlamSystem
from orbslam3_tpu.models.tracking import TrackingParams
from orbslam3_tpu.utils.datasets import RoomScene, orbit_trajectory
from orbslam3_tpu.utils.evaluation import evaluate_trajectory


def main(n_frames=120, pipeline=True, kf_int=5, redundancy=0.9):
    import jax
    print("backend:", jax.default_backend(), jax.devices())
    scene = RoomScene(seed=1, n_clutter=4)
    poses = orbit_trajectory(n_frames, radius=1.0, forward=0.0)
    imgs = [scene.render(R, t) for (R, t) in poses]
    slam = SlamSystem(scene.K, None, (scene.w, scene.h), n_features=1024,
                      seed=0,
                      tracking_params=TrackingParams(
                          kf_interval_override=kf_int, pipeline=pipeline))
    gt = np.array([-R.T @ t for (R, t) in poses])
    for i, (R, t) in enumerate(poses):
        info = slam.track_monocular(imgs[i], ts=float(i) / 20.0)
        if (i + 1) % 10 == 0:
            slam.tracker.flush_pending()
            st = slam.stats()
            ts, R_wc, t_wc, lost = slam.export_trajectory()
            sel = ~lost
            ate = None
            if sel.sum() > 5:
                try:
                    ate, n_assoc = evaluate_trajectory(
                        np.arange(i + 1) / 20.0, gt[: i + 1], ts[sel],
                        t_wc[sel], with_scale=True)
                except Exception as e:
                    ate = f"err:{e!r}"
            print(f"f{i+1:4d} state={slam.state.name:6s} "
                  f"kf={st['n_keyframes']:3d} mp={st['n_map_points']:5d} "
                  f"culled_kf={st.get('culled_kf', 0):3d} "
                  f"culled_mp={st.get('culled_mp', 0):5d} "
                  f"lost={int(lost.sum()):3d} ate={ate}")
    lc = {k: v for k, v in slam.stats().items() if k.startswith(("loops", "lc"))}
    print("loop stats:", lc)
    print("kf ids:", slam.map.valid_kf_ids())


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    main(n)
