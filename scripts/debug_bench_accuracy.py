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
    import time
    import jax
    print("backend:", jax.default_backend(), jax.devices())
    traj = os.environ.get("DBG_TRAJ", "orbit")
    mode = os.environ.get("DBG_MAPPING", "sync")
    print("traj:", traj, " mapping:", mode)
    scene = RoomScene(seed=1, n_clutter=4)
    if traj == "walk":
        from orbslam3_tpu.utils.datasets import walk_trajectory
        poses = walk_trajectory(n_frames, period=280)
    else:
        poses = orbit_trajectory(n_frames, radius=1.0, forward=0.0)
    imgs = [scene.render(R, t) for (R, t) in poses]
    slam = SlamSystem(scene.K, None, (scene.w, scene.h), n_features=1024,
                      seed=0, mapping_mode=mode,
                      tracking_params=TrackingParams(
                          kf_interval_override=kf_int, pipeline=pipeline))
    gt = np.array([-R.T @ t for (R, t) in poses])
    dump_at = int(os.environ.get("DBG_DUMP_AT", "0"))
    for i, (R, t) in enumerate(poses):
        if dump_at and i == dump_at:
            import faulthandler
            print(f"=== thread stacks at frame {i} ===", flush=True)
            faulthandler.dump_traceback()
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
            q = (len(slam.runtime.kf_queue)
                 if slam.runtime is not None else -1)
            print(f"f{i+1:4d} state={slam.state.name:6s} "
                  f"kf={st['n_keyframes']:3d} mp={st['n_map_points']:5d} "
                  f"culled_kf={st.get('culled_kf', 0):3d} "
                  f"culled_mp={st.get('culled_mp', 0):5d} "
                  f"lost={int(lost.sum()):3d} q={q} "
                  f"merr={st.get('mapper_errors', 0)}"
                  f"{' LAST:' + str(st.get('last_mapper_error'))[:120] if st.get('mapper_errors') else ''} "
                  f"ate={ate}")
    lc = {k: v for k, v in slam.stats().items() if k.startswith(("loops", "lc"))}
    print("loop stats:", lc)
    print("kf ids:", slam.map.valid_kf_ids())


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    main(n)
