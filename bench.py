"""Benchmark: tracking-frontend throughput per chip.

Measures the steady-state per-frame hot path of the SLAM pipeline on the
default JAX device (the real TPU under the driver): ORB pyramid extraction
(FAST + orientation + BRIEF) + projection matching against a 4096-point map
+ pose-only LM optimization — the work the reference does per frame on CPU
(reference src/Tracking.cc GrabImageMonocular → Track, real-time contract
20 fps, BASELINE.md).

Prints ONE JSON line: frames/s/chip with vs_baseline against the reference's
20 fps real-time target.
"""
import json
import time

import numpy as np


def main():
    import os
    import sys
    import jax
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        # The axon TPU claim happens once at interpreter start (sitecustomize)
        # and fails transiently under tunnel grant contention — retrying
        # in-process cannot help, so re-exec the whole interpreter a few
        # times before falling back to CPU (the JSON line must always print).
        tries = int(os.environ.get("BENCH_TPU_RETRY", "0"))
        if tries < 3:
            time.sleep(30)
            os.environ["BENCH_TPU_RETRY"] = str(tries + 1)
            os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)])
        jax.config.update("jax_platforms", "cpu")
        platform = jax.devices()[0].platform
    import jax.numpy as jnp
    from orbslam3_tpu.ops import features, pose_opt
    from orbslam3_tpu.models import kernels

    h, w = 480, 752
    cfg = features.OrbConfig(n_features=1024)  # EuRoC-class budget
    cap = cfg.total_capacity
    K = jnp.asarray([458.654, 457.296, 376.0, 240.0], jnp.float32)
    wh = jnp.asarray([float(w), float(h)], jnp.float32)
    n_mp = 4096

    proj_match = kernels.projection_matcher(0, cfg.n_levels, cfg.scale)

    @jax.jit
    def frame_step(img, R0, t0, mp_xyz, mp_desc, mp_normal, mp_mind, mp_maxd, mp_valid):
        feats = features.extract_orb(img, cfg)
        idx, ok, uv, lvl, frustum = proj_match(
            mp_xyz, mp_desc, mp_normal, mp_mind, mp_maxd, mp_valid, R0, t0, K,
            feats.xy, feats.desc, feats.octave, feats.valid, wh,
            jnp.asarray(8.0, jnp.float32), jnp.asarray(0.9, jnp.float32),
            jnp.asarray(100, jnp.int32), jnp.asarray(0.5, jnp.float32))
        pts = jnp.zeros((cap, 3), jnp.float32).at[idx].set(
            jnp.where(ok[:, None], mp_xyz, 0.0))
        valid = jnp.zeros((cap,), bool).at[idx].max(ok)
        inv_s2 = 1.0 / (1.2 ** (2.0 * feats.octave.astype(jnp.float32)))
        res = pose_opt.pose_optimize(R0, t0, pts, feats.xy, inv_s2, valid, K)
        return res.R, res.t, res.n_inliers

    rng = np.random.default_rng(0)
    imgs = [jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
            for _ in range(4)]
    R0 = jnp.eye(3, dtype=jnp.float32)
    t0 = jnp.zeros(3, jnp.float32)
    mp_xyz = jnp.asarray(rng.uniform([-4, -3, 5], [4, 3, 15], (n_mp, 3)).astype(np.float32))
    mp_desc = jnp.asarray(rng.integers(0, 2**32, (n_mp, 8), dtype=np.uint32))
    mp_normal = jnp.asarray(np.tile([0, 0, -1.0], (n_mp, 1)).astype(np.float32))
    mp_mind = jnp.full((n_mp,), 0.5, jnp.float32)
    mp_maxd = jnp.full((n_mp,), 50.0, jnp.float32)
    mp_valid = jnp.ones((n_mp,), bool)
    args = (R0, t0, mp_xyz, mp_desc, mp_normal, mp_mind, mp_maxd, mp_valid)

    # compile + warm up
    jax.block_until_ready(frame_step(imgs[0], *args))
    for im in imgs:
        jax.block_until_ready(frame_step(im, *args))

    n_iter = 30
    t0_ = time.perf_counter()
    for i in range(n_iter):
        out = frame_step(imgs[i % len(imgs)], *args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0_) / n_iter
    fps = 1.0 / dt
    baseline_fps = 20.0  # reference real-time contract (BASELINE.md)
    print(json.dumps({
        "metric": "tracking_frontend_frames_per_second_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
        "platform": platform,
    }))


if __name__ == "__main__":
    main()
