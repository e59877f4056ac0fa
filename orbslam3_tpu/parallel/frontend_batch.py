"""Multi-stream tracking frontend sharded over a device mesh.

The reference serves ONE camera rig per process (its parallelism is four
POSIX threads, SURVEY §2.3). The TPU-native scale-out for production serving
is the orthogonal direction: many concurrent SLAM sessions (robots / AR
clients / dataset shards), each frame-serial, batched so every chip runs the
identical fixed-shape frontend on its own stream shard — data parallelism
over SESSIONS, with zero collectives in the steady state (each stream's
state stays on its device; host code only routes inputs/outputs).

One step = ORB extraction → projection matching against the stream's map
shard → pose-only LM, i.e. the per-frame hot path of Tracking
(reference src/Tracking.cc GrabImageMonocular → Track), vmapped over the
stream axis and sharded over the mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import kernels
from ..ops import features as feat_ops
from ..ops import pose_opt


def make_batched_frontend(mesh: Mesh, h: int, w: int,
                          orb_cfg: feat_ops.OrbConfig | None = None,
                          n_mp: int = 4096, axis: str = "lm"):
    """Build a jitted multi-stream frontend step.

    Returns ``step(imgs, R0, t0, mp_xyz, mp_desc, mp_normal, mp_mind,
    mp_maxd, mp_valid, K) -> (R, t, n_inliers)`` where every array has a
    leading stream axis sharded over ``axis``. Per-stream shapes match the
    single-chip path; K is (S,4) per-stream intrinsics.
    """
    cfg = orb_cfg or feat_ops.OrbConfig(n_features=1024)
    cap = cfg.total_capacity
    proj_match = kernels.projection_matcher(0, cfg.n_levels, cfg.scale)
    wh = jnp.asarray([float(w), float(h)], jnp.float32)

    def one_stream(img, R0, t0, mp_xyz, mp_desc, mp_normal, mp_mind,
                   mp_maxd, mp_valid, K):
        feats = feat_ops.extract_orb(img, cfg)
        idx, ok, uv, lvl, frustum = proj_match(
            mp_xyz, mp_desc, mp_normal, mp_mind, mp_maxd, mp_valid,
            R0, t0, K, feats.xy, feats.desc, feats.octave, feats.valid, wh,
            jnp.asarray(8.0, jnp.float32), jnp.asarray(0.9, jnp.float32),
            jnp.asarray(100, jnp.int32), jnp.asarray(0.5, jnp.float32))
        pts = jnp.zeros((cap, 3), jnp.float32).at[idx].set(
            jnp.where(ok[:, None], mp_xyz, 0.0))
        valid = jnp.zeros((cap,), bool).at[idx].max(ok)
        inv_s2 = 1.0 / (cfg.scale ** (2.0 * feats.octave.astype(jnp.float32)))
        res = pose_opt.pose_optimize(R0, t0, pts, feats.xy, inv_s2, valid, K)
        return res.R, res.t, res.n_inliers

    vstep = jax.vmap(one_stream)
    shard = NamedSharding(mesh, P(axis))

    @functools.partial(jax.jit,
                       in_shardings=(shard,) * 10,
                       out_shardings=(shard, shard, shard))
    def step(imgs, R0, t0, mp_xyz, mp_desc, mp_normal, mp_mind, mp_maxd,
             mp_valid, K):
        return vstep(imgs, R0, t0, mp_xyz, mp_desc, mp_normal, mp_mind,
                     mp_maxd, mp_valid, K)

    return step
