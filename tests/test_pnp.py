import numpy as np
import jax.numpy as jnp

from orbslam3_tpu.ops import lie, pnp


def test_pnp_ransac_recovers_pose_with_outliers():
    rng = np.random.default_rng(0)
    n = 120
    xw = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                   rng.uniform(5, 15, n)], -1).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray([0.3, -0.5, 0.2], jnp.float32)))
    t = np.array([0.5, -0.3, 1.0], np.float32)
    xc = xw @ R.T + t
    rays = (xc / xc[:, 2:3]).astype(np.float32)
    rays[:, :2] += rng.normal(0, 0.5 / 458.0, (n, 2))  # 0.5 px noise
    # 25% outliers
    out = rng.choice(n, n // 4, replace=False)
    rays[out, :2] += rng.uniform(0.05, 0.2, (len(out), 2))

    rand = rng.integers(0, n, (256, 6)).astype(np.int32)
    res = pnp.pnp_ransac(jnp.asarray(xw), jnp.asarray(rays), jnp.ones(n, bool),
                         jnp.asarray(rand), jnp.ones(n, jnp.float32))
    assert bool(res.success)
    assert np.abs(np.asarray(res.R) - R).max() < 0.02, np.asarray(res.R) - R
    assert np.abs(np.asarray(res.t) - t).max() < 0.15, np.asarray(res.t)
    assert int(res.n_inliers) > 0.6 * (n - len(out))
    # injected outliers mostly rejected
    assert np.asarray(res.inliers)[out].mean() < 0.2


def test_pnp_fails_on_garbage():
    rng = np.random.default_rng(1)
    n = 60
    xw = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    rays = np.concatenate([rng.uniform(-0.5, 0.5, (n, 2)),
                           np.ones((n, 1))], -1).astype(np.float32)
    rand = rng.integers(0, n, (128, 6)).astype(np.int32)
    res = pnp.pnp_ransac(jnp.asarray(xw), jnp.asarray(rays), jnp.ones(n, bool),
                         jnp.asarray(rand), jnp.ones(n, jnp.float32))
    assert not bool(res.success)
