"""A/B the Schur-product matmul precision (VERDICT r4 Next #5).

Round 4 set jax_default_matmul_precision="highest" globally (needed: bf16
matmul passes corrupted tracking geometry on-chip), which regressed BA
iterations/s 15-20% — the Schur contractions in ops/ba.py are the solver's
only MXU-bound matmuls and pay a 6-pass f32 emulation. This script measures
iterations/s AND solution accuracy (pose/point deltas vs the highest-
precision run) for ORBSLAM3_BA_SCHUR_PRECISION in {highest, high} at the
BASELINE problem sizes. Run on the real TPU: python scripts/bench_ba_precision.py
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CHILD = r"""
import json, time, functools
import numpy as np
import jax, jax.numpy as jnp
import sys
sys.path.insert(0, %(repo)r)
from orbslam3_tpu.ops import ba as ba_ops
sys.path.insert(0, %(repo)r)
import importlib
bench = importlib.import_module("bench")

out = {}
for n_kf in (16, 64, 256):
    prob, K = bench._make_ba_problem(n_kf)
    solve = jax.jit(functools.partial(ba_ops.local_ba, cam_type=0,
                                      chi2_th=ba_ops.CHI2_MONO),
                    static_argnames=("iters1", "iters2"))
    res = solve(prob, K, iters1=10, iters2=0)
    jax.block_until_ready(res)
    t0 = time.perf_counter()
    for _ in range(3):
        res = solve(prob, K, iters1=10, iters2=0)
    jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / 3
    out[f"K{n_kf}"] = {
        "iters_per_s": round(10 / dt, 1),
        "t_mean": float(np.mean(np.asarray(res.t))),
        "chi2": float(np.asarray(res.chi2)),
        "pts_sum": float(np.sum(np.abs(np.asarray(res.pts)))),
    }
print("RESULT " + json.dumps(out))
"""


def run(prec):
    env = dict(os.environ, ORBSLAM3_BA_SCHUR_PRECISION=prec)
    p = subprocess.run([sys.executable, "-c", CHILD % {"repo": REPO}],
                       capture_output=True, text=True, env=env, timeout=1200)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            import json
            return json.loads(line[7:])
    print(p.stdout[-2000:], p.stderr[-2000:])
    raise RuntimeError(f"no result for {prec}")


def main():
    hi = run("highest")
    md = run("high")
    print(f"{'K':>6} {'highest it/s':>14} {'high it/s':>12} {'speedup':>8} "
          f"{'chi2 rel-diff':>14}")
    for k in hi:
        a, b = hi[k], md[k]
        rel = abs(a["chi2"] - b["chi2"]) / max(abs(a["chi2"]), 1e-9)
        print(f"{k:>6} {a['iters_per_s']:>14} {b['iters_per_s']:>12} "
              f"{b['iters_per_s']/a['iters_per_s']:>8.2f} {rel:>14.2e}")


if __name__ == "__main__":
    main()
