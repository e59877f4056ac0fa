"""orbslam3_tpu — a TPU-native visual / visual-inertial / multi-map SLAM framework.

A from-scratch rebuild of the capability surface of ORB-SLAM3 (reference:
/root/reference, UZ-SLAMLab ORB-SLAM3 V0.4 fork) designed TPU-first:

- Device compute is fixed-shape, batched, functional JAX/XLA (+ Pallas kernels
  for hot ops); the host runs the asynchronous SLAM state machine.
- The reference's pointer-graph map model (KeyFrame/MapPoint objects,
  covisibility graph) becomes masked structure-of-arrays pools with static
  capacities, so every algorithm (matching, triangulation, bundle adjustment,
  pose-graph optimization) is a jitted kernel over dense arrays.
- g2o is replaced by our own Gauss-Newton / Levenberg-Marquardt solvers with
  block-sparse Schur complement (`ops/ba.py`), DBoW2 by an array-form binary
  vocabulary (`ops/vocab.py`), and the ORB extractor by batched pyramid
  FAST+BRIEF kernels (`ops/features.py`).
- Multi-chip scaling shards map points (landmark Schur blocks) over a
  `jax.sharding.Mesh` (`parallel/`), with `psum`/`reduce_scatter` reductions
  for the pose system — the TPU-native analogue of the reference's
  thread-level pipeline (reference src/System.cc:135-161).
"""

__version__ = "0.1.0"

# SLAM geometry (pose LM, triangulation, Schur BA) is numerically fragile:
# TPU matmuls default to bfloat16 passes whose ~8-bit mantissa silently
# corrupts normal equations and projection chains — measured on-chip as a
# tracking failure at frame ~75 of the 120-frame bench orbit (ATE 0.04→0.63)
# that CPU float32 does not exhibit. All matmuls here are small (≤ a few K
# rows × 3-9 cols), nowhere near MXU-bound, so full-f32 accumulation costs
# nothing measurable; the FLOP-heavy kernels (Hamming matching, FAST) are
# integer/boolean and unaffected by this setting.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
