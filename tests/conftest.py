"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require real TPU hardware; multi-chip sharding tests run on
virtual CPU devices (JAX_PLATFORMS=cpu + xla_force_host_platform_device_count).
The axon sitecustomize registers a TPU backend at interpreter start and sets
jax_platforms='axon,cpu'; override it back to cpu before any backend init.
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    The XLA:CPU backend segfaults inside LLVM codegen once a single process
    has accumulated enough large compiled programs (reproduced
    deterministically: the 29th test's first extractor compile crashes after
    the first 28 tests' compilations, regardless of codegen threading).
    Clearing the jit caches per module keeps the compiler healthy; modules
    recompile what they share (a few seconds each)."""
    yield
    import gc
    import jax
    jax.clear_caches()
    gc.collect()


def dense_tracking_params(**kw):
    """Tracking params for the short synthetic fixtures: their per-frame
    motion is much larger than a real 20 fps camera's and rendered features
    don't churn the way real ones do, so the reference c2 condition rarely
    fires — pin a fixed 5-frame keyframe cadence instead (the effective
    density the reference reaches on real imagery)."""
    from orbslam3_tpu.models.tracking import TrackingParams
    kw.setdefault("kf_interval_override", 5)
    return TrackingParams(**kw)
