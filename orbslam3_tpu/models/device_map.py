"""Device-resident mirror of the map-point pool.

The reference keeps its map in CPU pointer graphs and every consumer walks
them in place (include/MapPoint.h, include/Map.h). Here the host ``MapState``
stays the source of truth for bookkeeping, but the numerical per-point state
that tracking kernels consume every frame — position, descriptor, normal,
scale range, validity — is mirrored ON DEVICE and refreshed only when the map
actually mutates (``MapState.device_version``). Per-frame device work then
uploads only small id lists and gathers from the resident pool, instead of
re-uploading gathered arrays each frame (under the remote-TPU tunnel each
host→device transfer costs ~1 ms and each device→host ~5 ms; round 2 spent
~300 ms/frame on exactly this).

Packing layout (two buffers so one upload each):
- ``mpf`` (P, 8) float32: xyz (3), normal (3), min_dist, max_dist
- ``mpu`` (P, 9) uint32:  desc (8), valid (1)
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _bucket(n: int, lo: int = 4096) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


class DeviceMapMirror:
    """Mirrors one MapState's point pool on the default device."""

    def __init__(self):
        self._map_ref = None
        self._ver = -1
        self._cap = 0
        self.mpf = None   # (P,8) f32
        self.mpu = None   # (P,9) u32

    def invalidate(self):
        self._ver = -1
        self._map_ref = None

    def sync(self, m) -> tuple:
        """Return (mpf, mpu) device buffers for ``m``, uploading only if the
        map mutated since the last sync (or the mirror tracked another map)."""
        ver = getattr(m, "device_version", None)
        if ver is None:
            ver = -2  # MapState without versioning: upload every time
        if (self._map_ref is m and ver >= 0 and ver == self._ver
                and self._cap >= m.n_mp):
            return self.mpf, self.mpu
        n = m.n_mp
        cap = self._cap if (self._map_ref is m and self._cap >= n and
                            self._cap > 0) else _bucket(max(n, 1))
        f = np.zeros((cap, 8), np.float32)
        u = np.zeros((cap, 9), np.uint32)
        f[:n, 0:3] = m.mp_xyz[:n]
        f[:n, 3:6] = m.mp_normal[:n]
        f[:n, 6] = m.mp_min_dist[:n]
        f[:n, 7] = np.maximum(m.mp_max_dist[:n], 1e-6)
        u[:n, 0:8] = m.mp_desc[:n]
        u[:n, 8] = m.mp_valid[:n]
        self.mpf = jnp.asarray(f)
        self.mpu = jnp.asarray(u)
        self._cap = cap
        self._map_ref = m
        self._ver = ver
        return self.mpf, self.mpu
