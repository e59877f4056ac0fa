"""Multi-chip scaling: mesh construction + landmark-sharded bundle adjustment."""
