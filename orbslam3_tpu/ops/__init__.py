"""Device-side compute kernels (JAX/XLA/Pallas). All fixed-shape, batched, functional."""
