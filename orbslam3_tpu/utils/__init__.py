"""Host-side utilities: datasets, evaluation, trajectory IO, config, timing."""


def ensure_backend():
    """Fall back to CPU when the default accelerator backend fails to
    initialize (the axon TPU tunnel claim is transient in this environment).
    Call before any jax computation."""
    import jax
    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")
