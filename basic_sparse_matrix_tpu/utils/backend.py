"""Backend selection helpers.

Some deployment environments (tunneled single-chip TPUs) eagerly register
and initialise their PJRT plugin from ``sitecustomize`` — before any user
code runs — so ``JAX_PLATFORMS`` set later is ignored. Multi-device CPU
simulation then needs the config-level reset below.
"""

from __future__ import annotations


def force_cpu_devices(n: int = 8) -> int:
    """Switch jax to the CPU backend with ``n`` simulated devices, even if
    another backend was already initialised. Returns the device count."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        import jax.extend.backend

        jax.extend.backend.clear_backends()
    except Exception:
        pass
    try:
        jax.config.update("jax_num_cpu_devices", n)
    except Exception:
        pass  # backend already CPU (e.g. via XLA_FLAGS); keep as is
    return len(jax.devices())


def ensure_multidevice(minimum: int = 2, simulate: int = 8) -> int:
    """If the current backend exposes fewer than ``minimum`` devices, fall
    back to a simulated CPU mesh. Returns the device count."""
    import jax

    try:
        if len(jax.devices()) >= minimum:
            return len(jax.devices())
    except RuntimeError:
        # requested platform unavailable (e.g. JAX_PLATFORMS names a plugin
        # that isn't registered in this process) — fall through to CPU
        pass
    return force_cpu_devices(simulate)
