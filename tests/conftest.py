"""Test configuration: run everything on a simulated 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; per SURVEY.md §4 the
distributed code paths are exercised on a host-CPU mesh. The ambient
environment eagerly initializes a tunneled single-chip TPU backend via
``sitecustomize`` (before this file runs), so env vars alone are too late —
we must switch the platform through jax's config and reset the backend
registry before requesting 8 CPU devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    import jax.extend.backend

    jax.extend.backend.clear_backends()
except Exception:
    pass
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # backend already CPU with forced device count via XLA_FLAGS
