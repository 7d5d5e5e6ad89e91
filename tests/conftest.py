"""Test configuration: run everything on a simulated 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; per SURVEY.md §4 the
distributed code paths are exercised on a host-CPU mesh via
``--xla_force_host_platform_device_count=8``. Must run before jax imports.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    )
