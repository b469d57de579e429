"""Test configuration: run on CPU with 8 virtual devices (so sharding /
halo-exchange logic is testable without a TPU slice; SURVEY.md §4) and
float64 enabled (the accuracy bar is 1e-8 relative residual)."""
import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
