"""Test config: run on the CPU backend with 8 virtual devices.

Multi-chip sharding tests use a virtual 8-device CPU mesh; the real-TPU
benchmark path is exercised by `bench.py`, not the unit suite.

Note: the session environment may pre-set JAX_PLATFORMS to a hardware
plugin; plain os.environ assignment is not always honored, so we also
force the platform through jax.config before any backend initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
