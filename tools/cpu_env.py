"""Import first in experiment scripts to force the CPU backend.

The axon TPU plugin registers itself regardless of JAX_PLATFORMS, so the
env var alone does not stick; jax.config does (same mechanism as
tests/conftest.py).
"""

import os

os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
