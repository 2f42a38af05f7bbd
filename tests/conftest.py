"""Test configuration: run the suite on CPU with 8 virtual devices.

Multi-chip sharding tests follow SURVEY.md §7 step 8: an 8-device CPU mesh
(xla_force_host_platform_device_count) stands in for a TPU slice. The axon
TPU plugin registers itself in sitecustomize before pytest starts, so we
flip the platform via jax.config (must happen before any backend use).
"""

import os

os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
