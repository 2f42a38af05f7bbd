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

# Persistent XLA compilation cache: the suite compiles hundreds of tiny
# distinct programs (every (shape, settings) pair is its own compiled
# core); caching them across runs cuts repeat suite time several-fold.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.scs_tpu_jax_cache_cpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: full-depth sweeps and other long runs; excluded from the "
        "default (CI-budget) tier — run with SCS_TPU_SLOW=1 to include",
    )


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (VERDICT r2 item 7): the default run stays inside a
    ~5-minute single-process budget; SCS_TPU_SLOW=1 runs everything
    (documented in README: `SCS_TPU_SLOW=1 python -m pytest tests/`)."""
    if os.environ.get("SCS_TPU_SLOW") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow tier (set SCS_TPU_SLOW=1 to run the full suite)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The suite compiles hundreds of distinct XLA CPU programs; with all of
    them kept live in one process, a late shard_map compilation segfaults
    inside XLA (reproducible at tests/test_sharding.py when the FULL suite
    runs in one process, absent when the module runs alone). Bounding the
    live-executable population avoids the crash and caps memory; tests
    recompile transparently."""
    yield
    jax.clear_caches()
    # compiled cores cache jitted callables; drop them with the caches
    from scs_tpu import solver as _solver
    from scs_tpu.ops import projections as _proj

    _solver._CORE_CACHE.clear()
    _proj._PROJECTOR_CACHE.clear()
