#!/usr/bin/env python
"""Diagnose the XLA:TPU compile-time wall (VERDICT r3 item 1).

Times `jax.jit(...).lower().compile()` for the batched-init monolith and
each of its stages separately, at a configurable batch size, so we can
see which sub-program owns the >280 s compile and whether splitting
fixes it. Run with COMPILE_DIAG_B=32 (etc.) to scale the batch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

B = int(os.environ.get("COMPILE_DIAG_B", "32"))
m = int(os.environ.get("COMPILE_DIAG_M", "1500"))
n = int(os.environ.get("COMPILE_DIAG_N", "1000"))

from scs_tpu.cones import ConeSpec
from scs_tpu.settings import Settings
from scs_tpu.solver import Mats, _hp, get_core


def timed_compile(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(_hp(fn)).lower(*args)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"{name:32s} lower {t_lower:7.2f}s  compile {t_compile:7.2f}s")


def main():
    stg = Settings.from_kwargs(
        verbose=False,
        direct_solver="inverse",
        rescale_in_chunk=False,
        lin_refine_steps=0,
        check_interval=50,
        eps_abs=1e-4,
        eps_rel=1e-4,
    )
    spec = ConeSpec.from_dict({"l": m})
    core = get_core(m, n, True, spec, stg)
    dtype = jnp.float32

    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.standard_normal((B, m, n)), dtype) / np.sqrt(m)
    P = jnp.zeros((B, n, n), dtype) + jnp.eye(n, dtype=dtype) * 1e-2
    bn = jnp.asarray(rng.standard_normal((B, m)), dtype)
    cn = jnp.asarray(rng.standard_normal((B, n)), dtype)
    ones_m = jnp.ones((B, m), dtype)
    ones_n = jnp.ones((B, n), dtype)
    one = jnp.ones((B,), dtype)
    mats = Mats(
        A=A, P=P, bn=bn, cn=cn,
        bl=jnp.zeros((B, 0), dtype), bu=jnp.zeros((B, 0), dtype),
        D=ones_m, E=ones_n, sc_b=one, sc_c=one, norm_b=one, norm_c=one,
    )

    which = os.environ.get("COMPILE_DIAG_WHICH", "all")

    def stage_factorize(mats):
        scale = jnp.asarray(stg.scale, dtype)
        return core._factorize(mats, scale)

    def stage_g(mats, L):
        scale = jnp.asarray(stg.scale, dtype)
        return core._compute_g(mats, scale, L)

    def stage_fresh(mats, L, gx, gy):
        scale = jnp.asarray(stg.scale, dtype)
        return core._fresh_state(L, gx, gy, scale)

    if which in ("all", "stages"):
        timed_compile("vmap(factorize)", jax.vmap(stage_factorize), mats)
        L = jax.vmap(stage_factorize)(mats)
        timed_compile("vmap(compute_g)", jax.vmap(stage_g), mats, L)
        gx, gy = jax.vmap(stage_g)(mats, L)
        timed_compile(
            "vmap(fresh_state)", jax.vmap(stage_fresh), mats, L, gx, gy
        )
    if which in ("all", "monolith"):
        timed_compile("vmap(_init_pure) MONOLITH", jax.vmap(core._init_pure), mats)


if __name__ == "__main__":
    main()
