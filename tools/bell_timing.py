#!/usr/bin/env python
"""Time the bell (Pallas block-ELL) path end-to-end on the chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy import sparse as sp

import scs_tpu

from scs_tpu.bench_cli import gen_bell_lp


if os.environ.get("BELL_CACHE"):
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["BELL_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

m = int(os.environ.get("M", "600"))
n = int(os.environ.get("N", "400"))
density = float(os.environ.get("DENSITY", "0.01"))
eps = float(os.environ.get("EPS", "1e-5"))

prob = gen_bell_lp(m, n, density, seed=7)
t0 = time.perf_counter()
sol = scs_tpu.solve(
    prob, {"l": m}, solver_strategy="bell", bell_block_size=128,
    eps_abs=eps, eps_rel=eps, verbose=False, max_iters=50000,
)
total = time.perf_counter() - t0
i = sol["info"]
print(
    f"bell {m}x{n} d={density}: {i['status']} in {i['iter']} iters, "
    f"total {total:.2f}s (setup {i['setup_time']:.2f}s solve "
    f"{i['solve_time']:.2f}s), pobj {i['pobj']:.6f}"
)
