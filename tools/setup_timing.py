#!/usr/bin/env python
"""Time BatchedSCS setup stages + first/second solve on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("B", "256"))
m = int(os.environ.get("M", "1500"))
n = int(os.environ.get("N", "1000"))

import jax

if os.environ.get("SETUP_CACHE"):
    jax.config.update("jax_compilation_cache_dir", os.environ["SETUP_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scs_tpu.batch import BatchedSCS
from scs_tpu.bench_cli import gen_batch_device

t0 = time.perf_counter()
A, P, b, c = gen_batch_device(B, m, n, seed=99)
print(f"gen: {time.perf_counter() - t0:.2f}s", flush=True)

t0 = time.perf_counter()
solver = BatchedSCS(
    {"A": A, "P": P, "b": b, "c": c},
    {"l": m},
    eps_abs=1e-4,
    eps_rel=1e-4,
    max_iters=20000,
    verbose=False,
)
print(
    f"setup: {time.perf_counter() - t0:.2f}s  {solver.setup_breakdown}",
    flush=True,
)

t0 = time.perf_counter()
res = solver.solve()
n_solved = sum(r["info"]["status"] == "solved" for r in res)
print(
    f"first solve (incl loop compile): {time.perf_counter() - t0:.2f}s "
    f"solved {n_solved}/{B}",
    flush=True,
)

t0 = time.perf_counter()
solver.reset()
print(f"reset (setup math, compiled): {time.perf_counter() - t0:.2f}s", flush=True)
t0 = time.perf_counter()
res = solver.solve()
print(f"second solve (compiled): {time.perf_counter() - t0:.2f}s", flush=True)
