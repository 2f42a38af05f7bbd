#!/usr/bin/env python
"""On-TPU smoke test: every flagship path at DEFAULT settings.

Round 2 shipped two paths that crashed on real hardware at defaults
while the CPU suite stayed green (VERDICT r2). This script is the guard:
one direct solve, one bell solve, one batched solve — all at default
settings on whatever backend `import scs_tpu` lands on (the real chip
when run plainly from the repo root).

Usage: python tools/tpu_smoke.py          (~1-2 min cold, seconds warm)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from scipy import sparse as sp


def main():
    from scs_tpu.bench_cli import _enable_compile_cache

    _enable_compile_cache()
    import jax

    import scs_tpu

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    rng = np.random.RandomState(0)

    # 1) direct single solve, defaults (only verbose off + bounded iters)
    m, n = 120, 80
    A = rng.randn(m, n) / np.sqrt(m)
    b = A @ rng.randn(n) + np.abs(rng.randn(m))
    c = -(A.T @ np.abs(rng.randn(m)))
    t0 = time.perf_counter()
    sol = scs_tpu.solve(
        {"A": sp.csc_matrix(A), "b": b, "c": c}, {"l": m},
        verbose=False, max_iters=10000,
    )
    assert sol["info"]["status"] == "solved", sol["info"]["status"]
    print(
        f"direct: solved in {sol['info']['iter']} iters "
        f"({time.perf_counter() - t0:.1f}s)"
    )

    # 2) bell solve at DEFAULT dtype (the round-2 on-chip crash case)
    mb, nb = 600, 400
    Ab = sp.random(mb, nb, density=0.01, random_state=rng, format="csc")
    Ab = Ab + sp.eye(mb, nb, format="csc")
    bb = Ab @ rng.randn(nb) + np.abs(rng.randn(mb))
    cb = -(Ab.T @ np.abs(rng.randn(mb)))
    t0 = time.perf_counter()
    sol = scs_tpu.solve(
        {"A": sp.csc_matrix(Ab), "b": bb, "c": cb}, {"l": mb},
        solver_strategy="bell", verbose=False, max_iters=20000,
    )
    assert sol["info"]["status"] in ("solved", "solved_inaccurate"), (
        sol["info"]["status"]
    )
    print(
        f"bell: {sol['info']['status']} in {sol['info']['iter']} iters "
        f"({time.perf_counter() - t0:.1f}s)"
    )

    # 3) batched solve at defaults
    B = 8
    Av = rng.randn(B, m, n) / np.sqrt(m)
    bv = np.einsum("bij,bj->bi", Av, rng.randn(B, n)) + np.abs(
        rng.randn(B, m)
    )
    cv = -np.einsum("bij,bi->bj", Av, np.abs(rng.randn(B, m)))
    t0 = time.perf_counter()
    results = scs_tpu.solve_batch(
        {"A": Av, "b": bv, "c": cv}, {"l": m}, max_iters=10000,
    )
    n_ok = sum(r["info"]["status"] == "solved" for r in results)
    assert n_ok == B, [r["info"]["status"] for r in results]
    print(f"batched: {n_ok}/{B} solved ({time.perf_counter() - t0:.1f}s)")
    print("tpu_smoke: ALL PATHS OK at default settings")


if __name__ == "__main__":
    main()
