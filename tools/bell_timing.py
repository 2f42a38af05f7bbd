#!/usr/bin/env python
"""Time the bell (Pallas block-ELL) path end-to-end on the chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy import sparse as sp

import scs_tpu

rng = np.random.RandomState(7)


def gen_lp(m, n, density, bs=128, width=6):
    nbr, nbc = -(-m // bs), -(-n // bs)
    tile_density = min(1.0, density * nbc / width)
    per_tile = max(1, int(tile_density * bs * bs))
    rows_l, cols_l = [], []
    for r in range(nbr):
        tiles = rng.choice(nbc, min(width, nbc), replace=False)
        rr = rng.randint(0, bs, size=per_tile * len(tiles))
        cc = rng.randint(0, bs, size=per_tile * len(tiles))
        tb = np.repeat(tiles, per_tile)
        rows_l.append(r * bs + rr)
        cols_l.append(tb * bs + cc)
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    keep = (rows < m) & (cols < n)
    rows, cols = rows[keep], cols[keep]
    vals = rng.randn(len(rows))
    A = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsc()
    A = A + sp.eye(m, n, format="csc")
    x0 = rng.randn(n)
    s = np.abs(rng.randn(m))
    b = A @ x0 + s
    y = np.abs(rng.randn(m))
    c = -(A.T @ y)
    return {"A": sp.csc_matrix(A), "b": b, "c": c}


if os.environ.get("BELL_CACHE"):
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["BELL_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

m = int(os.environ.get("M", "600"))
n = int(os.environ.get("N", "400"))
density = float(os.environ.get("DENSITY", "0.01"))
eps = float(os.environ.get("EPS", "1e-5"))

prob = gen_lp(m, n, density)
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
