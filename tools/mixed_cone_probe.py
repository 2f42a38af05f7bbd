"""Probe: reference mixed-cone K batch on the real TPU chip.

First-ever on-chip compile of batched eigh (PSD cones) + exp/power Newton
loops (VERDICT r5 item 2). Run: python tools/mixed_cone_probe.py [B] [eps]
"""
import os
import sys
import time

import numpy as np

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root)
sys.path.insert(0, os.path.join(_root, "tests"))
import oracle  # noqa: E402

from scs_tpu.batch import solve_batch  # noqa: E402

K = {
    "z": 10,
    "l": 15,
    "q": [5, 10, 0, 1],
    "s": [3, 4, 0, 0, 1, 10],
    "ep": 10,
    "ed": 10,
    "p": [-0.25, 0.5, 0.75, -0.33],
}

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
eps = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-5

m = oracle.cone_dims(K)
n = m // 3
print(f"m={m} n={n} B={B} eps={eps}")

rng = np.random.RandomState(3000)
As, bs, cs, stars = [], [], [], []
for i in range(B):
    data, p_star, _ = oracle.gen_feasible(K, n=n, density=0.1, rng=rng)
    As.append(np.asarray(data["A"].todense()))
    bs.append(data["b"])
    cs.append(data["c"])
    stars.append(p_star)
A = np.stack(As).astype(np.float32)
b = np.stack(bs)
c = np.stack(cs)
p_star = np.array(stars)

t0 = time.perf_counter()
res = solve_batch(
    {"A": A, "b": b, "c": c},
    K,
    dtype="float32",
    eps_abs=eps,
    eps_rel=eps,
    max_iters=50000,
    verbose=False,
)
el = time.perf_counter() - t0
statuses = [r["info"]["status"] for r in res]
objs = np.array([r["info"]["pobj"] for r in res])
iters = np.array([r["info"]["iter"] for r in res])
err = np.abs(objs - p_star)
print(f"elapsed {el:.1f}s, statuses: {set(statuses)}")
print(f"iters mean {iters.mean():.0f} max {iters.max()}")
print(f"obj abs err max {err.max():.2e}  (3-decimal parity: {(err < 5e-4).all()})")
print(f"p_star range [{p_star.min():.2f}, {p_star.max():.2f}]")
