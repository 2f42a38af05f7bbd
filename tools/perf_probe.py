#!/usr/bin/env python
"""Per-op bandwidth probe for the flagship solve phase (VERDICT r4 #4).

Measures achievable HBM GB/s of each hot op at the flagship shapes, then
one full 50-iteration chunk, so the utilization gap can be attributed:
op-shape ceiling vs scheduling/lockstep overheads.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

B = int(os.environ.get("B", "256"))
m = int(os.environ.get("M", "1500"))
n = int(os.environ.get("N", "1000"))

if os.environ.get("CACHE", "1") == "1":
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/jax_cache_perf"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

dtype = jnp.float32
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 6)
A = jax.random.normal(ks[0], (B, m, n), dtype)
Sinv = jax.random.normal(ks[1], (B, n, n), dtype)
P = jax.random.normal(ks[2], (B, n, n), dtype)
x = jax.random.normal(ks[3], (B, n), dtype)
y = jax.random.normal(ks[4], (B, m), dtype)
jax.block_until_ready(A)


def _sync(out):
    """block_until_ready does not truly block through the axon tunnel
    (verify-skill gotcha); a tiny D2H fetch of the result does."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timed(name, fn, args, nbytes, reps=20):
    with jax.default_matmul_precision("highest"):
        j = jax.jit(fn)
        out = j(*args)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = j(*args)
        _sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt * 1e3:8.2f} ms  {nbytes / dt / 1e9:7.1f} GB/s")
    return dt


fb = 4  # f32 bytes


def ax(A, x):
    return jnp.einsum("bmn,bn->bm", A, x)


def aty(A, y):
    return jnp.einsum("bmn,bm->bn", A, y)


def sinv_apply(S, v):
    return jnp.einsum("bnk,bk->bn", S, v)


def fused_iter(A, Sinv, P, x, y):
    """One DR-iteration's worth of streaming math (no cone/AA)."""
    rhs = 1e-6 * x - aty(A, y)
    px = sinv_apply(Sinv, rhs)
    py = y + ax(A, px)
    Ppx = sinv_apply(P, px)
    return px, py, Ppx


timed("A^T y   (B,m,n)", aty, (A, y), B * m * n * fb)
timed("A x     (B,m,n)", ax, (A, x), B * m * n * fb)
timed("S^-1 v  (B,n,n)", sinv_apply, (Sinv, x), B * n * n * fb)
timed("P x     (B,n,n)", sinv_apply, (P, x), B * n * n * fb)
t_iter = timed(
    "fused iteration streams",
    fused_iter,
    (A, Sinv, P, x, y),
    B * (2 * m * n + 2 * n * n) * fb,
)

# bf16 variants
Ab = A.astype(jnp.bfloat16)
Sb = Sinv.astype(jnp.bfloat16)


def aty_bf16(Ab, y):
    return jax.lax.dot_general(
        Ab, y.astype(jnp.bfloat16),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


timed("A^T y bf16 (f32 accum)", aty_bf16, (Ab, y), B * m * n * 2)


def sinv_bf16(Sb, v):
    return jax.lax.dot_general(
        Sb, v.astype(jnp.bfloat16),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


timed("S^-1 v bf16 (f32 accum)", sinv_bf16, (Sb, x), B * n * n * 2)

# full chunk through the real core
from scs_tpu.batch import BatchedSCS
from scs_tpu.bench_cli import gen_batch_device

Ag, Pg, bg, cg = gen_batch_device(B, m, n, seed=99)
solver = BatchedSCS(
    {"A": Ag, "P": Pg, "b": bg, "c": cg}, {"l": m},
    eps_abs=1e-4, eps_rel=1e-4, max_iters=20000, verbose=False,
)
states, mats = solver._states, solver.mats
seg = solver._vrun_seg
out = seg(states, mats, 20000, 1)
_sync(out.it)
reps = 5
t0 = time.perf_counter()
cur = states
for _ in range(reps):
    cur = seg(cur, mats, 20000, 1)
_sync(cur.it)
dt = (time.perf_counter() - t0) / reps
k = int(solver.stg.check_interval)
per_iter = dt / k
ideal = B * (2 * m * n + 2 * n * n) * fb
print(
    f"{'real chunk (50 it, incl cone/AA)':34s} {dt * 1e3:8.2f} ms  "
    f"{per_iter * 1e3:6.2f} ms/iter  {ideal / per_iter / 1e9:7.1f} GB/s-equiv"
)
print(f"fused-stream iter: {t_iter * 1e3:.2f} ms -> overhead factor "
      f"{per_iter / t_iter:.2f}x")
