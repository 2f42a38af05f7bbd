#!/usr/bin/env python
"""Bisect the vmapped factorize compile wall. STAGE env var:
  build_S | build_S_chol | full | full_direct
full_direct builds the same math WITHOUT vmap (hand-batched ops).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

B = int(os.environ.get("B", "256"))
n = int(os.environ.get("N", "1000"))
m = int(os.environ.get("M", "1500"))
stage = os.environ["STAGE"]
rho_x = 1e-6
dtype = jnp.float32

rng = np.random.RandomState(0)
A = jnp.asarray(rng.standard_normal((B, m, n)), dtype) / np.sqrt(m)
P = jnp.asarray(
    np.tile((0.1 * np.eye(n)).astype(np.float32)[None], (1, 1, 1))
) * jnp.ones((B, 1, 1), dtype)
dy = jnp.ones((B, m), dtype) * 10.0


def build_S_one(a, p, d):
    S = a.T @ (a * d[:, None])
    idx = jnp.arange(n)
    S = S.at[idx, idx].add(rho_x)
    return S + p


def chol_one(a, p, d):
    return jnp.linalg.cholesky(build_S_one(a, p, d))


def full_one(a, p, d):
    chol = jnp.linalg.cholesky(build_S_one(a, p, d))
    idx = jnp.arange(n)
    eye = jnp.zeros_like(chol).at[idx, idx].set(1.0)
    return jax.scipy.linalg.cho_solve((chol, True), eye)


def full_direct(A, P, dy):
    """Hand-batched: no vmap anywhere."""
    idx = jnp.arange(n)
    S = jnp.matmul(jnp.swapaxes(A, 1, 2), A * dy[:, :, None])
    S = S.at[:, idx, idx].add(rho_x) + P
    chol = jnp.linalg.cholesky(S)
    eyeB = jnp.zeros((B, n, n), dtype).at[:, idx, idx].set(1.0)
    return jax.scipy.linalg.cho_solve((chol, True), eyeB)


fns = {
    "build_S": jax.vmap(build_S_one),
    "build_S_chol": jax.vmap(chol_one),
    "full": jax.vmap(full_one),
    "full_direct": full_direct,
}
t0 = time.perf_counter()
with jax.default_matmul_precision("highest"):
    jax.jit(fns[stage]).lower(A, P, dy).compile()
print(f"{stage:14s} B={B:4d} compile {time.perf_counter() - t0:7.2f}s")
