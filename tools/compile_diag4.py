#!/usr/bin/env python
"""Clean arg-passing compile timings: VARIANT, B env vars."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

B = int(os.environ.get("B", "256"))
n = int(os.environ.get("N", "1000"))
m = int(os.environ.get("M", "1500"))
variant = os.environ["VARIANT"]
dtype = jnp.float32
rng = np.random.RandomState(0)

def mk_S():
    A = jnp.asarray(rng.standard_normal((B, m, n)), dtype) / np.sqrt(m)
    idx = jnp.arange(n)
    S = jnp.matmul(jnp.swapaxes(A, 1, 2), A)
    return S.at[:, idx, idx].add(2.0)

def chol(S):
    return jnp.linalg.cholesky(S)

def inv(S):
    L = jnp.linalg.cholesky(S)
    idx = jnp.arange(n)
    eyeB = jnp.zeros((B, n, n), dtype).at[:, idx, idx].set(1.0)
    return jax.scipy.linalg.cho_solve((L, True), eyeB)

def matvec(Si, x):
    return jnp.einsum("bnk,bk->bn", Si, x)

t0 = time.perf_counter()
if variant == "chol":
    S = mk_S(); jax.block_until_ready(S)
    t0 = time.perf_counter()
    jax.jit(chol).lower(S).compile()
elif variant == "inv":
    S = mk_S(); jax.block_until_ready(S)
    t0 = time.perf_counter()
    jax.jit(inv).lower(S).compile()
elif variant == "matvec":
    S = mk_S(); x = jnp.ones((B, n), dtype); jax.block_until_ready(S)
    t0 = time.perf_counter()
    jax.jit(matvec).lower(S, x).compile()
print(f"{variant:10s} B={B:4d} compile {time.perf_counter() - t0:7.2f}s")
