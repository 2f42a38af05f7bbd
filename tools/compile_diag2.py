#!/usr/bin/env python
"""Decompose the factorize compile wall op-by-op at two batch sizes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timed_compile(name, fn, *args):
    t0 = time.perf_counter()
    c = jax.jit(fn).lower(*args).compile()
    print(f"{name:44s} compile {time.perf_counter() - t0:7.2f}s")
    return c


def run(B, n, m):
    dtype = jnp.float32
    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.standard_normal((B, m, n)), dtype) / np.sqrt(m)
    dy = jnp.ones((B, m), dtype)
    S = jnp.einsum("bmn,bm,bmk->bnk", A, dy, A) + 2e-1 * jnp.eye(n, dtype=dtype)
    eye = jnp.eye(n, dtype=dtype)

    with jax.default_matmul_precision("highest"):
        def build_S(A, dy):
            return jnp.einsum("bmn,bm,bmk->bnk", A, dy, A) + 1e-6 * eye

        def chol(S):
            return jnp.linalg.cholesky(S)

        def inv_cho(S):
            L = jnp.linalg.cholesky(S)
            return jax.vmap(
                lambda Li: jax.scipy.linalg.cho_solve((Li, True), eye)
            )(L)

        def tri_solve(S):
            L = jnp.linalg.cholesky(S)
            return jax.lax.linalg.triangular_solve(
                L, jnp.broadcast_to(eye, (B, n, n)),
                left_side=True, lower=True,
            )

        print(f"--- B={B} n={n} m={m} (matmul precision highest) ---")
        timed_compile("build_S (einsum)", build_S, A, dy)
        timed_compile("cholesky", chol, S)
        timed_compile("cholesky+cho_solve(eye) [inverse]", inv_cho, S)
        timed_compile("cholesky+triangular_solve(eye)", tri_solve, S)

    def chol_d(S):
        return jnp.linalg.cholesky(S)

    def inv_cho_d(S):
        L = jnp.linalg.cholesky(S)
        return jax.vmap(
            lambda Li: jax.scipy.linalg.cho_solve((Li, True), eye)
        )(L)

    print(f"--- B={B} n={n} m={m} (default precision) ---")
    timed_compile("cholesky (default prec)", chol_d, S)
    timed_compile("cholesky+cho_solve(eye) (default prec)", inv_cho_d, S)


if __name__ == "__main__":
    Bs = [int(x) for x in os.environ.get("BS", "8,32").split(",")]
    n = int(os.environ.get("N", "1000"))
    m = int(os.environ.get("M", "1500"))
    for B in Bs:
        run(B, n, m)
