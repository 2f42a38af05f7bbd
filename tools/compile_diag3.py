#!/usr/bin/env python
"""One-op-per-process compile timing for build_S variants.

Usage: VARIANT=<name> B=8 python tools/compile_diag3.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

B = int(os.environ.get("B", "8"))
n = int(os.environ.get("N", "1000"))
m = int(os.environ.get("M", "1500"))
variant = os.environ.get("VARIANT", "einsum_highest")

dtype = jnp.float32
rng = np.random.RandomState(0)
A = jnp.asarray(rng.standard_normal((B, m, n)), dtype) / np.sqrt(m)
dy = jnp.ones((B, m), dtype)
eye = jnp.eye(n, dtype=dtype)


def einsum_S(A, dy):
    return jnp.einsum("bmn,bm,bmk->bnk", A, dy, A) + 1e-6 * eye


def scaled_matmul_S(A, dy):
    Ad = A * dy[:, :, None]
    return jnp.matmul(jnp.swapaxes(A, 1, 2), Ad) + 1e-6 * eye


def transpose_first_S(A, dy):
    At = jnp.swapaxes(A, 1, 2) * dy[:, None, :]
    return jnp.matmul(At, A) + 1e-6 * eye


def bf16_S(A, dy):
    Ad = (A * dy[:, :, None]).astype(jnp.bfloat16)
    At = jnp.swapaxes(A, 1, 2).astype(jnp.bfloat16)
    return (
        jax.lax.dot_general(
            At, Ad, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        + 1e-6 * eye
    )


FNS = {
    "einsum_highest": ("highest", einsum_S),
    "einsum_default": ("default", einsum_S),
    "scaled_highest": ("highest", scaled_matmul_S),
    "scaled_default": ("default", scaled_matmul_S),
    "transpose_highest": ("highest", transpose_first_S),
    "bf16": ("default", bf16_S),
}



def plain_matmul(A, dy):
    return jnp.matmul(jnp.swapaxes(A, 1, 2), A * dy[:, :, None])


def scan_S(A, dy):
    def one(_, ad):
        a, d = ad
        return None, jnp.matmul(a.T, a * d[:, None]) + 1e-6 * eye

    _, S = jax.lax.scan(one, None, (A, dy))
    return S


def scan_full(A, dy):
    """build_S + cholesky + inverse per element, scanned over the batch."""

    def one(_, ad):
        a, d = ad
        S = jnp.matmul(a.T, a * d[:, None]) + 2e-1 * eye
        L = jnp.linalg.cholesky(S)
        return None, jax.scipy.linalg.cho_solve((L, True), eye)

    _, Sinv = jax.lax.scan(one, None, (A, dy))
    return Sinv


FNS["plain_default"] = ("default", plain_matmul)
FNS["scan_highest"] = ("highest", scan_S)
FNS["scan_full_highest"] = ("highest", scan_full)

def plain_highest_fn(A, dy):
    return jnp.matmul(jnp.swapaxes(A, 1, 2), A * dy[:, :, None])


def single_highest(A, dy):
    return jnp.matmul(A[0].T, A[0] * dy[0][:, None])


FNS["plain_highest"] = ("highest", plain_highest_fn)
FNS["single_highest"] = ("highest", single_highest)

def barrier_eye(A, dy):
    S = jnp.matmul(jnp.swapaxes(A, 1, 2), A * dy[:, :, None])
    S = jax.lax.optimization_barrier(S)
    return S + 1e-6 * eye


def scatter_eye(A, dy):
    S = jnp.matmul(jnp.swapaxes(A, 1, 2), A * dy[:, :, None])
    idx = jnp.arange(n)
    return S.at[:, idx, idx].add(1e-6)


FNS["barrier_eye"] = ("highest", barrier_eye)
FNS["scatter_eye"] = ("highest", scatter_eye)

def fixed_factorize(A, dy):
    """Full factorize with scatter-diagonal: S, cholesky, inverse."""
    idx = jnp.arange(n)
    S = jnp.matmul(jnp.swapaxes(A, 1, 2), A * dy[:, :, None])
    S = S.at[:, idx, idx].add(2e-1)
    L = jnp.linalg.cholesky(S)
    return jax.vmap(lambda Li: jax.scipy.linalg.cho_solve((Li, True), eye))(L)


FNS["fixed_factorize"] = ("highest", fixed_factorize)

S_fixed = jnp.matmul(jnp.swapaxes(A, 1, 2), A * dy[:, :, None])
S_fixed = S_fixed.at[:, jnp.arange(n), jnp.arange(n)].add(2e-1)


def chol_only(A, dy):
    return jnp.linalg.cholesky(S_fixed)


def trisolve_bcast_eye(A, dy):
    L = jnp.linalg.cholesky(S_fixed)
    return jax.vmap(lambda Li: jax.scipy.linalg.cho_solve((Li, True), eye))(L)


def trisolve_scatter_eye(A, dy):
    L = jnp.linalg.cholesky(S_fixed)
    idx = jnp.arange(n)
    eyeB = jnp.zeros((B, n, n), dtype).at[:, idx, idx].set(1.0)
    return jax.scipy.linalg.cho_solve((L, True), eyeB)


FNS["chol_only"] = ("highest", chol_only)
FNS["trisolve_bcast_eye"] = ("highest", trisolve_bcast_eye)
FNS["trisolve_scatter_eye"] = ("highest", trisolve_scatter_eye)

prec, fn = FNS[variant]
t0 = time.perf_counter()
with jax.default_matmul_precision(prec):
    c = jax.jit(fn).lower(A, dy).compile()
print(f"{variant:24s} B={B:4d} compile {time.perf_counter() - t0:7.2f}s")
