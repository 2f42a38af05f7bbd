"""Prototype: Pallas batched GEMV (B,m,n)@(B,n)->(B,m) vs XLA einsum."""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _make_gemv_kernel(bm):
    def _gemv_kernel(a_ref, x_ref, y_ref):
        # a_ref: (1, bm, n), x_ref: (1, 1, n), y_ref: (1, 1, m)
        i = pl.program_id(1)
        yb = lax.dot_general(
            x_ref[0],
            a_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )  # (1, bm)
        y_ref[0, :, pl.dslice(i * bm, bm)] = yb

    return _gemv_kernel


@partial(jax.jit, static_argnames=("bm",))
def pallas_gemv(A, x, *, bm=512):
    B, m, n = A.shape
    x3 = x.reshape(B, 1, n)
    y = pl.pallas_call(
        _make_gemv_kernel(bm),
        out_shape=jax.ShapeDtypeStruct((B, 1, m), jnp.float32),
        grid=(B, m // bm),
        in_specs=[
            pl.BlockSpec((1, bm, n), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, n), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, m), lambda b, i: (b, 0, 0)),
    )(A, x3)
    return y.reshape(B, m)


def main():
    B, m, n = 128, 1536, 1024  # padded shapes
    rng = np.random.RandomState(0)
    An = (rng.randn(B, m, n) / np.sqrt(n)).astype(np.float32)
    xn = rng.randn(B, n).astype(np.float32)
    A = jnp.asarray(An)
    x = jnp.asarray(xn)

    y = pallas_gemv(A, x)
    yref = np.einsum("bmn,bn->bm", An.astype(np.float64), xn.astype(np.float64))
    err = np.abs(np.asarray(y) - yref).max() / np.abs(yref).max()
    print(f"pallas err: {err:.2e}")

    REPS = 30
    @jax.jit
    def chain(A, x):
        def body(i, x):
            y = pallas_gemv(A, x)
            return pallas_gemv(jnp.swapaxes(A, 1, 2), y[:, :n])[:, :n] if False else x + 0 * x
        return lax.fori_loop(0, REPS, body, x)

    # simpler chain: y = A@x ; x' = normalize rows trick keeping shapes
    @jax.jit
    def chain2(A, x):
        def body(i, x):
            y = pallas_gemv(A, x)
            return y[:, :n] / (1.0 + i)
        return lax.fori_loop(0, REPS, body, x)

    _ = np.asarray(chain2(A, x))
    t0 = time.perf_counter()
    _ = np.asarray(chain2(A, x))
    dt = (time.perf_counter() - t0) / REPS
    gbs = B * m * n * 4 / dt / 1e9
    print(f"pallas gemv: {dt*1e3:.3f} ms, {gbs:.0f} GB/s ({100*gbs/819:.0f}% peak)")

    with jax.default_matmul_precision("highest"):
        @jax.jit
        def chain3(A, x):
            def body(i, x):
                y = jnp.einsum("bmn,bn->bm", A, x)
                return y[:, :n] / (1.0 + i)
            return lax.fori_loop(0, REPS, body, x)
        _ = np.asarray(chain3(A, x))
        t0 = time.perf_counter()
        _ = np.asarray(chain3(A, x))
        dt = (time.perf_counter() - t0) / REPS
        gbs = B * m * n * 4 / dt / 1e9
        print(f"xla einsum highest: {dt*1e3:.3f} ms, {gbs:.0f} GB/s ({100*gbs/819:.0f}% peak)")


if __name__ == "__main__":
    main()


def _vpu_kernel(a_ref, x_ref, y_ref):
    # a_ref: (1, n, bm) [transposed layout], x_ref: (1, n, 1), y_ref: (1, 1, m)
    i = pl.program_id(1)
    bm = a_ref.shape[2]
    prod = a_ref[0] * x_ref[0]          # (n, bm) * (n, 1) lane-broadcast
    yb = jnp.sum(prod, axis=0)          # reduce over sublanes -> (bm,)
    y_ref[0, :, pl.dslice(i * bm, bm)] = yb.reshape(1, bm)


@partial(jax.jit, static_argnames=("bm",))
def vpu_gemv(At, x, *, bm=512):
    B, n, m = At.shape
    x3 = x.reshape(B, n, 1)
    y = pl.pallas_call(
        _vpu_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1, m), jnp.float32),
        grid=(B, m // bm),
        in_specs=[
            pl.BlockSpec((1, n, bm), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, n, 1), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, m), lambda b, i: (b, 0, 0)),
    )(At, x3)
    return y.reshape(B, m)


def main2():
    B, m, n = 128, 1536, 1024
    rng = np.random.RandomState(0)
    An = (rng.randn(B, m, n) / np.sqrt(n)).astype(np.float32)
    xn = rng.randn(B, n).astype(np.float32)
    At = jnp.asarray(An.transpose(0, 2, 1).copy())
    x = jnp.asarray(xn)
    y = vpu_gemv(At, x)
    yref = np.einsum("bmn,bn->bm", An.astype(np.float64), xn.astype(np.float64))
    err = np.abs(np.asarray(y) - yref).max() / np.abs(yref).max()
    print(f"vpu err: {err:.2e}")
    REPS = 30
    @jax.jit
    def chain(At, x):
        def body(i, x):
            y = vpu_gemv(At, x)
            return y[:, :n] / (1.0 + i)
        return lax.fori_loop(0, REPS, body, x)
    _ = np.asarray(chain(At, x))
    t0 = time.perf_counter()
    _ = np.asarray(chain(At, x))
    dt = (time.perf_counter() - t0) / REPS
    gbs = B * m * n * 4 / dt / 1e9
    print(f"vpu gemv: {dt*1e3:.3f} ms, {gbs:.0f} GB/s ({100*gbs/819:.0f}% peak)")


main2()
