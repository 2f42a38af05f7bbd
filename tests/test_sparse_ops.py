"""Block-ELL SpMV: packing + reference kernel + Pallas (interpret mode).

The Pallas TPU kernel itself is exercised on real hardware by the bench /
verify drives; here we check the layout and kernel logic on the CPU
backend (interpret=True runs the same kernel through the Pallas
interpreter)."""

import numpy as np
import pytest
from scipy import sparse

import jax.numpy as jnp

from scs_tpu.ops.sparse import bell_spmv, bell_spmv_ref, pack_bell


def _rand_csc(m, n, density, seed):
    rng = np.random.RandomState(seed)
    A = sparse.random(m, n, density=density, random_state=rng, format="csc")
    A.sort_indices()
    return A


@pytest.mark.parametrize("m,n,bs", [(100, 70, 8), (300, 200, 16), (64, 64, 32)])
def test_pack_bell_mv_rmv(m, n, bs):
    A = _rand_csc(m, n, 0.05, m + n)
    bm = pack_bell(A, block_size=bs, dtype=jnp.float32)
    x = np.random.RandomState(1).randn(n).astype(np.float32)
    y = np.random.RandomState(2).randn(m).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(bm.mv(jnp.asarray(x), use_pallas=False)),
        A @ x, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(bm.rmv(jnp.asarray(y), use_pallas=False)),
        A.T @ y, rtol=1e-4, atol=1e-5)
    # Jacobi data
    np.testing.assert_allclose(
        np.asarray(bm.col_sq),
        np.asarray(A.multiply(A).sum(axis=0)).ravel(), rtol=1e-5, atol=1e-6)


def test_bell_spmv_pallas_interpret_matches_ref():
    m, n, bs = 96, 80, 16
    A = _rand_csc(m, n, 0.1, 7)
    bm = pack_bell(A, block_size=bs, dtype=jnp.float32)
    x_pad = jnp.zeros(bm.n_pad, jnp.float32).at[:n].set(
        jnp.asarray(np.random.RandomState(3).randn(n), jnp.float32))
    ref = bell_spmv_ref(bm.A_blocks, bm.A_cols, x_pad)
    out = bell_spmv(bm.A_blocks, bm.A_cols, x_pad, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_numpy_packer_agrees_with_native():
    from scs_tpu import native
    from scs_tpu.ops.sparse import _pack_bell_numpy

    if not native.available:
        pytest.skip("native library unavailable")
    A = _rand_csc(50, 40, 0.12, 11)
    bn, cn = native.pack_block_ell(A, 8)
    bp, cp = _pack_bell_numpy(A, 8)
    # widths may differ only if counts differ (they must not)
    assert bn.shape == bp.shape
    # same block-sparsity => same dense reconstruction
    def densify(blocks, cols, m, n, bs):
        nbr, width = cols.shape
        out = np.zeros((nbr * bs, -(-n // bs) * bs))
        for bi in range(nbr):
            for w in range(width):
                bj = int(cols[bi, w])
                out[bi*bs:(bi+1)*bs, bj*bs:(bj+1)*bs] += blocks[bi, w]
        return out[:m, :n]
    np.testing.assert_allclose(densify(bn, cn, 50, 40, 8),
                               densify(bp, cp, 50, 40, 8))
    np.testing.assert_allclose(densify(bn, cn, 50, 40, 8), A.toarray())
