"""Native C++ runtime layer: CSC utilities, block-ELL packing.

Counterpart coverage of the reference's scs_matrix.c/csparse.c plumbing
(validated there implicitly through every solve; here directly against
scipy)."""

import numpy as np
import pytest
from scipy import sparse

from scs_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available, reason="native library unavailable (no g++)"
)


def _rand_csc(m, n, density=0.3, seed=0):
    rng = np.random.RandomState(seed)
    A = sparse.random(m, n, density=density, random_state=rng, format="csc")
    A.sort_indices()
    return A


def test_has_lower_tri():
    U = sparse.triu(_rand_csc(20, 20, 0.4, 1), format="csc")
    U.sort_indices()
    assert not native.has_lower_tri(U.indptr, U.indices, 20)
    F = _rand_csc(20, 20, 0.4, 2)
    # a dense-ish random square matrix almost surely has lower-tri entries
    expected = bool((sparse.tril(F, k=-1)).nnz > 0)
    assert native.has_lower_tri(F.indptr, F.indices, 20) == expected


def test_validate_csc():
    A = _rand_csc(15, 10, 0.5, 3)
    assert native.validate_csc(A.indptr, A.indices, 15, 10)
    bad = A.indices.copy()
    if len(bad):
        bad[0] = 99  # out of range
        assert not native.validate_csc(A.indptr, bad, 15, 10)


def test_csc_to_dense_matches_scipy():
    A = _rand_csc(23, 17, 0.3, 4)
    np.testing.assert_allclose(native.csc_to_dense(A), A.toarray())


def test_triu_to_dense_sym():
    rng = np.random.RandomState(5)
    S = rng.randn(12, 12)
    S = S + S.T
    U = sparse.triu(sparse.csc_matrix(S), format="csc")
    U.sort_indices()
    np.testing.assert_allclose(native.csc_triu_to_dense_sym(U), S)


def test_matvec_rmatvec():
    A = _rand_csc(30, 20, 0.25, 6)
    x = np.random.RandomState(7).randn(20)
    y = np.random.RandomState(8).randn(30)
    np.testing.assert_allclose(native.csc_matvec(A, x), A @ x, atol=1e-12)
    np.testing.assert_allclose(native.csc_rmatvec(A, y), A.T @ y, atol=1e-12)


@pytest.mark.parametrize("bs", [4, 8])
def test_block_ell_roundtrip(bs):
    """blocks/cols packing reproduces A @ x exactly."""
    m, n = 37, 29
    A = _rand_csc(m, n, 0.15, 9)
    blocks, cols = native.pack_block_ell(A, bs)
    nbr, width = cols.shape
    nbc = -(-n // bs)
    x = np.random.RandomState(10).randn(n)
    xp = np.zeros(nbc * bs)
    xp[:n] = x
    y = np.zeros(nbr * bs)
    for bi in range(nbr):
        for w in range(width):
            bj = cols[bi, w]
            y[bi * bs:(bi + 1) * bs] += blocks[bi, w] @ xp[bj * bs:(bj + 1) * bs]
    np.testing.assert_allclose(y[:m], A @ x, atol=1e-12)
    np.testing.assert_allclose(y[m:], 0.0, atol=1e-12)
