"""Unit tests for the cone projection kernels against the NumPy oracle.

Two layers of evidence:
  1. Agreement with the independent oracle in tests/oracle.py.
  2. The variational characterization of a projection p = Pi_K(z):
     p in K,  q := p - z in K*,  <p, q> = 0  (Moreau decomposition).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from scs_tpu.cones import ConeSpec, sd_cone_size
from scs_tpu.ops import projections as proj

import oracle


def _project(spec_dict, z):
    spec = ConeSpec.from_dict(spec_dict)
    f = proj.make_cone_projector(spec)
    return np.asarray(f(jnp.asarray(z, jnp.float64)))


RNG = np.random.RandomState(1234)

# Fuzz depth: the default tier runs a reduced number of random trials per
# cone so the suite fits the CI budget; SCS_TPU_SLOW=1 restores full depth.
import os as _os

_FULL_DEPTH = _os.environ.get("SCS_TPU_SLOW") == "1"


def _n(full, fast):
    return full if _FULL_DEPTH else fast




def test_zero_and_nonneg():
    K = {"z": 3, "l": 4}
    z = RNG.randn(7)
    p = _project(K, z)
    assert np.allclose(p[:3], 0.0)
    assert np.allclose(p[3:], np.maximum(z[3:], 0.0))


@pytest.mark.parametrize("sizes", [[3], [1], [5, 2, 5], [2, 2, 2]])
def test_soc(sizes):
    K = {"q": sizes}
    m = sum(sizes)
    for _ in range(5):
        z = RNG.randn(m) * 3
        p = _project(K, z)
        expected = oracle.proj_cone(z, K)
        np.testing.assert_allclose(p, expected, atol=1e-10)


@pytest.mark.parametrize("sizes", [[2], [3, 3], [1, 4], [5]])
def test_psd(sizes):
    K = {"s": sizes}
    m = sum(oracle.sd_size(n) for n in sizes)
    for _ in range(5):
        z = RNG.randn(m) * 2
        p = _project(K, z)
        expected = oracle.proj_cone(z, K)
        np.testing.assert_allclose(p, expected, atol=1e-9)


def test_psd_matches_reference_packing():
    """Cross-check the sqrt2 packing against the reference oracle's layout
    (gen_random_cone_prob.py proj_sdp: triu indices swapped, diag/sqrt2)."""
    n = 4
    z = RNG.randn(oracle.sd_size(n))
    tidx = np.triu_indices(n)
    tidx = (tidx[1], tidx[0])
    didx = np.diag_indices(n)
    a = np.zeros((n, n))
    a[tidx] = z
    a = a + a.T
    a[didx] = a[didx] / np.sqrt(2.0)
    w, v = np.linalg.eigh(a)
    a2 = (v * np.maximum(w, 0)) @ v.T
    a2[didx] = a2[didx] / np.sqrt(2.0)
    expected = a2[tidx]
    p = _project({"s": [n]}, z)
    np.testing.assert_allclose(p, expected, atol=1e-10)


@pytest.mark.parametrize("sizes", [[2], [3], [2, 3]])
def test_csd(sizes):
    K = {"cs": sizes}
    m = sum(n * n for n in sizes)
    for _ in range(5):
        z = RNG.randn(m) * 2
        p = _project(K, z)
        expected = oracle.proj_cone(z, K)
        np.testing.assert_allclose(p, expected, atol=1e-9)
        # variational check on each block: p PSD, p-z NSD-complement
        q = p - z
        assert abs(np.dot(p, q)) < 1e-8


def test_exp_primal():
    K = {"ep": 1}
    cases = [
        np.array([1.0, 1.0, 1.0]),
        np.array([-1.0, 2.0, 3.0]),
        np.array([5.0, 1.0, 1.0]),
        np.array([0.3, -0.5, 0.2]),
        np.array([-2.0, -2.0, 1.0]),
        np.array([-2.0, -2.0, -1.0]),
        np.array([10.0, 0.1, 0.1]),
    ] + [RNG.randn(3) * 2 for _ in range(_n(20, 6))]
    for z in cases:
        p = _project(K, z)
        expected = oracle.proj_exp(z)
        np.testing.assert_allclose(p, expected, atol=2e-6, err_msg=f"z={z}")
        # variational: p in Kexp, q = p - z in Kexp*, <p,q> ~ 0
        q = p - z
        assert oracle.in_exp(p, 1e-6), f"p not in Kexp: z={z} p={p}"
        assert oracle.in_exp_dual(q, 1e-6), f"q not in Kexp*: z={z} q={q}"
        assert abs(np.dot(p, q)) < 1e-6


def test_exp_dual():
    K = {"ed": 1}
    for _ in range(_n(20, 6)):
        z = RNG.randn(3) * 2
        p = _project(K, z)
        expected = z + oracle.proj_exp(-z)
        np.testing.assert_allclose(p, expected, atol=2e-6)


@pytest.mark.parametrize("a", [0.5, 0.25, 0.75, 0.33])
def test_pow_primal(a):
    K = {"p": [a]}
    for _ in range(_n(20, 6)):
        z = RNG.randn(3) * 2
        p = _project(K, z)
        q = p - z
        assert oracle.in_pow(p, a, 1e-7), f"p not in Kpow: z={z} p={p}"
        assert oracle.in_pow_dual(q, a, 1e-7), f"q not in Kpow*: z={z} q={q}"
        assert abs(np.dot(p, q)) < 1e-7
        expected = oracle.proj_pow(z, a)
        np.testing.assert_allclose(p, expected, atol=1e-6)


def test_pow_dual():
    a = 0.4
    K = {"p": [-a]}
    for _ in range(_n(10, 4)):
        z = RNG.randn(3) * 2
        p = _project(K, z)
        expected = z + oracle.proj_pow(-z, a)
        np.testing.assert_allclose(p, expected, atol=1e-6)


def test_box():
    bu = np.array([0.5, 1.0, 2.0])
    bl = np.array([-0.5, -1.0, 0.0])
    K = {"bu": bu, "bl": bl}
    for _ in range(_n(20, 6)):
        z = RNG.randn(4) * 2
        p = _project(K, z)
        expected = oracle.proj_box(z, bl, bu)
        np.testing.assert_allclose(p, expected, atol=1e-5)
        # membership + complementarity
        t, s = p[0], p[1:]
        assert t >= -1e-9
        assert np.all(s <= bu * t + 1e-7) and np.all(s >= bl * t - 1e-7)
        q = p - z
        assert abs(np.dot(p, q)) < 1e-6


def test_box_infinite_bounds():
    bu = np.array([np.inf, 1.0])
    bl = np.array([0.0, -np.inf])
    K = {"bu": bu, "bl": bl}
    for _ in range(_n(10, 4)):
        z = RNG.randn(3) * 2
        p = _project(K, z)
        t, s = p[0], p[1:]
        assert t >= -1e-9
        assert s[0] >= bl[0] * t - 1e-7
        assert s[1] <= bu[1] * t + 1e-7
        assert np.isfinite(p).all()


def test_ell1():
    K = {"ell1": [5]}
    for _ in range(_n(20, 6)):
        z = RNG.randn(6) * 2
        p = _project(K, z)
        expected = oracle.proj_ell1(z)
        np.testing.assert_allclose(p, expected, atol=1e-7)
        assert p[0] >= np.sum(np.abs(p[1:])) - 1e-7


def test_nuclear():
    mm, nn = 4, 3
    K = {"nuc_m": [mm], "nuc_n": [nn]}
    for _ in range(_n(10, 4)):
        z = RNG.randn(mm * nn + 1) * 2
        p = _project(K, z)
        t = p[0]
        X = p[1:].reshape(mm, nn, order="F")
        nuc = np.sum(np.linalg.svd(X, compute_uv=False))
        assert t >= nuc - 1e-6
        # complementarity with the residual
        q = p - z
        assert abs(np.dot(p, q)) < 1e-6
        # dual membership: spectral norm of residual matrix <= residual t
        Qx = q[1:].reshape(mm, nn, order="F")
        assert np.linalg.svd(Qx, compute_uv=False).max() <= q[0] + 1e-6


def test_sum_largest():
    nn, kk = 4, 2
    K = {"sl_n": [nn], "sl_k": [kk]}
    for _ in range(_n(10, 4)):
        z = RNG.randn(oracle.sd_size(nn) + 1) * 2
        p = _project(K, z)
        t = p[0]
        M = oracle._unpack_sym(p[1:], nn)
        w = np.linalg.eigvalsh(M)
        sk = np.sum(np.sort(w)[::-1][:kk])
        assert t >= sk - 1e-5
        q = p - z
        assert abs(np.dot(p, q)) < 1e-5
        # variational inequality against random cone points
        for _ in range(_n(20, 6)):
            Wr = RNG.randn(nn, nn)
            Wr = Wr + Wr.T
            wr, Vr = np.linalg.eigh(Wr)
            y_mat = (Vr * wr) @ Vr.T
            yw = np.linalg.eigvalsh(y_mat)
            ty = np.sum(np.sort(yw)[::-1][:kk]) + abs(RNG.randn())
            y_vec = np.concatenate([[ty], oracle._pack_sym(y_mat)])
            assert np.dot(z - p, y_vec - p) <= 1e-5


def test_logdet():
    nn = 3
    K = {"d": [nn]}
    for _ in range(_n(10, 4)):
        z = RNG.randn(oracle.sd_size(nn) + 2) * 2
        p = _project(K, z)
        t, v = p[0], p[1]
        M = oracle._unpack_sym(p[2:], nn)
        w = np.linalg.eigvalsh(M)
        assert v >= -1e-6
        assert np.all(w >= -1e-6)
        if v > 1e-8 and np.all(w > 1e-8):
            assert t <= v * np.sum(np.log(w / v)) + 1e-4
        q = p - z
        assert abs(np.dot(p, q)) < 1e-4
        # variational inequality sampling
        for _ in range(_n(20, 6)):
            Wr = RNG.randn(nn, nn)
            Wr = Wr @ Wr.T + 0.1 * np.eye(nn)
            vv = abs(RNG.randn()) + 0.1
            wr = np.linalg.eigvalsh(Wr)
            tt = vv * np.sum(np.log(wr / vv)) - abs(RNG.randn())
            y_vec = np.concatenate([[tt], [vv], oracle._pack_sym(Wr)])
            assert np.dot(z - p, y_vec - p) <= 1e-4


def test_logdet_matches_oracle():
    """Kernel vs the independent scipy-brentq oracle (two different
    root-finding stacks agreeing on the same projection)."""
    nn = 3
    K = {"d": [nn]}
    for _ in range(_n(10, 4)):
        z = RNG.randn(oracle.sd_size(nn) + 2) * 2
        p = _project(K, z)
        expected = oracle.proj_logdet(z, nn)
        np.testing.assert_allclose(p, expected, atol=5e-5)


def test_nuclear_matches_oracle():
    mm, nn = 4, 3
    K = {"nuc_m": [mm], "nuc_n": [nn]}
    for _ in range(_n(10, 4)):
        z = RNG.randn(mm * nn + 1) * 2
        p = _project(K, z)
        expected = oracle.proj_nuclear(z, mm, nn)
        np.testing.assert_allclose(p, expected, atol=1e-7)


def test_sum_largest_matches_oracle():
    """Kernel (capped-simplex prox bisection) vs the independent
    lifted-QP SLSQP oracle."""
    nn, kk = 4, 2
    K = {"sl_n": [nn], "sl_k": [kk]}
    for _ in range(_n(10, 4)):
        z = RNG.randn(oracle.sd_size(nn) + 1) * 2
        p = _project(K, z)
        expected = oracle.proj_sumlargest(z, nn, kk)
        np.testing.assert_allclose(p, expected, atol=5e-5)


def test_spectral_mixed_cone_full_vector():
    """Full-vector projection over a K mixing ALL spectral cones with the
    classic ones, against the oracle dispatcher."""
    K = {
        "l": 3,
        "q": [3],
        "s": [2],
        "d": [2],
        "nuc_m": [3],
        "nuc_n": [2],
        "ell1": [3],
        "sl_n": [3],
        "sl_k": [2],
    }
    m = oracle.cone_dims(K)
    spec = ConeSpec.from_dict(K)
    assert spec.dim == m
    for _ in range(5):
        z = RNG.randn(m) * 2
        p = _project(K, z)
        expected = oracle.proj_cone(z, K)
        np.testing.assert_allclose(p, expected, atol=5e-5)


def test_mixed_cone_full_vector():
    K = {"z": 2, "l": 3, "q": [3, 4], "s": [3], "ep": 2, "ed": 1, "p": [0.6, -0.4]}
    m = oracle.cone_dims(K)
    spec = ConeSpec.from_dict(K)
    assert spec.dim == m
    for _ in range(5):
        z = RNG.randn(m) * 2
        p = _project(K, z)
        expected = oracle.proj_cone(z, K)
        np.testing.assert_allclose(p, expected, atol=2e-6)


def test_dual_projector_moreau():
    K = {"l": 3, "q": [4], "s": [2]}
    spec = ConeSpec.from_dict(K)
    f = proj.make_cone_projector(spec)
    fd = proj.make_dual_cone_projector(spec)
    m = spec.dim
    for _ in range(5):
        z = RNG.randn(m)
        zj = jnp.asarray(z)
        # Moreau: z = proj_K(z) - proj_K*(-z) ... equivalently
        # proj_K(z) + (-z + proj_K(z))... check proj_dual directly vs oracle
        np.testing.assert_allclose(
            np.asarray(fd(zj)), oracle.proj_dual_cone(z, K), atol=1e-9
        )


def test_cone_spec_dims():
    K = dict(z=10, l=15, q=[5, 10, 0, 1], s=[3, 4, 0, 0, 1, 10], ep=10, ed=10,
             p=[-0.25, 0.5, 0.75, -0.33])
    spec = ConeSpec.from_dict(K)
    assert spec.dim == oracle.cone_dims(K)


def test_cone_spec_rejects_negative():
    with pytest.raises(ValueError):
        ConeSpec.from_dict({"l": -1})
    with pytest.raises(ValueError):
        ConeSpec.from_dict({"q": [3, -2]})


def test_cone_spec_f_deprecated():
    with pytest.warns(DeprecationWarning):
        spec = ConeSpec.from_dict({"f": 2, "z": 1})
    assert spec.z == 3
