"""Coverage tests modeled on the reference suite (test_scs_coverage.py,
test_mix_sd_csd_cone.py, test_spectral_and_complex_cones.py): closed-form
optima for every cone family, settings validation matrix, update/warm-start
semantics, file outputs, API contracts.

Reference citations are to files under /root/reference/.
"""

import os

import numpy as np
import pytest
import scipy.sparse as sp
from numpy.testing import assert_almost_equal

import scs_tpu as scs
from tests import oracle


def _solve(data, cone, **kw):
    kw.setdefault("verbose", False)
    return scs.solve(data, cone, **kw)


# ---------------------------------------------------------------------------
# Closed-form cone problems (reference: test_scs_coverage.py sections)
# ---------------------------------------------------------------------------


def test_power_cone_closed_form():
    # reference test_scs_coverage.py:984-1021: min z s.t. (x,y,z) in
    # Kpow(0.7), x = 1, y = 1 -> feasibility forces z <= x^a y^(1-a) = 1;
    # maximize z -> z* = 1
    a = 0.7
    A = sp.csc_matrix(
        np.array(
            [
                [1.0, 0.0, 0.0],
                [0.0, 1.0, 0.0],
                [-1.0, 0.0, 0.0],
                [0.0, -1.0, 0.0],
                [0.0, 0.0, -1.0],
            ]
        )
    )
    b = np.array([1.0, 1.0, 0.0, 0.0, 0.0])
    c = np.array([0.0, 0.0, -1.0])  # maximize z
    sol = _solve(
        {"A": A, "b": b, "c": c},
        {"z": 2, "p": [a]},
        eps_abs=1e-7,
        eps_rel=1e-7,
    )
    assert sol["info"]["status"] in ("solved", "solved_inaccurate")
    assert_almost_equal(sol["x"][2], 1.0, decimal=4)


def test_dual_power_cone_feasible():
    # dual power cone (negative parameter): random feasible problem,
    # KKT + membership checks against the oracle
    K = {"l": 4, "p": [-0.4, 0.6]}
    data, opt, _ = oracle.gen_feasible(K, n=8, density=0.6,
                                       rng=np.random.RandomState(5))
    sol = _solve(data, K, eps_abs=1e-7, eps_rel=1e-7)
    assert sol["info"]["status"] == "solved"
    assert_almost_equal(sol["info"]["pobj"], opt, decimal=3)


def test_sdp_closed_form():
    # reference test_scs_coverage.py:1380-1410: min tr(CX) s.t. X psd,
    # X11 = 1, with C = [[0,1],[1,0]]-ish pattern giving x*=-1 for the
    # off-diagonal. Packed triu layout, off-diag scaled by sqrt(2).
    # Problem: variables = packed 2x2 symmetric X = (X11, sqrt2*X21, X22).
    # min 2*X21  s.t. X11 = 1, X22 = 1, X psd  ->  X21* = -1.
    rt2 = np.sqrt(2.0)
    # rows: 2 zero-cone rows pinning X11, X22; 3 rows put X into the SD cone
    A = sp.csc_matrix(
        np.array(
            [
                [1.0, 0.0, 0.0],
                [0.0, 0.0, 1.0],
                [-1.0, 0.0, 0.0],
                [0.0, -1.0, 0.0],
                [0.0, 0.0, -1.0],
            ]
        )
    )
    b = np.array([1.0, 1.0, 0.0, 0.0, 0.0])
    c = np.array([0.0, rt2, 0.0])  # tr(CX) with C21=C12=1 -> sqrt2 * packed
    sol = _solve(
        {"A": A, "b": b, "c": c},
        {"z": 2, "s": [2]},
        eps_abs=1e-7,
        eps_rel=1e-7,
    )
    assert sol["info"]["status"] == "solved"
    # packed X21 = -1 -> scaled entry -sqrt(2); objective = -2
    assert_almost_equal(sol["x"][1], -rt2, decimal=4)
    assert_almost_equal(sol["info"]["pobj"], -2.0, decimal=4)


@pytest.mark.slow
def test_complex_sdp_mixed():
    # mixed real + complex PSD cones in one problem (reference:
    # test_mix_sd_csd_cone.py): random feasible problem, objective parity
    K = {"s": [3], "cs": [3]}
    data, opt, _ = oracle.gen_feasible(K, n=10, density=0.7,
                                       rng=np.random.RandomState(3))
    sol = _solve(data, K, eps_abs=1e-7, eps_rel=1e-7)
    assert sol["info"]["status"] == "solved"
    assert_almost_equal(sol["info"]["pobj"], opt, decimal=3)
    # slack must be in the cone per the oracle
    s = sol["s"]
    proj_s = oracle.proj_cone(s, K)
    np.testing.assert_allclose(s, proj_s, atol=1e-4)


# ---------------------------------------------------------------------------
# Spectral cones, solve-level (reference: test_spectral_and_complex_cones.py)
# ---------------------------------------------------------------------------


def _epigraph_problem(block_b, extra_rows):
    """min t s.t. (t, fixed_block) in cone: variable x = t only.

    Rows: first cone row is s_0 = t (A row = [-1], b = 0); the remaining
    rows have A = 0, b = block (so s = block exactly).
    """
    mrows = 1 + len(block_b)
    A = np.zeros((mrows, 1))
    A[0, 0] = -1.0
    b = np.concatenate([[0.0], block_b])
    c = np.array([1.0])
    return {"A": sp.csc_matrix(A), "b": b, "c": c}


def test_ell1_cone_epigraph():
    # min t s.t. (t, x0) in K_ell1  ->  t* = ||x0||_1
    # (bound semantics per test_spectral_and_complex_cones.py:180-188)
    rng = np.random.RandomState(11)
    x0 = rng.randn(6)
    data = _epigraph_problem(x0, [])
    data["b"][1:] = x0
    sol = _solve(data, {"ell1": [6]}, eps_abs=1e-7, eps_rel=1e-7)
    assert sol["info"]["status"] == "solved"
    assert_almost_equal(sol["x"][0], np.sum(np.abs(x0)), decimal=4)
    # returned slack obeys the cone inequality
    s = sol["s"]
    assert s[0] >= np.sum(np.abs(s[1:])) - 1e-4


def test_nuclear_cone_epigraph():
    # min t s.t. (t, vec_F(X0)) in K_nuc  ->  t* = ||X0||_* (column-major
    # layout per test_spectral_and_complex_cones.py:240-243)
    rng = np.random.RandomState(12)
    mm, nn = 4, 3
    X0 = rng.randn(mm, nn)
    data = _epigraph_problem(X0.ravel(order="F"), [])
    sol = _solve(
        data, {"nuc_m": [mm], "nuc_n": [nn]}, eps_abs=1e-7, eps_rel=1e-7
    )
    assert sol["info"]["status"] == "solved"
    tstar = np.sum(np.linalg.svd(X0, compute_uv=False))
    assert_almost_equal(sol["x"][0], tstar, decimal=4)


def test_sum_largest_cone_epigraph():
    # min t s.t. (t, pack(X0)) in K_sl(k) -> t* = sum of k largest eigs
    rng = np.random.RandomState(13)
    nn, kk = 4, 2
    M = rng.randn(nn, nn)
    X0 = M + M.T
    data = _epigraph_problem(oracle._pack_sym(X0), [])
    sol = _solve(data, {"sl_n": [nn], "sl_k": [kk]}, eps_abs=1e-7, eps_rel=1e-7)
    assert sol["info"]["status"] == "solved"
    w = np.linalg.eigvalsh(X0)
    tstar = np.sum(np.sort(w)[::-1][:kk])
    assert_almost_equal(sol["x"][0], tstar, decimal=4)


def test_logdet_cone_epigraph():
    # max t s.t. (t, 1, pack(X0)) in K_logdet -> t* = logdet(X0)
    rng = np.random.RandomState(14)
    nn = 3
    G = rng.randn(nn, nn)
    X0 = G @ G.T + 0.5 * np.eye(nn)
    block = np.concatenate([[1.0], oracle._pack_sym(X0)])
    mrows = 1 + len(block)
    A = np.zeros((mrows, 1))
    A[0, 0] = -1.0
    b = np.concatenate([[0.0], block])
    c = np.array([-1.0])  # maximize t
    sol = _solve(
        {"A": sp.csc_matrix(A), "b": b, "c": c},
        {"d": [nn]},
        eps_abs=1e-6,
        eps_rel=1e-6,
    )
    assert sol["info"]["status"] in ("solved", "solved_inaccurate")
    tstar = np.linalg.slogdet(X0)[1]
    assert_almost_equal(sol["x"][0], tstar, decimal=3)


# ---------------------------------------------------------------------------
# Settings validation matrix (reference: test_scs_coverage.py:2323-2401)
# ---------------------------------------------------------------------------

_TINY = {
    "A": sp.csc_matrix(np.array([[1.0], [-1.0]])),
    "b": np.array([1.0, 0.0]),
    "c": np.array([-1.0]),
}


@pytest.mark.parametrize(
    "bad",
    [
        {"max_iters": -1},
        {"eps_abs": -1e-3},
        {"eps_rel": -1e-3},
        {"eps_infeas": -1e-7},
        {"alpha": 0.0},
        {"alpha": 2.0},
        {"rho_x": -1.0},
        {"scale": 0.0},
        {"eps_abs": float("nan")},
        {"alpha": float("nan")},
        {"scale": float("inf")},
        {"acceleration_lookback": -1},
        {"time_limit_secs": -1.0},
    ],
)
def test_settings_rejected(bad):
    with pytest.raises((ValueError, TypeError)):
        scs.SCS(_TINY, {"l": 2}, verbose=False, **bad)


@pytest.mark.parametrize(
    "good",
    [
        {"eps_abs": float("inf")},  # +inf IS valid for tolerances
        {"eps_rel": float("inf")},
        {"eps_infeas": float("inf")},
        {"time_limit_secs": 0.0},  # 0 = no limit
        {"max_iters": 1},
        {"alpha": 1.999},
        {"alpha": 0.001},
    ],
)
def test_settings_accepted(good):
    # acceptance is a validation-layer property; constructing a full
    # solver per config costs a fresh XLA compile each (settings are part
    # of the compiled-core key), so validate via Settings and run ONE
    # end-to-end solve for the semantically interesting +inf-eps case
    scs.Settings.from_kwargs(verbose=False, **good)
    if good.get("eps_abs") == float("inf"):
        solver = scs.SCS(_TINY, {"l": 2}, verbose=False, **good)
        solver.solve()  # must not raise; terminates immediately


def test_time_limit():
    rng = np.random.RandomState(21)
    m, n = 120, 60
    A = sp.csc_matrix(rng.randn(m, n))
    b = A @ rng.randn(n) + np.abs(rng.randn(m))
    c = rng.randn(n)
    sol = _solve(
        {"A": A, "b": b, "c": c, "P": sp.eye(n, format="csc")},
        {"l": m},
        time_limit_secs=1e-9,
        eps_abs=1e-12,
        eps_rel=1e-12,
        max_iters=1000000,
    )
    # must terminate quickly with an inaccurate classification
    assert "inaccurate" in sol["info"]["status"] or sol["info"]["status"] in (
        "solved",
    )


# ---------------------------------------------------------------------------
# Cone-dict parsing parity (reference: test_scs_coverage.py:2493-2568,
# scsobject.h:74-326)
# ---------------------------------------------------------------------------


def test_cone_field_accepts_int_list_array():
    # 'q' as int, list, and ndarray must agree
    A = sp.csc_matrix(np.array([[0.0, 0.0], [-1.0, 0.0], [0.0, -1.0]]))
    b = np.array([1.0, 0.0, 0.0])
    c = np.array([-1.0, -1.0])
    sols = [
        _solve({"A": A, "b": b, "c": c}, {"q": qval})
        for qval in (3, [3], np.array([3]))
    ]
    for s in sols[1:]:
        np.testing.assert_allclose(s["x"], sols[0]["x"], atol=1e-9)


def test_cone_rejects_unknown_and_bad():
    with pytest.raises(ValueError):
        scs.SCS(_TINY, {"l": 2, "bogus": 1})
    with pytest.raises((ValueError, TypeError)):
        scs.SCS(_TINY, {"l": 2.5})
    with pytest.raises(ValueError):
        scs.SCS(_TINY, {"l": 2, "bu": [1.0], "bl": [2.0]})  # bl > bu
    with pytest.raises(ValueError):
        scs.SCS(_TINY, {"l": 2, "nuc_m": [2], "nuc_n": [3]})  # m < n
    with pytest.raises(ValueError):
        scs.SCS(_TINY, {"l": 2, "sl_n": [3], "sl_k": [4]})  # k > n


# ---------------------------------------------------------------------------
# API contracts
# ---------------------------------------------------------------------------


def test_returned_arrays_are_copies():
    # reference: test_scs_coverage.py:2909-2917 — mutating a returned array
    # must not affect subsequent solves
    solver = scs.SCS(_TINY, {"l": 2}, verbose=False)
    s1 = solver.solve()
    x_saved = s1["x"].copy()
    s1["x"][:] = 123.0
    s2 = solver.solve(warm_start=False)
    np.testing.assert_allclose(s2["x"], x_saved, atol=1e-9)


def test_update_before_first_solve():
    # reference: test_scs_coverage.py:1543-1553
    rng = np.random.RandomState(31)
    m, n = 30, 15
    A = sp.csc_matrix(rng.randn(m, n))
    b = A @ rng.randn(n) + np.abs(rng.randn(m))
    c = rng.randn(n)
    data = {"A": A, "b": b, "c": c, "P": sp.eye(n, format="csc")}
    solver = scs.SCS(data, {"l": m}, verbose=False, eps_abs=1e-6, eps_rel=1e-6)
    b2 = b + 0.05 * np.abs(rng.randn(m))
    solver.update(b=b2)
    sol = solver.solve()
    fresh = _solve(
        {"A": A, "b": b2, "c": c, "P": sp.eye(n, format="csc")},
        {"l": m},
        eps_abs=1e-6,
        eps_rel=1e-6,
    )
    assert sol["info"]["status"] == "solved"
    assert_almost_equal(sol["info"]["pobj"], fresh["info"]["pobj"], decimal=4)


def test_sequential_updates_track_optima():
    # reference: test_scs_coverage.py:1226-1238
    rng = np.random.RandomState(32)
    m, n = 40, 20
    A = sp.csc_matrix(rng.randn(m, n))
    b = A @ rng.randn(n) + np.abs(rng.randn(m))
    data = {"A": A, "b": b, "c": rng.randn(n), "P": sp.eye(n, format="csc")}
    solver = scs.SCS(data, {"l": m}, verbose=False, eps_abs=1e-6, eps_rel=1e-6)
    solver.solve()
    for k in range(3):
        c2 = rng.randn(n)
        solver.update(c=c2)
        sol = solver.solve()
        fresh = _solve(
            {"A": A, "b": b, "c": c2, "P": sp.eye(n, format="csc")},
            {"l": m},
            eps_abs=1e-6,
            eps_rel=1e-6,
        )
        assert_almost_equal(
            sol["info"]["pobj"], fresh["info"]["pobj"], decimal=3
        )


def test_infeasible_update_feasible():
    # reference: test_scs_coverage.py:1474-1495 — an infeasible problem,
    # after update(b), becomes feasible with the same workspace
    A = sp.csc_matrix(np.array([[1.0], [-1.0]]))
    b_bad = np.array([-1.0, -1.0])  # x <= -1 and x >= 1: infeasible
    c = np.array([1.0])
    solver = scs.SCS({"A": A, "b": b_bad, "c": c}, {"l": 2}, verbose=False)
    s1 = solver.solve()
    assert s1["info"]["status"] == "infeasible"
    solver.update(b=np.array([1.0, 0.0]))  # 0 <= x <= 1: feasible
    s2 = solver.solve(warm_start=False)
    assert s2["info"]["status"] == "solved"


def test_strategies_agree():
    # reference: test_scs_coverage.py:2060-2080 cross-backend agreement
    K = {"z": 2, "l": 6, "q": [4]}
    # with_P makes the objective strongly convex -> unique optimum, so the
    # two strategies' solutions are directly comparable
    data, opt, _ = oracle.gen_feasible(K, n=10, density=0.8, with_P=True,
                                       rng=np.random.RandomState(41))
    s_dir = _solve(data, K, solver_strategy="direct", eps_abs=1e-8,
                   eps_rel=1e-8)
    s_ind = _solve(data, K, solver_strategy="indirect", eps_abs=1e-8,
                   eps_rel=1e-8)
    assert s_dir["info"]["status"] == s_ind["info"]["status"] == "solved"
    np.testing.assert_allclose(s_dir["x"], s_ind["x"], atol=1e-3)
    assert_almost_equal(s_dir["info"]["pobj"], opt, decimal=4)
    assert_almost_equal(s_ind["info"]["pobj"], opt, decimal=4)


def test_linear_solver_enum_dispatch():
    # every reference backend name maps onto a working strategy
    for ls in scs.LinearSolver:
        sol = scs.SCS(_TINY, {"l": 2}, verbose=False, linear_solver=ls).solve()
        assert sol["info"]["status"] == "solved"


# ---------------------------------------------------------------------------
# File outputs (reference: test_scs_coverage.py:532-547, 1728-1751)
# ---------------------------------------------------------------------------


def test_write_data_file(tmp_path):
    fname = str(tmp_path / "prob.npz")
    solver = scs.SCS(_TINY, {"l": 2}, verbose=False, write_data_filename=fname)
    assert os.path.exists(fname)
    from scs_tpu.io import read_problem

    data, cone, stgs = read_problem(fname)
    np.testing.assert_allclose(data["b"], _TINY["b"])
    np.testing.assert_allclose(data["c"], _TINY["c"])
    assert cone["l"] == 2
    # reload must solve identically
    sol = scs.SCS(data, cone, verbose=False).solve()
    assert sol["info"]["status"] == "solved"


def test_write_data_file_native_binary(tmp_path):
    """Round-trip of the native C++ binary snapshot (rw.c analogue,
    csc_ops.cpp) selected by the '.bin' suffix, incl. P and a mixed cone."""
    from scs_tpu import native

    if not native.available:
        import pytest

        pytest.skip("native toolchain unavailable")
    from scipy import sparse as sp

    rng = np.random.RandomState(5)
    m, n = 13, 7
    A = sp.random(m, n, density=0.4, random_state=rng, format="csc")
    A = A + sp.eye(m, n, format="csc")
    Pu = sp.triu(sp.random(n, n, density=0.5, random_state=rng), format="csc")
    Pu = (Pu + sp.eye(n, format="csc")).tocsc()
    b, c = rng.randn(m), rng.randn(n)
    data = {"A": A.tocsc(), "b": b, "c": c, "P": Pu}
    cone = {"z": 2, "l": 5, "q": [3, 3]}
    fname = str(tmp_path / "prob.bin")
    from scs_tpu.io import read_problem, write_problem

    write_problem(fname, data, cone, {"eps_abs": 1e-5, "max_iters": 321,
                                      "normalize": True})
    assert os.path.exists(fname)
    data2, cone2, stgs2 = read_problem(fname)
    np.testing.assert_allclose(data2["b"], b)
    np.testing.assert_allclose(data2["c"], c)
    np.testing.assert_allclose(
        np.asarray(data2["A"].todense()), np.asarray(A.todense()))
    np.testing.assert_allclose(
        np.asarray(data2["P"].todense()), np.asarray(Pu.todense()))
    assert cone2 == {"z": 2, "l": 5, "q": [3, 3]}
    assert stgs2["max_iters"] == 321 and stgs2["eps_abs"] == 1e-5
    # write_data_filename='*.bin' goes through the same native writer
    fname2 = str(tmp_path / "viainit.bin")
    scs.SCS(data, cone, verbose=False, write_data_filename=fname2,
            max_iters=50)
    d3, c3, _ = read_problem(fname2)
    assert c3 == cone and d3["A"].nnz == A.nnz


def test_csv_log_file(tmp_path):
    fname = str(tmp_path / "log.csv")
    solver = scs.SCS(_TINY, {"l": 2}, verbose=False, log_csv_filename=fname)
    solver.solve()
    assert os.path.exists(fname)
    with open(fname) as f:
        header = f.readline().strip().split(",")
        rows = f.readlines()
    # reference CSV schema columns (analyze_csv_logs.ipynb cells 3-12)
    for col in ("iter", "res_pri", "res_dual", "gap", "tau", "scale",
                "aa_norm", "time"):
        assert col in header, f"missing CSV column {col}"
    assert len(rows) >= 1


def test_verbose_output(capsys):
    solver = scs.SCS(_TINY, {"l": 2}, verbose=True)
    solver.solve()
    out = capsys.readouterr().out
    assert "pri res" in out or "iter" in out
    assert "status" in out.lower() or "solved" in out.lower()


# ---------------------------------------------------------------------------
# Mixed-cone feasible problem at the reference's own K (the headline
# correctness anchor, test_solve_random_cone_prob.py:33-65)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_reference_k_mix():
    K = {
        "z": 10,
        "l": 15,
        "q": [5, 10, 0, 1],
        "s": [3, 4, 0, 0, 1],
        "ep": 3,
        "ed": 3,
        "p": [-0.25, 0.5],
    }
    data, opt, _ = oracle.gen_feasible(K, n=40, density=0.5,
                                       rng=np.random.RandomState(55))
    sol = _solve(data, K, eps_abs=1e-7, eps_rel=1e-7)
    assert sol["info"]["status"] == "solved"
    assert_almost_equal(sol["info"]["pobj"], opt, decimal=3)
    x, y, s = sol["x"], sol["y"], sol["s"]
    A = data["A"].toarray()
    assert np.linalg.norm(A @ x - data["b"] + s) < 1e-3
    assert np.linalg.norm(A.T @ y + data["c"]) < 1e-3
    assert abs(s @ y) < 1e-4
    np.testing.assert_allclose(s, oracle.proj_cone(s, K), atol=1e-4)
    np.testing.assert_allclose(y, oracle.proj_dual_cone(y, K), atol=1e-4)


# -- factorization reuse (reference scs_update semantics, SURVEY §3.3) ----


def _small_qp(seed=3):
    rng = np.random.RandomState(seed)
    m, n = 30, 20
    A = rng.randn(m, n) / np.sqrt(m)
    x0 = rng.randn(n)
    b = A @ x0 + np.abs(rng.randn(m))
    c = rng.randn(n) * 0.1
    G = rng.randn(n, 4)
    P = G @ G.T * 0.1 + 1e-3 * np.eye(n)
    return {
        "A": sp.csc_matrix(A),
        "b": b,
        "c": c,
        "P": sp.csc_matrix(np.triu(P)),
    }, m, n


def test_update_path_has_no_cholesky():
    """update(b, c) must reuse the numeric factor: the jaxpr of the
    factor-reusing init program contains no Cholesky, while the full init
    does (VERDICT r2 item 4; reference scsobject.h:1216-1219)."""
    import jax

    data, m, n = _small_qp()
    solver = scs.SCS(data, {"l": m}, verbose=False, solver_strategy="direct")
    core, mats = solver.core, solver.mats
    full = str(jax.make_jaxpr(core._init_pure)(mats))
    reuse = str(
        jax.make_jaxpr(core._init_from_factor)(mats, solver._state0.L)
    )
    assert "cholesky" in full
    assert "cholesky" not in reuse
    assert "triangular_solve" in reuse  # g is recomputed via the factor


def test_repeat_solve_reuses_setup():
    """A second solve() and a post-update solve must not re-run the full
    init program (the factorization cache is self._state0)."""
    data, m, n = _small_qp()
    solver = scs.SCS(
        data, {"l": m}, verbose=False, eps_abs=1e-7, eps_rel=1e-7
    )

    calls = {"n": 0}
    orig = solver.core._jit_init

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    solver.core._jit_init = counting
    try:
        s1 = solver.solve(warm_start=False)
        s2 = solver.solve()  # warm
        solver.update(b=data["b"] * 1.1)
        s3 = solver.solve(warm_start=False)
    finally:
        solver.core._jit_init = orig
    assert calls["n"] == 0, "solve()/update() re-ran the full init program"
    assert s1["info"]["status"] == "solved"
    assert s3["info"]["status"] == "solved"
    # the post-update solution tracks the perturbed problem
    A = data["A"].toarray()
    assert np.linalg.norm(A @ s3["x"] + s3["s"] - 1.1 * data["b"]) < 1e-3


def test_update_after_solve_correct_objective():
    """Sequential updates track optima with the reused factor
    (reference test_scs_coverage.py:1226-1238 analogue)."""
    data, m, n = _small_qp(seed=11)
    solver = scs.SCS(
        data, {"l": m}, verbose=False, eps_abs=1e-8, eps_rel=1e-8
    )
    for fac in (1.0, 1.3, 0.7):
        solver.update(c=data["c"] * fac)
        got = solver.solve(warm_start=False)
        fresh = scs.solve(
            {**data, "c": data["c"] * fac},
            {"l": m},
            verbose=False,
            eps_abs=1e-8,
            eps_rel=1e-8,
        )
        assert got["info"]["status"] == "solved"
        assert_almost_equal(
            got["info"]["pobj"], fresh["info"]["pobj"], decimal=4
        )


# -- round-3 coverage growth (VERDICT r2 item 10) --------------------------


@pytest.mark.slow
def test_strategies_agree_tight_qp_soc_sdp():
    """Cross-strategy agreement at eps=1e-9 on a QP+SOC+SDP mix
    (reference test_scs_coverage.py:2060-2080 at its tightest eps)."""
    K = {"z": 1, "l": 3, "q": [3], "s": [3]}
    data, opt, _ = oracle.gen_feasible(
        K, n=8, density=0.9, with_P=True, rng=np.random.RandomState(77)
    )
    sols = {}
    for strat in ("direct", "indirect"):
        s = _solve(
            data, K, solver_strategy=strat, eps_abs=1e-9, eps_rel=1e-9,
            max_iters=200000,
        )
        assert s["info"]["status"] == "solved", (strat, s["info"]["status"])
        sols[strat] = s
    np.testing.assert_allclose(
        sols["direct"]["x"], sols["indirect"]["x"], atol=1e-6
    )
    for strat in sols:
        assert_almost_equal(sols[strat]["info"]["pobj"], opt, decimal=6)


@pytest.mark.slow
@pytest.mark.parametrize("strategy", ["direct", "indirect"])
def test_closed_forms_per_strategy(strategy):
    """Each cone family's closed-form optimum, exercised per strategy
    (the reference parametrizes its closed-form sections over backends)."""
    # LP: min x st x >= 1 -> x* = 1 (reference test_scs_coverage.py:23-32)
    sol = scs.solve(
        {"A": sp.csc_matrix(np.array([[-1.0]])), "b": np.array([-1.0]),
         "c": np.array([1.0])},
        {"l": 1}, verbose=False, solver_strategy=strategy,
        eps_abs=1e-9, eps_rel=1e-9,
    )
    assert sol["info"]["status"] == "solved"
    assert_almost_equal(sol["x"][0], 1.0, decimal=6)

    # QP: min x^2/2 + x st x >= -0.5 -> x* = -0.5 variant (ref :761-779
    # uses x*=0.5 with different signs; same mechanics)
    sol = scs.solve(
        {"A": sp.csc_matrix(np.array([[-1.0]])), "b": np.array([0.5]),
         "c": np.array([1.0]),
         "P": sp.csc_matrix(np.array([[1.0]]))},
        {"l": 1}, verbose=False, solver_strategy=strategy,
        eps_abs=1e-9, eps_rel=1e-9,
    )
    assert sol["info"]["status"] == "solved"
    assert_almost_equal(sol["x"][0], -0.5, decimal=6)

    # SOC: min -x1 st ||(x1, x2)|| <= 1, x2 = 0.5 -> x1* = sqrt(3)/2
    # (reference :1055-1084)
    A = np.zeros((4, 2))
    A[0, :] = [0.0, 1.0]      # zero cone: x2 = 0.5
    A[1:, :] = [[0.0, 0.0], [-1.0, 0.0], [0.0, -1.0]]  # SOC(1, x1, x2)
    b = np.array([0.5, 1.0, 0.0, 0.0])
    sol = scs.solve(
        {"A": sp.csc_matrix(A), "b": b, "c": np.array([-1.0, 0.0])},
        {"z": 1, "q": [3]}, verbose=False, solver_strategy=strategy,
        eps_abs=1e-9, eps_rel=1e-9,
    )
    assert sol["info"]["status"] == "solved"
    assert_almost_equal(sol["x"][0], np.sqrt(3.0) / 2.0, decimal=6)

    # exp cone: min t st (1, 1, t) in Kexp -> t* = e (reference :912-951)
    A = np.zeros((3, 1))
    A[2, 0] = -1.0
    b = np.array([1.0, 1.0, 0.0])
    sol = scs.solve(
        {"A": sp.csc_matrix(A), "b": b, "c": np.array([1.0])},
        {"ep": 1}, verbose=False, solver_strategy=strategy,
        eps_abs=1e-9, eps_rel=1e-9,
    )
    assert sol["info"]["status"] == "solved"
    assert_almost_equal(sol["x"][0], np.e, decimal=5)


def test_indeterminate_end_to_end():
    """A solve whose final iterate carries no signal (tau ~ kappa ~ 0,
    no certificate at 1e3-relaxed tolerances) must classify as
    INDETERMINATE through the normal solve path (reference
    scs/py/__init__.py:20), not just via the unit predicate."""
    import jax.numpy as jnp

    data, m, n = _small_qp(seed=5)
    solver = scs.SCS(
        data, {"l": m}, verbose=False, max_iters=25, eps_abs=1e-12,
        eps_rel=1e-12,
    )
    core = solver.core
    orig = core._jit_chunk

    def sabotage(state, mats):
        st = orig(state, mats)
        scale = 1e-14
        # collapse the embedding ray: every component -> ~0 with
        # tau/kappa EXACTLY 0 so no candidate normalizes to a cert
        return st._replace(
            u=(st.u * scale).at[-1].set(0.0),
            v=(st.v * scale).at[-1].set(0.0),
            w=st.w * scale,
            u_sum=jnp.zeros_like(st.u_sum),
            v_sum=jnp.zeros_like(st.v_sum),
            avg_cnt=jnp.zeros_like(st.avg_cnt),
            status=jnp.int32(scs.UNFINISHED),
        )

    core._jit_chunk = sabotage
    # silent solves batch chunks via _jit_multi_chunk (host-poll
    # batching); route it through the sabotaged single-chunk path too
    orig_multi = core._jit_multi_chunk
    core._jit_multi_chunk = (
        lambda state, mats, seg, max_iters: sabotage(state, mats)
    )
    try:
        sol = solver.solve(warm_start=False)
    finally:
        core._jit_chunk = orig
        core._jit_multi_chunk = orig_multi
    assert sol["info"]["status"] == "indeterminate"
    assert sol["info"]["status_val"] == scs.INDETERMINATE


def test_determinism_fresh_instances():
    """Two fresh instances on identical data produce bit-identical
    solutions (reference test_scs_coverage.py:2283-2301)."""
    data, m, n = _small_qp(seed=21)
    s1 = scs.SCS(data, {"l": m}, verbose=False).solve(warm_start=False)
    s2 = scs.SCS(data, {"l": m}, verbose=False).solve(warm_start=False)
    np.testing.assert_array_equal(s1["x"], s2["x"])
    np.testing.assert_array_equal(s1["y"], s2["y"])
    np.testing.assert_array_equal(s1["s"], s2["s"])
    assert s1["info"]["iter"] == s2["info"]["iter"]
