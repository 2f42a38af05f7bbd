"""Random cone-problem sweeps with a-priori known status/optimum — the
port of the reference's test_solve_random_cone_prob.py and test_scs_rand.py
strategy (same cone mixes, same tolerance bars, same seeds)."""

import numpy as np
import pytest

import scs_tpu as scs

import oracle

# the reference's mixed-cone K (test_solve_random_cone_prob.py:33-41)
K = {
    "z": 10,
    "l": 15,
    "q": [5, 10, 0, 1],
    "s": [3, 4, 0, 0, 1],
    "ep": 10,
    "ed": 10,
    "p": [-0.25, 0.5, 0.75, -0.33],
}
m = oracle.cone_dims(K)
params = {"verbose": False, "eps_abs": 1e-7, "eps_rel": 1e-7, "eps_infeas": 1e-7}

# indirect at eps=1e-7 f64 costs ~12 s per sweep on CPU; the fast tier
# keeps the direct anchors and the slow tier runs both
STRATEGIES = [
    "direct",
    pytest.param("indirect", marks=pytest.mark.slow),
]


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_solve_feasible(strategy):
    rng = np.random.RandomState(3000)
    data, p_star, _ = oracle.gen_feasible(K, n=m // 3, density=0.1, rng=rng)
    solver = scs.SCS(data, K, solver_strategy=strategy, **params)
    sol = solver.solve()
    x, y, s = sol["x"], sol["y"], sol["s"]
    assert sol["info"]["status"] == "solved"
    np.testing.assert_almost_equal(np.dot(data["c"], x), p_star, decimal=3)
    assert np.linalg.norm(data["A"] @ x - data["b"] + s) < 1e-3
    assert np.linalg.norm(data["A"].T @ y + data["c"]) < 1e-3
    np.testing.assert_almost_equal(s.T @ y, 0.0, decimal=6)
    np.testing.assert_almost_equal(s, oracle.proj_cone(s, K), decimal=4)
    np.testing.assert_almost_equal(y, oracle.proj_dual_cone(y, K), decimal=3)


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_solve_infeasible(strategy):
    rng = np.random.RandomState(3001)
    data = oracle.gen_infeasible(K, n=m // 2, rng=rng)
    solver = scs.SCS(data, K, solver_strategy=strategy, **params)
    sol = solver.solve()
    assert sol["info"]["status"] == "infeasible"
    y = sol["y"]
    assert np.linalg.norm(data["A"].T @ y) < 1e-3
    assert data["b"].T @ y < -0.1
    np.testing.assert_almost_equal(y, oracle.proj_dual_cone(y, K), decimal=4)


@pytest.mark.parametrize("strategy", ["direct"])
def test_solve_unbounded(strategy):
    rng = np.random.RandomState(3002)
    data = oracle.gen_unbounded(K, n=m // 2, rng=rng)
    solver = scs.SCS(data, K, solver_strategy=strategy, **params)
    sol = solver.solve()
    assert sol["info"]["status"] == "unbounded"
    x, s = sol["x"], sol["s"]
    assert np.linalg.norm(data["A"] @ x + s) < 1e-3
    assert data["c"].T @ x < -0.1
    np.testing.assert_almost_equal(s, oracle.proj_cone(s, K), decimal=4)


# smaller sweep suite (reference: test_scs_rand.py runs 50/10/10; we keep a
# representative subset per CI budget and run the full sweep in bench)
K_SWEEP = {
    "z": 5,
    "l": 10,
    "q": [4, 6],
    "s": [3, 4],
    "ep": 2,
    "ed": 2,
    "p": [0.6, -0.4],
}
m_sweep = oracle.cone_dims(K_SWEEP)


@pytest.mark.parametrize("seed", range(1000, 1010))
def test_sweep_feasible(seed):
    rng = np.random.RandomState(seed)
    data, p_star, _ = oracle.gen_feasible(
        K_SWEEP, n=m_sweep // 2, density=0.3, rng=rng
    )
    sol = scs.solve(data, K_SWEEP, verbose=False, eps_abs=1e-5, eps_rel=1e-5,
                    max_iters=50000)
    assert sol["info"]["status"] == "solved"
    np.testing.assert_almost_equal(
        np.dot(data["c"], sol["x"]), p_star, decimal=2
    )


@pytest.mark.parametrize("seed", range(2000, 2005))
def test_sweep_infeasible(seed):
    rng = np.random.RandomState(seed)
    data = oracle.gen_infeasible(K_SWEEP, n=m_sweep // 2, rng=rng)
    sol = scs.solve(data, K_SWEEP, verbose=False, eps_abs=1e-5, eps_rel=1e-5)
    assert sol["info"]["status"] == "infeasible"


@pytest.mark.parametrize("seed", range(2100, 2105))
def test_sweep_unbounded(seed):
    rng = np.random.RandomState(seed)
    data = oracle.gen_unbounded(K_SWEEP, n=m_sweep // 2, rng=rng)
    sol = scs.solve(data, K_SWEEP, verbose=False, eps_abs=1e-5, eps_rel=1e-5)
    assert sol["info"]["status"] == "unbounded"


def test_feasible_with_P():
    rng = np.random.RandomState(4000)
    data, p_star, opt = oracle.gen_feasible(
        K_SWEEP, n=m_sweep // 2, density=0.3, rng=rng, with_P=True
    )
    sol = scs.solve(data, K_SWEEP, verbose=False, eps_abs=1e-6, eps_rel=1e-6)
    assert sol["info"]["status"] == "solved"
    x = sol["x"]
    P = data["P"]
    pobj = 0.5 * x @ (P @ x) + data["c"] @ x
    np.testing.assert_almost_equal(pobj, p_star, decimal=2)
