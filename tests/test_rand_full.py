"""Full-depth random sweeps — the port of the reference's
test_scs_rand.py (50 feasible + 10 infeasible + 10 unbounded per
strategy, reference K and seeds 1000/1001/1002, opts at
/root/reference/test/test_scs_rand.py:55-72) and test_scs_sdp.py (same
counts with the SDP-heavy K including 10x10 and 8x8 PSD blocks).

The reference's backend matrix [AUTO, QDLDL, CPU_INDIRECT] maps onto the
TPU strategies [direct, indirect] (SURVEY.md §2.4); unbounded detection is
direct-only, mirroring the reference's known-flaky indirect skip
(test_scs_rand.py:113-114).
"""

import numpy as np
import pytest
from numpy.testing import assert_almost_equal

import scs_tpu as scs

import oracle

# full-depth sweeps: ~3 minutes of the suite's budget on their own
pytestmark = pytest.mark.slow

num_feas = 50
num_unb = 10
num_infeas = 10

opts = {
    "max_iters": 100000,
    "eps_abs": 1e-5,
    "eps_infeas": 1e-5,
    "verbose": False,
}

# reference K (test_scs_rand.py:64-72)
K = {
    "z": 10,
    "l": 25,
    "q": [5, 10, 0, 1],
    "s": [2, 1, 2, 0, 1],
    "ep": 0,
    "ed": 0,
    "p": [0.25, -0.75, 0.33, -0.33, 0.2],
}
m = oracle.cone_dims(K)

# reference SDP-heavy K (test_scs_sdp.py: s gains 10 and 8 blocks)
K_SDP = dict(K, s=[2, 1, 2, 0, 1, 10, 8])
m_sdp = oracle.cone_dims(K_SDP)
opts_sdp = dict(opts, max_iters=10000)

STRATEGIES = ["direct", "indirect"]


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_feasible(strategy):
    rng = np.random.RandomState(1000)
    for _ in range(num_feas):
        data, p_star, _ = oracle.gen_feasible(K, n=m // 3, density=0.1, rng=rng)
        solver = scs.SCS(data, K, solver_strategy=strategy, **opts)
        sol = solver.solve()
        assert_almost_equal(np.dot(data["c"], sol["x"]), p_star, decimal=2)
        assert_almost_equal(np.dot(-data["b"], sol["y"]), p_star, decimal=2)


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_infeasible(strategy):
    rng = np.random.RandomState(1001)
    for _ in range(num_infeas):
        data = oracle.gen_infeasible(K, n=m // 2, rng=rng)
        solver = scs.SCS(data, K, solver_strategy=strategy, **opts)
        sol = solver.solve()
        assert sol["info"]["status"] == "infeasible"


@pytest.mark.parametrize("strategy", ["direct"])
def test_unbounded(strategy):
    rng = np.random.RandomState(1002)
    for _ in range(num_unb):
        data = oracle.gen_unbounded(K, n=m // 2, rng=rng)
        solver = scs.SCS(data, K, solver_strategy=strategy, **opts)
        sol = solver.solve()
        assert sol["info"]["status"] == "unbounded"


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_feasible_sdp(strategy):
    rng = np.random.RandomState(1000)
    for _ in range(num_feas):
        data, p_star, _ = oracle.gen_feasible(
            K_SDP, n=m_sdp // 3, density=0.1, rng=rng
        )
        solver = scs.SCS(data, K_SDP, solver_strategy=strategy, **opts_sdp)
        sol = solver.solve()
        assert_almost_equal(np.dot(data["c"], sol["x"]), p_star, decimal=2)
        assert_almost_equal(np.dot(-data["b"], sol["y"]), p_star, decimal=2)


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_infeasible_sdp(strategy):
    rng = np.random.RandomState(1001)
    for _ in range(num_infeas):
        data = oracle.gen_infeasible(K_SDP, n=m_sdp // 2, rng=rng)
        solver = scs.SCS(data, K_SDP, solver_strategy=strategy, **opts_sdp)
        sol = solver.solve()
        assert sol["info"]["status"] == "infeasible"


@pytest.mark.parametrize("strategy", ["direct"])
def test_unbounded_sdp(strategy):
    rng = np.random.RandomState(1002)
    for _ in range(num_unb):
        data = oracle.gen_unbounded(K_SDP, n=m_sdp // 2, rng=rng)
        solver = scs.SCS(data, K_SDP, solver_strategy=strategy, **opts_sdp)
        sol = solver.solve()
        assert sol["info"]["status"] == "unbounded"


# --- mixed sweep including the complex-PSD and ell1 spectral cone (round-1
# Weak #9: spectral/complex cones were only exercised via 1-variable
# epigraph problems, never inside a random mixed-K feasible sweep with
# full KKT/membership checks) ---

K_SPECTRAL = {
    "z": 4,
    "l": 10,
    "q": [5, 3],
    "s": [3],
    "cs": [3],
    "ep": 2,
    "p": [0.4, -0.6],
    "d": [2],
    "nuc_m": [3],
    "nuc_n": [2],
    "ell1": [4],
    "sl_n": [3],
    "sl_k": [2],
}
m_spec = oracle.cone_dims(K_SPECTRAL)


@pytest.mark.parametrize("seed", range(5000, 5010))
def test_feasible_spectral_mix(seed):
    rng = np.random.RandomState(seed)
    data, p_star, _ = oracle.gen_feasible(
        K_SPECTRAL, n=m_spec // 2, density=0.3, rng=rng
    )
    sol = scs.solve(
        data, K_SPECTRAL, verbose=False, eps_abs=1e-7, eps_rel=1e-7,
        max_iters=50000,
    )
    x, y, s = sol["x"], sol["y"], sol["s"]
    assert sol["info"]["status"] == "solved"
    assert_almost_equal(np.dot(data["c"], x), p_star, decimal=3)
    assert np.linalg.norm(data["A"] @ x - data["b"] + s) < 1e-3
    assert np.linalg.norm(data["A"].T @ y + data["c"]) < 1e-3
    assert_almost_equal(s.T @ y, 0.0, decimal=6)
    assert_almost_equal(s, oracle.proj_cone(s, K_SPECTRAL), decimal=4)
    assert_almost_equal(y, oracle.proj_dual_cone(y, K_SPECTRAL), decimal=3)
