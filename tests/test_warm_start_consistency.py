"""Warm-start consistency regression — the counterpart of the reference's
test_warm_start_consistency.py (GitHub issue #350: on a poorly-scaled QP,
the FIRST .solve(warm_start=True, x=..., y=..., s=...) call returned
'infeasible' while an identical second call and a cold start returned
'solved'; /root/reference/test/test_warm_start_consistency.py:1-10,
257-301).

The reference embeds its original 15-var/60-constraint QP data verbatim;
here an equivalent stressor is generated deterministically with the same
structure and failure surface: a dense ill-scaled PSD P (entries ~5e4,
eigenvalues spanning ~6 orders), mixed-magnitude box-like constraints, and
warm-start vectors taken from a barely-perturbed true solution — the
regime where a normalization / warm-start-mapping bug misclassifies the
first warm solve.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import scs_tpu as scs

_N, _M = 15, 60


def _make_problem():
    rng = np.random.RandomState(350)
    # ill-scaled dense PSD P: magnitudes ~5e4 with a wide spectrum
    t = np.linspace(0, 1, _N)
    G = np.exp(-8.0 * np.abs(t[:, None] - t[None, :]))  # smooth kernel
    P = 5e4 * (G @ G.T) + 1e-2 * np.eye(_N)
    # stacked bounds-like constraints with mixed row magnitudes
    A = np.vstack(
        [
            np.eye(_N) * 1.0,
            -np.eye(_N) * 1.0,
            rng.randn(_M - 2 * _N, _N) * np.logspace(0, 2, _N)[None, :],
        ]
    )
    ub = np.concatenate(
        [
            np.linspace(10, 230, _N),
            np.linspace(10, 230, _N),
            np.abs(rng.randn(_M - 2 * _N)) * 100 + 10,
        ]
    )
    c = -P @ np.linspace(1.0, 3.0, _N)  # pushes toward active bounds
    data = {
        "P": sp.csc_matrix(np.triu(P)),
        "A": sp.csc_matrix(A),
        "b": ub,
        "c": c,
    }
    return data, {"l": _M}


_SOLVER_KWARGS = dict(
    verbose=False,
    normalize=True,
    max_iters=100000,
    scale=0.1,
    adaptive_scale=True,
    eps_abs=1e-7,
    eps_rel=1e-6,
    eps_infeas=1e-7,
    alpha=1.5,
    rho_x=1e-6,
    acceleration_interval=10,
)

_AA_PARAMS = pytest.mark.parametrize(
    "acceleration_lookback", [0, 10], ids=["aa_off", "aa_on"]
)


def _warm_vectors():
    """A near-solution warm start (the #350 trigger shape: warm vectors a
    hair away from optimal, with tiny negative slack violations)."""
    data, cones = _make_problem()
    kwargs = dict(_SOLVER_KWARGS)
    solver = scs.SCS(data, cones, **kwargs)
    sol = solver.solve()
    assert sol["info"]["status"] == "solved"
    rng = np.random.RandomState(99)
    x0 = sol["x"] + 1e-6 * rng.randn(_N)
    y0 = np.maximum(sol["y"] + 1e-6 * rng.randn(_M), 0)
    s0 = np.maximum(sol["s"] + 1e-6 * rng.randn(_M), 0)
    return data, cones, x0, y0, s0


@_AA_PARAMS
def test_warm_start_first_call_not_infeasible(acceleration_lookback):
    data, cones, x0, y0, s0 = _warm_vectors()
    kwargs = {**_SOLVER_KWARGS, "acceleration_lookback": acceleration_lookback}
    solver = scs.SCS(data, cones, **kwargs)
    sol = solver.solve(warm_start=True, x=x0.copy(), y=y0.copy(), s=s0.copy())
    assert sol["info"]["status"] != "infeasible"


@_AA_PARAMS
def test_warm_start_consistent_with_cold_start(acceleration_lookback):
    data, cones, x0, y0, s0 = _warm_vectors()
    kwargs = {**_SOLVER_KWARGS, "acceleration_lookback": acceleration_lookback}

    solver_warm = scs.SCS(data, cones, **kwargs)
    w1 = solver_warm.solve(warm_start=True, x=x0.copy(), y=y0.copy(), s=s0.copy())
    w2 = solver_warm.solve(warm_start=True, x=x0.copy(), y=y0.copy(), s=s0.copy())

    solver_cold = scs.SCS(data, cones, **kwargs)
    cold = solver_cold.solve()

    assert cold["info"]["status"] == "solved"
    assert w1["info"]["status"] == cold["info"]["status"]
    assert w2["info"]["status"] == cold["info"]["status"]


def test_warm_start_reduces_iterations():
    """Warm starting from the solution converges in (far) fewer iterations
    (reference semantics: test_scs_coverage.py:1899-1914)."""
    data, cones, x0, y0, s0 = _warm_vectors()
    solver = scs.SCS(data, cones, **_SOLVER_KWARGS)
    cold = solver.solve(warm_start=False)
    warm = solver.solve(warm_start=True, x=x0, y=y0, s=s0)
    assert warm["info"]["status"] == "solved"
    assert warm["info"]["iter"] <= cold["info"]["iter"]
