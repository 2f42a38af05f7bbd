"""Failure-taxonomy tests: INDETERMINATE, SIGINT, time limit, FAILED —
the reference status surface at /root/reference/scs/py/__init__.py:16-25
and the 'failure detection' subsystem of SURVEY.md §5."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import scs_tpu as scs
from scs_tpu import info as info_mod


def _lp(seed=0, m=40, n=20):
    rng = np.random.RandomState(seed)
    A = rng.randn(m, n)
    x0 = rng.randn(n)
    b = A @ x0 + np.abs(rng.randn(m))
    c = rng.randn(n)
    return {"A": sp.csc_matrix(A), "b": b, "c": c}, {"l": m}


def test_indeterminate_classification():
    """A state whose tau AND kappa collapsed (relative to the iterate norm)
    with no certificate classifies as INDETERMINATE = -3 — 'indeterminate
    (norm too small)', reference scs/py/__init__.py:20."""
    data, cone = _lp()
    solver = scs.SCS(data, cone, verbose=False, max_iters=50)
    state = solver.core.init_state(solver.mats)
    N = solver.core.N
    u = jnp.ones(N).at[-1].set(0.0) * jnp.sqrt(N / (N - 1.0))
    state = state._replace(u=u, v=jnp.zeros(N))
    assert scs.SCS._is_indeterminate(
        state, float(state.u[-1]), float(state.v[-1])
    )
    # ...and a healthy state does not
    healthy = solver.core.init_state(solver.mats)
    assert not scs.SCS._is_indeterminate(
        healthy, float(healthy.u[-1]), float(healthy.v[-1])
    )


def test_indeterminate_status_string():
    assert info_mod.STATUS_STRINGS[info_mod.INDETERMINATE] == "indeterminate"
    info = info_mod.make_info(info_mod.INDETERMINATE, 10)
    assert info["status"] == "indeterminate"
    assert info["status_val"] == -3


def test_exhaustion_classifies_inaccurate():
    """max_iters exhaustion on a feasible problem yields solved_inaccurate
    (reference *_inaccurate semantics), never a hard failure."""
    data, cone = _lp(seed=3)
    sol = scs.solve(
        data, cone, verbose=False, max_iters=30, eps_abs=1e-12, eps_rel=1e-12
    )
    assert sol["info"]["status"] in ("solved_inaccurate", "solved")
    assert sol["info"]["iter"] <= 60  # one chunk of slack beyond the cap


def test_time_limit_stops_early():
    data, cone = _lp(seed=4, m=120, n=60)
    sol = scs.solve(
        data,
        cone,
        verbose=False,
        eps_abs=1e-14,
        eps_rel=1e-14,
        max_iters=10_000_000,
        time_limit_secs=1.0,
    )
    # terminated by the limit, classified inaccurate (not hung, not failed)
    assert sol["info"]["status"].endswith("inaccurate") or (
        sol["info"]["status"] == "solved"
    )


def test_sigint_status_maps_to_interrupted():
    """The SIGINT path: a KeyboardInterrupt inside the solve loop maps to
    status 'interrupted' (= SIGINT = -5), with partial results returned —
    the ctrlc.c counterpart (SURVEY §2.3). Simulated by raising from the
    verbose-print callback, exactly where a Ctrl-C lands (between device
    dispatches in the pipelined host loop)."""
    import scs_tpu.api as api_mod

    data, cone = _lp(seed=5)
    solver = scs.SCS(
        data, cone, verbose=True, eps_abs=1e-12, eps_rel=1e-12, max_iters=100000
    )

    calls = {"n": 0}
    real = api_mod.print_iter_line

    def fake_print(*a, **k):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise KeyboardInterrupt
        return real(*a, **k)

    orig = api_mod.print_iter_line
    api_mod.print_iter_line = fake_print
    try:
        sol = solver.solve()
    finally:
        api_mod.print_iter_line = orig
    assert sol["info"]["status"] == "interrupted"
    assert sol["info"]["status_val"] == info_mod.SIGINT
    # the lock must have been released: the instance is reusable
    sol2 = solver.solve()
    assert sol2["info"]["status"] in ("solved", "solved_inaccurate")


def test_failed_on_nonfinite_data():
    """NaN/Inf in the iterate maps to FAILED, never an unflagged answer."""
    rng = np.random.RandomState(6)
    m, n = 10, 5
    A = rng.randn(m, n)
    A[0, 0] = 1e300  # normalization squashes this but the solve blows up
    b = rng.randn(m)
    b[0] = -1e300
    c = np.full(n, 1e300)
    sol = scs.solve(
        {"A": sp.csc_matrix(A), "b": b, "c": c},
        {"l": m},
        verbose=False,
        normalize=False,
        max_iters=200,
    )
    assert sol["info"]["status"] in (
        "failed",
        "unbounded",
        "infeasible",
        "unbounded_inaccurate",
        "infeasible_inaccurate",
        "indeterminate",
    )
