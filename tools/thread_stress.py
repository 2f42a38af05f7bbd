#!/usr/bin/env python
"""Thread-parallel iteration harness — the repo's analogue of the
reference's `pytest-run-parallel --parallel-threads=4 --iterations=3` CI
leg (/root/reference/.github/workflows/freethreading_tests.yml:49-52).

Runs every scenario from tests/test_threading.py-style concurrency
surface (shared-instance solve/update barrages, distinct-instance
parallel solves, error-path lock release) in T concurrent threads for I
iterations each, failing on any exception or cross-thread result
divergence.

Usage:  python tools/thread_stress.py [--threads 4] [--iterations 3]
CI:     .github/workflows/ci.yml "thread-stress" job.
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import os
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402
from scipy import sparse as sp  # noqa: E402


def _mk_problem(seed):
    rng = np.random.RandomState(seed)
    m, n = 40, 25
    A = rng.randn(m, n) / np.sqrt(m)
    b = A @ rng.randn(n) + np.abs(rng.randn(m))
    c = -(A.T @ np.abs(rng.randn(m)))
    return {"A": sp.csc_matrix(A), "b": b, "c": c}, {"l": m}


def scenario_shared_instance(threads, iterations):
    """T threads hammer ONE instance with solve/update (per-instance lock
    must serialize; results must be identical per round)."""
    import scs_tpu

    data, cone = _mk_problem(0)
    solver = scs_tpu.SCS(
        data, cone, verbose=False, eps_abs=1e-6, eps_rel=1e-6
    )
    for _ in range(iterations):
        barrier = threading.Barrier(threads)

        def work(i):
            barrier.wait()
            if i % 3 == 2:
                solver.update(b=data["b"] * (1.0 + 1e-9 * i))
            return solver.solve(warm_start=False)["info"]["status"]

        with cf.ThreadPoolExecutor(threads) as ex:
            statuses = list(ex.map(work, range(threads)))
        assert all(s == "solved" for s in statuses), statuses


def scenario_distinct_instances(threads, iterations):
    """T threads, T instances — fully parallel solves, deterministic
    per-seed results across threads and iterations."""
    import scs_tpu

    expected = {}
    for it in range(iterations):
        barrier = threading.Barrier(threads)

        def work(i):
            data, cone = _mk_problem(100 + i)
            solver = scs_tpu.SCS(
                data, cone, verbose=False, eps_abs=1e-6, eps_rel=1e-6
            )
            barrier.wait()
            sol = solver.solve(warm_start=False)
            return i, sol["info"]["status"], round(sol["info"]["pobj"], 6)

        with cf.ThreadPoolExecutor(threads) as ex:
            for i, status, pobj in ex.map(work, range(threads)):
                assert status == "solved", (i, status)
                if i in expected:
                    assert expected[i] == pobj, (
                        f"thread-{i} result diverged across iterations: "
                        f"{expected[i]} vs {pobj}"
                    )
                expected[i] = pobj


def scenario_error_path_lock_release(threads, iterations):
    """Exceptions inside update() must release the per-instance lock
    (reference deadlock regression, test_free_threading.py:877-985)."""
    import scs_tpu

    data, cone = _mk_problem(7)
    solver = scs_tpu.SCS(data, cone, verbose=False)
    for _ in range(iterations):
        def work(i):
            try:
                solver.update(b=np.zeros(3))  # wrong dim -> ValueError
            except ValueError:
                pass
            return solver.solve(warm_start=False)["info"]["status"]

        with cf.ThreadPoolExecutor(threads) as ex:
            statuses = list(ex.map(work, range(threads)))
        assert all(s == "solved" for s in statuses), statuses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--iterations", type=int, default=3)
    args = ap.parse_args()

    scenarios = [
        scenario_shared_instance,
        scenario_distinct_instances,
        scenario_error_path_lock_release,
    ]
    for fn in scenarios:
        fn(args.threads, args.iterations)
        print(f"ok: {fn.__name__} x{args.iterations} @ {args.threads} threads")
    print("thread-stress: all scenarios passed")


if __name__ == "__main__":
    main()
