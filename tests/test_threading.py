"""Thread-safety at the Python API level — the counterpart of the
reference's free-threading suite (test/test_free_threading.py): many
threads over independent instances, solve barrages on a shared instance,
and interleaved update/solve. JAX releases the GIL during device
execution, so independent instances genuinely overlap; a per-instance
lock (api.SCS._lock discipline mirror of scsobject.h:939-955) keeps
shared-instance state transitions consistent."""

import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from scipy import sparse

import scs_tpu


def _tiny_qp(seed):
    rng = np.random.RandomState(seed)
    m, n = 30, 20
    A = rng.randn(m, n)
    x0 = rng.randn(n)
    b = A @ x0 + np.abs(rng.randn(m))
    c = rng.randn(n)
    G = rng.randn(n, 4)
    P = G @ G.T * 0.1 + np.eye(n)
    return (
        {
            "A": sparse.csc_matrix(A),
            "b": b,
            "c": c,
            "P": sparse.csc_matrix(np.triu(P)),
        },
        {"l": m},
    )


KW = dict(eps_abs=1e-6, eps_rel=1e-6, verbose=False, max_iters=5000)


def test_independent_instances_parallel():
    """N threads, each with its own instance: all must solve and agree
    with a serial run (reference: independent-instances classes)."""
    seeds = list(range(6))
    serial = {}
    for s in seeds:
        data, cone = _tiny_qp(s)
        serial[s] = scs_tpu.SCS(data, cone, **KW).solve()

    def work(s):
        data, cone = _tiny_qp(s)
        return s, scs_tpu.SCS(data, cone, **KW).solve()

    with ThreadPoolExecutor(max_workers=4) as ex:
        for s, sol in ex.map(work, seeds):
            assert sol["info"]["status"] == "solved"
            np.testing.assert_allclose(
                sol["x"], serial[s]["x"], rtol=1e-5, atol=1e-6
            )


def test_shared_instance_solve_barrage():
    """Many threads hammering .solve() on ONE instance: every call must
    return a consistent solved result (reference: shared-instance
    barrage, test_free_threading.py:234+)."""
    data, cone = _tiny_qp(42)
    solver = scs_tpu.SCS(data, cone, **KW)
    ref = solver.solve()
    barrier = threading.Barrier(4)
    results = []

    def work(_):
        barrier.wait()
        return solver.solve()

    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(work, range(8)))
    for sol in results:
        assert sol["info"]["status"] == "solved"
        np.testing.assert_allclose(sol["x"], ref["x"], rtol=1e-4, atol=1e-5)


def test_shared_instance_update_solve_interleaved():
    """update(b)/solve() interleaved from multiple threads must never
    corrupt state: every solve returns a valid solution of SOME of the
    b's that were set (reference: update/solve interleavings)."""
    data, cone = _tiny_qp(7)
    solver = scs_tpu.SCS(data, cone, **KW)
    A = np.asarray(data["A"].todense())
    bs = [data["b"] + 0.1 * k for k in range(4)]

    out = []

    def do_update(k):
        solver.update(b=bs[k % len(bs)])

    def do_solve(_):
        out.append(solver.solve())

    with ThreadPoolExecutor(max_workers=4) as ex:
        futs = []
        for k in range(8):
            futs.append(ex.submit(do_update, k))
            futs.append(ex.submit(do_solve, k))
        for f in futs:
            f.result()

    for sol in out:
        assert sol["info"]["status"] in ("solved", "solved_inaccurate")
        x, s = sol["x"], sol["s"]
        # primal residual must match one of the b's used
        r = min(
            np.linalg.norm(A @ x + s - bk) for bk in [data["b"], *bs]
        )
        assert r < 1e-3
