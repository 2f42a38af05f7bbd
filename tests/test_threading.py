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


def test_error_path_releases_lock():
    """An update()/solve() that raises must release the per-instance lock
    (reference: lock-release-on-error deadlock classes,
    test_free_threading.py:877-985). A leaked lock deadlocks the next
    call; run it on a worker thread with a timeout so a regression fails
    instead of hanging the suite."""
    data, cone = _tiny_qp(11)
    solver = scs_tpu.SCS(data, cone, **KW)

    for bad in (np.zeros(3), np.zeros((5, 5))):
        try:
            solver.update(b=bad)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass

    done = {}

    def follow_up():
        done["sol"] = solver.solve()

    t = threading.Thread(target=follow_up, daemon=True)
    t.start()
    t.join(timeout=120)
    assert not t.is_alive(), "lock leaked by the failing update()"
    assert done["sol"]["info"]["status"] == "solved"


def test_dealloc_during_concurrent_solve():
    """Drop the last external reference while another thread is inside
    solve(): the running call must complete and return a valid solution
    (reference TOCTOU regression: dealloc-vs-solve on self->work,
    test_free_threading.py:687-743 — there the C extension must not free
    the workspace under a live solve; here the running thread's reference
    keeps the instance alive and the lock serializes teardown)."""
    import gc

    data, cone = _tiny_qp(13)
    holder = [scs_tpu.SCS(data, cone, **KW)]
    started = threading.Event()
    out = {}

    def work():
        s = holder[0]
        started.set()
        out["sol"] = s.solve()

    t = threading.Thread(target=work)
    t.start()
    started.wait()
    holder.clear()  # main thread drops its reference mid-solve
    gc.collect()
    t.join(timeout=300)
    assert not t.is_alive()
    assert out["sol"]["info"]["status"] == "solved"


def test_concurrent_construction_does_not_mutate_inputs():
    """Constructor inputs are shared across threads; construction must not
    mutate the caller's dicts/arrays (reference borrowed-ref/concurrent-
    init regressions, test_free_threading.py:562-683, and the
    non-mutating sorted_indices contract, scs/py/__init__.py:137-142)."""
    data, cone = _tiny_qp(17)
    A_bytes = data["A"].data.tobytes()
    b_copy = data["b"].copy()
    cone_copy = dict(cone)

    def build(_):
        s = scs_tpu.SCS(data, cone, **KW)
        return s.solve()["info"]["status"]

    with ThreadPoolExecutor(max_workers=4) as ex:
        statuses = list(ex.map(build, range(8)))
    assert all(st == "solved" for st in statuses)
    assert data["A"].data.tobytes() == A_bytes
    np.testing.assert_array_equal(data["b"], b_copy)
    assert cone == cone_copy
