"""BatchedSCS.update(b, c) — the batched parametric-solve fast path —
plus time-limit and KeyboardInterrupt safety of the batched host loop
(VERDICT r4 item 5; reference scs_update semantics per
/root/reference/scs/scsobject.h:1133-1225 and SURVEY §3.3, sequential
updates tracking optima per test_scs_coverage.py:1226-1238)."""

import numpy as np
import pytest

import scs_tpu as scs
from scs_tpu.batch import BatchedSCS

import oracle

K = {"l": 12}
m = oracle.cone_dims(K)
n = 8


def _gen_batch(B, seed=0):
    rng = np.random.RandomState(seed)
    As, bs, cs, stars = [], [], [], []
    for _ in range(B):
        data, p_star, _ = oracle.gen_feasible(K, n=n, density=0.8, rng=rng)
        As.append(np.asarray(data["A"].todense()))
        bs.append(data["b"])
        cs.append(data["c"])
        stars.append(p_star)
    return np.stack(As), np.stack(bs), np.stack(cs), stars


def test_batched_update_tracks_optima():
    """A batched parametric sweep over c: update() + solve() must match a
    freshly-constructed batch on every problem."""
    B = 3
    A, b, c, _ = _gen_batch(B, seed=11)
    solver = BatchedSCS(
        {"A": A.copy(), "b": b, "c": c}, K,
        eps_abs=1e-7, eps_rel=1e-7, verbose=False,
    )
    first = solver.solve()
    assert all(r["info"]["status"] == "solved" for r in first)

    rng = np.random.RandomState(99)
    for _ in range(2):
        c2 = c + 0.3 * rng.randn(*c.shape)
        b2 = b + 0.1 * np.abs(rng.randn(*b.shape))
        solver.update(b=b2, c=c2)
        res = solver.solve()
        fresh = BatchedSCS(
            {"A": A.copy(), "b": b2, "c": c2}, K,
            eps_abs=1e-7, eps_rel=1e-7, verbose=False,
        ).solve()
        for i in range(B):
            assert res[i]["info"]["status"] == fresh[i]["info"]["status"]
            if res[i]["info"]["status"] == "solved":
                np.testing.assert_allclose(
                    c2[i] @ res[i]["x"],
                    c2[i] @ fresh[i]["x"],
                    rtol=1e-4, atol=1e-5,
                )
        b, c = b2, c2


def test_batched_update_b_only_and_c_only():
    B = 2
    A, b, c, _ = _gen_batch(B, seed=21)
    solver = BatchedSCS(
        {"A": A.copy(), "b": b, "c": c}, K,
        eps_abs=1e-6, eps_rel=1e-6, verbose=False,
    )
    solver.solve()
    b2 = b + 0.2
    solver.update(b=b2)
    res = solver.solve()
    fresh = BatchedSCS(
        {"A": A.copy(), "b": b2, "c": c}, K,
        eps_abs=1e-6, eps_rel=1e-6, verbose=False,
    ).solve()
    for i in range(B):
        np.testing.assert_allclose(
            c[i] @ res[i]["x"], c[i] @ fresh[i]["x"], rtol=1e-3, atol=1e-4
        )
    c2 = c * 1.5
    solver.update(c=c2)
    res = solver.solve()
    for i in range(B):
        assert res[i]["info"]["status"] == "solved"


def test_batched_update_path_has_no_cholesky():
    """The batched update path must reuse the cached factor: the g
    program's jaxpr contains no Cholesky (the analogue of the
    single-instance check at test_coverage.py:test_update_path_has_no_
    cholesky)."""
    import jax

    B = 2
    A, b, c, _ = _gen_batch(B, seed=31)
    solver = BatchedSCS(
        {"A": A.copy(), "b": b, "c": c}, K, verbose=False
    )
    full = str(jax.make_jaxpr(solver._vfactorize)(solver.mats))
    reuse = str(jax.make_jaxpr(solver._vg)(solver.mats, solver._L))
    assert "cholesky" in full
    assert "cholesky" not in reuse
    # and update() itself leaves the cached factor object untouched
    L_before = solver._L
    solver.update(b=b + 1.0)
    assert solver._L is L_before


def test_batched_time_limit_returns_partial():
    """time_limit_secs must stop the batched host loop and classify the
    unfinished problems with relaxed tolerances (*_inaccurate), like the
    single-problem path — not run to max_iters."""
    import time

    B = 2
    A, b, c, _ = _gen_batch(B, seed=41)
    solver = BatchedSCS(
        {"A": A.copy(), "b": b, "c": c}, K,
        eps_abs=0.0, eps_rel=0.0,  # unreachable: never terminates
        max_iters=10_000_000,
        time_limit_secs=1.0,
        check_interval=10,
        verbose=False,
    )
    t0 = time.perf_counter()
    res = solver.solve()
    elapsed = time.perf_counter() - t0
    assert elapsed < 30.0, f"time limit ignored ({elapsed:.1f}s)"
    for r in res:
        assert r["info"]["status"] in (
            "solved_inaccurate",
            "infeasible_inaccurate",
            "unbounded_inaccurate",
        ), r["info"]["status"]
        assert np.isfinite(r["x"]).all()


def test_batched_interrupt_keeps_partial_results():
    """A KeyboardInterrupt mid-batch returns every problem: retired ones
    keep their terminal statuses, in-flight ones report 'interrupted'
    (SIGINT) with their current iterates (VERDICT r4 weak #7)."""
    B = 2
    A, b, c, _ = _gen_batch(B, seed=51)
    solver = BatchedSCS(
        {"A": A.copy(), "b": b, "c": c}, K,
        eps_abs=0.0, eps_rel=0.0,
        max_iters=10_000_000,
        check_interval=10,
        verbose=False,
    )
    real = solver._vrun_seg
    calls = {"n": 0}

    def boom(*args, **kw):
        calls["n"] += 1
        if calls["n"] >= 3:
            raise KeyboardInterrupt
        return real(*args, **kw)

    solver._vrun_seg = boom
    res = solver.solve()
    assert all(r is not None for r in res)
    assert all(r["info"]["status"] == "interrupted" for r in res)
    assert all(np.isfinite(r["x"]).all() for r in res)


def test_compaction_ladder_correctness():
    """B=64 batch with heterogeneous convergence speeds: the retirement/
    compaction ladder (including the fused single-dispatch gather,
    r5 compile-wall fix) must retire early finishers and still return
    correct solutions for every problem at its ORIGINAL position.

    Uses the l+q mix (density 0.5): tiny pure-LP instances at density
    0.8 are occasionally so degenerate that even the single-problem
    solver exhausts max_iters — an intrinsic DR property of
    near-degenerate random LPs (see the family study in
    __graft_entry__.py), not a batching artifact."""
    B = 64
    Kq = {"l": 10, "q": [4]}
    rng = np.random.RandomState(77)
    As, bs, cs, stars = [], [], [], []
    for i in range(B):
        data, p_star, _ = oracle.gen_feasible(Kq, n=n, density=0.5, rng=rng)
        As.append(np.asarray(data["A"].todense()))
        bs.append(data["b"])
        cs.append(data["c"])
        stars.append(p_star)
    A, b, c = np.stack(As), np.stack(bs), np.stack(cs)
    solver = BatchedSCS(
        {"A": A.copy(), "b": b, "c": c}, Kq,
        eps_abs=1e-6, eps_rel=1e-6, verbose=False,
        check_interval=10, batch_compact_interval=1,
    )
    assert bool(solver.stg.batch_compaction)
    res = solver.solve()
    assert len(res) == B
    for i in range(B):
        assert res[i]["info"]["status"] == "solved", (
            i, res[i]["info"]["status"]
        )
        np.testing.assert_allclose(
            c[i] @ res[i]["x"], stars[i], rtol=1e-3, atol=1e-3
        )


def test_polish_honest_dual_objective():
    """Polished info must report the TRUE dual objective of the polished
    point (dobj = -0.5 x'Px - b'y) and gap = |pobj - dobj| — not the
    fabricated pobj - comp_slack (VERDICT r4 weak #5)."""
    from scs_tpu.bench_cli import gen_batch

    B, mm, nn = 4, 60, 40
    A, P, b, c, p_star = gen_batch(
        B, mm, nn, seed=7, dtype=np.float64, return_opt=True
    )
    s = BatchedSCS(
        {"A": A.astype(np.float32), "P": P.astype(np.float32),
         "b": b, "c": c},
        {"l": mm}, dtype="float32", eps_abs=1e-4, eps_rel=1e-4,
        max_iters=20000, verbose=False,
    )
    res = s.solve()
    res, mask = s.polish(res)
    assert mask.any()
    for i, r in enumerate(res):
        if not mask[i]:
            continue
        x, y = r["x"], r["y"]
        pobj = 0.5 * x @ (P[i] @ x) + c[i] @ x
        dobj = -0.5 * x @ (P[i] @ x) - b[i] @ y
        info = r["info"]
        assert abs(info["pobj"] - pobj) < 1e-4 * (1 + abs(pobj))
        assert abs(info["dobj"] - dobj) < 1e-4 * (1 + abs(dobj))
        assert abs(info["gap"] - abs(pobj - dobj)) < 1e-4 * (1 + abs(pobj))


def test_polish_initial_solve_correct_without_refinement():
    """Regression for the ADVICE r4 sign bug: with refine=0 the initial
    masked-KKT solve alone must already produce a near-feasible point in
    the NORMALIZED problem (||DAx - Db|| at the regularization-bias
    level ~1e-2, not the O(||b||) ~ 1 the sign-flipped rhs produced)."""
    import jax.numpy as jnp
    from scs_tpu import polish as polish_mod
    from scs_tpu.bench_cli import gen_batch

    B, mm, nn = 4, 60, 40
    A, P, b, c, _ = gen_batch(
        B, mm, nn, seed=13, dtype=np.float64, return_opt=True
    )
    s = BatchedSCS(
        {"A": A.astype(np.float32), "P": P.astype(np.float32),
         "b": b, "c": c},
        {"l": mm}, dtype="float32", eps_abs=1e-4, eps_rel=1e-4,
        max_iters=20000, verbose=False,
    )
    res = s.solve()
    zm = np.zeros(mm, bool)
    d = np.stack(
        [zm | (np.asarray(r["y"]) > np.asarray(r["s"])) for r in res]
    ).astype(np.float32)
    mats = s.mats
    xh, yh, sh, ok = polish_mod.polish_batch(
        mats.A, mats.P, mats.bn, mats.cn, jnp.asarray(d), zm, refine=0
    )
    rp, _, _ = polish_mod.kkt_errors(
        mats.A, mats.P, mats.bn, mats.cn, xh, yh, sh
    )
    # normalized data has ||bn|| = 1; the sign bug put rp at O(1)
    assert (np.asarray(rp) < 3e-2).all(), np.asarray(rp)
