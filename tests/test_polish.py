"""Active-set polishing tests (scs_tpu/polish.py + BatchedSCS.polish):
high accuracy from an eps=1e-4 solve + one masked-KKT solve, without
iterating the f32 DR tail. Verified against f64 ground truth."""

import numpy as np

import scs_tpu as scs
from scs_tpu.batch import BatchedSCS
from scs_tpu.bench_cli import gen_batch


def _solve_and_polish(B=8, m=150, n=100, seed=5):
    A, P, b, c, p_star = gen_batch(
        B, m, n, seed=seed, dtype=np.float64, return_opt=True
    )
    s = BatchedSCS(
        {"A": A.astype(np.float32), "P": P.astype(np.float32),
         "b": b, "c": c},
        {"l": m}, dtype="float32", eps_abs=1e-4, eps_rel=1e-4,
        max_iters=20000, verbose=False,
    )
    res = s.solve()
    pre = [dict(x=r["x"].copy(), pobj=r["info"]["pobj"]) for r in res]
    res, mask = s.polish(res)
    return A, P, b, c, p_star, res, mask, pre


def test_polish_reaches_high_accuracy():
    A, P, b, c, p_star, res, mask, pre = _solve_and_polish()
    assert mask.sum() >= len(res) // 2, f"only {mask.sum()} polished"
    for i, r in enumerate(res):
        if not mask[i]:
            continue
        x, y, s = r["x"], r["y"], r["s"]
        rp = np.linalg.norm(A[i] @ x + s - b[i])
        rd = np.linalg.norm(P[i] @ x + A[i].T @ y + c[i])
        assert rp < 1e-5 and rd < 1e-5, (i, rp, rd)
        assert abs(r["info"]["pobj"] - p_star[i]) < 1e-5
        # polished points remain cone-feasible to the f32 active-set
        # noise level (~1e-5 after row unscaling). A blanket clamp to
        # exact feasibility would zero ~m/2 noise-level multipliers and
        # ADD ~1e-5 of dual residual (measured r5), so tiny negatives
        # are the honest trade — still ~100x more feasible than the
        # unpolished DR point at eps=1e-4.
        assert (s > -5e-5).all() and (y > -5e-5).all()
        assert r["info"]["status"] == "solved"


def test_polish_improves_objective_error():
    _, _, _, _, p_star, res, mask, pre = _solve_and_polish(seed=9)
    for i, r in enumerate(res):
        if not mask[i]:
            continue
        before = abs(pre[i]["pobj"] - p_star[i])
        after = abs(r["info"]["pobj"] - p_star[i])
        # allow equality when the unpolished point was already excellent
        assert after <= max(before, 1e-6), (i, before, after)


def test_polish_keeps_unqualified_results():
    """Non-(zero+nonneg) cones and indirect strategy: polish is a
    no-op that returns the results untouched."""
    rng = np.random.RandomState(2)
    B, m, n = 2, 12, 6
    A = rng.randn(B, m, n)
    x0 = rng.randn(B, n)
    b = np.einsum("bmn,bn->bm", A, x0) + np.abs(rng.randn(B, m))
    c = -np.einsum("bmn,bm->bn", A, np.abs(rng.randn(B, m)))
    # SOC cone in the mix -> unsupported
    s = BatchedSCS(
        {"A": A, "b": b, "c": c}, {"l": m - 3, "q": [3]},
        dtype="float32", max_iters=5000, verbose=False,
    )
    res = s.solve()
    xs = [r["x"].copy() for r in res]
    res, mask = s.polish(res)
    assert not mask.any()
    for r, x_old in zip(res, xs):
        assert np.array_equal(r["x"], x_old)


def test_polish_lp_no_P_safe():
    """LP (no P): polish either verifies or falls back — never corrupts
    (the Pt = eps_reg*I range-space solve is ill-suited to LPs; the
    verification gate is what protects correctness)."""
    rng = np.random.RandomState(4)
    B, m, n = 4, 30, 20
    A = rng.randn(B, m, n)
    x0 = rng.randn(B, n)
    b = np.einsum("bmn,bn->bm", A, x0) + np.abs(rng.randn(B, m))
    c = -np.einsum("bmn,bm->bn", A, np.abs(rng.randn(B, m)))
    s = BatchedSCS(
        {"A": A, "b": b, "c": c}, {"l": m},
        dtype="float32", max_iters=20000, verbose=False,
    )
    res = s.solve()
    res, mask = s.polish(res)
    for i, r in enumerate(res):
        x, y, sv = r["x"], r["y"], r["s"]
        rp = np.linalg.norm(A[i] @ x + sv - b[i])
        assert rp < 1e-2 * (1 + np.linalg.norm(b[i])), (i, rp)
