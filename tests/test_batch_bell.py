"""Batched SPARSE solving via the bell strategy (VERDICT r5 item 6).

B same-pattern sparse problems solve as ONE vmapped block-ELL program —
per-problem block values with a leading batch axis through the same
Pallas/reference SpMV — without ever forming the (B, m, n) dense batch.
This is the batched analogue of the reference's B-sparse-instances
thread-pool model (/root/reference/test/test_free_threading.py:91-96).
"""

import numpy as np
import pytest
from scipy import sparse as sp

from scs_tpu.batch import BatchedSCS, solve_batch


def _gen_sparse_batch(B, m, n, density=0.05, seed=3, with_P=False):
    """B feasible-by-construction sparse LPs/QPs sharing one pattern."""
    rng = np.random.RandomState(seed)
    pat = sp.random(m, n, density, format="csc", random_state=rng)
    pat = (pat + sp.eye(m, n, format="csc")).tocsc()  # full row rank
    pat.sort_indices()
    P_pat = None
    if with_P:
        G = sp.random(n, n, 0.1, format="csc", random_state=rng)
        P_pat = (G @ G.T * 0.1 + 0.1 * sp.eye(n)).tocsc()
    As, Ps, bs, cs, stars = [], [], [], [], []
    for _ in range(B):
        Ai = pat.copy()
        Ai.data = rng.randn(pat.nnz)
        Ai = Ai + sp.eye(m, n, format="csc")
        z = rng.randn(m)
        y = np.maximum(z, 0)
        s = y - z
        x = rng.randn(n)
        if with_P:
            Pi = P_pat.copy()
            c = -Ai.T @ y - Pi @ x
            stars.append(0.5 * x @ (Pi @ x) + c @ x)
            Ps.append(Pi)
        else:
            c = -Ai.T @ y
            stars.append(float(c @ x))
        As.append(Ai)
        bs.append(Ai @ x + s)
        cs.append(c)
    data = {"A": As, "b": np.stack(bs), "c": np.stack(cs)}
    if with_P:
        data["P"] = Ps
    return data, np.array(stars)


def test_batched_bell_matches_dense():
    B, m, n = 4, 96, 64
    data, p_star = _gen_sparse_batch(B, m, n)
    kw = dict(
        dtype="float32", eps_abs=1e-5, eps_rel=1e-5,
        max_iters=20000, verbose=False,
    )
    res_bell = solve_batch(
        dict(data), {"l": m}, solver_strategy="bell",
        bell_block_size=32, **kw,
    )
    dense = dict(data)
    dense["A"] = np.stack([np.asarray(Ai.todense()) for Ai in data["A"]])
    res_dense = solve_batch(dense, {"l": m}, solver_strategy="direct", **kw)
    for rb, rd, ps in zip(res_bell, res_dense, p_star):
        assert rb["info"]["status"] == "solved"
        assert rd["info"]["status"] == "solved"
        gap = abs(rb["info"]["pobj"] - rd["info"]["pobj"]) / (
            1 + abs(rd["info"]["pobj"])
        )
        assert gap < 1e-3, gap
        assert abs(rb["info"]["pobj"] - ps) < 1e-2 * (1 + abs(ps))


def test_batched_bell_qp_with_sparse_P():
    B, m, n = 3, 96, 64
    data, p_star = _gen_sparse_batch(B, m, n, with_P=True, seed=11)
    res = solve_batch(
        data, {"l": m}, solver_strategy="bell", bell_block_size=32,
        dtype="float32", eps_abs=1e-5, eps_rel=1e-5,
        max_iters=20000, verbose=False,
    )
    for r, ps in zip(res, p_star):
        assert r["info"]["status"] == "solved"
        assert abs(r["info"]["pobj"] - ps) < 1e-2 * (1 + abs(ps))


def test_batched_bell_never_densifies():
    """The (B, m, n) dense batch must not exist anywhere: Mats.A stays
    (B, 0, 0) and the block-ELL pack is the only operator storage."""
    B, m, n = 3, 96, 64
    data, _ = _gen_sparse_batch(B, m, n, seed=7)
    s = BatchedSCS(
        data, {"l": m}, solver_strategy="bell", bell_block_size=32,
        dtype="float32", verbose=False,
    )
    assert s.mats.A.shape == (B, 0, 0)
    assert s.mats.bell is not None
    assert s.mats.bell.A_blocks.shape[0] == B
    # cols replicated per problem; blocks batched
    assert s.mats.bell.A_cols.shape[0] == B


def test_batched_bell_update_bc():
    """Parametric sweep on the batched bell path: update(b, c) reuses the
    packed operator (no re-packing, no re-equilibration of A)."""
    B, m, n = 3, 96, 64
    data, _ = _gen_sparse_batch(B, m, n, seed=13)
    s = BatchedSCS(
        data, {"l": m}, solver_strategy="bell", bell_block_size=32,
        dtype="float32", eps_abs=1e-5, eps_rel=1e-5,
        max_iters=20000, verbose=False,
    )
    res1 = s.solve()
    assert all(r["info"]["status"] == "solved" for r in res1)
    # perturb b: re-solve via the update fast path
    b2 = np.stack([np.asarray(data["b"][i]) * 1.1 for i in range(B)])
    s.update(b=b2)
    res2 = s.solve()
    assert all(r["info"]["status"] == "solved" for r in res2)
    # scaled-b LP: perturbed problems must differ from the originals
    assert any(
        abs(r1["info"]["pobj"] - r2["info"]["pobj"]) > 1e-9
        for r1, r2 in zip(res1, res2)
    )


def test_batched_bell_rejects_dense_input():
    rng = np.random.RandomState(0)
    with pytest.raises(ValueError, match="list of scipy sparse"):
        BatchedSCS(
            {"A": rng.randn(2, 8, 4), "b": rng.randn(2, 8),
             "c": rng.randn(2, 4)},
            {"l": 8}, solver_strategy="bell", verbose=False,
        )


def test_batched_bell_reset_resolves_identically():
    """reset() cold-starts the batched bell states; a second solve of the
    same packed batch reproduces the first run bit-for-bit in iteration
    counts and objectives (determinism parity, reference
    test_scs_coverage.py:2283-2301 scoped per-topology)."""
    B, m, n = 3, 96, 64
    data, _ = _gen_sparse_batch(B, m, n, seed=21)
    s = BatchedSCS(
        data, {"l": m}, solver_strategy="bell", bell_block_size=32,
        dtype="float32", eps_abs=1e-5, eps_rel=1e-5,
        max_iters=20000, verbose=False,
    )
    res1 = s.solve()
    s.reset()
    res2 = s.solve()
    for r1, r2 in zip(res1, res2):
        assert r1["info"]["iter"] == r2["info"]["iter"]
        assert r1["info"]["pobj"] == r2["info"]["pobj"]
        np.testing.assert_array_equal(r1["x"], r2["x"])
