"""Independent NumPy oracle for cone geometry and random problem generation.

This plays the role of the reference's test oracle
(/root/reference/test/gen_random_cone_prob.py): deterministic generators for
feasible / infeasible / unbounded cone problems with a-priori known status
or optimum, plus membership tests for every cone. It is written
independently of the solver's JAX kernels so that agreement between the two
is meaningful evidence of correctness.

Cone row layout (must match scs_tpu.cones.ConeSpec.segments()):
  z, l, box(bu/bl), q, s, cs, ep, ed, p  [+ spectral d, nuc, ell1, sl]
"""

from __future__ import annotations

import numpy as np
from scipy import sparse


def sd_size(n):
    return n * (n + 1) // 2


def cone_dims(K):
    m = K.get("z", 0) + K.get("l", 0)
    bu = K.get("bu", [])
    if len(bu) > 0:
        m += len(bu) + 1
    m += sum(K.get("q", []))
    m += sum(sd_size(n) for n in K.get("s", []))
    m += sum(n * n for n in K.get("cs", []))
    m += 3 * K.get("ep", 0)
    m += 3 * K.get("ed", 0)
    m += 3 * len(K.get("p", []))
    m += sum(sd_size(n) + 2 for n in K.get("d", []))
    m += sum(
        mm * nn + 1 for mm, nn in zip(K.get("nuc_m", []), K.get("nuc_n", []))
    )
    m += sum(n + 1 for n in K.get("ell1", []))
    m += sum(sd_size(n) + 1 for n in K.get("sl_n", []))
    return int(m)


# ---------------------------------------------------------------------------
# Projections (pure NumPy, written for clarity over speed)
# ---------------------------------------------------------------------------


def proj_nonneg(x):
    return np.maximum(x, 0.0)


def proj_soc(v):
    if v.size == 0:
        return v.copy()
    if v.size == 1:
        return proj_nonneg(v)
    t, x = v[0], v[1:]
    nx = np.linalg.norm(x)
    if nx <= t:
        return v.copy()
    if nx <= -t:
        return np.zeros_like(v)
    coef = 0.5 * (1.0 + t / nx)
    out = np.empty_like(v)
    out[0] = coef * nx
    out[1:] = coef * x
    return out


def _unpack_sym(z, n):
    """Packed (lower-tri by columns, sqrt2-scaled off-diag) -> symmetric."""
    M = np.zeros((n, n))
    pos = 0
    for j in range(n):
        for i in range(j, n):
            if i == j:
                M[i, j] = z[pos]
            else:
                M[i, j] = M[j, i] = z[pos] / np.sqrt(2.0)
            pos += 1
    return M


def _pack_sym(M):
    n = M.shape[0]
    z = np.zeros(sd_size(n))
    pos = 0
    for j in range(n):
        for i in range(j, n):
            z[pos] = M[i, j] if i == j else M[i, j] * np.sqrt(2.0)
            pos += 1
    return z


def proj_sdp(z, n):
    if n == 0:
        return z.copy()
    if n == 1:
        return proj_nonneg(z)
    M = _unpack_sym(z, n)
    w, V = np.linalg.eigh(M)
    Mp = (V * np.maximum(w, 0.0)) @ V.T
    return _pack_sym(Mp)


def _unpack_herm(z, n):
    H = np.zeros((n, n), complex)
    pos = 0
    for j in range(n):
        H[j, j] = z[pos]
        pos += 1
        for i in range(j + 1, n):
            H[i, j] = (z[pos] + 1j * z[pos + 1]) / np.sqrt(2.0)
            H[j, i] = np.conj(H[i, j])
            pos += 2
    return H


def _pack_herm(H):
    n = H.shape[0]
    z = np.zeros(n * n)
    pos = 0
    for j in range(n):
        z[pos] = H[j, j].real
        pos += 1
        for i in range(j + 1, n):
            z[pos] = H[i, j].real * np.sqrt(2.0)
            z[pos + 1] = H[i, j].imag * np.sqrt(2.0)
            pos += 2
    return z


def proj_csd(z, n):
    if n == 0:
        return z.copy()
    if n == 1:
        return proj_nonneg(z)
    H = _unpack_herm(z, n)
    w, V = np.linalg.eigh(H)
    Hp = (V * np.maximum(w, 0.0)) @ V.conj().T
    return _pack_herm(Hp)


def in_exp(v, tol=0.0):
    r, s, t = v
    if s > 0:
        return t >= s * np.exp(r / s) - tol
    return s >= -tol and r <= tol and t >= -tol


def in_exp_dual(v, tol=0.0):
    # K_exp^* = cl{(u,v,w): u < 0, -u*exp(v/u) <= e*w}
    u, vv, w = v
    if u < 0:
        return -u * np.exp(vv / u) <= np.e * w + tol
    return abs(u) <= tol and vv >= -tol and w >= -tol


def proj_exp(v0):
    """Projection onto Kexp via bisection on the dual multiplier.

    Independent formulation: at the projection p of v0, either p = v0
    (inside), p = 0 (v0 in polar), the analytic edge case, or p lies on the
    boundary with normal structure; we root-find on rho = dual 'r' gap,
    solving the inner scalar equation by Newton with bisection fallback.
    """
    v0 = np.asarray(v0, float)
    if in_exp(v0, 1e-15):
        return v0.copy()
    if in_exp_dual(-v0, 1e-15):
        return np.zeros(3)
    r0, s0, t0 = v0
    if r0 < 0 and s0 < 0:
        return np.array([r0, 0.0, max(t0, 0.0)])

    # At the solution: p = (r, s, t) with t = s*exp(r/s), s > 0, and
    # v0 - p is normal to the boundary. Use the classic parameterization
    # rho = (r0 - r): then p can be recovered from a 1-D root find.
    def inner_z(rho, w):
        # solve for zbar: f(zbar) = rho^-2 * zb*(zb+t0) - s0/rho + log(zb/rho) + 1 = 0
        zb = max(max(w - t0, -t0), 1e-9)
        for _ in range(200):
            f = (zb * (zb + t0)) / rho**2 - s0 / rho + np.log(zb / rho) + 1.0
            fp = (2.0 * zb + t0) / rho**2 + 1.0 / zb
            step = f / fp
            zb_new = zb - step
            if zb_new <= 0:
                zb = zb * 0.5
            else:
                zb = zb_new
            if abs(step) < 1e-14 * max(1.0, zb):
                break
        return zb + t0

    def g_of_rho(rho, w):
        t = inner_z(rho, w)
        s = (t - t0) * t / rho
        r = r0 - rho
        if s <= 0:
            return r, np.array([r, s, t])
        return r + s * np.log(s / t), np.array([r, s, t])

    lb, rho, w = 0.0, 0.125, s0
    g, p = g_of_rho(rho, w)
    it = 0
    while g > 0 and it < 200:
        lb = rho
        rho *= 2.0
        g, p = g_of_rho(rho, p[1])
        it += 1
    ub = rho
    for _ in range(300):
        rho = 0.5 * (lb + ub)
        g, p = g_of_rho(rho, p[1])
        if g > 0:
            lb = rho
        else:
            ub = rho
        if ub - lb < 1e-14:
            break
    return p


def in_pow(v, a, tol=1e-12):
    x, y, z = v
    return x >= -tol and y >= -tol and (
        max(x, 0.0) ** a * max(y, 0.0) ** (1 - a) >= abs(z) - tol
    )


def in_pow_dual(v, a, tol=1e-12):
    u, w, z = v
    return u >= -tol and w >= -tol and (
        (max(u, 0.0) / a) ** a * (max(w, 0.0) / (1 - a)) ** (1 - a)
        >= abs(z) - tol
    )


def proj_pow(v0, a):
    v0 = np.asarray(v0, float)
    if in_pow(v0, a, 0.0):
        return v0.copy()
    if in_pow_dual(-v0, a, 0.0):
        return np.zeros(3)
    xh, yh, zh = v0
    rh = abs(zh)
    r = rh / 2.0

    def cx(r, xh, aa):
        return max(0.5 * (xh + np.sqrt(xh * xh + 4.0 * aa * (rh - r) * r)), 1e-12)

    for _ in range(100):
        x = cx(r, xh, a)
        y = cx(r, yh, 1 - a)
        f = x**a * y ** (1 - a) - r
        if abs(f) < 1e-14:
            break
        dx = a * (rh - 2 * r) / (2 * x - xh)
        dy = (1 - a) * (rh - 2 * r) / (2 * y - yh)
        fp = x**a * y ** (1 - a) * (a * dx / x + (1 - a) * dy / y) - 1.0
        r = min(max(r - f / fp, 0.0), rh)
    z = np.sign(zh) * r
    return np.array([cx(r, xh, a), cx(r, yh, 1 - a), z])


def proj_box(v, bl, bu):
    """Project (t, s) onto {(t,s): t>=0, bl*t <= s <= bu*t} by scalar opt."""
    t0, s0 = v[0], v[1:]
    bl = np.asarray(bl, float)
    bu = np.asarray(bu, float)

    def obj(t):
        s = np.clip(s0, bl * t, bu * t)
        return (t - t0) ** 2 + np.sum((s - s0) ** 2)

    # golden-section over a generous bracket (obj is convex in t)
    lo, hi = 0.0, abs(t0) + np.linalg.norm(s0) + 1.0
    for _ in range(200):
        m1 = lo + 0.382 * (hi - lo)
        m2 = lo + 0.618 * (hi - lo)
        if obj(m1) < obj(m2):
            hi = m2
        else:
            lo = m1
    t = 0.5 * (lo + hi)
    s = np.clip(s0, bl * t, bu * t)
    return np.concatenate([[t], s])


def proj_ell1(v):
    t0, x0 = v[0], v[1:]
    if np.sum(np.abs(x0)) <= t0:
        return v.copy()
    if t0 <= -np.max(np.abs(x0), initial=0.0):
        return np.zeros_like(v)
    # bisection on lam
    lo, hi = 0.0, np.max(np.abs(x0), initial=0.0)
    for _ in range(200):
        lam = 0.5 * (lo + hi)
        g = np.sum(np.maximum(np.abs(x0) - lam, 0.0)) - t0 - lam
        if g > 0:
            lo = lam
        else:
            hi = lam
    lam = 0.5 * (lo + hi)
    x = np.sign(x0) * np.maximum(np.abs(x0) - lam, 0.0)
    return np.concatenate([[t0 + lam], x])


def proj_logdet(z, n):
    """Project (t, v, packed X) onto the log-determinant cone
    cl{(t, v, X): v > 0, X PSD, t <= v*logdet(X/v)}.

    Independent formulation (reference: spectral_cones/log_cone_*.c):
    spectral reduction to the vector cone, then the 2-level KKT root
    system solved with scipy.optimize.brentq (vs the solver's on-device
    nested fori_loop bisection). Three candidates — the point itself
    (inside), the active-constraint KKT point, and the v = 0 facet —
    compared by distance, since the projection onto a closed convex set
    is the unique nearest feasible point.
    """
    from scipy.optimize import brentq

    t0, v0 = float(z[0]), float(z[1])
    X = _unpack_sym(z[2:], n)
    w0, V = np.linalg.eigh(X)

    fn = float(n)

    def slog_at(mu, v):
        w = 0.5 * (w0 + np.sqrt(w0 * w0 + 4.0 * mu * v))
        return (
            float(np.sum(np.log(np.maximum(w, 1e-300))))
            - fn * np.log(max(v, 1e-300)),
            w,
        )

    # inside check (closure-aware, scale-relative tolerance: an absolute
    # 1e-14 misclassifies large-magnitude boundary points)
    if v0 > 0 and np.all(w0 >= 0):
        sl0, _ = slog_at(0.0, v0)
        tol_in = 1e-12 * max(1.0, abs(t0), abs(v0 * sl0))
        if t0 <= v0 * sl0 + tol_in:
            return np.asarray(z, float).copy()
    if v0 == 0 and np.all(w0 >= 0) and t0 <= 0:
        return np.asarray(z, float).copy()

    def phi(v, mu):
        sl, _ = slog_at(mu, v)
        return v - v0 - mu * (sl - fn)

    def solve_v(mu):
        """Inner stationarity root phi(v) = 0 over v > 0. For small mu
        (with v0 <= 0) phi > 0 everywhere — the stationary v is pinned at
        the v = 0 boundary; return 0.0 and let h() use the continuous
        extension v*slog -> 0."""
        hi = max(abs(v0), 1.0)
        for _ in range(200):
            if phi(hi, mu) > 0:
                break
            hi *= 4.0
        lo = min(hi, 1e-14)
        for _ in range(200):
            if phi(lo, mu) < 0:
                break
            lo *= 0.25
        if phi(lo, mu) > 0:
            return 0.0
        return brentq(phi, lo, hi, args=(mu,), xtol=1e-300, rtol=1e-15)

    def h(mu):
        v = solve_v(mu)
        if v == 0.0:
            return mu - t0  # lim_{v->0+} v*slog = 0
        sl, _ = slog_at(mu, v)
        return v * sl - (t0 - mu)

    # outer root on mu (h increasing); h(0+) < 0 because the point is
    # outside the cone. When every w0_i < 0 and v0 <= 0 the interior KKT
    # system has no root (phi keeps one sign: slog stays bounded as v->0)
    # — the projection then lies on the v = 0 facet, so candidate C is
    # marked infeasible (infinite distance) and candidate D wins below.
    # brentq raises RuntimeError on non-convergence (observed on ~0.1%
    # of random inputs) and ValueError on bad brackets — both must fall
    # through to the other candidates, not crash the oracle
    try:
        mu_hi = 1.0
        for _ in range(200):
            if h(mu_hi) > 0:
                break
            mu_hi *= 4.0
        mu_lo = 1e-14
        if h(mu_lo) > 0:
            mu = mu_lo
        else:
            mu = brentq(h, mu_lo, mu_hi, xtol=1e-300, rtol=1e-14)
        vC = solve_v(mu)
        _, wC = slog_at(mu, vC)
        tC = t0 - mu
        # Validate candidate C: the outer h() is discontinuous where the
        # inner phi root vanishes, so brentq can converge onto the jump
        # instead of a root, returning an INFEASIBLE non-projection
        # (violating t <= v*slog by O(1)). Only a verified root that is
        # actually in the cone may compete on distance.
        scale_h = max(1.0, abs(t0), abs(vC))
        if abs(h(mu)) > 1e-6 * scale_h or not _logdet_feasible(
            tC, vC, wC, fn
        ):
            tC, vC, wC = np.inf, np.inf, np.full_like(w0, np.inf)
    except (ValueError, RuntimeError):
        tC, vC, wC = np.inf, np.inf, np.full_like(w0, np.inf)

    # v = 0 facet candidate: {t <= 0, v = 0, X PSD}
    tD, vD, wD = min(t0, 0.0), 0.0, np.maximum(w0, 0.0)

    # guaranteed-feasible fallback candidate: direct SLSQP solve of the
    # projection in (t, v, w) space (like proj_sumlargest) — keeps the
    # oracle returning the nearest FEASIBLE point even when the
    # root-finding candidate is rejected
    tE, vE, wE = _logdet_slsqp(t0, v0, w0, fn)

    cands = [(tC, vC, wC), (tD, vD, wD), (tE, vE, wE)]
    dists = [
        (tc - t0) ** 2 + (vc - v0) ** 2 + np.sum((wc - w0) ** 2)
        for tc, vc, wc in cands
    ]
    t, v, w = cands[int(np.argmin(dists))]

    Xp = (V * w) @ V.T
    return np.concatenate([[t, v], _pack_sym(Xp)])


def _logdet_feasible(t, v, w, fn, tol_scale=1e-8):
    """Closure membership check for (t, v, eigvals) in the logdet cone."""
    if not np.all(np.isfinite(w)) or not np.isfinite(v) or not np.isfinite(t):
        return False
    tol = tol_scale * max(1.0, abs(t), abs(v))
    if v < -tol or np.any(w < -tol):
        return False
    if v <= tol:
        return t <= tol
    slog = float(np.sum(np.log(np.maximum(w, 1e-300)))) - fn * np.log(v)
    return t <= v * slog + tol_scale * max(1.0, abs(t), abs(v * slog))


def _logdet_slsqp(t0, v0, w0, fn):
    """Nearest point in the logdet cone via SLSQP on (t, v, w) —
    independent fallback formulation (cf. proj_sumlargest)."""
    from scipy.optimize import minimize

    n = len(w0)

    def obj(x):
        return (x[0] - t0) ** 2 + (x[1] - v0) ** 2 + np.sum(
            (x[2:] - w0) ** 2
        )

    def jac(x):
        g = 2.0 * (x - np.concatenate([[t0, v0], w0]))
        return g

    def con(x):
        v = max(x[1], 1e-12)
        w = np.maximum(x[2:], 1e-12)
        return v * (np.sum(np.log(w)) - fn * np.log(v)) - x[0]

    x0 = np.concatenate(
        [[min(t0, 0.0), max(v0, 1e-6)], np.maximum(w0, 1e-6)]
    )
    best = None
    for trial in range(3):
        res = minimize(
            obj,
            x0,
            jac=jac,
            method="SLSQP",
            constraints=[{"type": "ineq", "fun": con}],
            bounds=[(None, None), (0.0, None)] + [(0.0, None)] * n,
            options={"maxiter": 500, "ftol": 1e-14},
        )
        cand = res.x
        if _logdet_feasible(cand[0], cand[1], cand[2:], fn, 1e-6) and (
            best is None or obj(cand) < obj(best)
        ):
            best = cand
        x0 = x0 * (1.0 + 0.05 * (trial + 1)) + 1e-3
    if best is None:
        # always-feasible last resort: the origin facet point
        return min(t0, 0.0), 0.0, np.maximum(w0, 0.0)
    return float(best[0]), float(best[1]), best[2:]


def proj_nuclear(z, mm, nn):
    """Project (t, vec X) onto the nuclear-norm cone {(t, X): ||X||_* <= t};
    X is mm x nn stored COLUMN-major (reference nuclear_cone.c; layout per
    test_spectral_and_complex_cones.py:240-243). SVD reduction + the
    bisection-based ell1-epigraph projection of the singular values."""
    t0 = float(z[0])
    X = np.asarray(z[1:], float).reshape(nn, mm).T
    U, sig, Vt = np.linalg.svd(X, full_matrices=False)
    pr = proj_ell1(np.concatenate([[t0], sig]))
    Xp = (U * pr[1:]) @ Vt
    return np.concatenate([[pr[0]], Xp.T.ravel()])


def sum_k_largest(w, k):
    return float(np.sum(np.sort(w)[::-1][:k]))


def proj_sumlargest(z, n, k):
    """Project (t, packed X) onto {(t, X): sum of k largest eig(X) <= t}
    (reference: sum_largest_eval_cone.c).

    Independent formulation: spectral reduction, then the vector problem
    as a lifted QP solved by scipy SLSQP —
        s_k(w) <= t  <=>  exists a, zeta >= 0 with
        t >= k*a + sum(zeta),  zeta_i >= w_i - a
    — instead of the solver's prox/capped-simplex bisection."""
    from scipy.optimize import minimize

    t0 = float(z[0])
    X = _unpack_sym(z[1:], n)
    w0, V = np.linalg.eigh(X)

    if sum_k_largest(w0, k) <= t0 + 1e-14:
        return np.asarray(z, float).copy()

    # variables: [t, w (n), a, zeta (n)]
    a0 = np.sort(w0)[::-1][k - 1]
    zeta0 = np.maximum(w0 - a0, 0.0)
    x0 = np.concatenate([[max(t0, sum_k_largest(w0, k))], w0, [a0], zeta0])

    def obj(vv):
        t, w = vv[0], vv[1 : n + 1]
        return (t - t0) ** 2 + np.sum((w - w0) ** 2)

    def jac(vv):
        g = np.zeros_like(vv)
        g[0] = 2.0 * (vv[0] - t0)
        g[1 : n + 1] = 2.0 * (vv[1 : n + 1] - w0)
        return g

    cons = [
        {  # t - k*a - sum(zeta) >= 0
            "type": "ineq",
            "fun": lambda vv: vv[0] - k * vv[n + 1] - np.sum(vv[n + 2 :]),
        },
        {  # zeta_i - w_i + a >= 0
            "type": "ineq",
            "fun": lambda vv: vv[n + 2 :] - vv[1 : n + 1] + vv[n + 1],
        },
        {"type": "ineq", "fun": lambda vv: vv[n + 2 :]},  # zeta >= 0
    ]
    def feasible(vv):
        # the lifted constraints imply s_k(w) <= t; check the implied
        # constraint directly (SLSQP can stop with benign non-success
        # statuses like "positive directional derivative" at optimum)
        t, w = float(vv[0]), vv[1 : n + 1]
        tol = 1e-7 * max(1.0, abs(t))
        return sum_k_largest(w, k) <= t + tol

    res = None
    for trial in range(3):
        res = minimize(
            obj, x0, jac=jac, constraints=cons, method="SLSQP",
            options={"maxiter": 500, "ftol": 1e-16},
        )
        if feasible(res.x):
            break
        # retry from a perturbed start so an SLSQP failure surfaces as
        # an oracle error, never as a silent infeasible "projection"
        x0 = x0 + 1e-3 * (trial + 1) * (1.0 + np.abs(x0))
    assert res is not None and feasible(res.x), (
        f"proj_sumlargest oracle: SLSQP returned an infeasible point "
        f"after retries: {res.message}"
    )
    t, w = float(res.x[0]), res.x[1 : n + 1]
    Xp = (V * w) @ V.T
    return np.concatenate([[t], _pack_sym(Xp)])


def proj_cone(z, K):
    """Project the full slack vector onto the primal cone K."""
    z = np.asarray(z, float).copy()
    idx = 0
    zc = K.get("z", 0)
    z[idx : idx + zc] = 0.0
    idx += zc
    lc = K.get("l", 0)
    z[idx : idx + lc] = proj_nonneg(z[idx : idx + lc])
    idx += lc
    bu = np.asarray(K.get("bu", []), float)
    bl = np.asarray(K.get("bl", []), float)
    if bu.size > 0:
        bs = bu.size + 1
        z[idx : idx + bs] = proj_box(z[idx : idx + bs], bl, bu)
        idx += bs
    for qi in K.get("q", []):
        z[idx : idx + qi] = proj_soc(z[idx : idx + qi])
        idx += qi
    for ni in K.get("s", []):
        sz = sd_size(ni)
        z[idx : idx + sz] = proj_sdp(z[idx : idx + sz], ni)
        idx += sz
    for ni in K.get("cs", []):
        sz = ni * ni
        z[idx : idx + sz] = proj_csd(z[idx : idx + sz], ni)
        idx += sz
    for _ in range(K.get("ep", 0)):
        z[idx : idx + 3] = proj_exp(z[idx : idx + 3])
        idx += 3
    for _ in range(K.get("ed", 0)):
        z[idx : idx + 3] = z[idx : idx + 3] + proj_exp(-z[idx : idx + 3])
        idx += 3
    for pi in K.get("p", []):
        if pi >= 0:
            z[idx : idx + 3] = proj_pow(z[idx : idx + 3], pi)
        else:
            z[idx : idx + 3] = z[idx : idx + 3] + proj_pow(-z[idx : idx + 3], -pi)
        idx += 3
    for ni in K.get("d", []):
        sz = sd_size(ni) + 2
        z[idx : idx + sz] = proj_logdet(z[idx : idx + sz], ni)
        idx += sz
    for mm, nn in zip(K.get("nuc_m", []), K.get("nuc_n", [])):
        sz = mm * nn + 1
        z[idx : idx + sz] = proj_nuclear(z[idx : idx + sz], mm, nn)
        idx += sz
    for ni in K.get("ell1", []):
        z[idx : idx + ni + 1] = proj_ell1(z[idx : idx + ni + 1])
        idx += ni + 1
    for nn, kk in zip(K.get("sl_n", []), K.get("sl_k", [])):
        sz = sd_size(nn) + 1
        z[idx : idx + sz] = proj_sumlargest(z[idx : idx + sz], nn, kk)
        idx += sz
    return z


def proj_dual_cone(z, K):
    return np.asarray(z, float) + proj_cone(-np.asarray(z, float), K)


# ---------------------------------------------------------------------------
# Random problem generators with known status/optimum (reference strategy:
# gen_feasible/gen_infeasible/gen_unbounded in the reference oracle)
# ---------------------------------------------------------------------------


def gen_feasible(K, n, density=0.1, rng=None, with_P=False, p_scale=0.1):
    rng = rng or np.random.RandomState(0)
    m = cone_dims(K)
    z = rng.randn(m)
    y = proj_dual_cone(z, K)
    s = y - z  # = proj_cone(z, K); (s, y) complementary by Moreau

    A = sparse.random(m, n, density, format="csc", random_state=rng)
    A.data = rng.randn(A.nnz)
    x = rng.randn(n)
    P = None
    if with_P:
        G = rng.randn(n, max(1, n // 2))
        P = sparse.csc_matrix(p_scale * (G @ G.T))
        c = -A.T.dot(y) - P.dot(x)
    else:
        c = -A.T.dot(y)
    b = A.dot(x) + s
    data = {"A": A, "b": b, "c": c}
    if with_P:
        data["P"] = P
        opt = 0.5 * x @ (P @ x) + c @ x
    else:
        opt = float(np.dot(c, x))
    return data, opt, dict(x=x, y=y, s=s)


def gen_infeasible(K, n, rng=None):
    rng = rng or np.random.RandomState(0)
    m = cone_dims(K)
    z = rng.randn(m)
    y = proj_dual_cone(z, K)  # dual-cone certificate direction
    A = rng.randn(m, n)
    A = A - np.outer(y, A.T.dot(y)) / (np.linalg.norm(y) ** 2)  # A'y = 0
    b = rng.randn(m)
    b = -b / np.dot(b, y)  # b'y = -1 < 0
    return {"A": sparse.csc_matrix(A), "b": b, "c": rng.randn(n)}


def gen_unbounded(K, n, rng=None):
    rng = rng or np.random.RandomState(0)
    m = cone_dims(K)
    z = rng.randn(m)
    s = proj_cone(z, K)
    A = rng.randn(m, n)
    x = rng.randn(n)
    A = A - np.outer(s + A.dot(x), x) / (np.linalg.norm(x) ** 2)  # Ax + s = 0
    c = rng.randn(n)
    c = -c / np.dot(c, x)  # c'x = -1 < 0
    return {"A": sparse.csc_matrix(A), "b": rng.randn(m), "c": c}
