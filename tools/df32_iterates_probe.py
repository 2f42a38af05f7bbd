"""Does double-word (compensated) ITERATE storage break the f32 DR
residual floor? (VERDICT r4 missing #1: "double-word iterates could push
the on-chip ceiling toward 1e-8 and nobody has tried".)

Standalone numpy prototype of the reflection-form DR loop on a small
nonneg QP (the flagship family), three arithmetic models:
  f64        — ground truth trajectory
  f32        — plain f32 iterates (the TPU configuration today)
  f32+dw     — f32 compute, but the governing iterate w carried as an
               unevaluated (hi, lo) pair with two-sum accumulation; the
               linear solve / projection consume hi only.

MEASURED ANSWER (this machine, 20k iterations, flagship-family QP):

    f64          : rp 1.30e-07  rd 4.90e-07
    f32          : rp 7.77e-07  rd 1.18e-06
    f32 + dw-iter: rp 7.76e-07  rd 1.24e-06

Double-word iterate storage changes NOTHING: the f32 floor is set by
the PER-STEP arithmetic noise (the f32 linear solve and matvecs inject
~eps_f32-relative error into every u_tilde, which the nonexpansive DR
map never averages below), not by rounding in the w accumulation. To
move the floor one would need double-word MATVECS (Ozaki-style split
products) through the whole loop at 2-4x bandwidth cost. The
active-set polish path (scs_tpu/polish.py) reaches 1e-6..1e-7 without
either, which is why it is the shipped high-accuracy design.
"""
import os
import sys

import numpy as np

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root)

from scs_tpu.bench_cli import gen_batch  # noqa: E402

m, n, iters = 150, 100, 20000
A64, P64, b64, c64, _ = gen_batch(1, m, n, seed=7, return_opt=True)
A64, P64, b64, c64 = A64[0], P64[0], b64[0], c64[0]
N = n + m + 1


def build(dtype):
    A = A64.astype(dtype)
    P = P64.astype(dtype)
    b = b64.astype(dtype)
    c = c64.astype(dtype)
    rho = dtype(1e-6)
    ry = dtype(1.0)
    S = (
        P
        + rho * np.eye(n, dtype=dtype)
        + (A.T * ry) @ A
    ).astype(dtype)
    Sinv = np.linalg.inv(S.astype(np.float64)).astype(dtype)
    g = Sinv @ (c - A.T @ (ry * b))
    gy = ry * (b + A @ g)
    return A, P, b, c, Sinv, g, gy, rho, ry


def step(w, A, P, b, c, Sinv, gx, gy, rho, ry, dtype):
    """One reflection-form DR iteration (hi precision inputs cast to
    dtype before each op — mimics f32 device arithmetic)."""
    wx, wy, wtau = w[:n], w[n : n + m], w[-1]
    rhs = (rho * wx - A.T @ (ry * wy)).astype(dtype)
    px = (Sinv @ rhs).astype(dtype)
    py = (wy + ry * (A @ px)).astype(dtype)
    aq = 1.0 + rho * gx @ gx + ry * gy @ gy
    hp = c @ px + b @ py
    Ppx = P @ px
    bq = -wtau - hp + 2.0 * (gx @ Ppx)
    cq = -(px @ Ppx)
    disc = max(bq * bq - 4.0 * aq * cq, dtype(0))
    tau = max((-bq + np.sqrt(disc)) / (2.0 * aq), dtype(0))
    ut = np.concatenate([px - tau * gx, py - tau * gy, [tau]]).astype(dtype)
    refl = (2.0 * ut - w).astype(dtype)
    uy = np.maximum(refl[n : n + m], 0.0)
    u = np.concatenate([refl[:n], uy, [max(refl[-1], 0.0)]]).astype(dtype)
    return u, ut


def residuals(w_next, u):
    """SCS mapping (solver._finalize): x = u_x/tau, y = u_y/tau,
    s = v_y/tau with v = w_next - u."""
    tau = max(float(u[-1]), 1e-12)
    x = u[:n].astype(np.float64) / tau
    y = u[n : n + m].astype(np.float64) / tau
    v_y = (w_next.astype(np.float64) - u.astype(np.float64))[n : n + m]
    s = v_y / tau
    rp = np.linalg.norm(A64 @ x + s - b64) / (1 + np.linalg.norm(b64))
    rd = np.linalg.norm(P64 @ x + A64.T @ y + c64) / (
        1 + np.linalg.norm(c64)
    )
    return rp, rd


def run(dtype, compensated=False):
    A, P, b, c, Sinv, gx, gy, rho, ry = build(dtype)
    alpha = dtype(1.5)
    w = np.zeros(N, dtype)
    w[-1] = 1.0
    w_lo = np.zeros(N, dtype)  # compensation term
    best = (np.inf, np.inf)
    for k in range(iters):
        u, ut = step(w, A, P, b, c, Sinv, gx, gy, rho, ry, dtype)
        d = (alpha * (u - ut)).astype(dtype)
        if compensated:
            # two-sum: w_new = w + d with the rounding error captured
            # in w_lo and re-injected next iteration
            d_eff = (d + w_lo).astype(dtype)
            w_new = (w + d_eff).astype(dtype)
            err = (w - w_new).astype(dtype) + d_eff  # exact in f32
            w, w_lo = w_new, err.astype(dtype)
        else:
            w = (w + d).astype(dtype)
        if k % 250 == 0 or k == iters - 1:
            rp, rd = residuals(w, u)
            best = (min(best[0], rp), min(best[1], rd))
    return best


for label, dt, comp in (
    ("f64          ", np.float64, False),
    ("f32          ", np.float32, False),
    ("f32 + dw-iter", np.float32, True),
):
    rp, rd = run(dt, comp)
    print(f"{label}: residual floor rp {rp:.2e}  rd {rd:.2e}")
