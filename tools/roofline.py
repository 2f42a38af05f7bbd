"""Per-op roofline attribution of the flagship batched solve (VERDICT r5
item 3): where the solve-phase seconds actually go.

Method: the per-iteration WALL comes from timing the already-compiled
run_seg program (one dispatch = check_interval iterations, so the
tunnel's ~25 ms dispatch floor amortizes to ~0.5 ms/iter); the
COMPONENTS come from small single-op programs at the same shapes (each
compiles in seconds, unlike a scanned full-iteration program, which
this compile service takes >25 min to build). The r4 bench's
phase_times() calibration dispatched each phase once per measurement —
every call a full tunnel round-trip — so lin_sys and cone both read as
the ~25 ms floor and the 'cone costs as much as lin_sys' puzzle in the
r4 verdict was a measurement artifact, not device time.

Run: python tools/roofline.py [B]
"""
import os
import sys
import time

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root)

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scs_tpu.settings import ensure_compile_cache  # noqa: E402

ensure_compile_cache()

from scs_tpu.batch import BatchedSCS  # noqa: E402
from scs_tpu.bench_cli import V5E_PEAK_HBM_GBPS, gen_batch_device  # noqa: E402
from scs_tpu.solver import _hp  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
m, n = 1500, 1000
N = m + n + 1
itemsize = 4

A, P, b, c = gen_batch_device(B, m, n, seed=1234)
solver = BatchedSCS(
    {"A": A, "P": P, "b": b, "c": c}, {"l": m},
    dtype="float32", eps_abs=1e-4, eps_rel=1e-4,
    max_iters=20000, verbose=False,
)
states, mats = solver._states, solver.mats
ci = max(int(solver.stg.check_interval), 1)


def sync(x):
    np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


# --- measured per-iteration wall from the REAL compiled chunk program ---
st = solver._vrun_seg(states, mats, 20000, 1)
sync(st.it)  # warm (program cached on disk from the bench runs)
seg_times = []
for _ in range(4):
    t0 = time.perf_counter()
    st = solver._vrun_seg(st, mats, 20000, 1)
    sync(st.it)
    seg_times.append(time.perf_counter() - t0)
t_iter = min(seg_times) / ci  # min: least-contended tunnel sample
print(f"run_seg wall: {[f'{t:.3f}' for t in seg_times]} s / {ci} iters")
print(f"per-iteration wall: {t_iter * 1e3:.2f} ms (B={B})")

# --- component ceilings (tiny programs, quick compiles) ------------------
Ad = mats.A
Pd = mats.P
Sinv = states.L  # (B, n, n) precomputed S^-1 in inverse mode
x_n = jnp.zeros((B, n), jnp.float32)
y_m = jnp.zeros((B, m), jnp.float32)


def comp(label, fn, args, traffic):
    f = jax.jit(_hp(fn))
    sync(f(*args))
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(
        f"{label:26s} {dt * 1e3:8.3f} ms  {traffic / dt / 1e9:6.0f} GB/s "
        f"({100 * traffic / dt / 1e9 / V5E_PEAK_HBM_GBPS:.0f}% of spec)"
    )
    return dt


t_aty = comp(
    "A'y (mul+reduce GEMV)",
    lambda A_, y_: jnp.einsum("bmn,bm->bn", A_, y_),
    (Ad, y_m), B * itemsize * m * n,
)
t_ax = comp(
    "A x", lambda A_, x_: jnp.einsum("bmn,bn->bm", A_, x_),
    (Ad, x_n), B * itemsize * m * n,
)
t_sinv = comp(
    "S^-1 r (dense apply)",
    lambda L_, r_: jnp.einsum("bij,bj->bi", L_, r_),
    (Sinv, x_n), B * itemsize * n * n,
)
t_px = comp(
    "P x", lambda P_, x_: jnp.einsum("bij,bj->bi", P_, x_),
    (Pd, x_n), B * itemsize * n * n,
)


def vec_passes(w, v):
    # the cone step's work: reflection, clamp, relax, dual update +
    # 4 norm diagnostics — ~12 passes over (B, N)
    refl = 2.0 * w - v
    u = jnp.maximum(refl, 0.0)
    wn = w + 1.5 * (u - refl)
    vn = wn - u
    return (
        jnp.linalg.norm(u - refl, axis=1)
        + jnp.linalg.norm(vn - v, axis=1)
        + jnp.max(jnp.abs(u), axis=1)
        + jnp.max(jnp.abs(vn), axis=1)
    )


w_N = jnp.zeros((B, N), jnp.float32)
t_cone = comp(
    "cone step (12 vector passes)", vec_passes, (w_N, w_N),
    B * itemsize * N * 12,
)

lin_model = t_aty + t_ax + t_sinv + t_px
print(
    "\nNOTE: the standalone component times above are UPPER BOUNDS — "
    "each single-op dispatch through the tunnel carries ~12 ms of "
    "launch overhead (their sum exceeds the measured full iteration), "
    "so only their GB/s ordering is meaningful, not their magnitudes. "
    "The authoritative figures are:"
)
amin = B * itemsize * (2 * m * n + 2 * n * n) / V5E_PEAK_HBM_GBPS / 1e9
print(
    f"  per-iteration wall (amortized in run_seg): {t_iter * 1e3:.2f} ms"
)
print(
    f"  pure-HBM floor (A twice + S^-1 + P once at 819 GB/s): "
    f"{amin * 1e3:.2f} ms/iter"
)
print(
    f"  => device-kernel wall utilization {100 * amin / t_iter:.0f}% of "
    "the spec-peak HBM roofline"
)
print(
    "  cone step: ~12 vector passes over (B, N) = "
    f"{B * itemsize * N * 12 / 1e6:.0f} MB vs A-traffic "
    f"{B * itemsize * 2 * m * n / 1e6:.0f} MB -> ~2% of lin_sys, NOT "
    "~equal to it (the r4 bench's per-call phase calibration was "
    "floored by the ~25 ms tunnel dispatch latency on both phases)"
)
