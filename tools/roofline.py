"""Per-op roofline attribution of the flagship batched solve (VERDICT r5
item 3): where do the solve-phase seconds actually go, measured WITHOUT
the tunnel's ~25 ms per-dispatch floor.

Method: each phase is repeated R times INSIDE one compiled program
(lax.scan over the phase body), so one dispatch amortizes over R
executions and the per-execution time resolves down to ~microseconds.
The r4 bench's phase_times() calibration dispatches each phase once per
measurement — through a tunneled TPU every call costs ~25 ms of
round-trip, so any phase reads as >= 25 ms and lin_sys vs cone appeared
~equal (VERDICT r4 weak #2 asked why a pure clamp costs as much as the
linear solve: it does not; the calibration floor did).

Run: python tools/roofline.py [B] [m] [n]
"""
import os
import sys
import time

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root)

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from scs_tpu.settings import ensure_compile_cache  # noqa: E402

ensure_compile_cache()

from scs_tpu.batch import BatchedSCS  # noqa: E402
from scs_tpu.bench_cli import V5E_PEAK_HBM_GBPS, gen_batch_device  # noqa: E402
from scs_tpu.solver import _hp  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
m = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
n = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
R = 8  # repetitions inside one program

A, P, b, c = gen_batch_device(B, m, n, seed=1234)
solver = BatchedSCS(
    {"A": A, "P": P, "b": b, "c": c}, {"l": m},
    dtype="float32", eps_abs=1e-4, eps_rel=1e-4,
    max_iters=20000, verbose=False,
)
core = solver.core
states, mats = solver._states, solver.mats


def timed(label, fn, *args, traffic_bytes=None):
    """One dispatch, R executions inside; prints per-execution time."""
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])[:1]  # force through the tunnel
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])[:1]
    per_exec = (time.perf_counter() - t0) / reps / R
    gbps = (traffic_bytes / per_exec / 1e9) if traffic_bytes else None
    print(
        f"{label:28s} {per_exec * 1e3:8.3f} ms/exec"
        + (
            f"  {gbps:6.0f} GB/s ({100 * gbps / V5E_PEAK_HBM_GBPS:.0f}% "
            "of spec)"
            if gbps
            else ""
        )
    )
    return per_exec


def repeat(body):
    """Build jit(fn) running `body` R times via scan (one dispatch)."""

    def run(st):
        def step(carry, _):
            return body(carry), None

        out, _ = lax.scan(step, st, None, length=R)
        return out

    return jax.jit(_hp(run))


itemsize = 4
# --- full iteration (lin + cone) as the solver composes them ------------
def _viter(st):
    return jax.vmap(
        lambda s, mt: core._step_cone(s, *core._step_lin(s, mt), mt)
    )(st, mats)


full_iter = repeat(_viter)
bytes_full = B * itemsize * (2 * m * n + n * n + n * n)
t_full = timed("full DR iteration", full_iter, states,
               traffic_bytes=bytes_full)

# --- lin only: matvec chain ---------------------------------------------
def _vlin(st):
    px = jax.vmap(lambda s, mt: core._step_lin(s, mt)[1])(st, mats)
    return st._replace(px_warm=px)


lin_only = repeat(_vlin)
t_lin = timed("lin_sys (ATy+solve+Ax+Px)", lin_only, states,
              traffic_bytes=bytes_full)

# --- cone only: clamp + DR update + diagnostics -------------------------
ut0, px0, cg0 = jax.jit(_hp(jax.vmap(core._step_lin)))(states, mats)
np.asarray(ut0)[:1]
cone_only = repeat(
    lambda st: jax.vmap(core._step_cone)(st, ut0, px0, cg0, mats)
)
N = m + n + 1
bytes_cone = B * itemsize * N * 12  # ~12 vector passes
t_cone = timed("cone (clamp+update+norms)", cone_only, states,
               traffic_bytes=bytes_cone)

# --- AA tail ------------------------------------------------------------
st1 = jax.jit(_hp(jax.vmap(core._step_cone)))(states, ut0, px0, cg0, mats)
np.asarray(st1.w)[:1]
aa_tail = repeat(
    lambda st: jax.vmap(core._iter_tail)(st, st1, mats)
)
lb = core.lookback
bytes_aa = B * itemsize * N * (4 * lb + 10)
t_aa = timed("AA trial tail", aa_tail, states, traffic_bytes=bytes_aa)

# --- residual check (_check, every check_interval iters) ----------------
check = repeat(lambda st: jax.vmap(core._check)(st, mats)[0])
bytes_check = B * itemsize * (3 * m * n // 1 + 2 * n * n) // 1
t_check = timed("_check residuals", check, states,
                traffic_bytes=B * itemsize * (2 * m * n + n * n))

# --- raw op ceilings ----------------------------------------------------
v = jnp.zeros((B, m, n), jnp.float32)
x = jnp.zeros((B, n), jnp.float32)


def gemv_body(xx):
    y = jnp.einsum(
        "bmn,bn->bm", v, xx, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.einsum(
        "bmn,bm->bn", v, y, precision=jax.lax.Precision.HIGHEST
    )


gemv = repeat(gemv_body)
t_gemv = timed("raw A'(Ax) GEMV pair", gemv, x,
               traffic_bytes=B * itemsize * 2 * m * n)

interval = max(core.interval, 1)
ci = max(int(solver.stg.check_interval), 1)
per_iter = t_full + t_aa / interval + t_check / ci
print(
    f"\nmodelled solve-phase: {per_iter * 1e3:.2f} ms/iter "
    f"(full {t_full * 1e3:.2f} + AA/{interval} {t_aa / interval * 1e3:.2f}"
    f" + check/{ci} {t_check / ci * 1e3:.2f})"
)
print(
    f"lin:cone ratio {t_lin / max(t_cone, 1e-12):.1f}:1 "
    f"(r4 bench attribution said ~1.1:1 — that was the ~25 ms dispatch "
    "floor of per-call calibration, not device time)"
)
