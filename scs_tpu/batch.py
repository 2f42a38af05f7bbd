"""Batched multi-problem solving — the TPU-native replacement for the
reference's free-threaded many-instance concurrency model
(SURVEY.md §2.5: per-instance locks + no-GIL thread pools -> vmap).

A batch of B problems sharing (m, n, cone structure) is solved as ONE
compiled program: batched Cholesky + batched matmuls ride the MXU, cone
projections vectorize across the batch, and each problem carries its own
status/scale so early-converged problems freeze while the rest continue.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from . import info as info_mod
from .cones import ConeSpec
from .normalize import identity_scaling, ruiz_equilibrate
from .settings import Settings
from .solver import Mats, _hp, get_core
from .info import UNFINISHED


def _stack_mats(mats_list):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *mats_list)


class BatchedSCS:
    """Solve B same-shape cone problems simultaneously.

    Parameters
    ----------
    data: dict with batched arrays:
        A: (B, m, n) dense (or list of scipy sparse matrices)
        P: (B, n, n) dense, optional
        b: (B, m), c: (B, n)
    cone: one cone dict shared by the batch.
    """

    def __init__(self, data, cone, **settings):
        settings.setdefault("verbose", False)
        A = data["A"]
        if isinstance(A, (list, tuple)):
            A = np.stack([np.asarray(Ai.todense() if hasattr(Ai, "todense") else Ai) for Ai in A])
        A = np.asarray(A, np.float64)
        if A.ndim != 3:
            raise ValueError("Batched A must have shape (B, m, n)")
        B, m, n = A.shape
        b = np.asarray(data["b"], np.float64).reshape(B, m)
        c = np.asarray(data["c"], np.float64).reshape(B, n)
        P = data.get("P")
        if P is not None:
            if isinstance(P, (list, tuple)):
                P = np.stack([np.asarray(Pi.todense() if hasattr(Pi, "todense") else Pi) for Pi in P])
            P = np.asarray(P, np.float64).reshape(B, n, n)

        self.stg = Settings.from_kwargs(**settings)
        if self.stg.solver_strategy == "auto":
            self.stg.solver_strategy = "direct" if n <= 4096 else "indirect"
        spec = ConeSpec.from_dict(cone)
        if spec.dim != m:
            raise ValueError("cone dimensions incompatible with b")
        self.spec = spec
        self.B, self.m, self.n = B, m, n
        has_P = P is not None
        self.has_P = has_P
        dtype = jnp.float64 if self.stg.dtype == "float64" else jnp.float32
        self._dtype = dtype

        t0 = time.perf_counter()
        mats_list = []
        for i in range(B):
            if self.stg.normalize:
                Ah, Ph, bh, ch, scal, spec_hat = ruiz_equilibrate(
                    A[i], P[i] if has_P else None, b[i], c[i], spec
                )
            else:
                scal = identity_scaling(m, n)
                Ah, Ph, bh, ch, spec_hat = (
                    A[i],
                    P[i] if has_P else None,
                    b[i],
                    c[i],
                    spec,
                )
            mats_list.append(
                Mats(
                    A=jnp.asarray(Ah, dtype),
                    P=jnp.asarray(Ph, dtype) if has_P else jnp.zeros((0, 0), dtype),
                    bn=jnp.asarray(bh, dtype),
                    cn=jnp.asarray(ch, dtype),
                    bl=jnp.asarray(spec_hat.bl, dtype),
                    bu=jnp.asarray(spec_hat.bu, dtype),
                    D=jnp.asarray(scal.D, dtype),
                    E=jnp.asarray(scal.E, dtype),
                    sc_b=jnp.asarray(scal.sc_b, dtype),
                    sc_c=jnp.asarray(scal.sc_c, dtype),
                    norm_b=jnp.asarray(np.linalg.norm(b[i]), dtype),
                    norm_c=jnp.asarray(np.linalg.norm(c[i]), dtype),
                )
            )
        self.mats = _stack_mats(mats_list)
        self.core = get_core(m, n, has_P, spec, self.stg)
        core = self.core

        def masked_chunk(state, mats):
            """One chunk; problems that already terminated are frozen."""
            new = core._chunk(state, mats)
            keep = state.status == UNFINISHED

            def merge(old, newv):
                k = keep
                return jnp.where(k, newv, old) if old.ndim == 0 else jnp.where(
                    k.reshape((1,) * old.ndim), newv, old
                )

            return jax.tree.map(merge, state, new)

        vchunk = jax.vmap(masked_chunk)

        def run_all(states, mats, max_iters):
            def cond(s):
                return jnp.any((s.status == UNFINISHED) & (s.it < max_iters))

            def body(s):
                return vchunk(s, mats)

            return lax.while_loop(cond, body, states)

        self._vinit = jax.jit(_hp(jax.vmap(core._init_pure)))
        self._vrun = jax.jit(_hp(run_all), static_argnums=(2,))
        self._vfinalize = jax.jit(_hp(jax.vmap(core._finalize)))
        self._states = self._vinit(self.mats)
        jax.block_until_ready(self._states.gx)
        self._setup_time = time.perf_counter() - t0

    def reset(self):
        """Re-initialize all solver states (cold start)."""
        self._states = self._vinit(self.mats)
        jax.block_until_ready(self._states.gx)

    def solve(self):
        t0 = time.perf_counter()
        states = self._vrun(self._states, self.mats, self.stg.max_iters)
        x, y, s, x_cert, y_cert, s_cert, relaxed, diag = self._vfinalize(
            states, self.mats
        )
        jax.block_until_ready(x)
        solve_time = time.perf_counter() - t0
        self._states = states

        statuses = np.asarray(states.status)
        relaxed = np.asarray(relaxed)
        x, y, s = np.asarray(x), np.asarray(y), np.asarray(s)
        x_cert, y_cert, s_cert = (
            np.asarray(x_cert),
            np.asarray(y_cert),
            np.asarray(s_cert),
        )

        results = []
        for i in range(self.B):
            st = int(statuses[i])
            if st == info_mod.UNFINISHED:
                rl = int(relaxed[i])
                st = {
                    info_mod.SOLVED: info_mod.SOLVED_INACCURATE,
                    info_mod.INFEASIBLE: info_mod.INFEASIBLE_INACCURATE,
                    info_mod.UNBOUNDED: info_mod.UNBOUNDED_INACCURATE,
                }.get(rl, info_mod.SOLVED_INACCURATE)
            if st in (info_mod.INFEASIBLE, info_mod.INFEASIBLE_INACCURATE):
                xi, yi, si = np.full(self.n, np.nan), y_cert[i], np.full(self.m, np.nan)
            elif st in (info_mod.UNBOUNDED, info_mod.UNBOUNDED_INACCURATE):
                xi, yi, si = x_cert[i], np.full(self.m, np.nan), s_cert[i]
            else:
                xi, yi, si = x[i], y[i], s[i]
            d = jax.tree.map(lambda a: float(np.asarray(a)[i]), states.diag)
            info = info_mod.make_info(
                st,
                int(np.asarray(states.it)[i]),
                scale_updates=int(np.asarray(states.scale_updates)[i]),
                scale=float(np.asarray(states.scale)[i]),
                pobj=d.pobj,
                dobj=d.dobj,
                res_pri=d.res_pri,
                res_dual=d.res_dual,
                gap=d.gap,
                res_infeas=d.res_infeas,
                res_unbdd_a=d.res_unbdd_a,
                res_unbdd_p=d.res_unbdd_p,
                comp_slack=d.comp_slack,
                solve_time=solve_time,
                setup_time=self._setup_time,
            )
            results.append({"x": xi, "y": yi, "s": si, "info": info})
        return results


def solve_batch(data, cone, **settings):
    """One-shot batched solve over B same-shape problems."""
    return BatchedSCS(data, cone, **settings).solve()
