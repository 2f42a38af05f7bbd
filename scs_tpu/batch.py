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
from .normalize import row_block_ids, ruiz_equilibrate_jnp
from .settings import Settings
from .solver import Mats, _hp, get_core
from .info import UNFINISHED


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
        # Batched direct solves default to the precomputed-inverse apply:
        # B independent triangular solves serialize on TPU, while a
        # (B, n, n) @ (B, n) matvec is one bandwidth-bound fused op.
        settings.setdefault("direct_solver", "inverse")
        A = data["A"]
        if isinstance(A, (list, tuple)):
            A = np.stack([np.asarray(Ai.todense() if hasattr(Ai, "todense") else Ai) for Ai in A])
        if A.ndim != 3:
            raise ValueError("Batched A must have shape (B, m, n)")
        B, m, n = A.shape
        P = data.get("P")
        if P is not None and isinstance(P, (list, tuple)):
            P = np.stack([np.asarray(Pi.todense() if hasattr(Pi, "todense") else Pi) for Pi in P])

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
        # Everything from here runs ON DEVICE: one fused, vmapped XLA
        # program does the Ruiz equilibration + scaling for the whole batch
        # (the reference equilibrates per-instance on the host inside
        # scs_init; a per-problem host loop at batch >=512 would dominate
        # the solve — round-1 Weak #2).
        A = jnp.asarray(A, dtype)
        b = jnp.asarray(data["b"], dtype).reshape(B, m)
        c = jnp.asarray(data["c"], dtype).reshape(B, n)
        if has_P:
            P = jnp.asarray(P, dtype).reshape(B, n, n)

        ids, nblocks = row_block_ids(spec)
        normalize = self.stg.normalize

        def prep_one(A1, P1, b1, c1):
            norm_b = jnp.linalg.norm(b1)
            norm_c = jnp.linalg.norm(c1)
            if normalize:
                Ah, Ph, bh, ch, D, E, sc_b, sc_c, bl_h, bu_h = (
                    ruiz_equilibrate_jnp(
                        A1,
                        P1,
                        b1,
                        c1,
                        ids=ids,
                        nblocks=nblocks,
                        box_off=spec.z + spec.l,
                        bsize=spec.bsize,
                        bl=spec.bl,
                        bu=spec.bu,
                    )
                )
            else:
                Ah, Ph, bh, ch = A1, P1, b1, c1
                D, E = jnp.ones(m, dtype), jnp.ones(n, dtype)
                sc_b = sc_c = jnp.asarray(1.0, dtype)
                bl_h = jnp.asarray(spec.bl, dtype)
                bu_h = jnp.asarray(spec.bu, dtype)
            return Mats(
                A=Ah,
                P=Ph if has_P else jnp.zeros((0, 0), dtype),
                bn=bh,
                cn=ch,
                bl=bl_h,
                bu=bu_h,
                D=D,
                E=E,
                sc_b=jnp.asarray(sc_b, dtype),
                sc_c=jnp.asarray(sc_c, dtype),
                norm_b=norm_b,
                norm_c=norm_c,
            )

        if has_P:
            vprep = jax.jit(_hp(jax.vmap(prep_one)))
            self.mats = vprep(A, P, b, c)
        else:
            vprep = jax.jit(_hp(jax.vmap(lambda A1, b1, c1: prep_one(A1, None, b1, c1))))
            self.mats = vprep(A, b, c)
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
        self._phase_cache = None

    def phase_times(self):
        """Measured per-call device time of each phase for the WHOLE batch
        (seconds per batched call): jit(vmap(phase)) at the true shapes.
        Multiply by the iteration count for a per-phase time breakdown —
        the batched analogue of the reference's lin_sys/cone/accel timers
        (scs/scsobject.h:1088-1092)."""
        if self._phase_cache is not None:
            return self._phase_cache
        fns = self.core._phase_fns()
        out = {}
        for name, fn in fns.items():
            if name == "accel_trial" and self.core.lookback == 0:
                out[name] = 0.0
                continue
            j = jax.jit(_hp(jax.vmap(fn)))
            r = j(self._states, self.mats)
            jax.block_until_ready(r)
            reps = 5
            t0 = time.perf_counter()
            for _ in range(reps):
                r = j(self._states, self.mats)
            jax.block_until_ready(r)
            out[name] = (time.perf_counter() - t0) / reps
        self._phase_cache = out
        return out

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
        # one device->host transfer for the whole batch, not one per field
        # per problem
        diag_np = jax.tree.map(np.asarray, states.diag)
        iters_np = np.asarray(states.it)
        scale_updates_np = np.asarray(states.scale_updates)
        scale_np = np.asarray(states.scale)

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
            d = jax.tree.map(lambda a: float(a[i]), diag_np)
            info = info_mod.make_info(
                st,
                int(iters_np[i]),
                scale_updates=int(scale_updates_np[i]),
                scale=float(scale_np[i]),
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
