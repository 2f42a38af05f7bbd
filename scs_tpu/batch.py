"""Batched multi-problem solving — the TPU-native replacement for the
reference's free-threaded many-instance concurrency model
(SURVEY.md §2.5: per-instance locks + no-GIL thread pools -> vmap).

A batch of B problems sharing (m, n, cone structure) is solved as ONE
compiled program: batched Cholesky + batched matmuls ride the MXU, cone
projections vectorize across the batch, and each problem carries its own
status/scale so early-converged problems freeze while the rest continue.

Lockstep waste is bounded by RETIREMENT (VERDICT r2 item 3): the host
periodically syncs statuses, finalizes finished problems, and compacts
the survivors into a smaller static batch shape (a halving bucket
ladder, so at most log2 distinct shapes compile). The reference's
free-threading model retires each thread independently (SURVEY §2.5);
this is the batched analogue.

Memory safety (VERDICT r2 item 1): `recommend_chunks` estimates the
peak live bytes through setup against the device's HBM budget so the
flagship B>=512 configuration never dies with RESOURCE_EXHAUSTED; the
pre-equilibration (A, P) device arrays are donated into the setup
program so the equilibrated copies alias them instead of doubling the
footprint.
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


def device_hbm_bytes(device=None) -> int:
    """Best-effort HBM capacity of the target device (bytes)."""
    if device is None:
        device = jax.devices()[0]
    try:
        stats = device.memory_stats()
        if stats:
            for key in ("bytes_limit", "bytes_reservable_limit"):
                if key in stats and stats[key]:
                    return int(stats[key])
    except Exception:
        pass
    # v5e: 16 GiB HBM, of which XLA:TPU reports ~15.75 GB usable
    return int(15.75e9)


def batch_memory_bytes(B, m, n, has_P, itemsize=4, lookback=10):
    """(peak, steady) live-byte estimate for a B-problem batch.

    Peak occurs during setup: the problem data (A, P equilibrated
    in-place via donation) plus the S / chol(S) / S^-1 transients of the
    batched factorization; steady state drops the transients but keeps
    the factor L.
    """
    N = n + m + 1
    nP = n * n if has_P else 0
    mats_b = m * n + nP + 4 * (m + n)
    state_b = n * n + 2 * max(lookback, 1) * N + 8 * N
    setup_transient = 3 * n * n
    peak = B * itemsize * (mats_b + state_b + setup_transient)
    steady = B * itemsize * (mats_b + state_b)
    return peak, steady


def recommend_chunks(B, m, n, has_P, itemsize=4, budget=None) -> int:
    """Number of sequential sub-batches needed to fit setup in HBM."""
    if budget is None:
        budget = int(0.75 * device_hbm_bytes())
    peak, _ = batch_memory_bytes(B, m, n, has_P, itemsize)
    chunks = max(1, -(-peak // budget))
    # round up to a power of two for even slicing
    p = 1
    while p < chunks:
        p *= 2
    return int(min(p, B))


def _batch_programs(core, spec, normalize):
    """Jitted batched-program bundle, cached ON the core: every
    BatchedSCS instance with the same (shape, cone structure, settings)
    shares the same jit wrappers, so repeated construction (parametric
    sweeps, the bench's amortized second batch) reuses compiled
    executables via jax's fast path instead of re-tracing and
    re-lowering every program (~5-10 s per instance through the tunnel).

    `spec` and `normalize` come from the INSTANCE, not from core.stg /
    core.spec, and key the cache: the core's LRU key deliberately
    ignores box-bound VALUES (spec_signature) and `normalize`, but
    prep_one embeds both — sharing one bundle across instances that
    differ in them would silently solve with the first instance's
    bounds/normalization (code-review r4 finding).
    """
    key = (
        bool(normalize),
        np.asarray(spec.bl, np.float64).tobytes(),
        np.asarray(spec.bu, np.float64).tobytes(),
    )
    cache = getattr(core, "_batch_progs", None)
    if cache is None:
        cache = {}
        core._batch_progs = cache
    if key in cache:
        return cache[key]

    dtype = core.dtype
    m, n, has_P = core.m, core.n, core.has_P
    scale0 = float(core.stg.scale)
    ids, nblocks = row_block_ids(spec)

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

    def run_seg(states, mats, max_iters, seg):
        """Run at most `seg` chunks (early exit when all finish) — the
        segment between host-side retirement checkpoints."""

        def masked_chunk(state, mats):
            """One chunk; terminated AND iteration-capped problems
            freeze. The max_iters freeze matters under speculative
            pipelining: without it, a capped-but-UNFINISHED problem
            would keep iterating in the speculative segment and be
            finalized past its cap (code-review r4 finding)."""
            new = core._chunk(state, mats)
            keep = (state.status == UNFINISHED) & (state.it < max_iters)

            def merge(old, newv):
                k = keep
                return jnp.where(k, newv, old) if old.ndim == 0 else jnp.where(
                    k.reshape((1,) * old.ndim), newv, old
                )

            merged = jax.tree.map(merge, state, new)
            if core.rescale_in_chunk:
                return merged
            # with the refactorization hoisted out of the chunk, the
            # factor and g are loop-INVARIANT — carry the old buffers
            # through verbatim so XLA's memory plan never double-buffers
            # the (n, n) factor
            return merged._replace(L=state.L, gx=state.gx, gy=state.gy)

        vchunk = jax.vmap(masked_chunk)

        def cond(carry):
            s, k = carry
            return jnp.any(
                (s.status == UNFINISHED) & (s.it < max_iters)
            ) & (k < seg)

        def body(carry):
            s, k = carry
            return vchunk(s, mats), k + 1

        s, _ = lax.while_loop(cond, body, (states, jnp.int32(0)))
        return s

    def finalize_pack(state, mats):
        """Finalize + pack every per-problem scalar into ONE f32 row so
        the host fetches 7 arrays total instead of ~50 (each D2H is a
        full round-trip on a tunneled TPU; non-f32 first fetches stall
        for minutes — see Core._final_scalars)."""
        x, y, s, x_cert, y_cert, s_cert, relaxed, diag = core._finalize(
            state, mats
        )
        f = lambda v: jnp.asarray(v, jnp.float32)
        aa = state.aa
        scal = jnp.stack(
            [
                f(state.status),
                f(state.it),
                f(relaxed),
                f(state.scale_updates),
                f(state.scale),
                f(diag.pobj),
                f(diag.dobj),
                f(diag.res_pri),
                f(diag.res_dual),
                f(diag.gap),
                f(diag.res_infeas),
                f(diag.res_unbdd_a),
                f(diag.res_unbdd_p),
                f(diag.comp_slack),
                f(aa.aa_iter),
                f(aa.n_accept),
                f(aa.n_reject_nonfinite),
                f(aa.n_reject_weight_cap),
                f(aa.n_safeguard_reject),
                f(aa.count),
                f(aa.last_aa_norm),
                f(aa.last_reg),
            ]
        )
        return x, y, s, x_cert, y_cert, s_cert, scal

    def factorize_one(mats):
        return core._factorize(mats, jnp.asarray(scale0, dtype))

    def g_one(mats, L):
        return core._compute_g(mats, jnp.asarray(scale0, dtype), L)

    def fresh_one(L, gx, gy):
        return core._fresh_state(L, gx, gy, jnp.asarray(scale0, dtype))

    def compact(states, mats, idx):
        """Retirement compaction as ONE fused program: gather the
        surviving rows of every state/mats leaf in a single dispatch.
        A bare jax.tree.map(lambda a: a[idx], ...) on the host issues
        one jit-gather dispatch PER LEAF (~54 leaves), and on a
        tunneled TPU every dispatch is a full round-trip plus a
        per-leaf executable load — measured ~10-12 s per compaction,
        ~2/3 of the whole cold first solve (r5 timeline attribution).
        No donation: the first compaction's inputs alias self.mats
        (and retired-pack finalizes may still be in flight), so the
        originals must stay valid; the host drops the old states
        reference right after, freeing them anyway."""
        g = lambda a: a[idx]
        return jax.tree.map(g, states), jax.tree.map(g, mats)

    progs = {
        "prep_P": jax.jit(_hp(jax.vmap(prep_one)), donate_argnums=(0, 1)),
        "prep_noP": jax.jit(
            _hp(jax.vmap(lambda A1, b1, c1: prep_one(A1, None, b1, c1))),
            donate_argnums=(0,),
        ),
        "factorize": jax.jit(_hp(jax.vmap(factorize_one))),
        "g": jax.jit(_hp(jax.vmap(g_one))),
        "fresh": jax.jit(jax.vmap(fresh_one)),
        "run_seg": jax.jit(_hp(run_seg), static_argnums=(2, 3)),
        "rescale": jax.jit(_hp(jax.vmap(core.rescale_step))),
        "finalize": jax.jit(_hp(jax.vmap(finalize_pack))),
        "compact": jax.jit(compact),
    }
    cache[key] = progs
    return progs


class BatchedSCS:
    """Solve B same-shape cone problems simultaneously.

    Parameters
    ----------
    data: dict with batched arrays:
        A: (B, m, n) dense (or list of scipy sparse matrices)
        P: (B, n, n) dense, optional
        b: (B, m), c: (B, n)
    cone: one cone dict shared by the batch.

    NOTE: A and P are DONATED into the equilibration program (the
    equilibrated copies alias them — the difference between fitting
    B=512 in HBM and OOM). If you pass jax device arrays, the caller's
    references are consumed; pass numpy arrays (converted, caller copy
    untouched) or re-generate per construction.
    """

    # compaction ladder floor: never compact below this many problems.
    # Device utilization stops improving below ~64 (the residual tail at
    # a small bucket costs ~0.1 s of extra lockstep work, while every
    # extra ladder size is a full recompile of the segment/finalize/
    # rescale programs — tens of seconds on a cold compile service).
    _MIN_BUCKET = 32

    def __init__(self, data, cone, **settings):
        settings.setdefault("verbose", False)
        # Batched direct solves default to the precomputed-inverse apply:
        # B independent triangular solves serialize on TPU, while a
        # (B, n, n) @ (B, n) matvec is one bandwidth-bound fused op.
        settings.setdefault("direct_solver", "inverse")
        # Refactorize between segments, not inside the compiled loop —
        # keeps the while-program's HBM peak ~3x smaller (the batched
        # S/chol/S^-1 transients would otherwise live in its memory plan).
        settings.setdefault("rescale_in_chunk", False)
        # refinement doubles per-iteration A traffic; the batched flagship
        # workload (zero/nonneg/box cones, i.e. clamp projections) converges
        # at eps=1e-4 without it. Tight tolerances get the auto policy
        # (-1): high-accuracy mode needs 2 compensated refinement passes or
        # the solve error floors above eps. Mixed-cone batches (SOC/PSD/
        # exp/power/spectral) also get auto: without the f32 refinement
        # pass their DR residual floors ABOVE 1e-4 and the batch runs to
        # max_iters (measured on the reference mixed-cone K, r5).
        _eps_min = min(
            float(settings.get("eps_abs", 1e-4)),
            float(settings.get("eps_rel", 1e-4)),
        )
        _simple_cones = ConeSpec.from_dict(cone).is_simple
        settings.setdefault(
            "lin_refine_steps",
            -1 if (_eps_min < 3e-5 or not _simple_cones) else 0,
        )
        # on-chip tuned defaults (B=512 flagship sweep): 50-iteration
        # chunks halve the residual-check overhead, with retirement at
        # every segment boundary (finer retirement measured ~8% faster
        # than 100-iteration segments). 50 is also a multiple of
        # acceleration_interval (10), enabling the trial-aligned chunk
        # loop (Core._chunk).
        settings.setdefault("check_interval", 50)
        settings.setdefault("batch_compact_interval", 1)
        from .settings import ensure_compile_cache

        ensure_compile_cache()
        A = data["A"]
        P = data.get("P")
        # A batch of SPARSE problems (list/tuple of scipy matrices) stays
        # sparse when the bell strategy is in play: B same-pattern sparse
        # instances solve via vmapped block-ELL SpMV without ever forming
        # the (B, m, n) dense batch (VERDICT r5 item 6 — the dense form
        # OOMs at exactly the scale the reference's thread-pool-of-sparse
        # -instances model handles, test_free_threading.py:91-96).
        sparse_list = (
            isinstance(A, (list, tuple))
            and len(A) > 0
            and hasattr(A[0], "tocsc")
        )
        if sparse_list:
            B = len(A)
            m, n = A[0].shape
        else:
            if isinstance(A, (list, tuple)):
                A = np.stack([
                    np.asarray(Ai.todense() if hasattr(Ai, "todense") else Ai)
                    for Ai in A
                ])
            if A.ndim != 3:
                raise ValueError("Batched A must have shape (B, m, n)")
            B, m, n = A.shape

        self.stg = Settings.from_kwargs(**settings)
        if self.stg.solver_strategy == "auto":
            self.stg.solver_strategy = "direct" if n <= 4096 else "indirect"
        if self.stg.solver_strategy == "bell":
            if not sparse_list:
                raise ValueError(
                    "solver_strategy='bell' on a batch requires A as a "
                    "list of scipy sparse matrices (the point of the "
                    "batched bell path is never densifying)"
                )
        elif sparse_list:
            # non-bell strategies use the dense batched core
            A = np.stack([np.asarray(Ai.todense()) for Ai in A])
        if P is not None and isinstance(P, (list, tuple)) and not (
            sparse_list and self.stg.solver_strategy == "bell"
        ):
            P = np.stack([
                np.asarray(Pi.todense() if hasattr(Pi, "todense") else Pi)
                for Pi in P
            ])
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
        self.core = get_core(m, n, has_P, spec, self.stg)
        core = self.core
        progs = _batch_programs(core, spec, normalize=self.stg.normalize)
        self._vfactorize = progs["factorize"]
        self._vg = progs["g"]
        self._vfresh = progs["fresh"]
        self._vrun_seg = progs["run_seg"]
        self._vrescale = progs["rescale"]
        self._vfinalize = progs["finalize"]
        self._vcompact = progs["compact"]

        if self.stg.solver_strategy == "bell":
            # host-side sparse preprocessing per problem (O(B*nnz):
            # equilibration and block-ELL packing never materialize dense
            # A), then one stacked H2D transfer; the vmapped core runs
            # the Pallas SpMV with a leading batch axis (pallas batching)
            self.mats = self._build_bell_mats(
                A, P, data["b"], data["c"], spec, dtype
            )
            t_transfer = 0.0
            t_prep = time.perf_counter() - t0
            t1 = time.perf_counter()
        else:
            # Everything from here runs ON DEVICE: one fused, vmapped XLA
            # program does the Ruiz equilibration + scaling for the whole
            # batch (the reference equilibrates per-instance on the host
            # inside scs_init; a per-problem host loop at batch >=512
            # would dominate the solve — round-1 Weak #2).
            t0 = time.perf_counter()
            A = jnp.asarray(A, dtype)
            b = jnp.asarray(data["b"], dtype).reshape(B, m)
            c = jnp.asarray(data["c"], dtype).reshape(B, n)
            if has_P:
                P = jnp.asarray(P, dtype).reshape(B, n, n)
            jax.block_until_ready(A)
            t_transfer = time.perf_counter() - t0

            t1 = time.perf_counter()
            # donate (A, P): the equilibrated copies alias the inputs
            # instead of doubling the live set — the difference between
            # fitting B=512 in 16 GB HBM and RESOURCE_EXHAUSTED
            # (VERDICT r2 missing #1)
            if has_P:
                self.mats = progs["prep_P"](A, P, b, c)
            else:
                self.mats = progs["prep_noP"](A, b, c)
            jax.block_until_ready(self.mats.A)
            t_prep = time.perf_counter() - t1
        t2 = time.perf_counter()
        L = self._vfactorize(self.mats)
        jax.block_until_ready(L)
        t_fact = time.perf_counter() - t2
        # cache the batched factor for reset()/update(): the scale0
        # factorization depends only on (A, P), so parametric b/c sweeps
        # and repeat solves never re-run the batched Cholesky
        # (reference scs_update semantics, SURVEY §3.3)
        self._L = L
        t2 = time.perf_counter()
        gx, gy = self._vg(self.mats, L)
        self._states = self._vfresh(L, gx, gy)
        jax.block_until_ready(self._states.gx)
        t_g = time.perf_counter() - t2
        self._setup_time = time.perf_counter() - t0
        self.setup_breakdown = {
            "transfer": t_transfer,
            "equilibrate": t_prep,
            "factorize": t_fact,
            "compute_g": t_g,
        }
        self._phase_cache = None

    def _build_bell_mats(self, A_list, P_list, b, c, spec, dtype):
        """Batched block-ELL Mats for B SPARSE problems: per-problem host
        equilibration (O(nnz), normalize.ruiz_equilibrate_sparse) and
        block-ELL packing, stacked with a leading batch axis. Widths are
        padded to the per-batch maximum (zero tiles pointing at block 0 —
        harmless), so problems need not share a sparsity pattern, though
        a shared pattern packs densest. The vmapped solver core runs the
        same Pallas SpMV kernel with a leading batch axis (jax's pallas
        batching rule); cols are replicated per problem.

        Citation for semantics: the reference's B-independent-sparse-
        instances concurrency model (test_free_threading.py:91-96) —
        here one compiled program instead of B threads."""
        from scipy import sparse as spsp

        from .normalize import identity_scaling, ruiz_equilibrate_sparse
        from .ops.sparse import pack_bell_host, pack_bell_sym_host
        from .solver import BellData, PBell

        B, m, n = self.B, self.m, self.n
        bs = self.stg.bell_block_size
        b = np.asarray(b, np.float64).reshape(B, m)
        c = np.asarray(c, np.float64).reshape(B, n)
        has_P = P_list is not None

        np_dtype = np.float64 if dtype == jnp.float64 else np.float32

        def prep_one(i):
            Ai = spsp.csc_matrix(A_list[i])
            Pi = None
            if has_P:
                Pi = spsp.csc_matrix(P_list[i])
                if (abs(Pi - Pi.T) > 1e-12 * abs(Pi).max()).nnz > 0:
                    # accept triu input like the single-problem path
                    U = spsp.triu(Pi).tocsc()
                    Pi = (U + U.T - spsp.diags(U.diagonal())).tocsc()
            if self.stg.normalize:
                Ah, Ph, bh, ch, scal, spec_hat = ruiz_equilibrate_sparse(
                    Ai, Pi, b[i], c[i], spec
                )
            else:
                scal = identity_scaling(m, n)
                Ah, Ph, bh, ch, spec_hat = Ai, Pi, b[i], c[i], spec
            packed = pack_bell_host(Ah, bs, np_dtype)
            zmask = spec_hat.zero_row_mask().astype(np.float64)
            csq_zero = np.asarray(zmask @ Ah.multiply(Ah)).ravel()
            psym = (
                pack_bell_sym_host(Ph, bs, np_dtype) if has_P else None
            )
            return packed, csq_zero, psym, bh, ch, spec_hat, scal

        # host prep is per-problem independent and releases the GIL in
        # the native packer and the large numpy ops — thread it (1.3 s
        # per problem serial at the flagship bell size, measured r5)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, B)) as ex:
            prepped = list(ex.map(prep_one, range(B)))

        per = {k: [] for k in (
            "Ab", "Ac", "Atb", "Atc", "csq_all", "csq_zero",
            "pb", "pc", "pd", "bn", "cn", "bl", "bu",
            "D", "E", "sc_b", "sc_c", "norm_b", "norm_c",
        )}
        for i, (packed, csq_zero, psym, bh, ch, spec_hat, scal) in enumerate(
            prepped
        ):
            Ab, Ac, Atb, Atc, csq, _rsq = packed
            per["csq_zero"].append(csq_zero)
            per["csq_all"].append(csq)
            per["Ab"].append(Ab)
            per["Ac"].append(Ac)
            per["Atb"].append(Atb)
            per["Atc"].append(Atc)
            if has_P:
                per["pb"].append(psym[0])
                per["pc"].append(psym[1])
                per["pd"].append(psym[2])
            per["bn"].append(bh)
            per["cn"].append(ch)
            per["bl"].append(np.asarray(spec_hat.bl, np.float64))
            per["bu"].append(np.asarray(spec_hat.bu, np.float64))
            per["D"].append(np.asarray(scal.D))
            per["E"].append(np.asarray(scal.E))
            per["sc_b"].append(float(scal.sc_b))
            per["sc_c"].append(float(scal.sc_c))
            per["norm_b"].append(float(np.linalg.norm(b[i])))
            per["norm_c"].append(float(np.linalg.norm(c[i])))

        def stack_padded(blocks_list, cols_list):
            w = max(bk.shape[1] for bk in blocks_list)
            outs_b, outs_c = [], []
            for bk, ck in zip(blocks_list, cols_list):
                pad = w - bk.shape[1]
                if pad:
                    bk = np.concatenate(
                        [bk, np.zeros(
                            (bk.shape[0], pad) + bk.shape[2:], bk.dtype
                        )], axis=1,
                    )
                    ck = np.concatenate(
                        [ck, np.zeros((ck.shape[0], pad), ck.dtype)], axis=1
                    )
                outs_b.append(bk)
                outs_c.append(ck)
            return (
                jnp.asarray(np.stack(outs_b), dtype),
                jnp.asarray(np.stack(outs_c), jnp.int32),
            )

        A_blocks, A_cols = stack_padded(per["Ab"], per["Ac"])
        At_blocks, At_cols = stack_padded(per["Atb"], per["Atc"])
        bell = BellData(
            A_blocks=A_blocks,
            A_cols=A_cols,
            At_blocks=At_blocks,
            At_cols=At_cols,
            colsq_all=jnp.asarray(np.stack(per["csq_all"]), dtype),
            colsq_zero=jnp.asarray(np.stack(per["csq_zero"]), dtype),
        )
        pbell = None
        if has_P:
            p_blocks, p_cols = stack_padded(per["pb"], per["pc"])
            pbell = PBell(
                blocks=p_blocks,
                cols=p_cols,
                diag=jnp.asarray(np.stack(per["pd"]), dtype),
            )
        f = lambda k: jnp.asarray(np.stack(per[k]), dtype)
        return Mats(
            A=jnp.zeros((B, 0, 0), dtype),
            P=jnp.zeros((B, 0, 0), dtype),
            bn=f("bn"),
            cn=f("cn"),
            bl=f("bl"),
            bu=f("bu"),
            D=f("D"),
            E=f("E"),
            sc_b=jnp.asarray(np.asarray(per["sc_b"]), dtype),
            sc_c=jnp.asarray(np.asarray(per["sc_c"]), dtype),
            norm_b=jnp.asarray(np.asarray(per["norm_b"]), dtype),
            norm_c=jnp.asarray(np.asarray(per["norm_c"]), dtype),
            bell=bell,
            pbell=pbell,
        )

    def _prewarm_ladder(self, max_iters, seg):
        """Background AOT compilation of the compaction-ladder program
        sizes (B/2 ... _MIN_BUCKET) so their executables are ready by the
        time the batch compacts: the compiles overlap with the full-size
        segments already running on device. One thread per size exploits
        any parallelism the compile service offers; failures are ignored
        (the foreground jit path compiles on demand regardless)."""
        import threading

        def shapes_of(tree, size):
            return jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(
                    (size,) + a.shape[1:], a.dtype
                ),
                tree,
            )

        # once per (core, B): re-lowering already-compiled sizes would
        # waste background cycles on repeat solves
        warmed = getattr(self.core, "_ladder_warmed", set())
        if self.B in warmed:
            return
        warmed.add(self.B)
        self.core._ladder_warmed = warmed

        sizes = []
        t = self.B // 2
        while t >= self._MIN_BUCKET:
            sizes.append(t)
            t //= 2

        # capture abstract shapes EAGERLY: the workers run delayed, and
        # solve() nulls self._states on completion — a late worker would
        # otherwise crash silently and the (core, B) would stay marked
        # warmed without having compiled anything (code-review r4)
        shape_args = []
        for size in sizes:
            shape_args.append(
                (size, shapes_of(self._states, size), shapes_of(self.mats, size))
            )

        def worker(size, st, mt, delay):
            try:
                # stagger: let the FOREGROUND first-segment compile enter
                # the (possibly FIFO) compile service queue before the
                # ladder requests, and spread the ladder requests so the
                # most-imminent size goes first
                time.sleep(delay)
                s_eff = max(seg, 8) if size <= self._MIN_BUCKET else seg
                self._vrun_seg.lower(st, mt, max_iters, s_eff).compile()
                self._vfinalize.lower(st, mt).compile()
            except Exception:
                pass

        for i, (size, st, mt) in enumerate(shape_args):
            threading.Thread(
                target=worker, args=(size, st, mt, 3.0 + 2.0 * i), daemon=True
            ).start()

    def phase_times(self):
        """Measured per-call device time of each phase for the WHOLE batch
        (seconds per batched call): jit(vmap(phase dispatch)) at the true
        shapes, mirroring the single-problem instrumented decomposition
        (Core.phase_times). Multiply by the iteration count for a
        per-phase breakdown — the batched analogue of the reference's
        lin_sys/cone/accel timers (scs/scsobject.h:1088-1092)."""
        if self._phase_cache is not None:
            return self._phase_cache
        if self._states is None:
            self.reset()
        core = self.core

        vlin = jax.jit(_hp(jax.vmap(core._step_lin)))
        vcone = jax.jit(
            _hp(jax.vmap(lambda s, ut, px, ck, m: core._step_cone(s, ut, px, ck, m)))
        )
        vtail = jax.jit(_hp(jax.vmap(core._iter_tail)))
        vdoc = jax.jit(jax.vmap(core._doctored_trial_state))

        def time5(call):
            out = call()
            jax.block_until_ready(out)
            reps = 5
            t0 = time.perf_counter()
            for _ in range(reps):
                jax.block_until_ready(call())
            return (time.perf_counter() - t0) / reps

        st, mats = self._states, self.mats
        lin_out = vlin(st, mats)
        jax.block_until_ready(lin_out[0])
        t_lin = time5(lambda: vlin(st, mats)[0])
        t_cone = time5(lambda: vcone(st, *lin_out, mats).w)
        t_accel = 0.0
        if core.lookback > 0:
            std = vdoc(st)
            lo = vlin(std, mats)
            st1 = vcone(std, *lo, mats)
            jax.block_until_ready(st1.w)
            t_accel = time5(lambda: vtail(std, st1, mats).w)
        self._phase_cache = {
            "lin_sys": t_lin,
            "cone": t_cone,
            "accel_trial": t_accel,
        }
        return self._phase_cache

    def reset(self):
        """Re-initialize all solver states (cold start), reusing the
        cached scale0 factorization from construction."""
        L = getattr(self, "_L", None)
        if L is None:
            L = self._vfactorize(self.mats)
            self._L = L
        gx, gy = self._vg(self.mats, L)
        self._states = self._vfresh(L, gx, gy)
        jax.block_until_ready(self._states.gx)

    def update(self, b=None, c=None):
        """Update b and/or c for the whole batch WITHOUT refactorizing —
        the batched parametric-solve fast path (reference scs_update,
        /root/reference/scs/scsobject.h:1133-1225; semantics SURVEY
        §3.3). The stored equilibration (D, E, sc_b, sc_c) re-scales the
        new data exactly like the reference's re-normalization with the
        stored scaling; only g (the b/c-dependent half of setup) is
        recomputed, against the cached batched factor. No Cholesky runs
        in this path (jaxpr-verified, tests/test_batch_update.py)."""
        mats = self.mats
        if b is not None:
            b = jnp.asarray(
                np.asarray(b, np.float64).reshape(self.B, self.m),
                self._dtype,
            )
            mats = mats._replace(
                bn=mats.sc_b[:, None] * mats.D * b,
                norm_b=jnp.linalg.norm(b, axis=1),
            )
        if c is not None:
            c = jnp.asarray(
                np.asarray(c, np.float64).reshape(self.B, self.n),
                self._dtype,
            )
            mats = mats._replace(
                cn=mats.sc_c[:, None] * mats.E * c,
                norm_c=jnp.linalg.norm(c, axis=1),
            )
        self.mats = mats
        L = getattr(self, "_L", None)
        if L is None:
            L = self._vfactorize(mats)
            self._L = L
        gx, gy = self._vg(mats, L)
        self._states = self._vfresh(L, gx, gy)
        jax.block_until_ready(self._states.gx)

    # -- result building ---------------------------------------------------

    def _materialize(
        self, results, positions, pack, mask, elapsed, interrupted=False
    ):
        """Host side of finalization: fetch a dispatched finalize pack and
        build result dicts.

        mask: boolean array over the current batch — which rows to store
        (None = all). Rows whose original position already holds a result
        (compaction-padding duplicates) are skipped.
        """
        x, y, s, x_cert, y_cert, s_cert, scal = pack
        x, y, s = np.asarray(x), np.asarray(y), np.asarray(s)
        x_cert, y_cert, s_cert = (
            np.asarray(x_cert),
            np.asarray(y_cert),
            np.asarray(s_cert),
        )
        scal = np.asarray(scal, np.float64)  # (cur, 22) packed scalars

        timers = None
        if self.stg.phase_timing == "always":
            timers = self.phase_times()

        lookback = self.core.lookback
        interval = max(self.core.interval, 1)
        cur = len(positions)
        for i in range(cur):
            if mask is not None and not mask[i]:
                continue
            pos = int(positions[i])
            if results[pos] is not None:
                continue
            row = scal[i]
            st = int(row[0])
            it = int(row[1])
            if st == info_mod.UNFINISHED:
                if interrupted and it < int(self.stg.max_iters):
                    # Ctrl-C mid-batch: unfinished problems report SIGINT
                    # with their current iterates, exactly like the
                    # single-problem path (api.py KeyboardInterrupt ->
                    # ctrlc.c semantics); retired/iteration-capped
                    # problems keep their terminal classification.
                    st = info_mod.SIGINT
                else:
                    rl = int(row[2])
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
            if lookback > 0:
                aa_stats = {
                    "iter": int(row[14]),
                    "n_accept": int(row[15]),
                    "n_reject_lapack": 0,
                    "n_reject_rank0": 0,
                    "n_reject_nonfinite": int(row[16]),
                    "n_reject_weight_cap": int(row[17]),
                    "n_safeguard_reject": int(row[18]),
                    "last_rank": int(min(max(int(row[19]), 0), lookback)),
                    "last_aa_norm": float(row[20]),
                    "last_regularization": float(row[21]),
                }
            else:
                aa_stats = info_mod.default_aa_stats()
            rejected = (
                aa_stats["n_safeguard_reject"]
                + aa_stats["n_reject_nonfinite"]
                + aa_stats["n_reject_weight_cap"]
            )
            kw = {}
            if timers is not None:
                # calibration is per batched call at the initial size; the
                # per-problem share scales by 1/B
                aa_trials = it // interval if lookback > 0 else 0
                kw = dict(
                    lin_sys_time=timers["lin_sys"] * it / self.B,
                    cone_time=timers["cone"] * it / self.B,
                    accel_time=timers["accel_trial"] * aa_trials / self.B,
                )
            info = info_mod.make_info(
                st,
                it,
                scale_updates=int(row[3]),
                scale=float(row[4]),
                pobj=float(row[5]),
                dobj=float(row[6]),
                res_pri=float(row[7]),
                res_dual=float(row[8]),
                gap=float(row[9]),
                res_infeas=float(row[10]),
                res_unbdd_a=float(row[11]),
                res_unbdd_p=float(row[12]),
                comp_slack=float(row[13]),
                solve_time=elapsed,
                setup_time=self._setup_time,
                accepted_accel_steps=aa_stats["n_accept"],
                rejected_accel_steps=rejected,
                aa_stats=aa_stats,
                **kw,
            )
            results[pos] = {"x": xi, "y": yi, "s": si, "info": info}

    def polish(self, results, sub_batch=32, eps_reg=1e-6, refine=3):
        """Active-set polish of solved results (zero + nonneg cones,
        direct strategy): one masked-KKT solve with compensated
        refinement per problem, reaching ~f32-ulp KKT residuals without
        iterating the DR tail below the f32 floor (polish.py rationale;
        a capability the reference lacks). Results whose polished point
        fails verification (multiplier/slack sign conditions or residual
        regression) keep their unpolished values.

        Runs in NORMALIZED space against the retained equilibrated
        operator (the original A/P were donated at construction), then
        un-normalizes; sub-batched because the Schur transients are
        (sub, m, m). Returns (results, polished_mask)."""
        from . import polish as polish_mod

        spec = self.spec
        if (
            spec.dim != spec.z + spec.l
            or self.core.indirect
            or self._dtype != jnp.float32
        ):
            return results, np.zeros(self.B, bool)

        # HOST numpy, not a device array: a device-array closure constant
        # in the vmapped polish program is fetched D2H at MLIR-lowering
        # time, and the tunnel's first bool transfer stalls for minutes
        # (ADVICE r4; same rule as Core.zero_mask / solver._build_S)
        zero_mask = np.asarray(spec.zero_row_mask())
        mats = self.mats
        D = np.asarray(mats.D, np.float64)
        E = np.asarray(mats.E, np.float64)
        sc_b = np.asarray(mats.sc_b, np.float64)
        sc_c = np.asarray(mats.sc_c, np.float64)

        polished = np.zeros(self.B, bool)
        for lo in range(0, self.B, sub_batch):
            hi = min(lo + sub_batch, self.B)
            idxs = [
                i for i in range(lo, hi)
                if results[i] is not None
                and results[i]["info"]["status"]
                in ("solved", "solved_inaccurate")
            ]
            if not idxs:
                continue
            sl = np.asarray(idxs)
            # active mask from the ORIGINAL-unit complementarity test
            # (y_i > s_i picks the binding constraint; row scalings would
            # bias this comparison in normalized space)
            zmask_np = zero_mask
            d_np = np.stack(
                [
                    zmask_np
                    | (
                        np.asarray(results[i]["y"])
                        > np.asarray(results[i]["s"])
                    )
                    for i in sl
                ]
            ).astype(np.float32)
            gather = jnp.asarray(sl)
            A_s = mats.A[gather]
            P_s = mats.P[gather] if self.has_P else jnp.zeros(
                (len(sl), 0, 0), self._dtype
            )
            b_s = mats.bn[gather]
            c_s = mats.cn[gather]
            xh, yh, sh, ok = polish_mod.polish_batch(
                A_s, P_s, b_s, c_s,
                jnp.asarray(d_np, self._dtype),
                zero_mask, eps_reg=eps_reg, refine=refine,
            )
            # EXACT original-unit residual norms of the hat-space point:
            # weight each hat residual row by its inverse equilibration
            # (rp_orig = Dinv rp_hat / sc_b elementwise) instead of the
            # max-row-scale bound, which overstated by up to max(D)/min(D)
            wr = jnp.asarray(
                1.0 / (D[sl] * sc_b[sl, None]), self._dtype
            )
            wc = jnp.asarray(
                1.0 / (E[sl] * sc_c[sl, None]), self._dtype
            )
            rp, rd, gap = polish_mod.kkt_errors(
                A_s, P_s, b_s, c_s, xh, yh, sh, wr=wr, wc=wc
            )
            xh = np.asarray(xh, np.float64)
            yh = np.asarray(yh, np.float64)
            sh = np.asarray(sh, np.float64)
            ok = np.asarray(ok)
            rp, rd, gap = (
                np.asarray(rp, np.float64),
                np.asarray(rd, np.float64),
                np.asarray(gap, np.float64),
            )
            for k, i in enumerate(sl):
                if not ok[k]:
                    continue
                info = results[i]["info"]
                # exact original-unit residual norms (the kkt_errors call
                # above weighted each row by its inverse equilibration)
                rp_orig = float(rp[k])
                rd_orig = float(rd[k])
                if rp_orig > max(info["res_pri"], 1e-9) or rd_orig > max(
                    info["res_dual"], 1e-9
                ):
                    continue  # polish did not improve: keep original
                results[i]["x"] = E[i] * xh[k] / sc_b[i]
                results[i]["y"] = D[i] * yh[k] / sc_c[i]
                results[i]["s"] = sh[k] / (D[i] * sc_b[i])
                x_o, y_o, s_o = (
                    results[i]["x"], results[i]["y"], results[i]["s"],
                )
                info["res_pri"] = float(rp_orig)
                info["res_dual"] = float(rd_orig)
                info["comp_slack"] = float(abs(np.dot(s_o, y_o)))
                # objectives of the polished point, in original units:
                # pobj = (0.5 x_hat'P_hat x_hat + c_hat'x_hat)/(sc_b sc_c)
                # dobj = (-0.5 x_hat'P_hat x_hat - b_hat'y_hat)/(sc_b sc_c)
                # — the TRUE dual objective at the polished dual point
                # (VERDICT r4 weak #5: the previous pobj - comp_slack was
                # not the dual objective), and gap = |pobj - dobj|.
                ch = np.asarray(c_s[k], np.float64)
                bh = np.asarray(b_s[k], np.float64)
                quad = 0.0
                if self.has_P:
                    Ph = np.asarray(P_s[k], np.float64)
                    quad = 0.5 * xh[k] @ (Ph @ xh[k])
                sc = sc_b[i] * sc_c[i]
                info["pobj"] = float((quad + ch @ xh[k]) / sc)
                info["dobj"] = float((-quad - bh @ yh[k]) / sc)
                info["gap"] = float(abs(info["pobj"] - info["dobj"]))
                info["status"] = "solved"
                info["status_val"] = info_mod.SOLVED
                polished[i] = True
        return results, polished

    def solve(self):
        """Solve the batch. With compaction enabled (default), finished
        problems are retired at segment boundaries and the survivors are
        re-packed into a smaller static shape — per-problem `solve_time`
        is the wall-clock until that problem's retirement segment."""
        if self._states is None:
            self.reset()
        t0 = time.perf_counter()
        states, mats = self._states, self.mats
        B = self.B
        positions = np.arange(B)
        results: list = [None] * B
        max_iters = int(self.stg.max_iters)
        compact = bool(self.stg.batch_compaction) and B >= 2 * self._MIN_BUCKET
        if compact:
            self._prewarm_ladder(
                max_iters, max(1, int(self.stg.batch_compact_interval))
            )
        # clamp: a non-positive segment length would make run_seg's cond
        # false immediately, so `it` never advances and this loop spins
        # forever on the host (ADVICE r3)
        seg = max(1, int(self.stg.batch_compact_interval))

        # finalize packs are DISPATCHED at retirement time but fetched
        # after the last segment — D2H round-trips stay off the critical
        # path (each fetch is a full tunnel round-trip on remote TPUs)
        import os as _os

        dbg = _os.environ.get("SCS_TPU_TIMING") == "1"
        pending = []
        # device-iteration accounting: lockstep cost = sum over segments
        # of (bucket size x iterations run), vs the productive per-problem
        # iteration count — the honest utilization denominator
        self.device_prob_iters = 0
        prev_maxit = 0

        def seg_len(cur):
            # Once compacted to the ladder floor there are no more
            # retirement decisions — only termination detection — so run
            # several chunks per host poll (the device early-exits once
            # all problems terminate). At bucket 32 the per-chunk host
            # round-trip otherwise costs ~30-50% of the straggler tail.
            if compact and cur <= self._MIN_BUCKET:
                return max(seg, 8)
            return seg

        def probe_of(st):
            # probe rides f32: the tunnel's FIRST device->host transfer
            # of each non-f32 dtype stalls for minutes (measured: int32
            # ~80 s, bool ~290 s; f32 ~30 ms) — every host-consumed value
            # in this package is fetched as f32 for that reason
            return jnp.stack(
                [
                    st.status.astype(jnp.float32),
                    st.it.astype(jnp.float32),
                    st.rescale_trigger.astype(jnp.float32),
                ]
            )

        # Speculative segment pipelining: the NEXT segment is dispatched
        # before this segment's probe is fetched, so the device never
        # idles on the host round-trip. Retirement/rescale decisions from
        # probe k apply to the speculatively-advanced state k+1 — valid
        # (finished problems are frozen by the mask; a stale rescale
        # trigger re-evaluates inside rescale_step), just one segment
        # later than the non-speculative loop would apply them.
        #
        # Interrupt/time-limit safety (VERDICT r4 weak #7): the loop body
        # runs under a KeyboardInterrupt handler so a Ctrl-C mid-batch
        # keeps every already-retired result and reports SIGINT for the
        # rest (the single-problem path's ctrlc.c semantics); a
        # time_limit_secs overrun exits with *_inaccurate classification
        # for the unfinished problems.
        time_limit = float(self.stg.time_limit_secs or 0.0)
        interrupted = False
        try:
            states = self._vrun_seg(states, mats, max_iters, seg_len(B))
            while True:
                t_dbg = time.perf_counter()
                nxt = self._vrun_seg(
                    states, mats, max_iters, seg_len(len(positions))
                )
                probe = np.asarray(probe_of(states))  # waits on `states` only
                if dbg:
                    print(
                        f"# seg+probe {time.perf_counter() - t_dbg:.3f}s "
                        f"(cur={len(positions)}, it={probe[1].max():.0f})",
                        flush=True,
                    )
                status_np, it_np, trig_np = probe[0], probe[1], probe[2]
                max_it_now = int(it_np.max())
                chunks_run = -(-(max_it_now - prev_maxit) // max(
                    int(self.stg.check_interval), 1
                ))
                self.device_prob_iters += (
                    len(positions) * chunks_run * int(self.stg.check_interval)
                )
                prev_maxit = max_it_now
                done = (status_np != UNFINISHED) | (it_np >= max_iters)
                timed_out = bool(
                    time_limit and (time.perf_counter() - t0) > time_limit
                )
                if done.all() or timed_out:
                    # on normal exit nxt == states (the speculative segment
                    # runs zero chunks once every problem has terminated);
                    # on timeout the unfinished rows finalize as-is and
                    # _materialize classifies them with relaxed tolerances
                    pending.append(
                        (
                            self._vfinalize(states, mats),
                            positions,
                            None,
                            time.perf_counter() - t0,
                        )
                    )
                    break
                states = nxt
                if trig_np.any():
                    # some problem's adaptive scale drifted: run the separate
                    # refactorization program (kept out of the hot loop)
                    states = self._vrescale(states, mats)
                if not compact:
                    continue
                n_act = int((~done).sum())
                cur = len(positions)
                target = cur
                while target // 2 >= max(n_act, self._MIN_BUCKET):
                    target //= 2
                if target < cur:
                    # retire the finished problems, then compact the rest.
                    # `done` is one segment stale; the retired problems are
                    # frozen in `states`, so their finalize pack is identical.
                    pending.append(
                        (
                            self._vfinalize(states, mats),
                            positions,
                            done,
                            time.perf_counter() - t0,
                        )
                    )
                    active = np.where(~done)[0]
                    pad = np.full(target - n_act, active[0], dtype=np.int64)
                    idx = np.concatenate([active, pad])
                    states, mats = self._vcompact(
                        states, mats, jnp.asarray(idx, jnp.int32)
                    )
                    positions = positions[idx]
        except KeyboardInterrupt:
            interrupted = True
            # finalize the in-flight state so partial results (retired
            # packs + current iterates) are returned, not lost
            pending.append(
                (
                    self._vfinalize(states, mats),
                    positions,
                    None,
                    time.perf_counter() - t0,
                )
            )
        for pack, pos, mask, el in pending:
            self._materialize(
                results, pos, pack, mask, el, interrupted=interrupted
            )
        # states are compacted/finished now; a later solve() cold-starts
        self._states = None
        return results


def solve_batch(data, cone, **settings):
    """One-shot batched solve over B same-shape problems."""
    return BatchedSCS(data, cone, **settings).solve()
