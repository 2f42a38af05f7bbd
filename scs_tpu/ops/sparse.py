"""Block-ELL sparse matrix-vector product — the TPU-native sparse layout
and Pallas kernel behind the large-problem indirect strategy.

The reference's indirect backend does CSC SpMV on the CPU
(scs_source/linsys/cpu/indirect/private.c over scs_matrix.c). CSC gathers
are hostile to the TPU's vector/matrix units, so the TPU layout is
block-ELL: the matrix is cut into (bs x bs) dense tiles, and each
block-row stores a fixed number (`width`) of nonzero tiles plus their
block-column ids. SpMV then becomes `width` dense (bs x bs) @ (bs,)
products per block-row — MXU work with perfectly static shapes — and the
block-column ids ride the scalar-prefetch path so each x tile is DMA'd
into VMEM exactly when needed.

Host-side packing is done by the native C++ runtime
(native.pack_block_ell); this module provides:

  * bell_spmv       — Pallas TPU kernel (f32), with an interpret fallback
  * bell_spmv_ref   — pure-jnp reference (any backend/dtype, used on CPU
                      and as the numerical oracle)
  * BellMatrix      — packed (A, A^T) pair with .mv / .rmv
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


def _pallas_available() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def bell_spmv_ref(blocks, cols, x_pad):
    """Reference block-ELL SpMV: y (nbr*bs,) = A @ x.

    blocks: (nbr, width, bs, bs) storing each tile TRANSPOSED
    (blocks[r, w, j, i] = A_tile[i, j] — so the kernel's row-vector
    matmul x_tile @ blocks[r, w] is a plain MXU matmul); cols: (nbr,
    width) int32; x_pad: (nbc*bs,) zero-padded input.
    """
    nbr, width, bs, _ = blocks.shape
    xb = x_pad.reshape(-1, bs)  # (nbc, bs)
    gathered = xb[cols]  # (nbr, width, bs)
    y = jnp.einsum(
        "rwji,rwj->ri", blocks, gathered,
        preferred_element_type=blocks.dtype,
    )
    return y.reshape(nbr * bs)


def _bell_kernel(cols_ref, blk_ref, x_ref, y_ref):
    from jax.experimental import pallas as pl  # noqa: PLC0415

    @pl.when(pl.program_id(1) == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    # tiles are stored transposed, so A_tile @ x == x_row @ blk: a
    # (1, bs) @ (bs, bs) matmul — the MXU-legal orientation (a 2Dx1D
    # matvec fails Mosaic legalization). HIGHEST precision: the default
    # bf16 MXU passes give ~1e-2 relative error, which stalls the CG/DR
    # iterations this SpMV feeds (solver._hp rationale).
    y_ref[0, :, :] += jax.lax.dot(
        x_ref[0],
        blk_ref[0, 0],
        preferred_element_type=y_ref.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def _bell_kernel_rowmajor(cols_ref, blk_ref, x_ref, y_ref):
    """One grid step per BLOCK-ROW: the full padded x lives in VMEM and
    the width loop is unrolled inside the kernel, so the per-grid-step
    launch overhead (which dominates the one-tile-per-step kernel — each
    (1,bs)@(bs,bs) is ~0.2 us of DMA but ~2 us of step overhead) is paid
    nbr times instead of nbr*width times."""
    from jax.experimental import pallas as pl  # noqa: PLC0415

    i = pl.program_id(0)
    width = blk_ref.shape[1]
    bs = blk_ref.shape[-1]
    acc = jnp.zeros((1, bs), y_ref.dtype)
    for w in range(width):  # static unroll
        c = cols_ref[i, w]
        xt = x_ref[0, pl.dslice(c * bs, bs)].reshape(1, bs)
        acc = acc + jax.lax.dot(
            xt,
            blk_ref[0, w],
            preferred_element_type=y_ref.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
    y_ref[0, 0, :] = acc[0]


# full-x-in-VMEM is the fast path while x (padded) PLUS the double-
# buffered (1, width, bs, bs) block slab fit in VMEM (~16 MiB on v5e,
# budgeted at 12 MiB). Gating on x alone is wrong for semi-dense packs
# (width ~ nbc): the slab alone can exceed VMEM (ADVICE r3 medium).
_BELL_VMEM_BUDGET = 3 * 1024 * 1024  # f32 elements (12 MiB)


@partial(jax.jit, static_argnames=("interpret",))
def bell_spmv(blocks, cols, x_pad, *, interpret=False):
    """Pallas TPU block-ELL SpMV. f32 in/out; shapes as bell_spmv_ref.

    Tiles are carried as (count, 1, bs) so every block's trailing two
    dims are (1, bs) — equal-to-array on the sublane axis, lane-aligned
    on the last (the TPU lowering requires (8k, 128k) or equal dims).
    The x tile for each (block-row, slot) is DMA'd into VMEM by the
    scalar-prefetched block-column id.
    """
    from jax.experimental import pallas as pl  # noqa: PLC0415
    from jax.experimental.pallas import tpu as pltpu  # noqa: PLC0415

    nbr, width, bs, _ = blocks.shape
    n_pad = x_pad.shape[0]

    # The package enables x64 globally; under x64 the grid-spec index
    # maps trace their literal indices as i64 and Mosaic fails to
    # legalize the kernel ("failed to legalize operation 'func.func'",
    # reproduced on-chip when this guard was briefly removed). All
    # operands are f32/i32 by contract, so scoping x64 off around the
    # pallas_call has no caller-visible effect. (ADVICE r3 claimed
    # jax.enable_x64 does not exist — it does in jax 0.9 and the guard
    # is load-bearing.)
    x64_off = jax.enable_x64(False)

    if n_pad + 2 * width * bs * bs <= _BELL_VMEM_BUDGET:
        # fast path: full x resident in VMEM, one grid step per block-row
        xb = x_pad.reshape(1, n_pad)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nbr,),
            in_specs=[
                pl.BlockSpec((1, width, bs, bs), lambda i, cols: (i, 0, 0, 0)),
                pl.BlockSpec((1, n_pad), lambda i, cols: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, bs), lambda i, cols: (i, 0, 0)),
        )
        with x64_off:
            y = pl.pallas_call(
                _bell_kernel_rowmajor,
                out_shape=jax.ShapeDtypeStruct((nbr, 1, bs), blocks.dtype),
                grid_spec=grid_spec,
                interpret=interpret,
                cost_estimate=pl.CostEstimate(
                    flops=2 * nbr * width * bs * bs,
                    bytes_accessed=blocks.size * blocks.dtype.itemsize
                    + (n_pad + nbr * bs) * blocks.dtype.itemsize,
                    transcendentals=0,
                ),
            )(cols.astype(jnp.int32), blocks, xb)
        return y.reshape(nbr * bs)

    xb = x_pad.reshape(-1, 1, bs)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr, width),
        in_specs=[
            pl.BlockSpec((1, 1, bs, bs), lambda i, w, cols: (i, w, 0, 0)),
            pl.BlockSpec((1, 1, bs), lambda i, w, cols: (cols[i, w], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bs), lambda i, w, cols: (i, 0, 0)),
    )
    with x64_off:
        y = pl.pallas_call(
            _bell_kernel,
            out_shape=jax.ShapeDtypeStruct((nbr, 1, bs), blocks.dtype),
            grid_spec=grid_spec,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * nbr * width * bs * bs,
                bytes_accessed=blocks.size * blocks.dtype.itemsize
                + 2 * nbr * bs * blocks.dtype.itemsize,
                transcendentals=0,
            ),
        )(cols.astype(jnp.int32), blocks, xb)
    return y.reshape(nbr * bs)


class BellMatrix(NamedTuple):
    """Packed block-ELL representation of A and A^T (the pre-transposed
    A^T mirrors the reference GPU backend's gpu_atrans option,
    meson.build:291-293)."""

    m: int
    n: int
    bs: int
    A_blocks: jnp.ndarray  # (nbr, wA, bs, bs)
    A_cols: jnp.ndarray  # (nbr, wA)
    At_blocks: jnp.ndarray  # (nbc, wAt, bs, bs)
    At_cols: jnp.ndarray  # (nbc, wAt)
    col_sq: jnp.ndarray  # (n,) sum_i A_ij^2  (Jacobi preconditioner data)
    row_sq: jnp.ndarray  # (m,) sum_j A_ij^2

    @property
    def m_pad(self):
        return self.A_blocks.shape[0] * self.bs

    @property
    def n_pad(self):
        return self.At_blocks.shape[0] * self.bs

    def mv(self, x, *, use_pallas=None):
        """A @ x for x of length n (returns length m)."""
        x_pad = jnp.zeros(self.n_pad, self.A_blocks.dtype).at[: self.n].set(x)
        if use_pallas is None:
            use_pallas = _pallas_available()
        f = bell_spmv if use_pallas else bell_spmv_ref
        return f(self.A_blocks, self.A_cols, x_pad)[: self.m]

    def rmv(self, y, *, use_pallas=None):
        """A^T @ y for y of length m (returns length n)."""
        y_pad = jnp.zeros(self.m_pad, self.At_blocks.dtype).at[: self.m].set(y)
        if use_pallas is None:
            use_pallas = _pallas_available()
        f = bell_spmv if use_pallas else bell_spmv_ref
        return f(self.At_blocks, self.At_cols, y_pad)[: self.n]


def pack_bell_host(A_csc, block_size=128, np_dtype=np.float32):
    """Host-side block-ELL pack of (A, A^T): NUMPY arrays only, no device
    upload. The batched bell path stacks B of these before one H2D
    transfer — fetching per-problem device arrays back to stack them
    costs ~2 s each through the tunnel's ~30 MB/s D2H (measured r5).

    Returns (A_blocks, A_cols, At_blocks, At_cols, col_sq, row_sq).
    """
    from scipy import sparse as sp  # noqa: PLC0415

    from .. import native  # noqa: PLC0415

    A_csc = sp.csc_matrix(A_csc)
    A_csc.sort_indices()
    At_csc = sp.csc_matrix(A_csc.T)
    At_csc.sort_indices()

    def pack(M):
        if native.available:
            blocks, cols = native.pack_block_ell(M, block_size)
        else:
            blocks, cols = _pack_bell_numpy(M, block_size)
        # store tiles transposed: SpMV becomes x_row @ tile (MXU-legal)
        return (
            np.ascontiguousarray(
                blocks.transpose(0, 1, 3, 2), dtype=np_dtype
            ),
            np.asarray(cols, np.int32),
        )

    A_blocks, A_cols = pack(A_csc)
    At_blocks, At_cols = pack(At_csc)
    d = np.asarray(A_csc.multiply(A_csc).sum(axis=0), np_dtype).ravel()
    r = np.asarray(A_csc.multiply(A_csc).sum(axis=1), np_dtype).ravel()
    return A_blocks, A_cols, At_blocks, At_cols, d, r


def pack_bell(A_csc, block_size=128, dtype=jnp.float32):
    """Pack a scipy CSC matrix into a BellMatrix (A and A^T).

    Uses the native C++ packer when available, else a numpy fallback.
    """
    m, n = A_csc.shape
    np_dtype = np.float64 if dtype == jnp.float64 else np.float32
    A_blocks, A_cols, At_blocks, At_cols, d, r = pack_bell_host(
        A_csc, block_size, np_dtype
    )
    return BellMatrix(
        m=m,
        n=n,
        bs=block_size,
        A_blocks=jnp.asarray(A_blocks, dtype),
        A_cols=jnp.asarray(A_cols, jnp.int32),
        At_blocks=jnp.asarray(At_blocks, dtype),
        At_cols=jnp.asarray(At_cols, jnp.int32),
        col_sq=jnp.asarray(d, dtype),
        row_sq=jnp.asarray(r, dtype),
    )


def pack_bell_sym_host(P_csc, block_size=128, np_dtype=np.float32):
    """Host-side symmetric pack: numpy (blocks, cols, diag), no upload."""
    from scipy import sparse as sp  # noqa: PLC0415

    from .. import native  # noqa: PLC0415

    P_csc = sp.csc_matrix(P_csc)
    P_csc.sort_indices()
    if native.available:
        blocks, cols = native.pack_block_ell(P_csc, block_size)
    else:
        blocks, cols = _pack_bell_numpy(P_csc, block_size)
    blocks = np.ascontiguousarray(
        blocks.transpose(0, 1, 3, 2), dtype=np_dtype
    )
    return (
        blocks,
        np.asarray(cols, np.int32),
        np.asarray(P_csc.diagonal(), np_dtype),
    )


def pack_bell_sym(P_csc, block_size=128, dtype=jnp.float32):
    """Pack a symmetric sparse matrix (full P, not triu) into a one-sided
    block-ELL operator (solver.PBell): symmetry means a single pack serves
    P @ x in both orientations; diag(P) is extracted for the Jacobi
    preconditioner (solver._diagS)."""
    from ..solver import PBell  # noqa: PLC0415

    np_dtype = np.float64 if dtype == jnp.float64 else np.float32
    blocks, cols, diag = pack_bell_sym_host(P_csc, block_size, np_dtype)
    return PBell(
        blocks=jnp.asarray(blocks, dtype),
        cols=jnp.asarray(cols, jnp.int32),
        diag=jnp.asarray(diag, dtype),
    )


def pack_bell_sharded(A_csc, n_dev, block_size=128, dtype=jnp.float32):
    """Per-device block-ELL packs of (A, A^T) for a ROW-sharded operator
    (SURVEY §2.4 "TPU mapping": row-block-sharded A over ICI).

    The m rows (must be a multiple of n_dev*block_size — callers pre-pad
    with zero-cone rows) are split contiguously into n_dev groups; device
    d gets the pack of its row slice A_d AND the pack of A_d^T, so that

        A @ x    = all_gather_d(A_d @ x)          (x replicated)
        A^T @ y  = psum_d(A_d^T @ y_d)            (y_d = local rows)

    — one (n,)-psum / (m,)-all-gather per matvec, riding the ICI ring.
    Per-device widths are padded to the maximum across devices (padding
    slots have zero tiles pointing at block 0 — harmless), and all arrays
    are stacked with a leading n_dev axis for shard_map.

    Returns (A_blocks, A_cols, At_blocks, At_cols, colsq_all) with
    shapes (n_dev, nbr_loc, wA, bs, bs), (n_dev, nbr_loc, wA),
    (n_dev, nbc, wAt, bs, bs), (n_dev, nbc, wAt), (n,).
    """
    from scipy import sparse as sp  # noqa: PLC0415

    m, n = A_csc.shape
    if m % (n_dev * block_size) != 0:
        raise ValueError(
            f"sharded bell pack requires m ({m}) to be a multiple of "
            f"n_dev*block_size ({n_dev * block_size}); pad rows first"
        )
    m_loc = m // n_dev
    A_csc = sp.csc_matrix(A_csc)
    packs = [
        pack_bell(
            A_csc[d * m_loc : (d + 1) * m_loc], block_size, dtype
        )
        for d in range(n_dev)
    ]

    def stack_padded(blocks_list, cols_list):
        w = max(b.shape[1] for b in blocks_list)
        outs_b, outs_c = [], []
        for b, c in zip(blocks_list, cols_list):
            pad = w - b.shape[1]
            if pad:
                b = np.concatenate(
                    [np.asarray(b), np.zeros(
                        (b.shape[0], pad) + b.shape[2:], np.asarray(b).dtype
                    )],
                    axis=1,
                )
                c = np.concatenate(
                    [np.asarray(c), np.zeros((c.shape[0], pad), np.int32)],
                    axis=1,
                )
            outs_b.append(np.asarray(b))
            outs_c.append(np.asarray(c))
        return jnp.asarray(np.stack(outs_b), dtype), jnp.asarray(
            np.stack(outs_c), jnp.int32
        )

    A_blocks, A_cols = stack_padded(
        [p.A_blocks for p in packs], [p.A_cols for p in packs]
    )
    At_blocks, At_cols = stack_padded(
        [p.At_blocks for p in packs], [p.At_cols for p in packs]
    )
    colsq_all = jnp.sum(
        jnp.stack([jnp.asarray(p.col_sq, dtype) for p in packs]), axis=0
    )
    return A_blocks, A_cols, At_blocks, At_cols, colsq_all


def pack_bell_sym_sharded(P_csc, n_dev, block_size=128, dtype=jnp.float32):
    """Per-device block-ELL packs of the symmetric quadratic-cost matrix
    P for a ROW-sharded operator (VERDICT r4 item 7): device d holds the
    pack of its contiguous row slice P_d of the row-zero-padded P, so

        P @ x = all_gather_d(P_d @ x)[:n]        (x replicated)

    — the same communication pattern as the sharded A @ x (one tiled
    all-gather riding the ICI ring; symmetry means no second pack or
    psum is needed for the transpose orientation). Rows are zero-padded
    to a multiple of n_dev*block_size (padding rows are all-zero tiles —
    the gathered result is sliced back to n by the caller).

    Returns a solver.PBell with leading n_dev axes on blocks/cols
    ((n_dev, nbr_loc, w, bs, bs), (n_dev, nbr_loc, w)) and a replicated
    (n,) diag.
    """
    from scipy import sparse as sp  # noqa: PLC0415

    from ..solver import PBell  # noqa: PLC0415

    P_csc = sp.csc_matrix(P_csc)
    n = P_csc.shape[0]
    pad = (-n) % (n_dev * block_size)
    if pad:
        P_csc = sp.vstack(
            [P_csc.tocsr(), sp.csr_matrix((pad, n))]
        ).tocsc()
    n_rows = n + pad
    n_loc = n_rows // n_dev
    P_csr = P_csc.tocsr()
    packs = [
        pack_bell(
            P_csr[d * n_loc : (d + 1) * n_loc].tocsc(), block_size, dtype
        )
        for d in range(n_dev)
    ]

    w = max(p.A_blocks.shape[1] for p in packs)
    outs_b, outs_c = [], []
    for p in packs:
        b_, c_ = np.asarray(p.A_blocks), np.asarray(p.A_cols)
        padw = w - b_.shape[1]
        if padw:
            b_ = np.concatenate(
                [b_, np.zeros((b_.shape[0], padw) + b_.shape[2:], b_.dtype)],
                axis=1,
            )
            c_ = np.concatenate(
                [c_, np.zeros((c_.shape[0], padw), np.int32)], axis=1
            )
        outs_b.append(b_)
        outs_c.append(c_)
    return PBell(
        blocks=jnp.asarray(np.stack(outs_b), dtype),
        cols=jnp.asarray(np.stack(outs_c), jnp.int32),
        diag=jnp.asarray(P_csc.diagonal()[:n], dtype),
    )


def _pack_bell_numpy(A_csc, bs):
    """Pure-numpy block-ELL packer (fallback when g++ is unavailable)."""
    m, n = A_csc.shape
    nbr, nbc = -(-m // bs), -(-n // bs)
    coo = A_csc.tocoo()
    bi, bj = coo.row // bs, coo.col // bs
    pair_ids = bi * nbc + bj
    uniq = np.unique(pair_ids)
    slots = {}
    counts = np.zeros(nbr, np.int64)
    for p in uniq:
        r = p // nbc
        slots[p] = counts[r]
        counts[r] += 1
    width = max(int(counts.max()) if nbr else 0, 1)
    blocks = np.zeros((nbr, width, bs, bs))
    cols = np.zeros((nbr, width), np.int64)
    for p in uniq:
        cols[p // nbc, slots[p]] = p % nbc
    slot_of = np.array([slots[p] for p in pair_ids])
    blocks[bi, slot_of, coo.row % bs, coo.col % bs] = coo.data
    return blocks, cols
