"""Pallas TPU kernel: VMEM-resident packed Gauss-Jordan elimination.

The wide-GE solvers (ops/ge.py) eliminate a packed [A | T] coefficient
cube with an XLA ``fori_loop`` over pivot columns. XLA keeps the cube in
HBM and re-streams it every pivot: at the GE-hot hybrid shape
(m=510, C=32 words, B=448, emax=512 pivots) that is ~74 GB of HBM
traffic for a 29 MB working set — measured ~80 ms of the 151 ms binary
solve (varied-input timing; VALIDATION.md). Here the cube is DMA'd into
VMEM once per lane-tile of frames and all ``emax`` pivot steps run
on-chip; HBM sees the cube exactly once in and once out.

Layout: ``(C, m_pad, B)`` with the BATCH on lanes (the round-4 lane-major
lesson) and the packed words on the UNTILED outer axis — the per-step
column fetch is a dynamic index into axis 0, which needs no sublane
alignment proof (dynamic single-row slices of the tiled axes do not
lower: Mosaic requires statically-provable multiple-of-8 offsets).
Per-lane pivot bookkeeping (candidate mask, first-row argmin via iota,
used mask, failure flags) is vectorized across the 128-frame lane tile;
the pivot row is selected by a one-hot masked sum over sublanes (TPU has
no cross-sublane gather), and the row update is one masked XOR pass over
the cube per packed word.

Reference: Matlab/My_LDPC_HybridML_Erasure_Decoder.m:57-86 (the
elimination these solvers implement); same swap-free formulation as
ops/ge.py (pivot choices and failure flags byte-identical, tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xtime_packed32(v, poly_lo: int):
    # SWAR multiply-by-x of four GF(256) bytes per uint32 lane, using
    # shifts+selects only (full-range 32-bit vector multiplies avoided).
    msb = (v >> 7) & jnp.uint32(0x01010101)
    red = jnp.uint32(0)
    for bit in range(8):
        if (poly_lo >> bit) & 1:
            red = red ^ (msb << bit)
    return ((v << 1) & jnp.uint32(0xFEFEFEFE)) ^ red


def _gf_mul_lane(a, b, poly_lo: int):
    # GF(256) product of single-byte lanes ((1, bt) uint32 holding bytes)
    # by double-and-add over b's bits.
    acc = jnp.zeros_like(a)
    for i in range(8):
        take = ((b >> i) & 1) == 1
        acc = acc ^ jnp.where(take, a, jnp.uint32(0))
        a = _xtime_packed32(a, poly_lo) & jnp.uint32(0xFF)
    return acc


def _gf_inv_lane(x, poly_lo: int):
    # x^254 by square-and-multiply (13 lane products); inv(0) = 0 by the
    # repo convention (never consumed: no-pivot lanes write nothing).
    p = _gf_mul_lane(x, x, poly_lo)  # x^2
    acc = p
    for _ in range(6):
        p = _gf_mul_lane(p, p, poly_lo)  # x^4 .. x^128
        acc = _gf_mul_lane(acc, p, poly_lo)
    return acc


@functools.partial(
    jax.jit,
    static_argnames=("emax", "b_tile", "prim_poly", "interpret", "a_words"),
)
def gf256_eliminate(
    r: jax.Array,
    nreal: jax.Array,
    *,
    emax: int,
    b_tile: int = 128,
    prim_poly: int = 0x171,
    interpret: bool = False,
    a_words: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """GF(256) swap-free [A | T] elimination of a packed byte cube, in VMEM.

    The non-binary companion of :func:`f2_eliminate` (the RS / NB wide
    solver's pattern solve, ops/ge.py::ge_solve_wide_nb): same layout and
    bookkeeping, with byte columns (byte ``col & 3`` of word
    ``col >> 2``), pivot-row normalization by the field inverse
    (square-and-multiply on the pivot lanes), and the row update as
    double-and-add over the factor bytes' bits (8 masked-XOR passes of
    the xtime chain per word instead of GF(2)'s one).

    Args:
      r: (C, m_pad, B) uint32 — FOUR GF(256) bytes per word, LSB-first
        (byte j of word w = column 4w + j); m_pad % 8 == 0, pad rows zero.
      nreal: (1, B) int32 real-column counts.
      emax: byte columns to eliminate.
      b_tile: frames per grid program (B % b_tile == 0; % 128 on hw).
      prim_poly: GF(256) primitive polynomial (low byte drives xtime).
      a_words: leading words of each row holding the A block — enables
        the same two exact work cuts as :func:`f2_eliminate` (dynamic
        ``max(nreal)`` loop bound + completed-A-word skipping; failed
        lanes' cube words may differ, within the solver contract).

    Returns:
      (r_out, pivrow, failed) — as :func:`f2_eliminate`; r_out's pivot
      rows are NORMALIZED (they are the transform rows the solver
      gathers).
    """
    c_words, m_pad, b = r.shape
    if b % b_tile:
        raise ValueError(f"B={b} must be a multiple of b_tile={b_tile}")
    if nreal.shape != (1, b):
        raise ValueError(f"nreal shape {nreal.shape} != (1, {b})")
    poly_lo = prim_poly & 0xFF
    ncols = jnp.minimum(jnp.max(nreal), emax).reshape(1, 1).astype(jnp.int32)

    def kern(r_ref, nreal_ref, ncols_ref, out_ref, piv_ref, fail_ref):
        out_ref[...] = r_ref[...]
        m_iota = jax.lax.broadcasted_iota(
            jnp.int32, (m_pad, b_tile), 0
        )
        e_iota = jax.lax.broadcasted_iota(jnp.int32, (emax, b_tile), 0)
        nr = nreal_ref[...]  # (1, b_tile)

        def step(col, carry):
            used, pivacc, failed = carry
            colw = out_ref[pl.ds(col >> 2, 1)][0]  # (m_pad, b_tile) u32
            sh = ((col & 3) * 8).astype(jnp.uint32)
            colv = (colw >> sh) & jnp.uint32(0xFF)
            cand = (colv != 0) & (used == 0)
            piv = jnp.min(
                jnp.where(cand, m_iota, m_pad), axis=0, keepdims=True
            )  # (1, b_tile)
            has = piv < m_pad
            is_piv = m_iota == piv
            used = used | is_piv.astype(jnp.int32)
            pivacc = jnp.where((e_iota == col) & has, piv, pivacc)
            # Pivot element + inverse on the lane vector.
            colv_i = jax.lax.bitcast_convert_type(colv, jnp.int32)
            piv_el = jax.lax.bitcast_convert_type(
                jnp.sum(
                    jnp.where(is_piv, colv_i, 0), axis=0, keepdims=True
                ),
                jnp.uint32,
            )  # (1, b_tile)
            pinv = _gf_inv_lane(piv_el, poly_lo)
            elim_rows = (colv != 0) & ~is_piv & has  # (m_pad, b_tile)
            zero = jnp.zeros((m_pad, b_tile), jnp.int32)
            for cw in range(c_words):

                def word_update(cw=cw):
                    rc = out_ref[cw]  # (m_pad, b_tile)
                    rc_i = jax.lax.bitcast_convert_type(rc, jnp.int32)
                    prow = jax.lax.bitcast_convert_type(
                        jnp.sum(
                            jnp.where(is_piv, rc_i, zero),
                            axis=0,
                            keepdims=True,
                        ),
                        jnp.uint32,
                    )  # (1, b_tile) — the pivot row's word
                    # Normalize by the pivot inverse (double-and-add).
                    norm = jnp.zeros_like(prow)
                    a = prow
                    for i in range(8):
                        take = ((pinv >> i) & 1) == 1
                        norm = norm ^ jnp.where(take, a, jnp.uint32(0))
                        a = _xtime_packed32(a, poly_lo)
                    # Write the normalized row back, then eliminate the
                    # rest as double-and-add over each row's factor byte
                    # (colv).
                    rc = jnp.where(
                        is_piv & has,
                        jnp.broadcast_to(norm, rc.shape),
                        rc,
                    )
                    acc = jnp.zeros_like(rc)
                    nw = jnp.broadcast_to(norm, rc.shape)
                    for i in range(8):
                        take = (((colv >> i) & 1) == 1) & elim_rows
                        acc = acc ^ jnp.where(take, nw, jnp.uint32(0))
                        nw = _xtime_packed32(nw, poly_lo)
                    out_ref[cw] = rc ^ acc

                if a_words and cw < a_words:
                    # Completed A words: pivot row zero there, update a
                    # no-op (see f2_eliminate docstring).
                    @pl.when(cw >= (col >> 2))
                    def _():
                        word_update()
                else:
                    word_update()
            failed = failed | (
                (~has).astype(jnp.int32) * (col < nr).astype(jnp.int32)
            )
            return used, pivacc, failed

        used0 = jnp.zeros((m_pad, b_tile), jnp.int32)
        piv0 = jnp.zeros((emax, b_tile), jnp.int32)
        fail0 = jnp.zeros((1, b_tile), jnp.int32)
        ub = ncols_ref[0, 0] if a_words else emax
        _, pivacc, failed = jax.lax.fori_loop(
            0, ub, step, (used0, piv0, fail0)
        )
        piv_ref[...] = pivacc
        fail_ref[...] = failed

    grid = (b // b_tile,)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (c_words, m_pad, b_tile), lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, b_tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (c_words, m_pad, b_tile), lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (emax, b_tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, b_tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c_words, m_pad, b), jnp.uint32),
            jax.ShapeDtypeStruct((emax, b), jnp.int32),
            jax.ShapeDtypeStruct((1, b), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(r, nreal, ncols)


@functools.partial(
    jax.jit, static_argnames=("emax", "b_tile", "interpret", "a_words")
)
def f2_eliminate(
    r: jax.Array,
    nreal: jax.Array,
    *,
    emax: int,
    b_tile: int = 128,
    interpret: bool = False,
    a_words: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """GF(2) swap-free elimination of a packed bit cube, in VMEM.

    Args:
      r: (C, m_pad, B) uint32 — packed-bit [A | T] rows, bit ``col`` of
        word ``col >> 5``; m_pad % 8 == 0 (pad rows zero — they never
        pivot).
      nreal: (1, B) int32 — number of real erased columns per frame
        (columns >= nreal finding no pivot are not failures).
      emax: pivot columns to eliminate (bit columns 0..emax-1 of A).
      b_tile: frames per grid program (lane tile; B % b_tile == 0, and
        b_tile % 128 == 0 on hardware).
      a_words: number of leading words of each row holding the A block
        (round 5). When > 0, two exact work cuts apply:

        * the pivot loop runs only to ``max(nreal)`` over the whole
          batch — columns past every lane's residual are provable no-ops
          (pad columns are all-zero and contribute no pivot, update, or
          failure) — so the ``emax`` bucket stops costing anything when
          residuals are small;
        * COMPLETED A words are skipped: after the Jordan step on column
          c, every non-pivot row holds 0 in column c, so a later pivot
          row's words below ``col >> 5`` are zero and their update is a
          no-op. (Exception: a FAILED lane's un-pivoted column can leave
          nonzero entries behind, so failed lanes' cube words may differ
          from the unskipped computation — within the solver contract,
          which declares failed frames' solved values garbage; pivot
          rows and failure flags are unaffected.)

    Returns:
      (r_out, pivrow, failed): the eliminated cube (same layout), the
      (emax, B) int32 pivot-row index per column (0 where none), and
      (1, B) int32 failure flags (nonzero = rank-deficient).
    """
    c_words, m_pad, b = r.shape
    if b % b_tile:
        raise ValueError(f"B={b} must be a multiple of b_tile={b_tile}")
    if nreal.shape != (1, b):
        raise ValueError(f"nreal shape {nreal.shape} != (1, {b})")
    # Scalar loop bound, computed XLA-side and passed through SMEM: the
    # batch's widest residual (clamped to the bucket).
    ncols = jnp.minimum(jnp.max(nreal), emax).reshape(1, 1).astype(jnp.int32)

    def kern(r_ref, nreal_ref, ncols_ref, out_ref, piv_ref, fail_ref):
        out_ref[...] = r_ref[...]
        m_iota = jax.lax.broadcasted_iota(
            jnp.int32, (m_pad, b_tile), 0
        )
        e_iota = jax.lax.broadcasted_iota(jnp.int32, (emax, b_tile), 0)
        nr = nreal_ref[...]  # (1, b_tile)

        def step(col, carry):
            used, pivacc, failed = carry
            colw = out_ref[pl.ds(col >> 5, 1)][0]  # (m_pad, b_tile) u32
            colv = (colw >> (col & 31).astype(jnp.uint32)) & jnp.uint32(1)
            cand = (colv == 1) & (used == 0)
            # First candidate row per lane (argmin over sublanes via iota).
            piv = jnp.min(
                jnp.where(cand, m_iota, m_pad), axis=0, keepdims=True
            )  # (1, b_tile); == m_pad where none
            has = piv < m_pad  # (1, b_tile)
            is_piv = m_iota == piv  # (m_pad, b_tile); all-False if none
            used = used | is_piv.astype(jnp.int32)
            pivacc = jnp.where(
                (e_iota == col) & has, piv, pivacc
            )
            elim = (colv == 1) & ~is_piv & has  # (m_pad, b_tile) bool
            zero = jnp.zeros((m_pad, b_tile), jnp.int32)
            for cw in range(c_words):

                def word_update(cw=cw):
                    rc = out_ref[cw]  # (m_pad, b_tile)
                    # One-hot row select as a masked int32 sum (Mosaic
                    # has no unsigned reductions, and full-range 32-bit
                    # vector multiplies are avoided in favor of selects;
                    # exactly <= 1 term is nonzero, so the bit pattern
                    # is exact).
                    rc_i = jax.lax.bitcast_convert_type(rc, jnp.int32)
                    prow = jax.lax.bitcast_convert_type(
                        jnp.sum(
                            jnp.where(is_piv, rc_i, zero),
                            axis=0,
                            keepdims=True,
                        ),
                        jnp.uint32,
                    )
                    out_ref[cw] = rc ^ jnp.where(
                        elim,
                        jnp.broadcast_to(prow, rc.shape),
                        jnp.uint32(0),
                    )

                if a_words and cw < a_words:
                    # Completed A words: the pivot row is zero there (see
                    # docstring), the update a no-op — skip the two
                    # full-cube passes with one scalar branch.
                    @pl.when(cw >= (col >> 5))
                    def _():
                        word_update()
                else:
                    word_update()
            failed = failed | (
                (~has).astype(jnp.int32) * (col < nr).astype(jnp.int32)
            )
            return used, pivacc, failed

        used0 = jnp.zeros((m_pad, b_tile), jnp.int32)
        piv0 = jnp.zeros((emax, b_tile), jnp.int32)
        fail0 = jnp.zeros((1, b_tile), jnp.int32)
        ub = ncols_ref[0, 0] if a_words else emax
        _, pivacc, failed = jax.lax.fori_loop(
            0, ub, step, (used0, piv0, fail0)
        )
        piv_ref[...] = pivacc
        fail_ref[...] = failed

    grid = (b // b_tile,)
    r_out, pivrow, failed = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (c_words, m_pad, b_tile), lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, b_tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (c_words, m_pad, b_tile), lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (emax, b_tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, b_tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c_words, m_pad, b), jnp.uint32),
            jax.ShapeDtypeStruct((emax, b), jnp.int32),
            jax.ShapeDtypeStruct((1, b), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(r, nreal, ncols)
    return r_out, pivrow, failed
