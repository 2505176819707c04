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


@functools.partial(
    jax.jit, static_argnames=("emax", "b_tile", "interpret")
)
def f2_eliminate(
    r: jax.Array,
    nreal: jax.Array,
    *,
    emax: int,
    b_tile: int = 128,
    interpret: bool = False,
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

    def kern(r_ref, nreal_ref, out_ref, piv_ref, fail_ref):
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
                rc = out_ref[cw]  # (m_pad, b_tile)
                # One-hot row select as a masked int32 sum (Mosaic has no
                # unsigned reductions, and full-range 32-bit vector
                # multiplies are avoided in favor of selects; exactly
                # <= 1 term is nonzero, so the bit pattern is exact).
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
                    elim, jnp.broadcast_to(prow, rc.shape), jnp.uint32(0)
                )
            failed = failed | (
                (~has).astype(jnp.int32) * (col < nr).astype(jnp.int32)
            )
            return used, pivacc, failed

        used0 = jnp.zeros((m_pad, b_tile), jnp.int32)
        piv0 = jnp.zeros((emax, b_tile), jnp.int32)
        fail0 = jnp.zeros((1, b_tile), jnp.int32)
        _, pivacc, failed = jax.lax.fori_loop(
            0, emax, step, (used0, piv0, fail0)
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
    )(r, nreal)
    return r_out, pivrow, failed
