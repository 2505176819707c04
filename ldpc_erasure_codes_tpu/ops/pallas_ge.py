"""Pallas TPU kernel: VMEM-resident Gauss-Jordan rank check over GF(2).

The XLA `ge_rank_check` pivot loop re-streams the whole (B, m+emax, emax)
matrix through HBM on every pivot step (~emax full passes). This kernel
keeps each batch-tile's matrix resident in VMEM for the entire elimination —
HBM sees the matrix exactly once — and runs the identical pivot schedule
(first nonzero row at/below the diagonal, masked swap, full elimination), so
results are bit-identical to `ops.ge.ge_rank_check(gf_order=2)`.

This is the "hardest kernel" of SURVEY §7 (data-dependent pivoting) done the
TPU way: all row selection is expressed as masked vector ops over the whole
matrix (no per-frame scalar control flow), batched over a VMEM-sized frame
tile per grid program.

Measured note (TPU v5e, (2040,1530), emax=192, B=256): bit-identical to the
XLA path but ~3.3x SLOWER. Mosaic currently implements reductions and
new-minor-dim broadcasts only for 32-bit types and has no dynamic column
extraction, which forces (a) int32 compute on an int8 matrix and (b) one-hot
full-matrix products for column/row selection — ~8 full int32 passes per
pivot vs XLA's ~4 fused int8 HBM streams. The HBM-residency advantage does
not survive that inflation at these matrix sizes. Kept as the experimental
VMEM-resident formulation (and the base to revisit when Mosaic grows 8-bit
reductions); production uses ``ops.ge.ge_rank_check`` + batch compaction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldpc_erasure_codes_tpu.ops.arrays import CodeArrays
from ldpc_erasure_codes_tpu.ops.ge import erased_indices


def _ge_kernel(a_in_ref, nreal_ref, failed_ref, a_ref):
    # Mosaic constraints shape this kernel: reductions and new-minor-dim
    # broadcasts exist only for 32-bit types, and there is no dynamic column
    # extraction — so the matrix is *stored* int8 but each pivot step
    # computes in int32, selects the column with a one-hot max, and picks the
    # pivot row with a min-over-masked-iota (first candidate row).
    bb, mm, emax = a_ref.shape
    a_ref[:, :, :] = a_in_ref[:, :, :]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (bb, mm), 1)
    lane_onehot = jax.lax.broadcasted_iota(jnp.int32, (1, 1, emax), 2)
    nreal = nreal_ref[:, 0]

    def pivot_step(col, failed):
        a = a_ref[:, :, :].astype(jnp.int32)
        onehot = (lane_onehot == col).astype(jnp.int32)
        colv = jnp.max(a * onehot, axis=2)  # (bb, mm)
        cand = (colv != 0) & (row_iota >= col)
        has = jnp.any(cand, axis=1)  # (bb,)
        piv = jnp.min(jnp.where(cand, row_iota, mm), axis=1)  # first candidate
        piv = jnp.where(has, piv, col)
        is_piv = (row_iota == piv[:, None]).astype(jnp.int32)
        is_col = (row_iota == col).astype(jnp.int32)
        # Masked row swap via select + max-reduce (single selected row, so
        # max == the row; no per-frame dynamic row addressing needed).
        row_piv = jnp.max(a * is_piv[:, :, None], axis=1)  # (bb, emax)
        row_col = jnp.max(a * is_col[:, :, None], axis=1)
        keep = (1 - is_piv) * (1 - is_col)
        a = (
            a * keep[:, :, None]
            + row_col[:, None, :] * is_piv[:, :, None]
            + row_piv[:, None, :] * is_col[:, :, None]
        )
        # Eliminate col everywhere except the pivot row.
        colv2 = jnp.max(a * onehot, axis=2)
        elim = ((colv2 != 0) & (row_iota != col) & has[:, None]).astype(jnp.int32)
        a = a ^ (elim[:, :, None] * row_piv[:, None, :])
        a_ref[:, :, :] = a.astype(jnp.int8)
        return failed | ((~has) & (col < nreal)).astype(jnp.int32)

    failed0 = jnp.zeros((bb,), dtype=jnp.int32)
    failed = jax.lax.fori_loop(0, emax, pivot_step, failed0)
    failed_ref[:, :] = failed[:, None]


@functools.partial(jax.jit, static_argnames=("emax", "block", "interpret"))
def ge_rank_pallas(
    arrays: CodeArrays,
    erased: jax.Array,
    *,
    emax: int,
    block: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Bit-identical drop-in for ``ge_rank_check(gf_order=2)`` (binary codes).

    ``block`` frames are eliminated per grid program with the augmented
    matrix in VMEM — size block·(m+emax)·emax bytes plus temporaries; keep it
    within VMEM including int32 temporaries (block=8, emax<=192).
    """
    b, n = erased.shape
    m = arrays.h.shape[0]
    er_idx, real, nreal = erased_indices(erased, emax)
    overflow = nreal > emax

    # Augmented matrix build (same prologue as ge_rank_check).
    a_top = jnp.take(arrays.h, er_idx, axis=1)  # (m, B, E) int8
    a_top = jnp.transpose(a_top, (1, 0, 2)) * real[:, None, :].astype(jnp.int8)
    eye = jnp.eye(emax, dtype=jnp.int8)[None] * (~real)[:, None, :].astype(jnp.int8)
    a = jnp.concatenate([a_top, eye], axis=1)  # (B, M, E)
    mm = m + emax

    pad_b = (-b) % block
    if pad_b:
        a = jnp.pad(a, ((0, pad_b), (0, 0), (0, 0)))
        nreal_p = jnp.pad(nreal, (0, pad_b))
    else:
        nreal_p = nreal
    bp = b + pad_b

    failed = pl.pallas_call(
        _ge_kernel,
        grid=(bp // block,),
        in_specs=[
            pl.BlockSpec(
                (block, mm, emax), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((block, mm, emax), jnp.int8)],
        interpret=interpret,
    )(a, nreal_p[:, None].astype(jnp.int32))
    return (failed[:b, 0] != 0) | overflow
