"""Batched Gaussian elimination over GF(2) / GF(256) — the ML erasure solver.

The reference's maximum-likelihood fallback solves ``H_erased . x = H_known .
y_known`` by sequential row-reduction with row swaps per codeword
(Matlab/My_LDPC_HybridML_Erasure_Decoder.m:48-88 binary,
Matlab/My_LDPC_HybridML_NonBinary_Erasure_Decoder.m:61-128 GF(256)).

TPU-native re-design: fixed shapes + full batching.

* The per-codeword erased-column set (data-dependent size) is padded to a
  static bucket ``emax``; pad slots get **virtual unit columns** in an extra
  block of ``emax`` appended rows, so padded columns pivot trivially on their
  own private row and never disturb the real system. No dynamic shapes, no
  per-codeword control flow.
* One ``fori_loop`` over pivot columns; each step does the pivot search
  (argmax of a masked column), a masked row swap, and a full Gauss-Jordan
  elimination (all rows at once) — vectorized across the batch so many
  codewords share each pivot step. Pivot order matches the reference
  (ascending erased index, first nonzero row at-or-below the diagonal).
* Singularity (a real column with no pivot) sets a per-codeword failure flag —
  the reference's ``dont_do_jordan`` (My_LDPC_HybridML_Erasure_Decoder.m:59-62).
  Like the reference, solved values are still written back; callers must gate
  on the flag.

Work is O(B . (m+emax) . emax^2) byte-ops on the VPU; the hybrid decoder only
reaches this kernel for codewords the peeler could not finish, and ``emax``
buckets keep the cube small.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ldpc_erasure_codes_tpu import gf
from ldpc_erasure_codes_tpu.ops.arrays import CodeArrays
from ldpc_erasure_codes_tpu.ops.peel import _pad_n, _xor_reduce


def erased_indices(erased: jax.Array, emax: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-codeword erased symbol indices, ascending, padded to emax.

    Returns (er_idx (B, emax) int32, real (B, emax) bool, nreal (B,) int32).
    Stable argsort of the inverted mask lists erased positions first in
    ascending index order — matching the reference's ``find`` pivot order.
    """
    order = jnp.argsort(~erased, axis=1, stable=True).astype(jnp.int32)
    er_idx = order[:, :emax]
    nreal = jnp.sum(erased, axis=1, dtype=jnp.int32)
    real = jnp.arange(emax, dtype=jnp.int32)[None, :] < nreal[:, None]
    return er_idx, real, nreal


def _syndrome_known(
    arrays: CodeArrays, values: jax.Array, gf_order: int
) -> jax.Array:
    """rhs = H . y_known ((B, m[, W])): erased slots are zero so a plain
    neighbor MAC over all neighbors is the known-only sum."""
    wide = values.ndim == 3
    values_p = _pad_n(values, 1)
    yv = jnp.take(values_p, arrays.vlist_idx, axis=1)  # (B, m, dmax[, W])
    if gf_order == 2:
        return _xor_reduce(yv, axis=2)
    coeff = arrays.vlist_val[None, :, :, None] if wide else arrays.vlist_val[None]
    return _xor_reduce(gf.gf_mul(coeff, yv), axis=2)


@functools.partial(jax.jit, static_argnames=("emax", "gf_order"))
def ge_rank_check(
    arrays: CodeArrays,
    erased: jax.Array,
    *,
    emax: int,
    gf_order: int = 2,
) -> jax.Array:
    """Pattern-only solvability: would Gauss-Jordan on the residual succeed?

    Runs the same pivot loop as :func:`ge_solve` on the erased-column matrix
    alone (no right-hand side, no value updates) — solvability depends only
    on the erasure pattern (and, over GF(256), on the fixed H coefficients),
    never on the transmitted values.

    Returns ``failed`` (B,) bool (rank-deficient or bucket overflow).
    """
    b, n = erased.shape
    # A bucket wider than the code covers every pattern; clamping (trace-time,
    # emax is static) keeps short codes working with the default emax=128.
    emax = min(emax, n)
    m = arrays.h.shape[0]
    er_idx, real, nreal = erased_indices(erased, emax)
    overflow = nreal > emax

    h_src = arrays.h_nb if gf_order == 256 else arrays.h.astype(jnp.uint8)
    a_top = jnp.take(h_src, er_idx, axis=1)
    a_top = jnp.transpose(a_top, (1, 0, 2)) * real[:, None, :].astype(jnp.uint8)
    eye = jnp.eye(emax, dtype=jnp.uint8)[None] * (~real)[:, None, :].astype(jnp.uint8)
    a = jnp.concatenate([a_top, eye], axis=1)  # (B, M, emax)
    mm = m + emax
    row_iota = jnp.arange(mm, dtype=jnp.int32)[None, :]

    def step(col, carry):
        a, failed = carry
        colv = jax.lax.dynamic_index_in_dim(a, col, axis=2, keepdims=False)
        cand = (colv != 0) & (row_iota >= col)
        has = jnp.any(cand, axis=1)
        piv = jnp.argmax(cand, axis=1).astype(jnp.int32)
        piv = jnp.where(has, piv, col)
        is_piv = row_iota == piv[:, None]
        is_col = row_iota == col
        row_piv = jnp.take_along_axis(a, piv[:, None, None], axis=1)
        row_col = jax.lax.dynamic_slice_in_dim(a, col, 1, axis=1)
        a = jnp.where(is_piv[:, :, None], row_col, a)
        a = jnp.where(is_col[:, :, None], row_piv, a)
        prow = jax.lax.dynamic_slice_in_dim(a, col, 1, axis=1)
        if gf_order == 256:
            pivot_el = jax.lax.dynamic_index_in_dim(
                prow[:, 0, :], col, axis=1, keepdims=False
            )
            prow = gf.gf_mul(gf.gf_inv(pivot_el)[:, None, None], prow)
            a = jnp.where(is_col[:, :, None], prow, a)
            colv2 = jax.lax.dynamic_index_in_dim(a, col, axis=2, keepdims=False)
            factor = jnp.where((row_iota != col) & has[:, None], colv2, 0)
            a = a ^ gf.gf_mul(factor[:, :, None], prow)
        else:
            colv2 = jax.lax.dynamic_index_in_dim(a, col, axis=2, keepdims=False)
            elim = ((colv2 != 0) & (row_iota != col) & has[:, None]).astype(jnp.uint8)
            a = a ^ elim[:, :, None] * prow
        failed = failed | (~has & (col < nreal))
        return a, failed

    _, failed = jax.lax.fori_loop(0, emax, step, (a, overflow))
    return failed


@functools.partial(jax.jit, static_argnames=("emax", "gf_order"))
def ge_solve(
    arrays: CodeArrays,
    values: jax.Array,
    erased: jax.Array,
    *,
    emax: int,
    gf_order: int = 2,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Solve all residual erasures by batched Gauss-Jordan elimination.

    Args:
      values: (B, n) uint8 or (B, n, W) wide symbols, erased slots zero.
      erased: (B, n) bool residual erasure mask (e.g. after peeling).
      emax: static column bucket; codewords with more than emax residual
        erasures are flagged failed (choose emax >= expected residuals, at
        most m).
      gf_order: 2 or 256.

    Returns:
      (values, erased, failed) — ``failed`` (B,) bool marks rank-deficient or
      bucket-overflow codewords; their values are garbage in the previously
      erased slots (reference writes garbage too) and their ``erased`` mask is
      left set.
    """
    b, n = erased.shape
    # Clamp as in ge_rank_check: emax > n adds only pad columns, and the
    # unclamped shapes break (er_idx caps at n while the bucket iotas don't).
    emax = min(emax, n)
    m = arrays.h.shape[0]
    wide = values.ndim == 3
    er_idx, real, nreal = erased_indices(erased, emax)
    overflow = nreal > emax

    # A: (B, m+emax, emax). Top block = erased columns of H (zeroed for pad
    # slots); bottom block = identity rows for pad slots only.
    h_src = arrays.h_nb if gf_order == 256 else arrays.h.astype(jnp.uint8)
    a_top = jnp.take(h_src, er_idx, axis=1)  # (m, B, emax)
    a_top = jnp.transpose(a_top, (1, 0, 2)) * real[:, None, :].astype(jnp.uint8)
    eye = jnp.eye(emax, dtype=jnp.uint8)[None] * (~real)[:, None, :].astype(jnp.uint8)
    a = jnp.concatenate([a_top, eye], axis=1)  # (B, M, emax)
    mm = m + emax

    rhs_top = _syndrome_known(arrays, values, gf_order)  # (B, m[, W])
    pad_shape = (b, emax, values.shape[2]) if wide else (b, emax)
    rhs = jnp.concatenate([rhs_top, jnp.zeros(pad_shape, rhs_top.dtype)], axis=1)

    row_iota = jnp.arange(mm, dtype=jnp.int32)[None, :]  # (1, M)

    def step(col, carry):
        a, rhs, failed = carry
        colv = jax.lax.dynamic_index_in_dim(a, col, axis=2, keepdims=False)  # (B, M)
        cand = (colv != 0) & (row_iota >= col)
        has = jnp.any(cand, axis=1)  # (B,)
        piv = jnp.argmax(cand, axis=1).astype(jnp.int32)  # first True
        piv = jnp.where(has, piv, col)  # degenerate: self-swap no-op

        # Masked row swap col <-> piv (per codeword).
        is_piv = row_iota == piv[:, None]
        is_col = row_iota == col
        row_piv_a = jnp.take_along_axis(a, piv[:, None, None], axis=1)  # (B,1,E)
        row_col_a = jax.lax.dynamic_slice_in_dim(a, col, 1, axis=1)
        a = jnp.where(is_piv[:, :, None], row_col_a, a)
        a = jnp.where(is_col[:, :, None], row_piv_a, a)
        if wide:
            row_piv_r = jnp.take_along_axis(rhs, piv[:, None, None], axis=1)
            row_col_r = jax.lax.dynamic_slice_in_dim(rhs, col, 1, axis=1)
            rhs = jnp.where(is_piv[:, :, None], row_col_r, rhs)
            rhs = jnp.where(is_col[:, :, None], row_piv_r, rhs)
        else:
            row_piv_r = jnp.take_along_axis(rhs, piv[:, None], axis=1)
            row_col_r = jax.lax.dynamic_slice_in_dim(rhs, col, 1, axis=1)
            rhs = jnp.where(is_piv, row_col_r, rhs)
            rhs = jnp.where(is_col, row_piv_r, rhs)

        prow_a = jax.lax.dynamic_slice_in_dim(a, col, 1, axis=1)  # (B, 1, E)
        prow_r = jax.lax.dynamic_slice_in_dim(rhs, col, 1, axis=1)

        if gf_order == 256:
            # Normalize the pivot row to a unit pivot.
            pivot_el = jax.lax.dynamic_index_in_dim(
                prow_a[:, 0, :], col, axis=1, keepdims=False
            )  # (B,)
            inv_el = gf.gf_inv(pivot_el)
            prow_a = gf.gf_mul(inv_el[:, None, None], prow_a)
            prow_r = gf.gf_mul(
                inv_el[:, None, None] if wide else inv_el[:, None], prow_r
            )
            a = jnp.where(is_col[:, :, None], prow_a, a)
            rhs = jnp.where(is_col[:, :, None] if wide else is_col, prow_r, rhs)
            colv2 = jax.lax.dynamic_index_in_dim(a, col, axis=2, keepdims=False)
            factor = jnp.where((row_iota != col) & has[:, None], colv2, 0)  # (B, M)
            a = a ^ gf.gf_mul(factor[:, :, None], prow_a)
            fr = factor[:, :, None] if wide else factor
            rhs = rhs ^ gf.gf_mul(fr, prow_r)
        else:
            colv2 = jax.lax.dynamic_index_in_dim(a, col, axis=2, keepdims=False)
            elim = ((colv2 != 0) & (row_iota != col) & has[:, None]).astype(jnp.uint8)
            a = a ^ elim[:, :, None] * prow_a
            er8 = (elim[:, :, None] if wide else elim) * prow_r
            rhs = rhs ^ er8

        failed = failed | (~has & (col < nreal))
        return a, rhs, failed

    failed0 = overflow
    a, rhs, failed = jax.lax.fori_loop(0, emax, step, (a, rhs, failed0))

    # Identity now occupies rows 0..emax-1; the solution is rhs[:emax].
    x = rhs[:, :emax]  # (B, emax[, W])
    writable = real & ~overflow[:, None]
    if wide:
        x = x * writable[:, :, None].astype(x.dtype)
    else:
        x = x * writable.astype(x.dtype)
    bidx = jnp.arange(b)[:, None]
    safe_idx = jnp.where(writable, er_idx, n)  # scatter pads to a dropped slot
    values_p = _pad_n(values, 1)
    values_p = values_p.at[bidx, safe_idx].set(x)
    values = values_p[:, :n]
    solved = ~failed
    erased = erased & ~solved[:, None]
    return values, erased, failed
