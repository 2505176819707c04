"""Hybrid MPA + ML decoder: peel first, Gauss-Jordan the residual.

TPU re-design of the reference's hybrid decoders
(Matlab/My_LDPC_HybridML_Erasure_Decoder.m:3-91,
Matlab/My_LDPC_HybridML_NonBinary_Erasure_Decoder.m:4-131): cheap iterative
peeling removes the bulk of erasures; the rare residual stopping set is solved
exactly by the batched GE kernel. This combination beats the equivalent-rate
Reed-Solomon code at every tested erasure rate (paper tex:164).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ldpc_erasure_codes_tpu.ops.arrays import CodeArrays
from ldpc_erasure_codes_tpu.ops.compact import (
    compact_ge_solve,
    residual_order,
)
from ldpc_erasure_codes_tpu.ops.ge import ge_solve, ge_solve_packed
from ldpc_erasure_codes_tpu.ops.pallas_peel import (
    default_b_tile,
    peel_decode_vmem,
    tile_wide,
    untile_wide,
)
from ldpc_erasure_codes_tpu.ops.peel import peel_decode
from ldpc_erasure_codes_tpu.ops.peel_wide import peel_decode_wide


@functools.partial(
    jax.jit,
    static_argnames=(
        "gf_order", "peel_iters", "emax", "impl", "ge_subbatch", "b_tile",
        "tiled", "ge_impl", "static_topo",
    ),
)
def hybrid_decode(
    arrays: CodeArrays,
    values: jax.Array,
    erased: jax.Array,
    *,
    gf_order: int = 2,
    peel_iters: int = 10,
    emax: int = 128,
    impl: str = "gather",
    ge_subbatch: int = 0,
    b_tile: int = 0,
    tiled: bool = False,
    ge_impl: str = "auto",
    static_topo: tuple | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Peel up to ``peel_iters`` sweeps, then GE-solve the residual.

    The reference runs 10 peeling iterations before falling back
    (My_LDPC_HybridML_Erasure_Decoder.m:9). ``emax`` buckets the residual GE
    width; codewords whose residual exceeds it are flagged failed.
    ``ge_subbatch`` > 0 additionally compacts the frames that still hold
    erasures into a bucket of that size before the elimination (overflow →
    failed) — the production setting at low FER, where stopping sets are
    rare. ``b_tile`` <= 0 auto-sizes the VMEM frame tile to the code/symbol
    shape (``pallas_peel.default_b_tile``); ``impl="vmem"`` applies to wide
    (B, n, W) values only — scalar symbols have no VMEM kernel and use the
    gather path. ``tiled`` (impl="vmem" only): ``values`` is in the
    tile-major pipeline layout (``encode_packed_vmem(tiled_out=True)`` /
    ``pallas_peel.tile_wide``) and is returned in it — the peel rides the
    layout straight through; the GE fallback untiles/retiles INSIDE the
    residual branch, so the common all-peeled batch never pays a layout
    transpose.

    Returns (values, erased, iters, failed).
    """
    if tiled and impl != "vmem":
        raise ValueError("tiled=True requires impl='vmem'")
    if values.ndim == 3 and impl == "vmem":
        # Production wide path: the VMEM-resident Pallas decoder (binary or
        # GF(256); frames stay on chip across the whole peel loop).
        if tiled:
            n1 = erased.shape[1] + 1
            bt_in = values.shape[1] // n1
            if b_tile > 0 and b_tile != bt_in:
                raise ValueError(
                    f"b_tile={b_tile} != tile size {bt_in} of the tiled "
                    f"values layout {values.shape}"
                )
            bt = bt_in
        else:
            bt = b_tile if b_tile > 0 else default_b_tile(
                values.shape[1], values.shape[2]
            )
        values, erased, iters = peel_decode_vmem(
            arrays, values, erased, max_iters=peel_iters, gf_order=gf_order,
            b_tile=bt, tiled=tiled,
            schedule="unrolled" if static_topo is not None else "seq",
            static_topo=static_topo,
        )
    elif values.ndim == 3 and impl == "gather":
        # Wide frames use the symbol-major XLA decoder (same fixed point and
        # iteration accounting; ~2x the frame-major step for binary, and the
        # GF(256) wide path — SWAR packed MACs, no table gathers).
        values, erased, iters = peel_decode_wide(
            arrays, values, erased, max_iters=peel_iters, gf_order=gf_order
        )
    else:
        # Scalar/2D symbols have no VMEM kernel: map impl="vmem" to the
        # gather path explicitly (peel_decode rejects unknown impl strings).
        scalar_impl = "gather" if impl == "vmem" else impl
        values, erased, iters = peel_decode(
            arrays, values, erased, gf_order=gf_order, max_iters=peel_iters,
            impl=scalar_impl,
        )
    any_residual = jnp.any(erased)
    b, n = erased.shape

    def ge_flat(v, e):
        if ge_subbatch > 0:
            return compact_ge_solve(
                arrays, v, e, emax=emax, f_max=ge_subbatch, gf_order=gf_order,
                ge_impl=ge_impl,
            )
        packed = ge_impl == "packed" or (
            ge_impl == "auto"
            and gf_order == 2
            and v.ndim == 3
            and v.dtype == jnp.uint32
        )
        if packed:
            return ge_solve_packed(arrays, v, e, emax=emax)
        return ge_solve(arrays, v, e, emax=emax, gf_order=gf_order)

    def with_ge(args):
        v, e = args
        if not tiled:
            return ge_flat(v, e)
        bt = v.shape[1] // (n + 1)
        if (
            ge_subbatch > 0
            and gf_order == 2
            and ge_impl in ("auto", "packed")
        ):
            # Tile-direct writeback (round 4): the old chain untiled the
            # FULL batch, scattered the solved sub-batch into it, and
            # re-tiled — two full-batch HBM relayouts plus a wide-cube
            # scatter, measured ~170 ms of glue at the GE-hot .2031
            # point, MORE than the GE itself. Here the GE returns solved
            # ROWS (ge_solve_packed(return_rows=True)) and they scatter
            # straight into the tile-major tensor: frame f's symbol s
            # lives at [f // bt, s * bt + f % bt, :], and discarded slots
            # target the pad block (row n), which stays zero because
            # non-writable rows of x are zeroed.
            sel, is_resid, overflow = residual_order(e, ge_subbatch)
            vf_sub = untile_wide(v, b, n)[sel]
            x, sidx, e_sub, failed_sub = ge_solve_packed(
                arrays, vf_sub, e[sel], emax=emax, return_rows=True
            )
            t_idx = sel // bt
            off = sel % bt
            rows = sidx * bt + off[:, None]
            v = v.at[t_idx[:, None], rows].set(x)
            e = e.at[sel].set(jnp.where(is_resid[:, None], e_sub, e[sel]))
            failed = (
                jnp.zeros((b,), bool).at[sel].set(failed_sub & is_resid)
                | overflow
            )
            return v, e, failed
        # Untile/retile only inside the residual branch: the all-peeled
        # batch (the common case at production PER) skips this entirely.
        vf = untile_wide(v, b, n)
        if gf_order == 256:
            vf = jax.lax.bitcast_convert_type(vf, jnp.uint8).reshape(
                b, n, 4 * vf.shape[2]
            )
        vf, e, failed = ge_flat(vf, e)
        if gf_order == 256:
            vf = jax.lax.bitcast_convert_type(
                vf.reshape(b, n, -1, 4), jnp.uint32
            )
        return tile_wide(vf, bt), e, failed

    def without_ge(args):
        v, e = args
        return v, e, jnp.zeros(e.shape[0], dtype=bool)

    # Skip the GE cube entirely when the whole batch peeled clean (the common
    # case at low PER).
    values, erased, failed = jax.lax.cond(
        any_residual, with_ge, without_ge, (values, erased)
    )
    return values, erased, iters, failed
