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
from ldpc_erasure_codes_tpu.ops.compact import compact_ge_solve
from ldpc_erasure_codes_tpu.ops.ge import ge_solve
from ldpc_erasure_codes_tpu.ops.pallas_peel import default_b_tile, peel_decode_vmem
from ldpc_erasure_codes_tpu.ops.peel import peel_decode
from ldpc_erasure_codes_tpu.ops.peel_wide import peel_decode_wide


@functools.partial(
    jax.jit,
    static_argnames=(
        "gf_order", "peel_iters", "emax", "impl", "ge_subbatch", "b_tile",
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
    gather path.

    Returns (values, erased, iters, failed).
    """
    if values.ndim == 3 and impl == "vmem":
        # Production wide path: the VMEM-resident Pallas decoder (binary or
        # GF(256); frames stay on chip across the whole peel loop).
        bt = b_tile if b_tile > 0 else default_b_tile(
            values.shape[1], values.shape[2]
        )
        values, erased, iters = peel_decode_vmem(
            arrays, values, erased, max_iters=peel_iters, gf_order=gf_order,
            b_tile=bt,
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

    def with_ge(args):
        v, e = args
        if ge_subbatch > 0:
            return compact_ge_solve(
                arrays, v, e, emax=emax, f_max=ge_subbatch, gf_order=gf_order
            )
        return ge_solve(arrays, v, e, emax=emax, gf_order=gf_order)

    def without_ge(args):
        v, e = args
        return v, e, jnp.zeros(e.shape[0], dtype=bool)

    # Skip the GE cube entirely when the whole batch peeled clean (the common
    # case at low PER).
    values, erased, failed = jax.lax.cond(
        any_residual, with_ge, without_ge, (values, erased)
    )
    return values, erased, iters, failed
