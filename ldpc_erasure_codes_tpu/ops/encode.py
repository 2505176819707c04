"""Systematic encoders.

The reference encodes by sequential triangular back-substitution — an
inherently serial loop over parity rows
(Matlab/LDPCErasureCodes_MessagePassingAlgSim.m:164-174 binary;
Matlab/ErasureCodes_NonBinaryLDPCSim.m:172-182 GF(256); the FPGA keeps the
same row-sequential schedule, OpenCL/device/ldpc_erasure_encoder.cl:72-84).

TPU-first design: the triangular solve is precomputed **once per code** on the
host (codes/registry.py parity_gen), turning encode into a single dense
mod-2 / GF(256)-bit-image matmul on the MXU with bit-identical output. The
sequential `lax.scan` formulation is retained as a cross-check oracle
(the reference's dual-implementation test pattern,
Matlab/LDPCErasureCodes.m:117-129).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ldpc_erasure_codes_tpu import gf
from ldpc_erasure_codes_tpu.ops.arrays import CodeArrays


def encode(arrays: CodeArrays, source: jax.Array) -> jax.Array:
    """Binary systematic encode: (..., k) uint8 bits -> (..., n) uint8.

    One int8 matmul on the MXU: parity = (source @ P) mod 2.
    """
    p = gf.mod2_matmul(source.astype(jnp.int8), arrays.parity_gen)
    return jnp.concatenate([source.astype(jnp.uint8), p.astype(jnp.uint8)], axis=-1)


def encode_nb(arrays: CodeArrays, source: jax.Array) -> jax.Array:
    """GF(256) systematic encode: (..., k) uint8 -> (..., n) uint8.

    The GF(256) parity generator is applied through its binary image
    (arrays.parity_gen is (8k, 8m) for non-binary codes), i.e. an int8 MXU
    matmul over bit lanes.
    """
    p = gf.gf_matmul_bitimage(source, arrays.parity_gen)
    return jnp.concatenate([source.astype(jnp.uint8), p], axis=-1)


def encode_wide(arrays: CodeArrays, source_bits: jax.Array) -> jax.Array:
    """Wide-symbol binary encode: (..., S, k) bitplanes -> (..., S, n).

    The symbol-width axis S rides along as extra matmul batch — S independent
    binary codewords sharing one erasure pattern, the reference's bit-plane
    parallelism axis (paper tex:51-59; symbol_type's 8192-bit packets,
    OpenCL/host/src/main.cpp:44-47).
    """
    return encode(arrays, source_bits)


def encode_scan(arrays: CodeArrays, source: jax.Array, n: int, k: int) -> jax.Array:
    """Sequential-schedule binary encoder (cross-check path).

    ``lax.scan`` over parity rows, each step XOR-reducing the row's neighbors
    (minus the triangle diagonal) from the partially built codeword — the
    direct TPU transcription of the reference's loop. O(m) sequential steps;
    used in tests to certify the matmul encoder, never on the hot path.
    """
    m, dmax = arrays.vlist_idx.shape
    batch = source.shape[:-1]
    cw0 = jnp.zeros((*batch, n + 1), dtype=jnp.uint8)
    cw0 = cw0.at[..., :k].set(source.astype(jnp.uint8))

    def step(cw, row):
        idx, deg = row
        nbrs = jnp.where(jnp.arange(dmax) < deg - 1, idx, n)  # drop diagonal+pad
        vals = jnp.take(cw, nbrs, axis=-1)
        p = jnp.sum(vals.astype(jnp.int32), axis=-1) & 1
        pos = idx[deg - 1]  # the diagonal column k+i
        cw = jax.lax.dynamic_update_index_in_dim(
            cw, p.astype(jnp.uint8), pos, axis=-1
        )
        return cw, None

    # Triangle rows list the diagonal last only when indices are sorted —
    # vlist rows are stored in ascending column order, and the diagonal k+i
    # is each row's largest index in triangle form.
    cw, _ = jax.lax.scan(step, cw0, (arrays.vlist_idx, arrays.vlist_len))
    return cw[..., :n]
