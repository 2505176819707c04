"""Constant-topology tiled syndrome vs the dense bit-plane formulation."""

import numpy as np
import jax
import jax.numpy as jnp

from ldpc_erasure_codes_tpu.codes import gen_row_wise
from ldpc_erasure_codes_tpu.ops import device_arrays
from ldpc_erasure_codes_tpu.ops.pallas_nbmm import f2_matvec_wide
from ldpc_erasure_codes_tpu.ops.pallas_peel import static_topology
from ldpc_erasure_codes_tpu.ops.pallas_synd import syndrome_from_topo


def test_syndrome_matches_dense():
    code = gen_row_wise([(16, 6)], [(48, 2)], seed=3, max_tries=40,
                        strict_tries=4)
    arrays = device_arrays(code)
    topo = static_topology(arrays)
    b, w = 8, 4  # W uint32 words (16 bytes/symbol)
    n, m = code.n, code.m
    m_pad = -(-m // 8) * 8
    key = jax.random.key(0)
    values = jax.random.bits(key, (b, n, w), dtype=jnp.uint32)
    # Zero a few slots (the erased invariant; the syndrome is oblivious).
    mask = jax.random.uniform(jax.random.fold_in(key, 1), (b, n)) < 0.2
    values = jnp.where(mask[:, :, None], jnp.uint32(0), values)

    got = syndrome_from_topo(
        values, topo=topo, m_pad=m_pad, bt=4, interpret=True
    )  # (B, m_pad, 4W) uint8

    n_pad = -(-(n + 1) // 32) * 32
    vp = jnp.pad(values, ((0, 0), (0, n_pad - n), (0, 0)))
    vb = jax.lax.bitcast_convert_type(vp, jnp.uint8).reshape(
        b, n_pad, 4 * w
    )
    ht = jnp.pad(
        jnp.asarray(arrays.h).astype(jnp.int8),
        ((0, m_pad - m), (0, n_pad - n)),
    )
    want = f2_matvec_wide(vb, ht, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
