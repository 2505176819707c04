"""VMEM-resident Pallas encoder vs the XLA packed encoder (bit-identical).

CPU tests run in interpret mode (auto-selected on the cpu backend).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ldpc_erasure_codes_tpu.codes import get_code, toy_code
from ldpc_erasure_codes_tpu.ops import device_arrays, encode_packed
from ldpc_erasure_codes_tpu.ops.pallas_encode import encode_packed_vmem


@pytest.mark.parametrize("b,w,bt", [(8, 2, 8), (5, 3, 4)])
def test_binary_matches_xla(b, w, bt):
    code = get_code("n2000_k1000")
    arrays = device_arrays(code)
    src = jax.random.bits(jax.random.key(0), (b, code.k, w), dtype=jnp.uint32)
    want = encode_packed(arrays, src)
    got = encode_packed_vmem(arrays, src, b_tile=bt, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_binary_n2040():
    code = get_code("n2040_k1530")
    arrays = device_arrays(code)
    src = jax.random.bits(jax.random.key(1), (4, code.k, 2), dtype=jnp.uint32)
    want = encode_packed(arrays, src)
    got = encode_packed_vmem(arrays, src, b_tile=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_nb_matches_xla():
    code = toy_code(n=60, k=36, seed=2, gf_order=256)
    arrays = device_arrays(code)
    src = jax.random.bits(jax.random.key(2), (6, code.k, 8), dtype=jnp.uint8)
    want = encode_packed(arrays, src, gf_order=256)
    got = encode_packed_vmem(
        arrays, src, gf_order=256, b_tile=4, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
