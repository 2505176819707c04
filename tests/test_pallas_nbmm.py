"""Fused GF(256) bit-image matvec kernels vs the XLA bit-image path.

The kernels (ops/pallas_nbmm.py) must agree byte-exactly with the XLA
formulation (`bits(y) @ img` + repack) that ops/ge.py used before round 4 —
interpret mode on CPU, both the constant-matrix and per-frame-batched
variants, plus the chained "mw" layout contract.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ldpc_erasure_codes_tpu import gf
from ldpc_erasure_codes_tpu.ops.ge import _bit_image_dev
from ldpc_erasure_codes_tpu.ops.pallas_nbmm import (
    gf_matmul_batched,
    gf_matvec_wide,
)


def _xla_ref(y, img):
    ub = gf.bytes_to_bits(jnp.transpose(y, (0, 2, 1)))
    acc = jax.lax.dot_general(
        ub, img,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return gf.bits_to_bytes(acc & 1)  # (B, W, m)


@pytest.mark.parametrize("b,n,w,m", [(3, 255, 256, 63), (2, 96, 128, 32)])
def test_matvec_matches_xla(b, n, w, m):
    rng = np.random.default_rng(b)
    y = jnp.asarray(rng.integers(0, 256, (b, n, w), dtype=np.uint8))
    mat = jnp.asarray(rng.integers(0, 256, (n, m), dtype=np.uint8))
    img = _bit_image_dev(mat)
    out = gf_matvec_wide(y, img, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(_xla_ref(y, img)))
    # "mw" layout: kernel-native (B, m_pad, W), pad rows zero.
    out_mw = gf_matvec_wide(y, img, interpret=True, out_layout="mw")
    m_pad = -(-m // 8) * 8
    assert out_mw.shape == (b, m_pad, w)
    np.testing.assert_array_equal(
        np.asarray(out_mw)[:, :m, :],
        np.asarray(_xla_ref(y, img)).transpose(0, 2, 1),
    )
    assert not np.asarray(out_mw)[:, m:, :].any()


def test_matmul_batched_matches_xla():
    rng = np.random.default_rng(7)
    b, m, e, w = 3, 63, 50, 256
    m_pad, e_pad = 64, 56
    rhs = rng.integers(0, 256, (b, m_pad, w), dtype=np.uint8)
    rhs[:, m:, :] = 0
    mats = jnp.asarray(rng.integers(0, 256, (b, e, m), dtype=np.uint8))
    # Build per-frame images exactly as ops/ge.py does.
    tt_img = _bit_image_dev(jnp.transpose(mats, (0, 2, 1)))  # (B, 8m, 8e)
    from ldpc_erasure_codes_tpu.ops.ge import _bit_image_dev_tpm

    imgs = _bit_image_dev_tpm(mats, e_pad, m_pad)
    out = gf_matmul_batched(jnp.asarray(rhs), imgs, interpret=True)
    assert out.shape == (b, e_pad, w)
    # Reference: per-frame x = M . rhs over GF(256) via the XLA bit path.
    rb = gf.bytes_to_bits(jnp.asarray(rhs[:, :m, :]).transpose(0, 2, 1))
    xb = jax.lax.dot_general(
        rb, tt_img,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )
    ref = np.asarray(gf.bits_to_bytes(xb & 1)).transpose(0, 2, 1)  # (B,e,W)
    np.testing.assert_array_equal(np.asarray(out)[:, :e, :], ref)


def test_matvec_validates_chunk():
    y = jnp.zeros((1, 16, 96), jnp.uint8)
    img = jnp.zeros((128, 64), jnp.int8)
    with pytest.raises(ValueError):
        gf_matvec_wide(y, img, wc=64, interpret=True)
