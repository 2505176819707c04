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
    tt_img = _bit_image_dev(jnp.transpose(mats, (0, 2, 1)))  # (B, 8m, 8e)
    # The kernel takes the zero-padded byte matrices; the plane-major
    # image is built in-kernel from the xtime chain.
    mats_p = jnp.pad(mats, ((0, 0), (0, e_pad - e), (0, m_pad - m)))
    out = gf_matmul_batched(jnp.asarray(rhs), mats_p, interpret=True)
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


def test_apply_scatter_matches_separate():
    """gf_apply_scatter == gf_matmul_batched + row placement: solved rows
    land at their idx targets, dump-row writes (idx >= n) are discarded,
    and untouched rows pass through unchanged."""
    from ldpc_erasure_codes_tpu.ops.pallas_nbmm import gf_apply_scatter

    rng = np.random.default_rng(11)
    b, n_pad, m_pad, e_pad, w = 3, 64, 16, 16, 256
    emax, n_real = 10, 60
    values = rng.integers(0, 256, (b, n_pad, w), dtype=np.uint8)
    values[:, n_real:, :] = 0
    rhs = rng.integers(0, 256, (b, m_pad, w), dtype=np.uint8)
    mats = rng.integers(0, 256, (b, e_pad, m_pad), dtype=np.uint8)
    idx = np.stack(  # target rows must be ZERO (the erasure invariant)
        [
            np.concatenate(
                [
                    rng.choice(n_real, size=emax - 2, replace=False),
                    # dump-row slots (discarded), padded to e_pad
                    np.full(e_pad - (emax - 2), n_real),
                ]
            )
            for _ in range(b)
        ]
    ).astype(np.int32)
    for f in range(b):
        values[f, idx[f, : emax - 2]] = 0  # erased slots are zero
    out = gf_apply_scatter(
        jnp.asarray(values), jnp.asarray(rhs), jnp.asarray(mats),
        jnp.asarray(idx), interpret=True,
    )
    x = np.asarray(
        gf_matmul_batched(jnp.asarray(rhs), jnp.asarray(mats), interpret=True)
    )
    ref = values.copy()
    for f in range(b):
        for i in range(emax - 2):  # real slots only; the rest hit the dump
            ref[f, idx[f, i]] = x[f, i]
    ref[:, n_real:, :] = 0  # dump rows: contents unspecified, never read
    got = np.asarray(out).copy()
    got[:, n_real:, :] = 0
    np.testing.assert_array_equal(got, ref)


def test_f2_matvec_and_apply_scatter():
    """GF(2) kernel pair == direct parity computation on byte views."""
    from ldpc_erasure_codes_tpu.ops.pallas_nbmm import (
        f2_apply_scatter,
        f2_matvec_wide,
    )

    rng = np.random.default_rng(5)
    b, n_pad, m_pad, e_pad, wb = 2, 64, 16, 16, 256
    n_real, e_real = 60, 12
    h = (rng.random((m_pad, n_pad)) < 0.2).astype(np.int8)
    h[14:, :] = 0  # pad check rows
    h[:, n_real:] = 0
    y = rng.integers(0, 256, (b, n_pad, wb), dtype=np.uint8)
    y[:, n_real:, :] = 0
    rhs = f2_matvec_wide(jnp.asarray(y), jnp.asarray(h), interpret=True)
    # Direct parity: bit c of rhs byte = parity over symbols of bit c.
    ref = np.zeros((b, m_pad, wb), np.uint8)
    for f in range(b):
        for c in range(8):
            plane = (y[f] >> c) & 1
            ref[f] |= (((h.astype(np.int64) @ plane) & 1) << c).astype(
                np.uint8
            )
    np.testing.assert_array_equal(np.asarray(rhs), ref)

    t = (rng.random((b, e_pad, m_pad)) < 0.3).astype(np.int8)
    t[:, e_real:, :] = 0
    idx = np.stack(
        [
            np.concatenate(
                [
                    rng.choice(n_real, size=e_real, replace=False),
                    np.full(e_pad - e_real, n_real),
                ]
            )
            for _ in range(b)
        ]
    ).astype(np.int32)
    vals = y.copy()
    for f in range(b):
        vals[f, idx[f, :e_real]] = 0  # erased slots zero
    out = f2_apply_scatter(
        jnp.asarray(vals), rhs, jnp.asarray(t), jnp.asarray(idx),
        interpret=True,
    )
    # Reference x = T . rhs over GF(2), placed at idx.
    refv = vals.copy()
    for f in range(b):
        x = np.zeros((e_pad, wb), np.uint8)
        for c in range(8):
            plane = (ref[f] >> c) & 1
            x |= (((t[f].astype(np.int64) @ plane) & 1) << c).astype(
                np.uint8
            )
        for i in range(e_real):
            refv[f, idx[f, i]] = x[i]
    got = np.asarray(out).copy()
    got[:, n_real:, :] = 0
    refv[:, n_real:, :] = 0
    np.testing.assert_array_equal(got, refv)


def test_matvec_validates_chunk():
    y = jnp.zeros((1, 16, 96), jnp.uint8)
    img = jnp.zeros((128, 64), jnp.int8)
    with pytest.raises(ValueError):
        gf_matvec_wide(y, img, wc=64, interpret=True)


def test_auto_wc_rejects_unalignable_width():
    # ADVICE r4: the auto-chunk decrement loop must raise the divisibility
    # error, not crash with ZeroDivisionError, when W has no 128-aligned
    # divisor under the VMEM budget.
    from ldpc_erasure_codes_tpu.ops.pallas_nbmm import _auto_wc

    assert _auto_wc(256, 1024) == 256
    assert _auto_wc(384, 64 * 1024 * 1024) == 128  # budget caps below W
    assert _auto_wc(96, 1024) == 96  # below one lane tile: W itself
    with pytest.raises(ValueError, match="128-lane-aligned"):
        # W=192 with the budget capping the chunk at 128: no 128-aligned
        # divisor exists — the old loop decremented to 0 and crashed.
        _auto_wc(192, 64 * 1024 * 1024)
