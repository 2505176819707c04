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


def test_w_chunked_matches_unchunked():
    """W-chunked encode (lanes independent) is bit-identical to unchunked,
    flat and tiled_out, binary and GF(256)."""
    code = get_code("n2000_k1000")
    arrays = device_arrays(code)
    b, w, bt = 5, 4, 4
    src = jax.random.bits(jax.random.key(9), (b, code.k, w), dtype=jnp.uint32)
    want = encode_packed_vmem(
        arrays, src, b_tile=bt, interpret=True, w_chunk=-1
    )
    got = encode_packed_vmem(arrays, src, b_tile=bt, interpret=True, w_chunk=2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    want_t = encode_packed_vmem(
        arrays, src, b_tile=bt, tiled_out=True, interpret=True, w_chunk=-1
    )
    got_t = encode_packed_vmem(
        arrays, src, b_tile=bt, tiled_out=True, interpret=True, w_chunk=2
    )
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))

    nb = toy_code(n=60, k=36, seed=2, gf_order=256)
    nba = device_arrays(nb)
    srcb = jax.random.bits(jax.random.key(10), (6, nb.k, 8), dtype=jnp.uint8)
    want_nb = encode_packed(nba, srcb, gf_order=256)
    got_nb = encode_packed_vmem(
        nba, srcb, gf_order=256, b_tile=4, interpret=True, w_chunk=1
    )
    np.testing.assert_array_equal(np.asarray(got_nb), np.asarray(want_nb))
    with pytest.raises(ValueError):  # must divide W (words)
        encode_packed_vmem(
            arrays, src, b_tile=bt, interpret=True, w_chunk=3
        )


def test_tiled_out_matches_tile_wide():
    """tiled_out=True returns exactly tile_wide(flat output) — the native
    tile handoff feeding peel_decode_vmem(tiled=True)."""
    from ldpc_erasure_codes_tpu.ops.pallas_peel import tile_wide

    code = get_code("n2000_k1000")
    arrays = device_arrays(code)
    b, w, bt = 5, 2, 4
    src = jax.random.bits(jax.random.key(3), (b, code.k, w), dtype=jnp.uint32)
    flat = encode_packed_vmem(arrays, src, b_tile=bt, interpret=True)
    tiled = encode_packed_vmem(
        arrays, src, b_tile=bt, tiled_out=True, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(tiled), np.asarray(tile_wide(flat, bt))
    )


def test_tiled_out_nb_word_packed():
    """NB tiled_out is the word-packed uint32 tile layout."""
    from ldpc_erasure_codes_tpu.ops.pallas_peel import tile_wide

    code = toy_code(n=60, k=36, seed=2, gf_order=256)
    arrays = device_arrays(code)
    b, w, bt = 6, 8, 4
    src = jax.random.bits(jax.random.key(4), (b, code.k, w), dtype=jnp.uint8)
    flat = encode_packed_vmem(
        arrays, src, gf_order=256, b_tile=bt, interpret=True
    )
    packed = jax.lax.bitcast_convert_type(
        flat.reshape(b, code.n, w // 4, 4), jnp.uint32
    )
    tiled = encode_packed_vmem(
        arrays, src, gf_order=256, b_tile=bt, tiled_out=True, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(tiled), np.asarray(tile_wide(packed, bt))
    )


def test_tiled_encode_decode_chain():
    """Full native-layout chain: encode(tiled_out) -> decode(tiled) equals
    the flat chain bit-exactly (values on resolved symbols, mask, iters)."""
    from ldpc_erasure_codes_tpu.ops.pallas_peel import (
        peel_decode_vmem, untile_wide,
    )

    code = get_code("n2000_k1000")
    arrays = device_arrays(code)
    b, w, bt = 6, 2, 4
    src = jax.random.bits(jax.random.key(5), (b, code.k, w), dtype=jnp.uint32)
    mask = jax.random.uniform(jax.random.key(6), (b, code.n)) < 0.3
    cw = encode_packed_vmem(arrays, src, b_tile=bt, interpret=True)
    v1, e1, i1 = peel_decode_vmem(
        arrays, cw, mask, max_iters=50, b_tile=bt, interpret=True
    )
    cwt = encode_packed_vmem(
        arrays, src, b_tile=bt, tiled_out=True, interpret=True
    )
    v2t, e2, i2 = peel_decode_vmem(
        arrays, cwt, mask, max_iters=50, b_tile=bt, tiled=True,
        interpret=True,
    )
    v2 = untile_wide(v2t, b, code.n)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_unrolled_matches_dynamic():
    """static_topo (constant-topology unrolled back-substitution) ==
    the dynamic-table kernel, binary and GF(256), flat and tiled_out."""
    from ldpc_erasure_codes_tpu.ops.pallas_encode import static_enc_topology

    for gf in (2, 256):
        code = toy_code(n=96, k=64, seed=3, gf_order=gf)
        arrays = device_arrays(code)
        key = jax.random.key(7)
        if gf == 2:
            src = jax.random.bits(key, (6, code.k, 8), dtype=jnp.uint32)
        else:
            src = jax.random.randint(key, (6, code.k, 8), 0, 256,
                                     dtype=jnp.uint8)
        topo = static_enc_topology(arrays, code.k)
        for kw in (dict(), dict(tiled_out=True)):
            a = encode_packed_vmem(
                arrays, src, gf_order=gf, b_tile=2, interpret=True, **kw
            )
            u = encode_packed_vmem(
                arrays, src, gf_order=gf, b_tile=2, interpret=True,
                static_topo=topo, **kw,
            )
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(u), err_msg=f"gf={gf} {kw}"
            )
