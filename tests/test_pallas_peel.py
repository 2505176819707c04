"""VMEM-resident Pallas peeling decoder vs the NumPy oracle and XLA paths.

The kernel runs the MATLAB sequential schedule (Gauss-Seidel, row order), so
it must match ``oracle.peel_decode`` bit-exactly INCLUDING iteration counts;
its fixed point must also equal the Jacobi XLA paths (``peel_decode``,
``peel_decode_wide``) on every frame. CPU tests use interpret mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ldpc_erasure_codes_tpu.codes import gen_row_wise, get_code
from ldpc_erasure_codes_tpu.ops import device_arrays, encode_packed
from ldpc_erasure_codes_tpu.ops.peel import peel_decode
from ldpc_erasure_codes_tpu.ops.pallas_peel import peel_decode_vmem
from ldpc_erasure_codes_tpu.utils import oracle


def _bits_from_words(words):
    # (n, W) uint32 -> (n,) int64 bit-plane 0 (for oracle comparison)
    return (words[:, 0] & 1).astype(np.int64)


def _make_case(code, b, w, per, seed):
    arrays = device_arrays(code)
    key = jax.random.key(seed)
    src = jax.random.bits(key, (b, code.k, w), dtype=jnp.uint32)
    cw = encode_packed(arrays, src)
    mask = jax.random.uniform(jax.random.fold_in(key, 1), (b, code.n)) < per
    recv = jnp.where(mask[:, :, None], jnp.uint32(0), cw)
    return arrays, cw, recv, mask


@pytest.mark.parametrize("bt,schedule", [
    (4, "seq"), (8, "seq"),
    pytest.param(4, "counted", marks=pytest.mark.slow),
    pytest.param(8, "counted", marks=pytest.mark.slow),
])
def test_matches_oracle_bit_exact(bt, schedule):
    """Values, residual mask, AND iteration counts equal the oracle's
    sequential sweep on every frame (both sequential-schedule kernels:
    plain and counted)."""
    code = gen_row_wise([(16, 6)], [(48, 2)], seed=3, max_tries=40,
                        strict_tries=4)
    b, w, per = 8, 2, 0.25
    arrays, cw, recv, mask = _make_case(code, b, w, per, seed=0)
    v, e, iters = peel_decode_vmem(
        arrays, recv, mask, max_iters=50, b_tile=bt, schedule=schedule,
        interpret=True,
    )
    v, e, iters = map(np.asarray, (v, e, iters))
    cw_np, mask_np = np.asarray(cw), np.asarray(mask)
    for f in range(b):
        recv_bits = np.where(
            mask_np[f], oracle.ERASED, (cw_np[f, :, 0] & 1).astype(np.int64)
        )
        o_out, o_iters = oracle.peel_decode(code, recv_bits, max_iters=50)
        np.testing.assert_array_equal(
            e[f], o_out == oracle.ERASED, err_msg=f"frame {f} mask"
        )
        # Resolved symbols carry the full recovered words.
        np.testing.assert_array_equal(
            v[f][~e[f]], cw_np[f][~e[f]], err_msg=f"frame {f} values"
        )
        assert iters[f] == o_iters, f"frame {f}: {iters[f]} vs {o_iters}"


@pytest.mark.slow
def test_counted_equals_seq_everywhere():
    """schedule="counted" is the SAME schedule as "seq" (incremental counts
    + sound sweep-start skips): values, masks, and iteration counts must be
    bitwise identical across early-stop, tiled I/O, W-chunking, and GF(256)
    modes on the production code."""
    from ldpc_erasure_codes_tpu.ops.pallas_peel import tile_wide

    code = get_code("n2040_k1530")
    b, w, per = 6, 8, 0.1406
    arrays, cw, recv, mask = _make_case(code, b, w, per, seed=5)

    for kw in (
        dict(),
        dict(early_stop_k=code.k),
        dict(early_stop_k=code.k, w_chunk=4),
    ):
        o1 = peel_decode_vmem(
            arrays, recv, mask, max_iters=50, b_tile=2, schedule="seq",
            interpret=True, **kw,
        )
        o2 = peel_decode_vmem(
            arrays, recv, mask, max_iters=50, b_tile=2, schedule="counted",
            interpret=True, **kw,
        )
        for x, y, nm in zip(o1, o2, ("values", "mask", "iters")):
            np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y), err_msg=f"{kw} {nm}"
            )

    # Tiled I/O contract.
    vt = tile_wide(recv, 2)
    o1 = peel_decode_vmem(
        arrays, recv, mask, max_iters=50, b_tile=2, schedule="counted",
        interpret=True,
    )
    o2 = peel_decode_vmem(
        arrays, vt, mask, max_iters=50, b_tile=2, schedule="counted",
        tiled=True, interpret=True,
    )
    from ldpc_erasure_codes_tpu.ops.pallas_peel import untile_wide

    np.testing.assert_array_equal(
        np.asarray(o1[0]), np.asarray(untile_wide(o2[0], b, code.n))
    )
    np.testing.assert_array_equal(np.asarray(o1[1]), np.asarray(o2[1]))
    np.testing.assert_array_equal(np.asarray(o1[2]), np.asarray(o2[2]))


def test_unrolled_matches_oracle_and_seq():
    """schedule="unrolled" (constant-topology program, the round-3
    production schedule) == seq bit-exactly: values, masks, iteration
    counts, early-stop, tiled I/O, and GF(256)."""
    from ldpc_erasure_codes_tpu.ops.pallas_peel import (
        static_topology,
        tile_wide,
        untile_wide,
    )

    code = gen_row_wise([(16, 6)], [(48, 2)], seed=3, max_tries=40,
                        strict_tries=4)
    arrays, cw, recv, mask = _make_case(code, 8, 2, 0.25, seed=0)
    topo = static_topology(arrays)
    for kw in (dict(), dict(early_stop_k=code.k)):
        o1 = peel_decode_vmem(
            arrays, recv, mask, max_iters=50, b_tile=4, schedule="seq",
            interpret=True, **kw,
        )
        o2 = peel_decode_vmem(
            arrays, recv, mask, max_iters=50, b_tile=4, schedule="unrolled",
            static_topo=topo, interpret=True, **kw,
        )
        for x, y, nm in zip(o1, o2, ("values", "mask", "iters")):
            np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y), err_msg=f"{kw} {nm}"
            )
    # Tiled I/O contract.
    b, n = mask.shape
    vt = tile_wide(recv, 4)
    o3 = peel_decode_vmem(
        arrays, vt, mask, max_iters=50, b_tile=4, schedule="unrolled",
        static_topo=topo, tiled=True, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(o2[0]), np.asarray(untile_wide(o3[0], b, n))
    )
    # Missing/mismatched static_topo must fail loudly.
    with pytest.raises(ValueError):
        peel_decode_vmem(
            arrays, recv, mask, b_tile=4, schedule="unrolled", interpret=True
        )
    with pytest.raises(ValueError):
        peel_decode_vmem(
            arrays, recv, mask, b_tile=4, schedule="seq", static_topo=topo,
            interpret=True,
        )


def test_unrolled_check_orders_same_fixed_point():
    """Reordered constant-topology programs (static_topology order=split2 /
    color — the reference's 2-way check-partition schedule generalized,
    ldpc_erasure_decoder_perf_tests.cl:95-203) reach the same fixed point:
    identical final masks and identical resolved values (iteration counts
    are schedule-dependent and may differ). Also exercises the unroll_blk
    fence-size knob."""
    from ldpc_erasure_codes_tpu.ops.pallas_peel import static_topology

    code = gen_row_wise([(16, 6)], [(48, 2)], seed=3, max_tries=40,
                        strict_tries=4)
    arrays, cw, recv, mask = _make_case(code, 8, 2, 0.25, seed=0)
    outs = {}
    for order, blk in (("natural", 8), ("split2", 8), ("color", 16)):
        topo = static_topology(arrays, order=order)
        outs[order] = peel_decode_vmem(
            arrays, recv, mask, max_iters=50, b_tile=4, schedule="unrolled",
            static_topo=topo, interpret=True, unroll_blk=blk,
        )
    v0, e0, _ = outs["natural"]
    v0 = np.where(np.asarray(e0)[:, :, None], 0, np.asarray(v0))
    for order in ("split2", "color"):
        v, e, _ = outs[order]
        np.testing.assert_array_equal(np.asarray(e), np.asarray(e0), order)
        np.testing.assert_array_equal(
            np.where(np.asarray(e)[:, :, None], 0, np.asarray(v)), v0, order
        )
    with pytest.raises(ValueError):
        static_topology(arrays, order="bogus")


def test_fence_gate_bit_exact():
    """fence_gate=True (round 5: sweep-start fence-union gating) must be
    bit-identical to the ungated unrolled program — values, masks, AND
    iteration counts — binary, flat and tiled, at a fence size that
    yields several fences per sweep (NB leg: the slow twin below)."""
    from ldpc_erasure_codes_tpu.ops.pallas_peel import static_topology

    code = gen_row_wise([(16, 6)], [(48, 2)], seed=3, max_tries=40,
                        strict_tries=4)
    arrays, cw, recv, mask = _make_case(code, 8, 2, 0.25, seed=0)
    topo = static_topology(arrays)
    for kw in (dict(), dict(early_stop_k=code.k)):
        o1 = peel_decode_vmem(
            arrays, recv, mask, max_iters=50, b_tile=4, schedule="unrolled",
            static_topo=topo, interpret=True, unroll_blk=4, **kw,
        )
        o2 = peel_decode_vmem(
            arrays, recv, mask, max_iters=50, b_tile=4, schedule="unrolled",
            static_topo=topo, interpret=True, unroll_blk=4,
            fence_gate=True, **kw,
        )
        for x, y, nm in zip(o1, o2, ("values", "mask", "iters")):
            np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y), err_msg=f"{kw} {nm}"
            )
    # fence_gate without the unrolled schedule must fail loudly.
    with pytest.raises(ValueError):
        peel_decode_vmem(
            arrays, recv, mask, b_tile=4, schedule="seq", fence_gate=True,
            interpret=True,
        )


@pytest.mark.slow
def test_fence_gate_nb_bit_exact():
    """GF(256) fence_gate == ungated (the gate is binary-production-only —
    measured negative for NB — but must stay bit-exact as a knob)."""
    from ldpc_erasure_codes_tpu.codes import toy_code
    from ldpc_erasure_codes_tpu.ops.pallas_peel import static_topology

    nb = toy_code(n=96, k=64, seed=3, gf_order=256)
    arr_nb = device_arrays(nb)
    key = jax.random.key(12)
    b, w = 4, 8
    src = jax.random.randint(key, (b, nb.k, w), 0, 256, dtype=jnp.uint8)
    cwn = encode_packed(arr_nb, src, gf_order=256)
    mk = jax.random.uniform(jax.random.fold_in(key, 1), (b, nb.n)) < 0.12
    rcv = jnp.where(mk[:, :, None], jnp.uint8(0), cwn)
    tn = static_topology(arr_nb)
    o1 = peel_decode_vmem(
        arr_nb, rcv, mk, max_iters=50, b_tile=2, gf_order=256,
        schedule="unrolled", static_topo=tn, interpret=True, unroll_blk=4,
    )
    o2 = peel_decode_vmem(
        arr_nb, rcv, mk, max_iters=50, b_tile=2, gf_order=256,
        schedule="unrolled", static_topo=tn, interpret=True, unroll_blk=4,
        fence_gate=True,
    )
    for x, y, nm in zip(o1, o2, ("values", "mask", "iters")):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=nm)


def test_unrolled_nb_equals_seq():
    """GF(256) unrolled schedule (compile-time Horner bits) == seq."""
    from ldpc_erasure_codes_tpu.codes import toy_code
    from ldpc_erasure_codes_tpu.ops.pallas_peel import static_topology

    code = toy_code(n=96, k=64, seed=3, gf_order=256)
    arrays = device_arrays(code)
    key = jax.random.key(12)
    b, w = 4, 8
    src = jax.random.randint(key, (b, code.k, w), 0, 256, dtype=jnp.uint8)
    cw = encode_packed(arrays, src, gf_order=256)
    mask = jax.random.uniform(jax.random.fold_in(key, 1), (b, code.n)) < 0.12
    recv = jnp.where(mask[:, :, None], jnp.uint8(0), cw)
    topo = static_topology(arrays)
    o1 = peel_decode_vmem(
        arrays, recv, mask, max_iters=50, b_tile=2, gf_order=256,
        schedule="seq", interpret=True,
    )
    o2 = peel_decode_vmem(
        arrays, recv, mask, max_iters=50, b_tile=2, gf_order=256,
        schedule="unrolled", static_topo=topo, interpret=True,
    )
    for x, y, nm in zip(o1, o2, ("values", "mask", "iters")):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=nm)


@pytest.mark.slow
def test_counted_nb_equals_seq():
    """GF(256) counted schedule == seq schedule bit-exactly."""
    code = get_code("n2040_k1530_gf256")
    arrays = device_arrays(code)
    key = jax.random.key(11)
    b, w = 4, 8
    src = jax.random.randint(key, (b, code.k, w), 0, 256, dtype=jnp.uint8)
    cw = encode_packed(arrays, src, gf_order=256)
    mask = jax.random.uniform(jax.random.fold_in(key, 1), (b, code.n)) < 0.14
    recv = jnp.where(mask[:, :, None], jnp.uint8(0), cw)
    o1 = peel_decode_vmem(
        arrays, recv, mask, max_iters=50, b_tile=2, gf_order=256,
        schedule="seq", interpret=True,
    )
    o2 = peel_decode_vmem(
        arrays, recv, mask, max_iters=50, b_tile=2, gf_order=256,
        schedule="counted", interpret=True,
    )
    for x, y, nm in zip(o1, o2, ("values", "mask", "iters")):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=nm)


@pytest.mark.slow
def test_fixed_point_matches_jacobi_xla():
    code = get_code("n2000_k1000")
    b, w, per = 4, 2, 0.35
    arrays, cw, recv, mask = _make_case(code, b, w, per, seed=1)
    v_p, e_p, _ = peel_decode_vmem(
        arrays, recv, mask, max_iters=50, interpret=True
    )
    v_x, e_x, _ = peel_decode(arrays, recv, mask, max_iters=50)
    np.testing.assert_array_equal(np.asarray(e_p), np.asarray(e_x))
    np.testing.assert_array_equal(np.asarray(v_p), np.asarray(v_x))


@pytest.mark.slow
def test_serpentine_same_fixed_point():
    """Serpentine (alternating-direction) sweeps reach the same fixed point
    (values + residual mask) as the forward-only MATLAB schedule; iteration
    counts are schedule-dependent (up-pointing chains resolve faster, down-
    pointing ones can take an extra sweep) and only bounded here."""
    code = gen_row_wise([(16, 6)], [(48, 2)], seed=3, max_tries=40,
                        strict_tries=4)
    for seed, per in ((0, 0.25), (4, 0.3)):
        arrays, cw, recv, mask = _make_case(code, 8, 2, per, seed=seed)
        v1, e1, i1 = peel_decode_vmem(
            arrays, recv, mask, max_iters=50, interpret=True
        )
        v2, e2, i2 = peel_decode_vmem(
            arrays, recv, mask, max_iters=50, serpentine=True, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        assert (np.asarray(i2) <= 50).all()


def test_fuses_channel_masking():
    """Passing UN-masked codewords with the mask must give the same result
    as pre-masked input (masking is fused into the copy-in)."""
    code = get_code("n2000_k1000")
    b, w, per = 4, 2, 0.3
    arrays, cw, recv, mask = _make_case(code, b, w, per, seed=2)
    v1, e1, i1 = peel_decode_vmem(arrays, cw, mask, max_iters=50,
                                  interpret=True)
    v2, e2, i2 = peel_decode_vmem(arrays, recv, mask, max_iters=50,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_early_stop_k_and_batch_padding():
    """early_stop_k=k halts once source symbols resolve; B not a multiple of
    b_tile pads cleanly; clean frames report iters == 1."""
    code = gen_row_wise([(16, 6)], [(48, 2)], seed=3, max_tries=40,
                        strict_tries=4)
    b, w = 5, 1
    arrays, cw, recv, mask = _make_case(code, b, w, 0.2, seed=3)
    mask = mask.at[0].set(False)  # frame 0: nothing erased
    recv0 = jnp.where(mask[:, :, None], jnp.uint32(0), cw)
    v, e, iters = peel_decode_vmem(
        arrays, recv0, mask, max_iters=50, early_stop_k=code.k,
        b_tile=4, interpret=True,
    )
    v, e, iters = map(np.asarray, (v, e, iters))
    assert iters[0] == 1
    # Source region of converged frames is exact.
    for f in range(b):
        if not e[f][: code.k].any():
            np.testing.assert_array_equal(
                v[f][: code.k], np.asarray(cw)[f][: code.k]
            )


def test_nb_matches_oracle_bit_exact():
    """GF(256) kernel: every byte lane equals the oracle's sequential NB
    sweep (values, masks, iteration counts)."""
    from ldpc_erasure_codes_tpu.codes import toy_code
    from ldpc_erasure_codes_tpu.ops import encode_packed

    code = toy_code(n=60, k=36, seed=2, gf_order=256)
    arrays = device_arrays(code)
    b, w, per = 6, 4, 0.15
    key = jax.random.key(11)
    src = jax.random.bits(key, (b, code.k, w), dtype=jnp.uint8)
    cw = encode_packed(arrays, src, gf_order=256)
    mask = jax.random.uniform(jax.random.fold_in(key, 1), (b, code.n)) < per
    recv = jnp.where(mask[:, :, None], jnp.uint8(0), cw)
    v, e, iters = peel_decode_vmem(
        arrays, recv, mask, max_iters=50, gf_order=256, b_tile=4,
        interpret=True,
    )
    v, e, iters = map(np.asarray, (v, e, iters))
    cw_np, mask_np = np.asarray(cw), np.asarray(mask)
    for f in range(b):
        for lane in range(w):
            rv = np.where(
                mask_np[f], oracle.ERASED, cw_np[f, :, lane].astype(np.int64)
            )
            o_out, o_iters = oracle.peel_decode_nb(code, rv, max_iters=50)
            np.testing.assert_array_equal(
                e[f], o_out == oracle.ERASED, err_msg=f"frame {f} mask"
            )
            np.testing.assert_array_equal(
                v[f, :, lane][~e[f]],
                cw_np[f, :, lane][~e[f]],
                err_msg=f"frame {f} lane {lane} values",
            )
            assert iters[f] == o_iters, f"frame {f}"


def test_nb_fixed_point_matches_xla_wide():
    from ldpc_erasure_codes_tpu.codes import toy_code
    from ldpc_erasure_codes_tpu.ops import encode_packed
    from ldpc_erasure_codes_tpu.ops.peel_wide import peel_decode_wide

    code = toy_code(n=60, k=36, seed=2, gf_order=256)
    arrays = device_arrays(code)
    b, w = 8, 8
    key = jax.random.key(12)
    src = jax.random.bits(key, (b, code.k, w), dtype=jnp.uint8)
    cw = encode_packed(arrays, src, gf_order=256)
    mask = jax.random.uniform(jax.random.fold_in(key, 1), (b, code.n)) < 0.2
    recv = jnp.where(mask[:, :, None], jnp.uint8(0), cw)
    v_p, e_p, _ = peel_decode_vmem(
        arrays, recv, mask, max_iters=50, gf_order=256, interpret=True
    )
    v_x, e_x, _ = peel_decode_wide(
        arrays, recv, mask, max_iters=50, gf_order=256
    )
    np.testing.assert_array_equal(np.asarray(e_p), np.asarray(e_x))
    np.testing.assert_array_equal(np.asarray(v_p), np.asarray(v_x))


def test_skip_idle_and_cond_stores_identical():
    code = get_code("n2000_k1000")
    arrays, cw, recv, mask = _make_case(code, 4, 1, 0.3, seed=4)
    out_a = peel_decode_vmem(arrays, recv, mask, skip_idle=True,
                             cond_stores=True, interpret=True)
    for skip, conds in [(False, True), (True, False), (False, False)]:
        out_b = peel_decode_vmem(arrays, recv, mask, skip_idle=skip,
                                 cond_stores=conds, interpret=True)
        for a, b_ in zip(out_a, out_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_hybrid_vmem_impl():
    """hybrid_decode(impl='vmem') routes peeling through the Pallas kernel
    (auto-interpreted on CPU) and matches the gather-routed hybrid."""
    from ldpc_erasure_codes_tpu.ops import hybrid_decode

    code = get_code("n2000_k1000")
    arrays, cw, recv, mask = _make_case(code, 8, 2, 0.3, seed=6)
    v1, e1, _, f1 = hybrid_decode(
        arrays, recv, mask, peel_iters=20, emax=128, impl="vmem"
    )
    v2, e2, _, f2 = hybrid_decode(
        arrays, recv, mask, peel_iters=20, emax=128
    )
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_hybrid_tiled_matches_untiled():
    """hybrid_decode(tiled=True) rides the tile-major layout through the
    peel and untiles only inside the GE branch — values/masks/iters/failed
    must equal the flat-layout hybrid, including when GE actually fires
    (short peel budget at high PER leaves residuals)."""
    from ldpc_erasure_codes_tpu.ops import hybrid_decode
    from ldpc_erasure_codes_tpu.ops.hybrid import hybrid_decode as hd
    from ldpc_erasure_codes_tpu.ops.pallas_peel import tile_wide, untile_wide

    code = get_code("n2000_k1000")
    b, w, bt = 8, 2, 4
    arrays, cw, recv, mask = _make_case(code, b, w, 0.35, seed=9)
    v1, e1, i1, f1 = hybrid_decode(
        arrays, recv, mask, peel_iters=3, emax=256, impl="vmem", b_tile=bt
    )
    v2t, e2, i2, f2 = hybrid_decode(
        arrays, tile_wide(recv, bt), mask, peel_iters=3, emax=256,
        impl="vmem", tiled=True,
    )
    v2 = untile_wide(v2t, b, code.n)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    with pytest.raises(ValueError):
        hd(arrays, tile_wide(recv, bt), mask, impl="gather", tiled=True)


def test_hybrid_tiled_nb_matches_untiled():
    """GF(256) tiled hybrid: word-packed layout in/out, GE branch converts
    through bytes; bit-exact vs the flat uint8 hybrid."""
    from ldpc_erasure_codes_tpu.codes import toy_code
    from ldpc_erasure_codes_tpu.ops import encode_packed, hybrid_decode
    from ldpc_erasure_codes_tpu.ops.pallas_peel import tile_wide, untile_wide

    code = toy_code(n=60, k=36, seed=2, gf_order=256)
    arrays = device_arrays(code)
    b, w, bt = 6, 8, 4
    key = jax.random.key(31)
    src = jax.random.bits(key, (b, code.k, w), dtype=jnp.uint8)
    cw = encode_packed(arrays, src, gf_order=256)
    mask = jax.random.uniform(jax.random.fold_in(key, 1), (b, code.n)) < 0.3
    recv = jnp.where(mask[:, :, None], jnp.uint8(0), cw)
    v1, e1, i1, f1 = hybrid_decode(
        arrays, recv, mask, gf_order=256, peel_iters=3, emax=32,
        impl="vmem", b_tile=bt,
    )
    packed = jax.lax.bitcast_convert_type(
        recv.reshape(b, code.n, w // 4, 4), jnp.uint32
    )
    v2t, e2, i2, f2 = hybrid_decode(
        arrays, tile_wide(packed, bt), mask, gf_order=256, peel_iters=3,
        emax=32, impl="vmem", tiled=True,
    )
    v2 = jax.lax.bitcast_convert_type(
        untile_wide(v2t, b, code.n), jnp.uint8
    ).reshape(b, code.n, w)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_tile_roundtrip():
    """tile_wide/untile_wide invert each other, incl. ragged batch."""
    from ldpc_erasure_codes_tpu.ops.pallas_peel import tile_wide, untile_wide

    for b, n, w, bt in [(8, 12, 3, 4), (5, 7, 2, 4), (3, 9, 1, 8)]:
        x = jax.random.bits(jax.random.key(b), (b, n, w), dtype=jnp.uint32)
        t = tile_wide(x, bt)
        ntiles = -(-b // bt)
        assert t.shape == (ntiles, (n + 1) * bt, w)
        np.testing.assert_array_equal(
            np.asarray(untile_wide(t, b, n)), np.asarray(x)
        )


def test_tiled_io_matches_untiled():
    """tiled=True on tile_wide(recv) gives the identical decode (values,
    mask, iteration counts) as the flat path, with values returned in the
    tile layout."""
    from ldpc_erasure_codes_tpu.ops.pallas_peel import tile_wide, untile_wide

    code = gen_row_wise([(16, 6)], [(48, 2)], seed=3, max_tries=40,
                        strict_tries=4)
    b, w, bt = 6, 2, 4
    arrays, cw, recv, mask = _make_case(code, b, w, 0.25, seed=5)
    v1, e1, i1 = peel_decode_vmem(
        arrays, recv, mask, max_iters=50, b_tile=bt, interpret=True
    )
    vt = tile_wide(recv, bt)
    v2t, e2, i2 = peel_decode_vmem(
        arrays, vt, mask, max_iters=50, b_tile=bt, tiled=True, interpret=True
    )
    assert v2t.shape == vt.shape
    v2 = untile_wide(v2t, b, code.n)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_tiled_nb_matches_untiled():
    """GF(256) tiled path: word-packed tile input/output equals the flat
    uint8 path bit-exactly."""
    from ldpc_erasure_codes_tpu.codes import toy_code
    from ldpc_erasure_codes_tpu.ops import encode_packed
    from ldpc_erasure_codes_tpu.ops.pallas_peel import tile_wide, untile_wide

    code = toy_code(n=60, k=36, seed=2, gf_order=256)
    arrays = device_arrays(code)
    b, w, bt = 6, 8, 4
    key = jax.random.key(21)
    src = jax.random.bits(key, (b, code.k, w), dtype=jnp.uint8)
    cw = encode_packed(arrays, src, gf_order=256)
    mask = jax.random.uniform(jax.random.fold_in(key, 1), (b, code.n)) < 0.15
    recv = jnp.where(mask[:, :, None], jnp.uint8(0), cw)
    v1, e1, i1 = peel_decode_vmem(
        arrays, recv, mask, max_iters=50, gf_order=256, b_tile=bt,
        interpret=True,
    )
    packed = jax.lax.bitcast_convert_type(
        recv.reshape(b, code.n, w // 4, 4), jnp.uint32
    )
    vt = tile_wide(packed, bt)
    v2t, e2, i2 = peel_decode_vmem(
        arrays, vt, mask, max_iters=50, gf_order=256, b_tile=bt,
        tiled=True, interpret=True,
    )
    v2 = jax.lax.bitcast_convert_type(
        untile_wide(v2t, b, code.n), jnp.uint8
    ).reshape(b, code.n, w)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


@pytest.mark.parametrize("schedule", ["seq", pytest.param("jacobi", marks=pytest.mark.slow)])
def test_w_chunked_matches_unchunked(schedule):
    """W-chunking (w_chunk < W): identical values, masks, and iteration
    counts to the unchunked decode — mask evolution is value-independent,
    so each chunk is an independent decode of the same frame. Covers the
    flat and tiled input paths and GF(256)."""
    from ldpc_erasure_codes_tpu.ops.pallas_peel import tile_wide, untile_wide

    code = gen_row_wise([(16, 6)], [(48, 2)], seed=3, max_tries=40,
                        strict_tries=4)
    b, w, bt = 6, 4, 4
    arrays, cw, recv, mask = _make_case(code, b, w, 0.25, seed=7)
    v1, e1, i1 = peel_decode_vmem(
        arrays, recv, mask, max_iters=50, b_tile=bt, interpret=True,
        schedule=schedule, w_chunk=-1,
    )
    v2, e2, i2 = peel_decode_vmem(
        arrays, recv, mask, max_iters=50, b_tile=bt, interpret=True,
        schedule=schedule, w_chunk=2,
    )
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    # Tiled handoff: the chunk DMA slices the same tile-major HBM buffer.
    vt = tile_wide(recv, bt)
    v3t, e3, i3 = peel_decode_vmem(
        arrays, vt, mask, max_iters=50, b_tile=bt, tiled=True,
        interpret=True, schedule=schedule, w_chunk=2,
    )
    assert v3t.shape == vt.shape
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e3))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i3))
    np.testing.assert_array_equal(
        np.asarray(v1), np.asarray(untile_wide(v3t, b, code.n))
    )


def test_w_chunked_nb_matches_unchunked():
    """GF(256) W-chunking equality (chunk boundary inside the packed
    uint32 word stream)."""
    from ldpc_erasure_codes_tpu.codes import toy_code
    from ldpc_erasure_codes_tpu.ops import encode_packed

    code = toy_code(n=60, k=36, seed=2, gf_order=256)
    arrays = device_arrays(code)
    b, w, bt = 6, 8, 4  # 8 bytes = 2 uint32 words -> chunks of 1 word
    key = jax.random.key(23)
    src = jax.random.bits(key, (b, code.k, w), dtype=jnp.uint8)
    cw = encode_packed(arrays, src, gf_order=256)
    mask = jax.random.uniform(jax.random.fold_in(key, 1), (b, code.n)) < 0.15
    recv = jnp.where(mask[:, :, None], jnp.uint8(0), cw)
    v1, e1, i1 = peel_decode_vmem(
        arrays, recv, mask, max_iters=50, gf_order=256, b_tile=bt,
        interpret=True, w_chunk=-1,
    )
    v2, e2, i2 = peel_decode_vmem(
        arrays, recv, mask, max_iters=50, gf_order=256, b_tile=bt,
        interpret=True, w_chunk=1,
    )
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_w_chunk_validation():
    code = gen_row_wise([(16, 6)], [(48, 2)], seed=3, max_tries=40,
                        strict_tries=4)
    arrays, cw, recv, mask = _make_case(code, 4, 4, 0.25, seed=8)
    with pytest.raises(ValueError):  # must divide W
        peel_decode_vmem(
            arrays, recv, mask, b_tile=4, interpret=True, w_chunk=3
        )


@pytest.mark.parametrize("bt", [4, 8])
@pytest.mark.slow
def test_jacobi_matches_xla_jacobi_bit_exact(bt):
    """schedule="jacobi" = the Jacobi schedule run in VMEM: masks, resolved
    values, AND iteration counts equal the XLA ``peel_decode`` Jacobi path
    bit-exactly (detection from sweep-start MXU counts => events per sweep
    are exactly the Jacobi events)."""
    code = gen_row_wise([(16, 6)], [(48, 2)], seed=3, max_tries=40,
                        strict_tries=4)
    arrays, cw, recv, mask = _make_case(code, 10, 2, 0.25, seed=2)
    v0, e0, i0 = peel_decode(arrays, recv, mask, max_iters=50)
    v1, e1, i1 = peel_decode_vmem(
        arrays, recv, mask, max_iters=50, b_tile=bt, schedule="jacobi",
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))


def test_jacobi_real_code_early_stop():
    """(2040,1530) at the headline PER: first-k region, resolved values and
    per-frame finish iterations equal the XLA Jacobi path under first-k
    early stop (the FPGA contract: parity-region residuals are
    stopping-schedule-dependent)."""
    code = get_code("n2040_k1530")
    arrays, cw, recv, mask = _make_case(code, 8, 2, 0.1406, seed=3)
    k = code.k
    v0, e0, i0 = peel_decode(
        arrays, recv, mask, max_iters=50, early_stop_k=k
    )
    v1, e1, i1 = peel_decode_vmem(
        arrays, recv, mask, max_iters=50, b_tile=8, schedule="jacobi",
        early_stop_k=k, interpret=True,
    )
    e1_np, v1_np = np.asarray(e1), np.asarray(v1)
    np.testing.assert_array_equal(np.asarray(e0)[:, :k], e1_np[:, :k])
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    # Every resolved symbol's value is exact (schedule-invariant).
    np.testing.assert_array_equal(
        v1_np[~e1_np], np.asarray(cw)[~e1_np]
    )


@pytest.mark.slow
def test_jacobi_nb_matches_xla():
    """GF(256) jacobi schedule equals the XLA NB Jacobi path bit-exactly
    (the exclude-self value identity inv_s (x) acc XOR rows[s] must hold
    over the weighted syndrome too)."""
    from ldpc_erasure_codes_tpu.codes import toy_code

    code = toy_code(n=60, k=36, seed=2, gf_order=256)
    arrays = device_arrays(code)
    b, w = 8, 8
    key = jax.random.key(11)
    src = jax.random.bits(key, (b, code.k, w), dtype=jnp.uint8)
    cw = encode_packed(arrays, src, gf_order=256)
    mask = jax.random.uniform(jax.random.fold_in(key, 1), (b, code.n)) < 0.18
    recv = jnp.where(mask[:, :, None], jnp.uint8(0), cw)
    v0, e0, i0 = peel_decode(arrays, recv, mask, max_iters=50, gf_order=256)
    v1, e1, i1 = peel_decode_vmem(
        arrays, recv, mask, max_iters=50, gf_order=256, b_tile=4,
        schedule="jacobi", interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))


@pytest.mark.slow
def test_jacobi_tiled_matches_flat():
    """The tile-major I/O contract holds for the jacobi schedule too."""
    from ldpc_erasure_codes_tpu.ops.pallas_peel import tile_wide, untile_wide

    code = gen_row_wise([(16, 6)], [(48, 2)], seed=3, max_tries=40,
                        strict_tries=4)
    b, w, bt = 6, 2, 4
    arrays, cw, recv, mask = _make_case(code, b, w, 0.25, seed=5)
    v1, e1, i1 = peel_decode_vmem(
        arrays, recv, mask, max_iters=50, b_tile=bt, schedule="jacobi",
        interpret=True,
    )
    v2t, e2, i2 = peel_decode_vmem(
        arrays, tile_wide(recv, bt), mask, max_iters=50, b_tile=bt,
        schedule="jacobi", tiled=True, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(
        np.asarray(v1), np.asarray(untile_wide(v2t, b, code.n))
    )
