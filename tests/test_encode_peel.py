"""Encoder and peeling-decoder kernel tests vs the NumPy oracle.

Jacobi (kernel) and Gauss-Seidel (oracle) peeling reach the same maximal
stopping set; tests compare at convergence, not per-iteration.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ldpc_erasure_codes_tpu import codes as codes_mod
from ldpc_erasure_codes_tpu import ops
from ldpc_erasure_codes_tpu.channel import apply_erasures
from ldpc_erasure_codes_tpu.utils import oracle


@pytest.fixture(scope="module")
def c2000():
    return codes_mod.get_code("n2000_k1000")


@pytest.fixture(scope="module")
def a2000(c2000):
    return ops.device_arrays(c2000)


@pytest.fixture(scope="module")
def nb2040():
    return codes_mod.get_code("n2040_k1530_gf256")


@pytest.fixture(scope="module")
def anb2040(nb2040):
    return ops.device_arrays(nb2040)


def _batch_erase(rng, cws, per):
    mask = rng.random(cws.shape) <= per
    return mask


class TestEncoders:
    def test_matmul_vs_scan_vs_oracle(self, c2000, a2000):
        rng = np.random.default_rng(0)
        src = rng.integers(0, 2, (4, c2000.k), dtype=np.uint8)
        got = np.asarray(ops.encode(a2000, jnp.asarray(src)))
        got_scan = np.asarray(
            ops.encode_scan(a2000, jnp.asarray(src), c2000.n, c2000.k)
        )
        for i in range(4):
            want = oracle.encode_triangular(c2000, src[i])
            assert np.array_equal(got[i], want)
            assert np.array_equal(got_scan[i], want)

    def test_nb_encode_vs_oracle(self, nb2040, anb2040):
        rng = np.random.default_rng(1)
        src = rng.integers(0, 256, (2, nb2040.k), dtype=np.uint8)
        got = np.asarray(ops.encode_nb(anb2040, jnp.asarray(src)))
        for i in range(2):
            want = oracle.encode_triangular_nb(nb2040, src[i])
            assert np.array_equal(got[i], want)

    def test_wide_encode_consistent(self, c2000, a2000):
        # S bitplanes encoded at once == S separate encodes.
        rng = np.random.default_rng(2)
        s = 16
        src = rng.integers(0, 2, (3, s, c2000.k), dtype=np.uint8)
        got = np.asarray(ops.encode_wide(a2000, jnp.asarray(src)))
        flat = np.asarray(ops.encode(a2000, jnp.asarray(src.reshape(-1, c2000.k))))
        assert np.array_equal(got.reshape(-1, c2000.n), flat)

    def test_nb_packed_encode_chunked_prime_w(self):
        """encode_packed(gf_order=256) lane-chunking: a W above the fold
        limit with NO divisor near it (prime W) must ceil-chunk with a
        zero-padded tail — not collapse to chunk=1 — and equal the
        unchunked bit-image encode exactly."""
        from ldpc_erasure_codes_tpu.codes import toy_code

        code = toy_code(n=60, k=36, seed=2, gf_order=256)
        arrays = ops.device_arrays(code)
        rng = np.random.default_rng(7)
        b, w = 1024, 37  # limit = 32768 // 1024 = 32 < W; 37 is prime
        src = jnp.asarray(rng.integers(0, 256, (b, code.k, w), dtype=np.uint8))
        got = np.asarray(ops.encode_packed(arrays, src, gf_order=256))
        want = np.asarray(
            jnp.moveaxis(ops.encode_nb(arrays, jnp.moveaxis(src, 2, 1)), 1, 2)
        )
        assert np.array_equal(got, want)


class TestPeelDecode:
    @pytest.mark.parametrize("impl", ["gather", "matmul"])
    def test_matches_oracle_fixed_point(self, c2000, a2000, impl):
        rng = np.random.default_rng(3)
        b = 8
        src = rng.integers(0, 2, (b, c2000.k), dtype=np.uint8)
        cws = np.stack([oracle.encode_triangular(c2000, s) for s in src]).astype(np.uint8)
        # PER 0.35 near threshold: mix of successes and stopping sets.
        mask = _batch_erase(rng, cws, 0.35)
        vals = jnp.asarray(np.where(mask, 0, cws).astype(np.uint8))
        got_v, got_e, iters = ops.peel_decode(
            a2000, apply_erasures(vals, jnp.asarray(mask)), jnp.asarray(mask),
            max_iters=60, impl=impl,
        )
        got_v, got_e = np.asarray(got_v), np.asarray(got_e)
        for i in range(b):
            recv = cws[i].astype(np.int64)
            recv[mask[i]] = oracle.ERASED
            want, _ = oracle.peel_decode(c2000, recv, max_iters=60)
            want_er = want == oracle.ERASED
            assert np.array_equal(got_e[i], want_er), f"cw {i}: stopping sets differ"
            assert np.array_equal(got_v[i][~want_er], want[~want_er]), f"cw {i}: values differ"
            assert np.all(got_v[i][want_er] == 0)

    def test_nb_matches_oracle_fixed_point(self, nb2040, anb2040):
        rng = np.random.default_rng(4)
        b = 4
        src = rng.integers(0, 256, (b, nb2040.k), dtype=np.uint8)
        cws = np.stack([oracle.encode_triangular_nb(nb2040, s) for s in src]).astype(np.uint8)
        mask = _batch_erase(rng, cws, 0.17)
        vals = jnp.asarray(np.where(mask, 0, cws).astype(np.uint8))
        got_v, got_e, _ = ops.peel_decode(
            anb2040, vals, jnp.asarray(mask), gf_order=256, max_iters=60
        )
        got_v, got_e = np.asarray(got_v), np.asarray(got_e)
        for i in range(b):
            recv = cws[i].astype(np.int64)
            recv[mask[i]] = oracle.ERASED
            want, _ = oracle.peel_decode_nb(nb2040, recv, max_iters=60)
            want_er = want == oracle.ERASED
            assert np.array_equal(got_e[i], want_er)
            assert np.array_equal(got_v[i][~want_er], want[~want_er])

    def test_wide_symbols_match_bitplanes(self, c2000, a2000):
        # Packed uint32 wide symbols decode identically to scalar bitplanes.
        rng = np.random.default_rng(5)
        b, w = 2, 4
        cw_words = rng.integers(0, 2**32, (b, c2000.n, w), dtype=np.uint32)
        # make them valid codewords per bitplane: encode each bitplane
        src_bits = rng.integers(0, 2, (b, 32 * w, c2000.k), dtype=np.uint8)
        planes = np.asarray(ops.encode(a2000, jnp.asarray(src_bits)))  # (b, S, n)
        # pack bitplanes into uint32 words: plane s -> word s//32 bit s%32
        cw_words = np.zeros((b, c2000.n, w), dtype=np.uint32)
        for s in range(32 * w):
            cw_words[:, :, s // 32] |= planes[:, s, :].astype(np.uint32) << (s % 32)
        mask = _batch_erase(rng, np.zeros((b, c2000.n)), 0.3)
        vals = jnp.asarray(cw_words * ~mask[:, :, None])
        got_v, got_e, _ = ops.peel_decode(a2000, vals, jnp.asarray(mask), max_iters=60)
        # scalar reference: decode each bitplane via matmul impl
        flat_vals = jnp.asarray((planes * ~mask[:, None, :]).astype(np.uint8).reshape(-1, c2000.n))
        flat_mask = jnp.asarray(np.repeat(mask[:, None, :], 32 * w, 1).reshape(-1, c2000.n))
        ref_v, ref_e, _ = ops.peel_decode(a2000, flat_vals, flat_mask, max_iters=60)
        ref_v = np.asarray(ref_v).reshape(b, 32 * w, c2000.n)
        repacked = np.zeros_like(cw_words)
        for s in range(32 * w):
            repacked[:, :, s // 32] |= ref_v[:, s, :].astype(np.uint32) << (s % 32)
        assert np.array_equal(np.asarray(got_e), np.asarray(ref_e).reshape(b, -1, c2000.n)[:, 0, :])
        known = ~np.asarray(got_e)
        assert np.array_equal(np.asarray(got_v)[known], repacked[known])

    def test_iteration_counts(self, c2000, a2000):
        rng = np.random.default_rng(6)
        src = rng.integers(0, 2, (2, c2000.k), dtype=np.uint8)
        cws = np.stack([oracle.encode_triangular(c2000, s) for s in src]).astype(np.uint8)
        # no erasures -> 1 iteration
        mask = np.zeros((2, c2000.n), dtype=bool)
        _, _, iters = ops.peel_decode(a2000, jnp.asarray(cws), jnp.asarray(mask))
        assert np.all(np.asarray(iters) == 1)

    def test_early_stop_first_k(self, c2000, a2000):
        # A word whose only unresolved erasures sit in the parity region is
        # "done" under FPGA early-stop semantics.
        rng = np.random.default_rng(7)
        src = rng.integers(0, 2, (1, c2000.k), dtype=np.uint8)
        cw = oracle.encode_triangular(c2000, src[0]).astype(np.uint8)[None]
        mask = np.zeros((1, c2000.n), dtype=bool)
        mask[0, c2000.k :] = True  # erase all parities: peeling recovers most
        vals = jnp.asarray(cw * ~mask)
        _, er_full, it_full = ops.peel_decode(a2000, vals, jnp.asarray(mask), max_iters=60)
        _, er_k, it_k = ops.peel_decode(
            a2000, vals, jnp.asarray(mask), max_iters=60, early_stop_k=c2000.k
        )
        assert int(it_k[0]) <= int(it_full[0])
        assert not np.asarray(er_k)[0, : c2000.k].any()

    def test_history(self, c2000, a2000):
        rng = np.random.default_rng(8)
        src = rng.integers(0, 2, (2, c2000.k), dtype=np.uint8)
        cws = np.stack([oracle.encode_triangular(c2000, s) for s in src]).astype(np.uint8)
        mask = _batch_erase(rng, cws, 0.2)
        vals = jnp.asarray((cws * ~mask).astype(np.uint8))
        _, erased, hist = ops.peel_decode_with_history(
            a2000, vals, jnp.asarray(mask), max_iters=20
        )
        hist = np.asarray(hist)
        assert hist.shape == (2, 20)
        # residual counts are non-increasing and end at the final residual
        assert np.all(np.diff(hist, axis=1) <= 0)
        assert np.array_equal(hist[:, -1], np.asarray(erased).sum(1))


class TestWorklistImpl:
    """Work-list peeling must reach the gather impl's fixed point exactly."""

    def test_worklist_matches_gather_wide(self):
        import jax, jax.numpy as jnp
        from ldpc_erasure_codes_tpu import channel as ch
        from ldpc_erasure_codes_tpu.codes import get_code
        from ldpc_erasure_codes_tpu.ops import (
            device_arrays,
            encode_packed,
            peel_decode,
        )

        code = get_code("n2040_k1530")
        arrays = device_arrays(code)
        key = jax.random.key(0)
        src = jax.random.bits(key, (4, code.k, 2), dtype=jnp.uint32)
        cw = encode_packed(arrays, src)
        mask = ch.iid_erasures(jax.random.key(1), (4, code.n), 0.16)
        recv = ch.apply_erasures(cw, mask)
        vg, eg, _ = peel_decode(arrays, recv, mask, impl="gather")
        for wl in (16, 128):
            vw, ew, _ = peel_decode(
                arrays, recv, mask, impl="worklist", worklist_size=wl
            )
            np.testing.assert_array_equal(np.asarray(ew), np.asarray(eg))
            np.testing.assert_array_equal(np.asarray(vw), np.asarray(vg))

    def test_worklist_matches_gather_nb(self):
        import jax, jax.numpy as jnp
        from ldpc_erasure_codes_tpu import channel as ch
        from ldpc_erasure_codes_tpu.codes import toy_code
        from ldpc_erasure_codes_tpu.ops import (
            device_arrays,
            encode_nb,
            peel_decode,
        )

        code = toy_code(n=60, k=36, seed=2, gf_order=256)
        arrays = device_arrays(code)
        key = jax.random.key(3)
        src = jax.random.bits(key, (8, code.k), dtype=jnp.uint8)
        cw = encode_nb(arrays, src)
        mask = ch.iid_erasures(jax.random.key(4), (8, code.n), 0.15)
        recv = ch.apply_erasures(cw, mask)
        vg, eg, _ = peel_decode(arrays, recv, mask, gf_order=256, impl="gather")
        vw, ew, _ = peel_decode(
            arrays, recv, mask, gf_order=256, impl="worklist", worklist_size=24
        )
        np.testing.assert_array_equal(np.asarray(vw), np.asarray(vg))
        np.testing.assert_array_equal(np.asarray(ew), np.asarray(eg))


class TestSeqBlocksSchedule:
    """seq_blocks=m reproduces the MATLAB Gauss-Seidel schedule bit-exactly
    (residuals AND iteration counts); every schedule shares the fixed point."""

    def test_matches_oracle_iterations(self):
        import jax, jax.numpy as jnp
        from ldpc_erasure_codes_tpu import channel as ch
        from ldpc_erasure_codes_tpu.codes import get_code
        from ldpc_erasure_codes_tpu.ops import device_arrays, encode, peel_decode

        code = get_code("n2000_k1000")
        arrays = device_arrays(code)
        src = jax.random.bits(jax.random.key(0), (6, code.k), dtype=jnp.uint8) & 1
        cw = encode(arrays, src)
        mask = ch.iid_erasures(jax.random.key(1), (6, code.n), 0.35)
        recv = ch.apply_erasures(cw, mask)
        v, e, iters = peel_decode(arrays, recv, mask, max_iters=50, seq_blocks=code.m)
        v, e, iters = map(np.asarray, (v, e, iters))
        cwn, maskn = np.asarray(cw), np.asarray(mask)
        for i in range(6):
            rv = np.where(maskn[i], -1, cwn[i].astype(np.int64))
            out, it_o = oracle.peel_decode(code, rv, max_iters=50)
            np.testing.assert_array_equal(e[i], out < 0)
            assert int(iters[i]) == it_o
        vj, ej, _ = peel_decode(arrays, recv, mask, max_iters=50)
        np.testing.assert_array_equal(np.asarray(ej), e)
        np.testing.assert_array_equal(np.asarray(vj), v)

    def test_two_blocks_nb(self):
        import jax, jax.numpy as jnp
        from ldpc_erasure_codes_tpu import channel as ch
        from ldpc_erasure_codes_tpu.codes import toy_code
        from ldpc_erasure_codes_tpu.ops import device_arrays, encode_nb, peel_decode

        code = toy_code(n=60, k=36, seed=2, gf_order=256)
        arrays = device_arrays(code)
        src = jax.random.bits(jax.random.key(3), (8, code.k), dtype=jnp.uint8)
        cw = encode_nb(arrays, src)
        mask = ch.iid_erasures(jax.random.key(4), (8, code.n), 0.15)
        recv = ch.apply_erasures(cw, mask)
        vg, eg, _ = peel_decode(arrays, recv, mask, gf_order=256)
        v2, e2, _ = peel_decode(arrays, recv, mask, gf_order=256, seq_blocks=2)
        np.testing.assert_array_equal(np.asarray(e2), np.asarray(eg))
        np.testing.assert_array_equal(np.asarray(v2), np.asarray(vg))


class TestPeelDecodeWide:
    """Symbol-major wide decoder: identical fixed point (and identical
    iteration counts at split=1) to the frame-major gather decoder."""

    def test_matches_gather_all_splits(self):
        import jax, jax.numpy as jnp
        from ldpc_erasure_codes_tpu import channel as ch
        from ldpc_erasure_codes_tpu.codes import get_code
        from ldpc_erasure_codes_tpu.ops import (
            device_arrays,
            encode_packed,
            peel_decode,
            peel_decode_wide,
        )

        code = get_code("n2040_k1530")
        arrays = device_arrays(code)
        src = jax.random.bits(jax.random.key(0), (8, code.k, 3), dtype=jnp.uint32)
        cw = encode_packed(arrays, src)
        for per, seed in [(0.14, 1), (0.2, 2)]:
            mask = ch.iid_erasures(jax.random.key(seed), (8, code.n), per)
            recv = ch.apply_erasures(cw, mask)
            vg, eg, ig = peel_decode(
                arrays, recv, mask, max_iters=50, early_stop_k=code.k
            )
            for split in (1, 2, 4):
                vw, ew, iw = peel_decode_wide(
                    arrays, recv, mask, max_iters=50, early_stop_k=code.k,
                    split=split,
                )
                np.testing.assert_array_equal(np.asarray(ew), np.asarray(eg))
                np.testing.assert_array_equal(np.asarray(vw), np.asarray(vg))
                if split == 1:
                    np.testing.assert_array_equal(np.asarray(iw), np.asarray(ig))

    def test_matches_gather_nb(self):
        """GF(256) symbol-major wide path: fixed point and iteration counts
        equal the frame-major gather decoder at gf_order=256."""
        import jax, jax.numpy as jnp
        from ldpc_erasure_codes_tpu import channel as ch
        from ldpc_erasure_codes_tpu.codes import toy_code
        from ldpc_erasure_codes_tpu.ops import (
            device_arrays,
            encode_packed,
            peel_decode,
            peel_decode_wide,
        )

        code = toy_code(n=60, k=36, seed=2, gf_order=256)
        arrays = device_arrays(code)
        src = jax.random.bits(jax.random.key(5), (8, code.k, 6), dtype=jnp.uint8)
        cw = encode_packed(arrays, src, gf_order=256)
        for per, seed in [(0.12, 6), (0.2, 7)]:
            mask = ch.iid_erasures(jax.random.key(seed), (8, code.n), per)
            recv = ch.apply_erasures(cw, mask)
            vg, eg, ig = peel_decode(
                arrays, recv, mask, gf_order=256, max_iters=50
            )
            vw, ew, iw = peel_decode_wide(
                arrays, recv, mask, gf_order=256, max_iters=50
            )
            np.testing.assert_array_equal(np.asarray(ew), np.asarray(eg))
            np.testing.assert_array_equal(np.asarray(vw), np.asarray(vg))
            np.testing.assert_array_equal(np.asarray(iw), np.asarray(ig))

    def test_hybrid_wide_nb(self):
        """hybrid_decode routes wide GF(256) frames through the symbol-major
        path; full recovery matches the scalar-lane hybrid."""
        import jax, jax.numpy as jnp
        from ldpc_erasure_codes_tpu import channel as ch
        from ldpc_erasure_codes_tpu.codes import toy_code
        from ldpc_erasure_codes_tpu.ops import (
            device_arrays,
            encode_packed,
            hybrid_decode,
        )

        code = toy_code(n=60, k=36, seed=2, gf_order=256)
        arrays = device_arrays(code)
        src = jax.random.bits(jax.random.key(8), (8, code.k, 4), dtype=jnp.uint8)
        cw = encode_packed(arrays, src, gf_order=256)
        mask = ch.iid_erasures(jax.random.key(9), (8, code.n), 0.12)
        recv = ch.apply_erasures(cw, mask)
        v, e, iters, failed = hybrid_decode(
            arrays, recv, mask, gf_order=256, peel_iters=10, emax=32
        )
        v, e, failed = map(np.asarray, (v, e, failed))
        cw_np, mask_np = np.asarray(cw), np.asarray(mask)
        from ldpc_erasure_codes_tpu.utils import oracle

        for f in range(8):
            # Failure flags must agree with the oracle's singular verdict
            # (the weak random toy code is genuinely ML-singular on several
            # of these draws — that is the point of the comparison).
            rv = np.where(mask_np[f], -1, cw_np[f, :, 0].astype(np.int64))
            _, _, singular = oracle.hybrid_ml_decode_nb(code, rv)
            assert bool(failed[f]) == bool(singular), f"frame {f}"
            if not failed[f]:
                assert not e[f].any()
                np.testing.assert_array_equal(v[f], cw_np[f])
        assert (~failed).any()
