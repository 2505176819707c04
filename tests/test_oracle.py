"""Self-consistency tests for the NumPy oracle (the MATLAB-semantics model).

Patterns follow the reference's own test strategy: randomized exactness trials
(Matlab/Test_My_RS_Decode.m:42-58) and analytic oracles (rank feasibility,
Matlab/LDPCErasureCodes.m:108-115; Gilbert-Elliott steady state,
Matlab/Bursty_Error_Channel_Model.m:60-71).
"""

import numpy as np
import pytest

from ldpc_erasure_codes_tpu import codes as codes_mod
from ldpc_erasure_codes_tpu import gf
from ldpc_erasure_codes_tpu.utils import oracle


@pytest.fixture(scope="module")
def c2000():
    return codes_mod.get_code("n2000_k1000")


def _erase(rng, cw, per):
    recv = cw.copy()
    mask = rng.random(cw.size) <= per
    recv[mask] = oracle.ERASED
    return recv, mask


class TestPeeling:
    def test_decodes_at_low_per(self, c2000):
        rng = np.random.default_rng(10)
        ok = 0
        for _ in range(10):
            src = rng.integers(0, 2, c2000.k)
            cw = oracle.encode_triangular(c2000, src)
            recv, _ = _erase(rng, cw, 0.10)
            out, iters = oracle.peel_decode(c2000, recv)
            if not np.any(out == oracle.ERASED):
                assert np.array_equal(out, cw)
                ok += 1
        assert ok == 10  # PER 0.10 is deep in the waterfall for rate 1/2

    def test_no_erasures_single_iteration(self, c2000):
        rng = np.random.default_rng(11)
        src = rng.integers(0, 2, c2000.k)
        cw = oracle.encode_triangular(c2000, src)
        out, iters = oracle.peel_decode(c2000, cw.copy())
        assert iters == 1
        assert np.array_equal(out, cw)


class TestHybridML:
    def test_beats_plain_peeling(self, c2000):
        # At PER near capacity the hybrid decoder must recover codewords the
        # peeler cannot (the reference's headline result, tex:164).
        rng = np.random.default_rng(12)
        peel_fail = hybrid_ok = 0
        for _ in range(20):
            src = rng.integers(0, 2, c2000.k)
            cw = oracle.encode_triangular(c2000, src)
            recv, mask = _erase(rng, cw, 0.40)
            if mask.sum() > c2000.m:
                continue
            p_out, _ = oracle.peel_decode(c2000, recv, max_iters=10)
            h_out, _, singular = oracle.hybrid_ml_decode(c2000, recv)
            if np.any(p_out == oracle.ERASED):
                peel_fail += 1
                if not singular and np.array_equal(h_out, cw):
                    hybrid_ok += 1
        assert peel_fail > 0
        assert hybrid_ok > 0

    def test_success_iff_full_rank(self, c2000):
        # The GE succeeds exactly when the erased columns of H are independent
        # (analytic feasibility oracle).
        rng = np.random.default_rng(13)
        checked = 0
        for _ in range(10):
            src = rng.integers(0, 2, c2000.k)
            cw = oracle.encode_triangular(c2000, src)
            recv, mask = _erase(rng, cw, 0.42)
            if mask.sum() > c2000.m:
                continue
            out, _, singular = oracle.hybrid_ml_decode(c2000, recv)
            if not singular:
                assert np.array_equal(out, cw)
                checked += 1
        assert checked > 0


class TestNonBinary:
    def test_nb_roundtrip(self):
        nb = codes_mod.get_code("n2000_k1000_gf256")
        rng = np.random.default_rng(14)
        for _ in range(3):
            src = rng.integers(0, 256, nb.k)
            cw = oracle.encode_triangular_nb(nb, src)
            recv, mask = _erase(rng, cw, 0.25)
            out, _, singular = oracle.hybrid_ml_decode_nb(nb, recv)
            if not singular and not np.any(out == oracle.ERASED):
                assert np.array_equal(out, cw)

    def test_nb_peel_matches_binary_when_coeffs_one(self, c2000):
        # With all coefficients = 1, GF(256) peeling restricted to {0,1}
        # values must reproduce binary peeling.
        rng = np.random.default_rng(15)
        src = rng.integers(0, 2, c2000.k)
        cw = oracle.encode_triangular(c2000, src)
        recv, _ = _erase(rng, cw, 0.3)
        out_b, it_b = oracle.peel_decode(c2000, recv, max_iters=10)
        out_nb, it_nb = oracle.peel_decode_nb(c2000, recv, max_iters=10)
        assert np.array_equal(out_b, out_nb)
        assert it_b == it_nb


class TestRSOracle:
    def test_vandermonde_75_exactness(self):
        # (7,5) toy code over GF(256) with G(r,c) = alpha^(r*c), systematized;
        # random message + erasure-pattern trials must decode exactly
        # (reference: Matlab/Test_My_RS_Decode.m:30-58).
        t = gf.build_tables()
        k, n = 5, 7
        rows = np.arange(1, k + 1)[:, None]
        cols = np.arange(1, n + 1)[None, :]
        g = t.exp[(rows * cols) % 255].astype(np.uint8)
        g_sys = gf.gf_matmul_np(gf.gf_inv_matrix_np(g[:, :k]), g)
        assert np.array_equal(g_sys[:, :k], np.eye(k, dtype=np.uint8))
        rng = np.random.default_rng(16)
        for _ in range(300):
            msg = rng.integers(0, 256, k)
            cw = gf.gf_matvec_np(g_sys.T.astype(np.int64), msg)
            keep = np.sort(rng.choice(n, size=k, replace=False))
            out = oracle.rs_decode(keep, cw[keep], g_sys, k)
            assert np.array_equal(out, msg)


class TestGilbertElliott:
    def test_steady_state(self):
        rng = np.random.default_rng(17)
        alpha, beta = 0.01, 0.4
        err, _ = oracle.gilbert_elliott_sample(rng, 200_000, alpha, beta)
        want = oracle.gilbert_elliott_steady_state(alpha, beta)
        assert abs(err.mean() - want) < 0.01
