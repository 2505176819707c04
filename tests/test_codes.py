"""Code registry / parser / encoder-precompute tests."""

import os

import numpy as np
import pytest

from ldpc_erasure_codes_tpu import codes as codes_mod
from ldpc_erasure_codes_tpu.utils import oracle
from tests.conftest import REFERENCE_DIR, reference_available


@pytest.fixture(scope="module")
def c2000():
    return codes_mod.get_code("n2000_k1000")


@pytest.fixture(scope="module")
def c2040():
    return codes_mod.get_code("n2040_k1530")


class TestRegistry:
    def test_shipped_codes(self):
        names = codes_mod.list_codes()
        assert {"n2000_k1000", "n2040_k1530", "n4000_k2000"} <= set(names)

    def test_params(self, c2000, c2040):
        assert (c2000.n, c2000.k, c2000.rs_n, c2000.rs_k) == (2000, 1000, 250, 125)
        assert (c2040.n, c2040.k, c2040.rs_n, c2040.rs_k) == (2040, 1530, 255, 192)

    def test_structure_valid(self, c2000, c2040):
        c2000.validate()
        c2040.validate()
        assert c2000.is_triangular
        assert c2040.is_triangular

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            codes_mod.get_code("nope")

    def test_clist_consistent(self, c2000):
        cl_idx, cl_len, _ = c2000.clist
        # total edges match
        assert cl_len.sum() == c2000.vlist_len.sum()
        # row 0's neighbors reference back
        r0 = c2000.vlist_idx[0, : c2000.vlist_len[0]]
        for c in r0:
            assert 0 in cl_idx[c, : cl_len[c]]

    def test_gf256_lift(self, c2040):
        nb = codes_mod.get_code("n2040_k1530_gf256")
        assert nb.gf_order == 256
        assert np.array_equal(nb.vlist_idx, c2040.vlist_idx)
        sup = nb.vlist_idx < nb.n
        assert np.all(nb.vlist_val[sup] >= 1)
        # deterministic
        nb2 = c2040.lift_to_gf256(seed=0)
        assert np.array_equal(nb.vlist_val, nb2.vlist_val)


@pytest.mark.skipif(not reference_available(), reason="reference fixtures not present")
class TestReferenceParity:
    def test_header_matches_mat(self, c2000):
        import scipy.io as sio

        h = sio.loadmat(
            os.path.join(
                REFERENCE_DIR, "Matlab", "n2000_k1000_no6cycles_triangleForm_OpenCL_H.mat"
            )
        )["H_sparse"].toarray()
        assert np.array_equal(c2000.h_dense, h.astype(np.uint8))

    def test_parse_single_code_header(self):
        path = os.path.join(
            REFERENCE_DIR, "OpenCL", "device", "n2000_k1000_no6cycle_ldpc_Vlist_device.h"
        )
        (code,) = codes_mod.parse_vlist_header(path)
        assert (code.n, code.k) == (2000, 1000)
        code.validate()


class TestParityGenerator:
    def test_dense_encode_matches_sequential(self, c2000):
        rng = np.random.default_rng(0)
        src = rng.integers(0, 2, c2000.k)
        want = oracle.encode_triangular(c2000, src)
        p = (src @ c2000.parity_gen) & 1
        assert np.array_equal(p, want[c2000.k :])

    def test_dense_encode_matches_sequential_2040(self, c2040):
        rng = np.random.default_rng(1)
        src = rng.integers(0, 2, c2040.k)
        want = oracle.encode_triangular(c2040, src)
        p = (src @ c2040.parity_gen) & 1
        assert np.array_equal(p, want[c2040.k :])

    def test_dense_encode_nb(self):
        from ldpc_erasure_codes_tpu import gf

        nb = codes_mod.get_code("n2040_k1530_gf256")
        rng = np.random.default_rng(2)
        src = rng.integers(0, 256, nb.k)
        want = oracle.encode_triangular_nb(nb, src)
        p = gf.gf_matvec_np(nb.parity_gen_nb.T, src)
        assert np.array_equal(p, want[nb.k :])

    def test_encoded_word_satisfies_checks(self, c2000):
        rng = np.random.default_rng(3)
        src = rng.integers(0, 2, c2000.k)
        cw = oracle.encode_triangular(c2000, src)
        syn = (c2000.h_dense.astype(np.int64) @ cw) & 1
        assert not syn.any()

    def test_encoded_word_satisfies_checks_nb(self):
        from ldpc_erasure_codes_tpu import gf

        nb = codes_mod.get_code("n2000_k1000_gf256")
        rng = np.random.default_rng(4)
        src = rng.integers(0, 256, nb.k)
        cw = oracle.encode_triangular_nb(nb, src)
        t = gf.build_tables()
        prod = t.mul[nb.h_dense_nb.astype(np.int64), cw[None, :]]
        syn = np.bitwise_xor.reduce(prod, axis=1)
        assert not syn.any()
