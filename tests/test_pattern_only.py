"""Pattern-only FER fast path: must agree exactly with the value path."""

import numpy as np
import jax
import jax.numpy as jnp

from ldpc_erasure_codes_tpu import channel as ch
from ldpc_erasure_codes_tpu.codes import get_code, toy_code
from ldpc_erasure_codes_tpu.ops import (
    device_arrays,
    ge_rank_check,
    ge_solve,
    hybrid_decode,
    peel_decode,
    peel_decode_mask,
)
from ldpc_erasure_codes_tpu.sim import DecoderConfig, SimConfig, make_sim_step


def test_mask_peel_matches_value_peel():
    code = get_code("n2000_k1000")
    arrays = device_arrays(code)
    mask = ch.iid_erasures(jax.random.key(0), (64, code.n), 0.35)
    values = jnp.zeros((64, code.n), jnp.uint8)  # all-zero codeword is valid
    _, e_val, it_val = peel_decode(arrays, values, mask, max_iters=50)
    e_msk, it_msk = peel_decode_mask(arrays, mask, max_iters=50)
    np.testing.assert_array_equal(np.asarray(e_msk), np.asarray(e_val))
    np.testing.assert_array_equal(np.asarray(it_msk), np.asarray(it_val))


def test_rank_check_matches_ge_solve():
    code = toy_code(n=64, k=40, seed=1)
    arrays = device_arrays(code)
    mask = ch.iid_erasures(jax.random.key(1), (128, code.n), 0.25)
    values = jnp.zeros((128, code.n), jnp.uint8)
    _, _, failed_solve = ge_solve(arrays, values, mask, emax=24)
    failed_rank = ge_rank_check(arrays, mask, emax=24)
    np.testing.assert_array_equal(np.asarray(failed_rank), np.asarray(failed_solve))


def test_rank_check_matches_ge_solve_gf256():
    code = toy_code(n=48, k=28, seed=2, gf_order=256)
    arrays = device_arrays(code)
    mask = ch.iid_erasures(jax.random.key(2), (64, code.n), 0.25)
    values = jnp.zeros((64, code.n), jnp.uint8)
    _, _, failed_solve = ge_solve(arrays, values, mask, emax=24, gf_order=256)
    failed_rank = ge_rank_check(arrays, mask, emax=24, gf_order=256)
    np.testing.assert_array_equal(np.asarray(failed_rank), np.asarray(failed_solve))


def test_pattern_only_sim_matches_full_sim():
    code = get_code("n2040_k1530")
    base = dict(code=code.name, batch=128, seed=5)
    for kind in ("peel", "hybrid", "ml"):
        # peel_iters=max_iters so the value path also peels to convergence
        # (the pattern path always does; ML solvability is unaffected but
        # the iteration histogram and emax pressure match only this way).
        dec = DecoderConfig(kind=kind, emax=96, peel_iters=50)
        full = make_sim_step(code, SimConfig(**base, decoder=dec))
        fast = make_sim_step(
            code, SimConfig(**base, decoder=dec, track_values=False)
        )
        key = jax.random.key(11)
        per = jnp.float32(0.17)
        a = jax.device_get(full(key, per))
        b = jax.device_get(fast(key, per))
        # Same channel keys -> identical masks -> identical statistics.
        assert int(a.block_errors) == int(b.block_errors), kind
        assert int(a.rs_block_errors) == int(b.rs_block_errors), kind
        assert int(a.ml_failed) == int(b.ml_failed), kind
        assert int(a.erased_symbols) == int(b.erased_symbols), kind
        np.testing.assert_array_equal(a.iters_hist, b.iters_hist, err_msg=kind)
