"""Pallas on-device channel kernel tests.

The hardware PRNG only exists on real TPUs (the CPU interpreter stubs it to
zeros), so statistical checks are gated on a TPU backend; CPU CI covers the
tracing/shape path via the interpreter.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ldpc_erasure_codes_tpu.ops.pallas_channel import channel_apply_per64


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def test_interpreter_path_shapes():
    """Trace + run under the Pallas TPU interpreter (PRNG stubbed): shapes,
    dtypes, and the erased-slots-zero invariant still hold."""
    from jax.experimental.pallas import tpu as pltpu

    vals = jax.random.bits(jax.random.key(0), (8, 256, 4), dtype=jnp.uint32)
    with pltpu.force_tpu_interpret_mode():
        recv, mask = channel_apply_per64(vals, jnp.int32(1), jnp.int32(16))
    assert recv.shape == vals.shape and recv.dtype == vals.dtype
    assert mask.shape == (8, 256) and mask.dtype == jnp.bool_
    m = np.asarray(mask)
    r = np.asarray(recv)
    assert (r[m] == 0).all()
    np.testing.assert_array_equal(r[~m], np.asarray(vals)[~m])


@pytest.mark.skipif(not _on_tpu(), reason="hardware PRNG needs a real TPU")
def test_statistics_on_tpu():
    vals = jax.random.bits(jax.random.key(0), (16, 2040, 8), dtype=jnp.uint32)
    recv, mask = channel_apply_per64(vals, jnp.int32(7), jnp.int32(16))
    m = np.asarray(jax.device_get(mask))
    assert 0.22 < m.mean() < 0.28
    # Determinism + independent per-codeword streams.
    _, m2 = channel_apply_per64(vals, jnp.int32(7), jnp.int32(16))
    np.testing.assert_array_equal(np.asarray(jax.device_get(m2)), m)
    assert not np.array_equal(m[0], m[1])


class TestPallasGE:
    def test_rank_matches_xla_interpret(self):
        """VMEM-resident GE rank kernel == XLA ge_rank_check, mixed outcomes."""
        from ldpc_erasure_codes_tpu import channel as ch
        from ldpc_erasure_codes_tpu.codes import get_code
        from ldpc_erasure_codes_tpu.ops import (
            device_arrays,
            ge_rank_check,
            peel_decode_mask,
        )
        from ldpc_erasure_codes_tpu.ops.pallas_ge import ge_rank_pallas

        code = get_code("n2040_k1530")
        arrays = device_arrays(code)
        mask = ch.iid_erasures(jax.random.key(5), (24, code.n), 0.215)
        e, _ = peel_decode_mask(arrays, mask, max_iters=50)
        full = np.asarray(ge_rank_check(arrays, e, emax=192))
        pal = np.asarray(
            ge_rank_pallas(arrays, e, emax=192, block=8, interpret=True)
        )
        np.testing.assert_array_equal(pal, full)
        nres = int(np.asarray(jnp.any(e, axis=1)).sum())
        assert 0 < int(full.sum()) < nres  # both outcomes exercised
