"""A/B the counted sequential schedule vs seq at the headline point (TPU).

Variants (all bit-exact to the oracle's sequential schedule, asserted in
tests/test_pallas_peel.py):
  seq                      — round-2 production (baseline ~78.3 ms/step)
  seq skip_idle=False      — no per-check vector->scalar branch (phase bench
                             measured this FASTER at the event-dense point)
  counted                  — incremental counts + sweep-start scalar skips
  counted + knob combos    — skip_idle / cond_stores (bits-gated updates)

Run: python scripts/bench_counted.py [--quick]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from ldpc_erasure_codes_tpu import channel as ch
    from ldpc_erasure_codes_tpu.codes import get_code
    from ldpc_erasure_codes_tpu.ops import device_arrays
    from ldpc_erasure_codes_tpu.ops.pallas_encode import encode_packed_vmem
    from ldpc_erasure_codes_tpu.ops.pallas_peel import peel_decode_vmem

    quick = "--quick" in sys.argv
    code = get_code("n2040_k1530")
    arrays = device_arrays(code)
    b = 256 if quick else 2048
    w, bt, per = 256, 32, 0.1406
    reps = 3 if quick else 10

    key = jax.random.key(0)
    src = jax.random.bits(key, (b, code.k, w), dtype=jnp.uint32)
    cw = jax.block_until_ready(
        encode_packed_vmem(arrays, src, b_tile=bt, tiled_out=True)
    )

    def digest_of(values):
        return jnp.bitwise_xor.reduce(
            jnp.bitwise_xor.reduce(values, axis=1), axis=0
        )

    def mk(**kw):
        @jax.jit
        def step(k, cw):
            mask = ch.iid_erasures(k, (b, code.n), per)
            values, erased, iters = peel_decode_vmem(
                arrays, cw, mask, max_iters=50, early_stop_k=code.k,
                b_tile=bt, tiled=True, **kw,
            )
            return (
                jnp.sum(erased[:, : code.k], dtype=jnp.int32),
                jnp.max(iters),
                digest_of(values),
            )
        return step

    ref_digest = None
    for name, kw in [
        ("seq [prod r2]", dict(schedule="seq")),
        ("seq skip_idle=False", dict(schedule="seq", skip_idle=False)),
        ("counted", dict(schedule="counted")),
        ("counted skip_idle=False", dict(schedule="counted", skip_idle=False)),
        ("counted cond_stores", dict(schedule="counted", cond_stores=True)),
        ("counted si=F cs=T",
         dict(schedule="counted", skip_idle=False, cond_stores=True)),
    ]:
        try:
            fn = mk(**kw)
            out = jax.block_until_ready(fn(jax.random.fold_in(key, 999), cw))
            if ref_digest is None:
                ref_digest = out
            else:
                import numpy as np
                assert int(out[0]) == int(ref_digest[0]), name
                assert np.array_equal(
                    np.asarray(out[2]), np.asarray(ref_digest[2])
                ), f"{name}: digest mismatch"
            t0 = time.perf_counter()
            for i in range(reps):
                out = fn(jax.random.fold_in(key, i), cw)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / reps
            gbps = b * code.k * 32 * w / dt / 1e9
            print(f"{name:28s} {dt * 1e3:8.2f} ms/step  {gbps:7.1f} Gbps",
                  flush=True)
        except Exception as e:  # compile failures shouldn't kill the battery
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
