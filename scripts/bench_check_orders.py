"""Check-visit-order A/B under the unrolled schedule (round 4, VERDICT #4).

The reference's 2-way check-partition schedule halves the dependency depth
of a sweep by running two half-sweeps independently and merging by union
(OpenCL/device/ldpc_erasure_decoder_perf_tests.cl:95-203; tex:183). In the
constant-topology Mosaic program the equivalent lever is the BAKED VISIT
ORDER: resolutions commute (every successful resolution writes the true
codeword symbol), so any order reaches the same fixed point — but orders
differ in how often adjacent program-order visits share symbols, which is
what serializes Mosaic's (alias-decidable) scheduling. A/Bs
static_topology(order=...) x unroll_blk at the headline point
(B=2048, W=256, PER .1406, tile-major, values consumed).

Run: python scripts/bench_check_orders.py [order:blk ...]
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
    from ldpc_erasure_codes_tpu.ops.pallas_peel import (
        peel_decode_vmem,
        static_topology,
    )
    from ldpc_erasure_codes_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    code = get_code("n2040_k1530")
    arrays = device_arrays(code)
    b, w, per, reps, bt = 2048, 256, 0.1406, 10, 32
    configs = [
        (a.split(":")[0], int(a.split(":")[1])) for a in sys.argv[1:]
    ] or [("natural", 8), ("split2", 8), ("color", 8), ("color", 16)]

    key = jax.random.key(0)
    src = jax.random.bits(key, (b, code.k, w), dtype=jnp.uint32)
    cw = jax.block_until_ready(
        encode_packed_vmem(arrays, src, b_tile=bt, tiled_out=True)
    )
    del src

    for order, blk in configs:
        topo = static_topology(arrays, order=order)

        @jax.jit
        def step(key, cw, topo=topo, blk=blk):
            mask = ch.iid_erasures(key, (b, code.n), per)
            values, erased, iters = peel_decode_vmem(
                arrays, cw, mask, max_iters=50, early_stop_k=code.k,
                b_tile=bt, tiled=True, schedule="unrolled",
                static_topo=topo, unroll_blk=blk,
            )
            digest = jnp.bitwise_xor.reduce(
                jnp.bitwise_xor.reduce(values, axis=1), axis=0
            )
            return (
                jnp.sum(erased[:, : code.k], dtype=jnp.int32),
                jnp.max(iters),
                digest,
            )

        try:
            t0 = time.perf_counter()
            out = jax.block_until_ready(step(jax.random.fold_in(key, 999), cw))
            compile_s = time.perf_counter() - t0
        except ValueError:
            raise
        except Exception as exc:  # Mosaic compile / VMEM failures
            print(f"order={order} blk={blk}: FAILED ({type(exc).__name__}: "
                  f"{str(exc)[:160]})", flush=True)
            continue
        assert int(out[0]) == 0, f"residual {int(out[0])}"
        t0 = time.perf_counter()
        for i in range(reps):
            out = step(jax.random.fold_in(key, i), cw)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        gbps = b * code.k * 32 * w / dt / 1e9
        print(
            f"order={order:8s} blk={blk:2d}: {dt * 1e3:6.1f} ms/step  "
            f"{gbps:6.1f} Gbps info  max_iters={int(out[1])}  "
            f"(compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
