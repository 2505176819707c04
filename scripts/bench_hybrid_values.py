"""Hybrid VALUE-mode throughput at GE-hot operating points (real TPU).

VERDICT r2 missing #1: the round-2 hybrid number (221.7 Gbps) was measured
at PER .1406 where the GE branch almost never executes. Here the full value
pipeline (tiled VMEM encode -> fused-mask VMEM peel -> compacted GE with
values) is timed at EVERY Table-I operating point of both production codes,
including the PERs where stopping sets are common and the ML stage does
real work — the regime the reference's headline hybrid claim covers
(Matlab/My_LDPC_HybridML_Erasure_Decoder.m:48-88, tex:164).

Also A/Bs the round-3 packed-bit GE (ge_impl=packed: narrow elimination +
MXU apply) against the round-2 byte GE at the hottest point.

Run: python scripts/bench_hybrid_values.py  (one JSON-ish line per point)
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_point(code_name, per, *, b, emax, f_max, w=256, peel_iters=10,
              ge_impl="auto", reps=8):
    from ldpc_erasure_codes_tpu import channel as ch
    from ldpc_erasure_codes_tpu.codes import get_code
    from ldpc_erasure_codes_tpu.ops import device_arrays, hybrid_decode
    from ldpc_erasure_codes_tpu.ops.pallas_encode import encode_packed_vmem
    from ldpc_erasure_codes_tpu.ops.pallas_peel import (
        default_b_tile,
        static_topology,
    )

    code = get_code(code_name)
    arrays = device_arrays(code)
    bt = default_b_tile(code.n, w)
    topo = static_topology(arrays)  # unrolled peel inside the hybrid
    key = jax.random.key(0)
    # Pre-encode outside the timed loop (the FPGA decoder benchmark's and
    # bench.py's model: the decoder receives already-encoded frames).
    src = jax.random.bits(key, (b, code.k, w), dtype=jnp.uint32)
    cw = jax.block_until_ready(
        encode_packed_vmem(arrays, src, b_tile=bt, tiled_out=True)
    )

    @jax.jit
    def step(k, cw):
        mask = ch.iid_erasures(k, (b, code.n), per)
        # Mask fusion happens in the peel copy-in; the hybrid rides the
        # tile-major layout, untiling only inside the GE branch.
        v, e, iters, failed = hybrid_decode(
            arrays, cw, mask, peel_iters=peel_iters, emax=emax,
            impl="vmem", ge_subbatch=f_max, b_tile=bt, tiled=True,
            ge_impl=ge_impl, static_topo=topo,
        )
        digest = jnp.bitwise_xor.reduce(
            jnp.bitwise_xor.reduce(v, axis=1), axis=0
        )
        return (
            jnp.sum(e[:, : code.k], dtype=jnp.int32),
            jnp.sum(failed.astype(jnp.int32)),
            jnp.sum(jnp.any(e, axis=1).astype(jnp.int32)),
            digest,
        )

    out = jax.block_until_ready(step(jax.random.fold_in(key, 999), cw))
    t0 = time.perf_counter()
    tot_failed = 0
    for i in range(reps):
        out = step(jax.random.fold_in(key, i), cw)
        tot_failed += int(out[1])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    gbps = b * code.k * 32 * w / dt / 1e9
    frames = b * reps
    print(
        f"{code_name} PER={per:<7} ge={ge_impl:6s} emax={emax:<4d} "
        f"f_max={f_max:<4d} {dt * 1e3:8.2f} ms/step  {gbps:7.1f} Gbps  "
        f"hybrid_fer={tot_failed / frames:.2e} ({tot_failed}/{frames})",
        flush=True,
    )
    return gbps


def main() -> None:
    from ldpc_erasure_codes_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    quick = "--quick" in sys.argv
    b = 256 if quick else 1024
    # (2040,1530): full Table-I PER range; GE-hot at .1875/.2031. Residual
    # stopping sets after 10 peel sweeps reach ~350+ symbols at .2031
    # (measured), so emax must approach m=510 there; the hybrid_fer column
    # should reproduce VALIDATION's FER table (4.7e-3 at .1875, 1.65e-1 at
    # .2031) — a higher number means emax/f_max clipping, not decoder loss.
    for per, emax, fmax in [
        (0.1406, 256, 64),
        (0.1719, 256, 64),
        (0.1875, 384, 128),
        (0.2031, 512, 448),
    ]:
        run_point("n2040_k1530", per, b=b, emax=emax, f_max=fmax)
    # Packed-vs-bytes GE A/B at the hottest point.
    run_point("n2040_k1530", 0.2031, b=b, emax=512, f_max=448,
              ge_impl="bytes")
    # (2000,1000): rate-1/2 points; GE-hot at .3906.
    for per, emax, fmax in [
        (0.3438, 256, 16),
        (0.375, 512, 32),
        (0.3906, 768, 64),
    ]:
        run_point("n2000_k1000", per, b=b, emax=emax, f_max=fmax)


if __name__ == "__main__":
    main()
