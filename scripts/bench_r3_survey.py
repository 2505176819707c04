"""Round-3 kernel survey: unrolled-schedule throughput across codes/fields.

Re-measures the VALIDATION kernel-table rows that round 2 recorded with the
dynamic-topology kernels, now under the round-3 production configuration
(constant-topology unrolled peel/encode, tile-major I/O), on the real chip:

  * binary decode, other registry codes (2000,1000) / (4000,2000) at their
    deep Table-I PERs — round-2 rows were 111.4 / 72.2 Gbps with seq;
  * GF(256) standalone decode (B=512) and encode under the unrolled
    schedule — round-2 rows were 189.0 / 108.2 Gbps dynamic.

Decode legs follow bench.py's model (pre-encoded frames, on-device channel
draw, values consumed via XOR digest). One Mosaic compile per (code, shape),
jit-cached.

Run: python scripts/bench_r3_survey.py [--quick]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_decode(code_name, per, *, b, w=256, gf_order=2, reps=8,
                 schedule="unrolled"):
    from ldpc_erasure_codes_tpu import channel as ch
    from ldpc_erasure_codes_tpu.codes import get_code
    from ldpc_erasure_codes_tpu.ops import device_arrays
    from ldpc_erasure_codes_tpu.ops.pallas_encode import encode_packed_vmem
    from ldpc_erasure_codes_tpu.ops.pallas_peel import (
        default_b_tile,
        peel_decode_vmem,
        static_topology,
    )

    code = get_code(code_name)
    arrays = device_arrays(code)
    bt = default_b_tile(code.n, w if gf_order == 2 else w // 4)
    topo = static_topology(arrays) if schedule == "unrolled" else None
    key = jax.random.key(0)
    if gf_order == 2:
        src = jax.random.bits(key, (b, code.k, w), dtype=jnp.uint32)
        symbol_bits = 32 * w
    else:
        w32 = jax.random.bits(key, (b, code.k, w // 4), dtype=jnp.uint32)
        src = jax.lax.bitcast_convert_type(w32, jnp.uint8).reshape(
            b, code.k, w
        )
        symbol_bits = 8 * w
    cw = jax.block_until_ready(
        encode_packed_vmem(arrays, src, gf_order=gf_order, b_tile=bt,
                           tiled_out=True)
    )

    @jax.jit
    def step(k, cw):
        mask = ch.iid_erasures(k, (b, code.n), per)
        v, e, iters = peel_decode_vmem(
            arrays, cw, mask, max_iters=50, early_stop_k=code.k,
            gf_order=gf_order, b_tile=bt, tiled=True, schedule=schedule,
            static_topo=topo,
        )
        dig = v if gf_order == 2 else v.astype(jnp.uint32)
        return (
            jnp.sum(e[:, : code.k], dtype=jnp.int32),
            jnp.bitwise_xor.reduce(jnp.bitwise_xor.reduce(dig, axis=1), axis=0),
        )

    out = jax.block_until_ready(step(jax.random.fold_in(key, 999), cw))
    assert int(out[0]) == 0, f"residual {int(out[0])}"
    t0 = time.perf_counter()
    for i in range(reps):
        out = step(jax.random.fold_in(key, i), cw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    gbps = b * code.k * symbol_bits / dt / 1e9
    print(
        f"decode {code_name:18s} gf={gf_order:<3d} PER={per:<7} B={b:<5d} "
        f"bt={bt:<3d} {schedule:8s} {dt * 1e3:8.2f} ms/step  "
        f"{gbps:7.1f} Gbps info",
        flush=True,
    )
    return gbps


def bench_encode(code_name, *, b, w, gf_order, reps=8, unroll=True):
    from ldpc_erasure_codes_tpu.codes import get_code
    from ldpc_erasure_codes_tpu.ops import device_arrays
    from ldpc_erasure_codes_tpu.ops.pallas_encode import (
        encode_packed_vmem,
        static_enc_topology,
    )
    from ldpc_erasure_codes_tpu.ops.pallas_peel import default_b_tile

    code = get_code(code_name)
    arrays = device_arrays(code)
    bt = default_b_tile(code.n, w if gf_order == 2 else w // 4)
    topo = static_enc_topology(arrays, code.k) if unroll else None
    key = jax.random.key(0)
    if gf_order == 2:
        src32 = jax.random.bits(key, (b, code.k, w), dtype=jnp.uint32)
        symbol_bits = 32 * w
    else:
        # uint32 argument + in-jit bitcast: a materialized uint8 argument
        # would pay a physical (32,128)->(8,128) retile (~15 ms at the NB
        # shape, measured in bench_nb_stages).
        src32 = jax.random.bits(key, (b, code.k, w // 4), dtype=jnp.uint32)
        symbol_bits = 8 * w
    src32 = jax.block_until_ready(src32)

    @jax.jit
    def step(src32):
        if gf_order == 2:
            src = src32
        else:
            src = jax.lax.bitcast_convert_type(src32, jnp.uint8).reshape(
                b, code.k, w
            )
        cw = encode_packed_vmem(arrays, src, gf_order=gf_order, b_tile=bt,
                                tiled_out=True, static_topo=topo)
        return jnp.bitwise_xor.reduce(
            jnp.bitwise_xor.reduce(cw.astype(jnp.uint32), axis=1), axis=0
        )

    out = jax.block_until_ready(step(src32))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(src32)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    gbps = b * code.k * symbol_bits / dt / 1e9
    print(
        f"encode {code_name:18s} gf={gf_order:<3d} B={b:<5d} bt={bt:<3d} "
        f"{'unrolled' if unroll else 'dynamic':8s} {dt * 1e3:8.2f} ms/step  "
        f"{gbps:7.1f} Gbps info",
        flush=True,
    )
    return gbps


def main() -> None:
    quick = "--quick" in sys.argv
    b2 = 256 if quick else 2048
    b1 = 128 if quick else 1024
    b5 = 64 if quick else 512
    # Binary decode at the other registry codes' deep PERs (round-2 rows:
    # 111.4 / 72.2 Gbps with schedule="seq").
    bench_decode("n2000_k1000", 0.3438, b=b2)
    bench_decode("n4000_k2000", 0.3438, b=b1)
    # GF(256) standalone decode/encode under unrolled (round-2 dynamic rows:
    # 189.0 / 108.2 Gbps at these shapes).
    bench_decode("n2040_k1530_gf256", 0.1406, b=b5, w=1024, gf_order=256)
    bench_encode("n2040_k1530_gf256", b=b5, w=1024, gf_order=256)
    # Binary encode under unrolled at the round-2 record shape (588 dynamic).
    bench_encode("n2040_k1530", b=b1, w=256, gf_order=2)


if __name__ == "__main__":
    main()
