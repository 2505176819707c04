"""Is the peel sweep op-latency-bound or VMEM-bandwidth-bound? (real TPU)

Same op COUNT, half the BYTES: W=128 vs W=256 at identical B/bt/PER. If the
step time barely moves, the sweep is bound by op issue/latency (tiny-slice
overheads); if it nearly halves, it is VMEM-bandwidth-bound on the wide row
traffic. Plus: the all-idle wide sweep cost (PER=0, skip_idle=False) to
price one sweep's unconditional wide work.

Run: python scripts/bench_boundedness.py
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

    code = get_code("n2040_k1530")
    arrays = device_arrays(code)
    b, bt, per, reps = 2048, 32, 0.1406, 10
    key = jax.random.key(0)

    def digest_of(values):
        return jnp.bitwise_xor.reduce(
            jnp.bitwise_xor.reduce(values, axis=1), axis=0
        )

    for name, w, per_, kw in [
        ("W=256 seq skip_idle=F  PER=.1406", 256, per, dict(skip_idle=False)),
        ("W=128 seq skip_idle=F  PER=.1406", 128, per, dict(skip_idle=False)),
        ("W=256 seq skip_idle=F  PER=0", 256, 0.0, dict(skip_idle=False)),
        ("W=128 seq skip_idle=T  PER=.1406", 128, per, dict()),
    ]:
        src = jax.random.bits(key, (b, code.k, w), dtype=jnp.uint32)
        cw = jax.block_until_ready(
            encode_packed_vmem(arrays, src, b_tile=bt, tiled_out=True)
        )

        @jax.jit
        def step(k, cw, w=w, per_=per_, kw=kw):
            mask = ch.iid_erasures(k, (b, code.n), per_)
            values, erased, iters = peel_decode_vmem(
                arrays, cw, mask, max_iters=50, early_stop_k=code.k,
                b_tile=bt, tiled=True, schedule="seq", **kw,
            )
            return (
                jnp.sum(erased[:, : code.k], dtype=jnp.int32),
                jnp.max(iters),
                digest_of(values),
            )

        try:
            out = jax.block_until_ready(step(jax.random.fold_in(key, 999), cw))
            t0 = time.perf_counter()
            for i in range(reps):
                out = step(jax.random.fold_in(key, i), cw)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / reps
            gbps = b * code.k * 32 * w / dt / 1e9
            print(f"{name:36s} {dt * 1e3:8.2f} ms/step  {gbps:7.1f} Gbps",
                  flush=True)
        except Exception as e:
            print(f"{name:36s} FAILED: {e}", flush=True)
        del cw


if __name__ == "__main__":
    main()
