"""Phase breakdown of the headline VMEM peel decode step (real TPU).

Where do the 78.5 ms/step at B=2048/W=256/bt=32 actually go? Each row below
isolates one component of the bench.py step (all honest: decoded values are
consumed via XOR digest; see VALIDATION.md measurement-integrity note):

  digest      — XOR digest of the tiled codewords only (no decode): the
                fixed consume cost shared by every decode measurement.
  per0        — full decode call at PER=0: copy-in DMA + channel-mask fuse +
                ONE all-idle sweep (every check pays the count phase, no
                check fires) + copy-out + digest. per0 - digest ~= HBM copy
                + one sweep of pure count phase.
  perX itK    — decode at the headline PER with max_iters=K: the marginal
                cost of sweep K is the difference between consecutive rows
                (early sweeps are event-dense, late sweeps idle).
  knob rows   — skip_idle / cond_stores / schedule A/B at the full setting.

Usage: python scripts/bench_peel_phases.py [--quick]
Writes one line per measurement; run on the real TPU chip only.
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
    w = 256
    bt = 32
    per = 0.1406
    reps = 3 if quick else 10

    key = jax.random.key(0)
    src = jax.random.bits(key, (b, code.k, w), dtype=jnp.uint32)
    cw = jax.block_until_ready(
        encode_packed_vmem(arrays, src, b_tile=bt, tiled_out=True)
    )

    def timed(name, fn):
        out = jax.block_until_ready(fn(jax.random.fold_in(key, 999), cw))
        t0 = time.perf_counter()
        for i in range(reps):
            out = fn(jax.random.fold_in(key, i), cw)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        gbps = b * code.k * 32 * w / dt / 1e9
        print(f"{name:40s} {dt * 1e3:8.2f} ms/step  ({gbps:7.1f} Gbps-equiv)",
              flush=True)
        return dt

    def digest_of(values):
        return jnp.bitwise_xor.reduce(
            jnp.bitwise_xor.reduce(values, axis=1), axis=0
        )

    @jax.jit
    def digest_only(k, cw):
        mask = ch.iid_erasures(k, (b, code.n), per)
        return digest_of(cw), jnp.sum(mask)

    timed("digest+mask only (no decode)", digest_only)

    def mk(per_, **kw):
        @jax.jit
        def step(k, cw):
            mask = ch.iid_erasures(k, (b, code.n), per_)
            values, erased, iters = peel_decode_vmem(
                arrays, cw, mask, early_stop_k=code.k, b_tile=bt,
                tiled=True, **kw,
            )
            return (
                jnp.sum(erased[:, : code.k], dtype=jnp.int32),
                jnp.max(iters),
                digest_of(values),
            )
        return step

    timed("decode PER=0 (copy + 1 idle sweep)", mk(0.0, max_iters=50))
    for it in (1, 2, 3, 4, 5):
        timed(f"decode PER=.1406 max_iters={it}", mk(per, max_iters=it))
    base = timed("decode PER=.1406 max_iters=50 [prod]", mk(per, max_iters=50))
    timed("  + skip_idle=False", mk(per, max_iters=50, skip_idle=False))
    timed("  + cond_stores=True", mk(per, max_iters=50, cond_stores=True))
    if not quick:
        timed("  + schedule=jacobi", mk(per, max_iters=50, schedule="jacobi"))
    print(f"baseline step: {base * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
