"""TPU micro-benchmark: VMEM-resident Pallas decoder vs the XLA wide path.

Run on the real chip:  python scripts/bench_pallas_peel.py [--quick]
Env overrides: BP_CODE, BP_BATCH, BP_WORDS, BP_PER, BP_REPS, BP_TILE,
BP_SKIP_IDLE, BP_COND_STORES (default 0 — measured-negative research knob,
see ops/pallas_peel.py).

Validates fixed-point equality against peel_decode_wide on the same draw
first (values + mask), then times both with the decoded values consumed
(XOR digest — see VALIDATION.md measurement-integrity note).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ldpc_erasure_codes_tpu import channel as ch
from ldpc_erasure_codes_tpu.codes import get_code
from ldpc_erasure_codes_tpu.ops import device_arrays, encode_packed
from ldpc_erasure_codes_tpu.ops.pallas_peel import peel_decode_vmem
from ldpc_erasure_codes_tpu.ops.peel_wide import peel_decode_wide


def main() -> None:
    quick = "--quick" in sys.argv
    code = get_code(os.environ.get("BP_CODE", "n2040_k1530"))
    arrays = device_arrays(code)
    b = int(os.environ.get("BP_BATCH", "64" if quick else "256"))
    w = int(os.environ.get("BP_WORDS", "256"))
    per = float(os.environ.get("BP_PER", "0.1406"))
    reps = int(os.environ.get("BP_REPS", "3" if quick else "10"))
    bt = int(os.environ.get("BP_TILE", "8"))
    skip_idle = os.environ.get("BP_SKIP_IDLE", "1") == "1"
    cond_stores = os.environ.get("BP_COND_STORES", "0") == "1"
    symbol_bits = 32 * w

    key = jax.random.key(0)
    src = jax.random.bits(key, (b, code.k, w), dtype=jnp.uint32)
    cw = jax.block_until_ready(encode_packed(arrays, src))
    print(f"encoded B={b} W={w} per={per} bt={bt} skip_idle={skip_idle} "
          f"cond_stores={cond_stores}", flush=True)

    def digest(values):
        return jnp.bitwise_xor.reduce(
            jnp.bitwise_xor.reduce(values, axis=1), axis=0
        )

    @jax.jit
    def step_pallas(key, cw):
        mask = ch.iid_erasures(key, (b, code.n), per)
        # No apply_erasures: masking is fused into the kernel copy-in.
        values, erased, iters = peel_decode_vmem(
            arrays, cw, mask, max_iters=50, early_stop_k=code.k,
            b_tile=bt, skip_idle=skip_idle, cond_stores=cond_stores,
        )
        return (jnp.sum(erased[:, : code.k], dtype=jnp.int32),
                jnp.max(iters), digest(values))

    @jax.jit
    def step_xla(key, cw):
        mask = ch.iid_erasures(key, (b, code.n), per)
        recv = ch.apply_erasures(cw, mask)
        values, erased, iters = peel_decode_wide(
            arrays, recv, mask, max_iters=50, early_stop_k=code.k
        )
        return (jnp.sum(erased[:, : code.k], dtype=jnp.int32),
                jnp.max(iters), digest(values))

    # Fixed-point equality on one draw.
    kchk = jax.random.fold_in(key, 12345)
    mask = ch.iid_erasures(kchk, (b, code.n), per)
    recv = ch.apply_erasures(cw, mask)
    t0 = time.perf_counter()
    vp, ep, ip = jax.block_until_ready(
        peel_decode_vmem(arrays, cw, mask, max_iters=50,
                         early_stop_k=code.k, b_tile=bt,
                         skip_idle=skip_idle, cond_stores=cond_stores)
    )
    print(f"pallas compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    vx, ex, ix = jax.block_until_ready(
        peel_decode_wide(arrays, recv, mask, max_iters=50,
                         early_stop_k=code.k)
    )
    import numpy as np

    # Contract under early_stop_k: the first-k region is schedule-invariant;
    # parity-region residuals legitimately differ between stopping schedules
    # (per-tile vs whole-batch). Compare first k + resolved-value correctness.
    k = code.k
    epn, exn = np.asarray(ep), np.asarray(ex)
    vpn, vxn = np.asarray(vp), np.asarray(vx)
    cwn = np.asarray(cw)
    same_mask = bool((epn[:, :k] == exn[:, :k]).all())
    same_vals = bool((vpn[:, :k] == vxn[:, :k]).all())
    res_ok = all(
        (vpn[f][~epn[f]] == cwn[f][~epn[f]]).all() for f in range(b)
    )
    print(f"first-k equal: mask={same_mask} values={same_vals} "
          f"resolved-correct={res_ok} "
          f"iters pallas<= {int(np.asarray(ip).max())} "
          f"xla<= {int(np.asarray(ix).max())}", flush=True)
    if not (same_mask and same_vals and res_ok):
        print("MISMATCH — aborting timings", flush=True)
        sys.exit(1)

    for name, step in [("pallas", step_pallas), ("xla_wide", step_xla)]:
        out = jax.block_until_ready(step(jax.random.fold_in(key, 999), cw))
        print(f"{name} warmup: residual={int(out[0])} "
              f"max_iters={int(out[1])}", flush=True)
        t0 = time.perf_counter()
        for i in range(reps):
            out = step(jax.random.fold_in(key, i), cw)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        fps = b * reps / dt
        gbps = fps * code.k * symbol_bits / 1e9
        print(f"{name}: frames={b*reps} time={dt:.3f}s fps={fps:.1f} "
              f"info={gbps:.2f} Gbps (S={symbol_bits})", flush=True)


if __name__ == "__main__":
    main()
