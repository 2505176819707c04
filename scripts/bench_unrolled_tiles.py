"""Unrolled-schedule frame-tile growth experiment (round 3 follow-up).

W-chunked tile growth (bt=64/wc=128 at W=256) measured NEGATIVE for the
dynamic-topology `seq` schedule (268.3 vs 327 Gbps — VALIDATION.md): the
per-chunk mask sweeps out-cost the 2x per-check scalar amortization when the
sweep is visit-serialization-bound. The `unrolled` schedule removed that
serialization constraint, so the trade may flip — this script A/Bs the
headline point (B=2048, W=256, PER .1406, tile-major I/O, values consumed)
across (b_tile, w_chunk) under `schedule="unrolled"`.

Run: python scripts/bench_unrolled_tiles.py [bt:wc ...]   (default battery)
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
    b, w, per, reps = 2048, 256, 0.1406, 10
    configs = [
        (int(a.split(":")[0]), int(a.split(":")[1])) for a in sys.argv[1:]
    ] or [(32, 0), (64, 128), (48, 128)]
    topo = static_topology(arrays)

    from ldpc_erasure_codes_tpu.ops.pallas_peel import tile_wide

    key = jax.random.key(0)
    src = jax.random.bits(key, (b, code.k, w), dtype=jnp.uint32)
    # The tile-major layout is a function of the decode b_tile: encode ONCE
    # in the flat layout and retile per config (ADVICE r3: a single bt=32
    # tiled encode made every grown-tile config fail the decoder's shape
    # validation at trace time, and the broad except mislabeled that as a
    # compile failure; encoding per-config with b_tile=bt instead OOMs the
    # encoder's VMEM at bt=64 — the decoder's tile budget is not the
    # encoder's).
    cw_flat = jax.block_until_ready(
        encode_packed_vmem(arrays, src, b_tile=32, tiled_out=False)
    )
    del src  # HBM: flat cw (4.3 GB) + per-config tile + decode out ~= 13 GB

    cw = out = None
    for bt, wc in configs:
        cw = out = None  # free the previous config's tile + outputs first
        cw = jax.block_until_ready(jax.jit(tile_wide, static_argnums=1)(cw_flat, bt))
        @jax.jit
        def step(key, cw, bt=bt, wc=wc):
            mask = ch.iid_erasures(key, (b, code.n), per)
            values, erased, iters = peel_decode_vmem(
                arrays, cw, mask, max_iters=50, early_stop_k=code.k,
                b_tile=bt, tiled=True, schedule="unrolled",
                static_topo=topo, w_chunk=wc,
            )
            digest = jnp.bitwise_xor.reduce(
                jnp.bitwise_xor.reduce(values, axis=1), axis=0
            )
            return jnp.sum(erased[:, : code.k], dtype=jnp.int32), digest

        try:
            t0 = time.perf_counter()
            out = jax.block_until_ready(step(jax.random.fold_in(key, 999), cw))
            compile_s = time.perf_counter() - t0
        except ValueError:
            # Config/shape errors are experiment bugs, not measurements —
            # surface them instead of recording a bogus negative.
            raise
        except Exception as exc:  # Mosaic compile / VMEM failures
            print(f"bt={bt} wc={wc}: FAILED ({type(exc).__name__}: "
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
            f"bt={bt} wc={wc or w}: {dt * 1e3:6.1f} ms/step  "
            f"{gbps:6.1f} Gbps info  (compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
