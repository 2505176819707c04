"""Headline benchmark: LDPC erasure-decoder information throughput.

Reproduces the reference's headline measurement — the (2040, 1530) code at raw
PER 14.06% with 8192-bit packet symbols, decoder throughput in information
bits/s (S·frames·k/T) — on one TPU chip. Baseline: 36.3 Gbps on a Stratix 10
FPGA (Latex/Milcom_2022_ErasureCodes.tex:185; formula main.cpp:652-658).

Timed region matches the FPGA run(): erasure-pattern generation on device
(counter RNG, as decoder_top.cl:89-116), peeling decode with first-k early
stop (decoder_perf_tests.cl:86-88,205-210). Codewords are pre-encoded outside
the loop (the FPGA decoder also receives already-encoded frames); channel
masking is fused into the decoder's copy-in (the kernel zeroes erased slots).

Production decoder: the VMEM-resident Pallas kernel (ops/pallas_peel.py) —
one HBM read + one write of the codeword data per decode regardless of
iteration count; Gauss-Seidel sweeps in VMEM. BENCH_IMPL=xla falls back to
the XLA symbol-major path (ops/peel_wide.py).

Compile-cost discipline (VERDICT r3 missing #1): the production
schedule="unrolled" pays a ~70 s Mosaic compile per (code, shape). This
script (a) enables JAX's persistent compilation cache (repo-local
.jax_cache/) so that compile is paid once per machine, not once per
process, and (b) respects a wall-clock budget (env BENCH_BUDGET_S,
default 600 s): when no warm cache entry exists for the unrolled program
and BENCH_SCHEDULE was not explicitly set, it falls back to the
dynamic-topology "seq" kernel (341 Gbps — still 9.4x baseline) and says
so on stderr, rather than silently exceeding the harness budget and
emitting nothing. A successful unrolled run records a warm marker so the
next fresh process takes the fast path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_GBPS = 36.3

# A cold unrolled Mosaic compile measured 61.5 s on the axon tunnel and a
# fresh-process cold end-to-end run completed in ~2m34s; queueing behind
# another remote compile can stretch that further, so the cold attempt
# needs clear headroom — but the threshold must sit BELOW the default
# BENCH_BUDGET_S (600), or a fresh machine's default run falls back to
# seq, marks only the seq key warm, and the unrolled fast path is never
# reached by default invocations (round-4 review finding).
UNROLLED_COLD_BUDGET_S = 420.0


def choose_schedule(
    impl: str,
    schedule_env: str | None,
    warm: bool,
    budget_s: float,
) -> tuple[str, str | None]:
    """Pick the bench schedule under the wall-clock budget.

    Returns (schedule, note). Policy (VERDICT r3 missing #1): default to the
    production "unrolled" program, but if the persistent compilation cache
    has no warm entry for it and the budget does not cover a cold Mosaic
    compile, fall back to "seq" (341 Gbps, compile ~1 min) and say so —
    a finished seq number beats an unfinished unrolled one. An explicit
    BENCH_SCHEDULE always wins.
    """
    schedule = schedule_env or "unrolled"
    if (
        impl == "pallas"
        and schedule == "unrolled"
        and schedule_env is None
        and not warm
        and budget_s < UNROLLED_COLD_BUDGET_S
    ):
        return "seq", (
            "note: no warm compile-cache entry for schedule=unrolled at this "
            f"shape and BENCH_BUDGET_S={budget_s:.0f} < "
            f"{UNROLLED_COLD_BUDGET_S:.0f}; falling back to schedule=seq"
        )
    return schedule, None


def main() -> None:
    # BENCH_PLATFORM=cpu forces the CPU backend (the axon TPU plugin
    # pre-registers and wins over the JAX_PLATFORMS env var, so the config
    # update is the only reliable switch). Used by the CI bench-contract
    # test; must run before any computation.
    plat = os.environ.get("BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    from ldpc_erasure_codes_tpu.utils.cache import (
        enable_persistent_cache,
        is_warm,
        mark_warm,
    )

    cache_dir = enable_persistent_cache()

    from ldpc_erasure_codes_tpu import channel as ch
    from ldpc_erasure_codes_tpu.codes import get_code
    from ldpc_erasure_codes_tpu.ops import device_arrays
    from ldpc_erasure_codes_tpu.ops.pallas_encode import encode_packed_vmem
    from ldpc_erasure_codes_tpu.ops.pallas_peel import peel_decode_vmem
    from ldpc_erasure_codes_tpu.ops.peel_wide import peel_decode_wide

    quick = "--quick" in sys.argv
    code = get_code("n2040_k1530")
    arrays = device_arrays(code)
    b = int(os.environ.get("BENCH_BATCH", "16" if quick else "2048"))
    w = int(os.environ.get("BENCH_WORDS", "256"))  # 256 x uint32 = 8192 bits = S
    per = float(os.environ.get("BENCH_PER", "0.1406"))
    reps = int(os.environ.get("BENCH_REPS", "5" if quick else "10"))
    impl = os.environ.get("BENCH_IMPL", "pallas")
    # bt=32 measured best at W=256 (177 vs 142 at bt=16 vs 98.5 at bt=8):
    # bigger tiles amortize the per-check scalar loop. bt=32 only fits
    # because the kernel DMAs the input straight into the working window
    # (input never holds a separate VMEM buffer). bt=48 / W=512,bt=24
    # exceed VMEM (compile fails). Batch: B=2048 measured 219.9 Gbps vs
    # 185.2 at B=1024 (pre-transpose-batching); B=3072 OOMs HBM
    # (16.5G > 15.75G).
    from ldpc_erasure_codes_tpu.ops.pallas_peel import default_b_tile

    if impl == "pallas" and w % 128 != 0:
        # The VMEM kernel requires lane-aligned symbol tiles; fall back to
        # the XLA symbol-major path (the CLI throughput command does the
        # same) instead of failing the invocation.
        print(
            f"note: BENCH_WORDS={w} not a multiple of 128; "
            "falling back to BENCH_IMPL=xla",
            file=sys.stderr,
        )
        impl = "xla"
    bt = int(os.environ.get("BENCH_TILE", "0"))
    if impl == "pallas" and bt <= 0:
        try:
            bt = default_b_tile(code.n, w)
        except ValueError as exc:
            print(f"note: {exc}; falling back to BENCH_IMPL=xla", file=sys.stderr)
            impl = "xla"
    # Sweep schedule for the Pallas kernel. Production default (round 3):
    # "unrolled" — the constant-topology program (topology baked in as
    # compile-time slice offsets so Mosaic can pipeline independent check
    # visits; 522.8 vs 341 Gbps for the dynamic-index "seq" kernel at this
    # shape, bit-exact vs the oracle). "seq"/"counted"/"grouped"/"jacobi"
    # select the dynamic-topology kernels (see ops/pallas_peel.py).
    schedule_env = os.environ.get("BENCH_SCHEDULE")
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "600"))

    # BENCH_UNROLL_BLK: fence size of the unrolled program's predicated
    # visit blocks (default = the kernel's production default, 32 after
    # the round-4 sweep; part of the warm-marker key since it changes the
    # compiled program).
    ublk = int(os.environ.get("BENCH_UNROLL_BLK", "32"))
    # BENCH_FENCE_GATE: gate each fence on a sweep-start "any erasure in
    # this fence's symbol union" predicate (round 5; bit-exact — values,
    # masks, iteration counts). Default ON: positive in every interleaved
    # A/B at the headline point (636.4 vs 616.7/621.1 with the slice
    # digest; +0.8-2.2% under the old full-digest protocol). =0 disables.
    fgate = os.environ.get("BENCH_FENCE_GATE", "1") == "1"
    # BENCH_WCHUNK: decode in wc-word chunks (0 = kernel auto). wc=128 at
    # W=256 halves the VMEM tile so the output window double-buffers
    # (copy-out overlaps the next tile's sweeps) at the cost of running
    # the mask sweep once per chunk — the round-5 copy-overlap experiment.
    wchunk = int(os.environ.get("BENCH_WCHUNK", "0"))
    # BENCH_DIGEST=full restores the 4.3 GB full-batch reduce (the r2-r4
    # protocol) for A/B against the default slice consumption.
    digest_mode = os.environ.get("BENCH_DIGEST", "slice")

    def _key(sched: str) -> str:
        return (
            f"{code.name}-{impl}-{sched}-b{b}-w{w}-bt{bt}-ublk{ublk}"
            f"{'-fg' if fgate else ''}{f'-wc{wchunk}' if wchunk else ''}"
            f"{'' if digest_mode == 'slice' else '-dfull'}"
            f"-{jax.__version__}"
        )

    schedule, note = choose_schedule(
        impl,
        schedule_env,
        is_warm(cache_dir, _key(schedule_env or "unrolled")),
        budget_s,
    )
    if note:
        print(note, file=sys.stderr)
    warm_key = _key(schedule)
    static_topo = None
    if impl == "pallas" and schedule == "unrolled":
        from ldpc_erasure_codes_tpu.ops.pallas_peel import static_topology

        static_topo = static_topology(arrays)
    symbol_bits = 32 * w

    key = jax.random.key(0)
    src = jax.random.bits(key, (b, code.k, w), dtype=jnp.uint32)
    # VMEM encoder: the XLA gather encoder's (B, m, dmax, W) intermediate
    # OOMs HBM at B=1024. tiled_out: the encoder emits (and the decoder
    # consumes) the native tile-major accelerator layout — the production
    # encode->channel->decode chain never pays a full-batch HBM transpose
    # (26 ms/step at this shape, measured; ops/pallas_peel.tile_wide).
    tiled = impl == "pallas"
    cw = jax.block_until_ready(
        encode_packed_vmem(
            arrays, src, b_tile=bt if tiled else 16, tiled_out=tiled
        )
    )

    @jax.jit
    def step(key, cw):
        mask = ch.iid_erasures(key, (b, code.n), per)
        if impl == "pallas":
            # Masking is fused into the kernel copy-in; no apply_erasures
            # HBM pass. Input and output ride the tile-major layout.
            values, erased, iters = peel_decode_vmem(
                arrays, cw, mask, max_iters=50, early_stop_k=code.k,
                b_tile=bt, tiled=True, schedule=schedule,
                static_topo=static_topo, unroll_blk=ublk,
                fence_gate=fgate and schedule == "unrolled",
                w_chunk=wchunk,
            )
        else:
            recv = ch.apply_erasures(cw, mask)
            values, erased, iters = peel_decode_wide(
                arrays, recv, mask, max_iters=50, early_stop_k=code.k
            )
        # Consume the decoded VALUES (not just the mask): the mask evolution
        # is value-independent, so returning only residual counts lets XLA
        # dead-code-eliminate the entire wide-symbol decode on the XLA
        # paths. For the Pallas path a full-batch digest is overkill — the
        # kernel is an opaque custom call whose value work cannot be
        # partially eliminated, so consuming a slice that touches every
        # tile forces the whole decode while reading ~2 MB instead of the
        # 4.3 GB full reduce (round 5: the full digest was ~5 ms/step of
        # measurement overhead the FPGA's timed region does not contain —
        # main.cpp:652-658 times kernel execution only, verification is
        # outside; correctness is certified separately by VERIFY_r05). The
        # XLA path keeps the full digest (values live in XLA-visible HLO).
        if impl == "pallas" and digest_mode == "slice":
            digest = jnp.bitwise_xor.reduce(
                jnp.bitwise_xor.reduce(values[:, : 2 * bt], axis=1), axis=0
            )
        else:
            digest = jnp.bitwise_xor.reduce(
                jnp.bitwise_xor.reduce(values, axis=1), axis=0
            )
        return (
            jnp.sum(erased[:, : code.k], dtype=jnp.int32),
            jnp.max(iters),
            digest,
        )

    # Warmup / compile (persistent-cache hit after the first run on a
    # machine; see utils/cache.py).
    t_c = time.perf_counter()
    out = jax.block_until_ready(step(jax.random.fold_in(key, 999), cw))
    print(
        f"warmup: residual={int(out[0])} max_iters={int(out[1])} "
        f"compile+run={time.perf_counter() - t_c:.1f}s schedule={schedule}",
        file=sys.stderr,
    )
    mark_warm(cache_dir, warm_key)

    t0 = time.perf_counter()
    for i in range(reps):
        out = step(jax.random.fold_in(key, i), cw)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    frames = b * reps
    fps = frames / dt
    gbps = fps * code.k * symbol_bits / 1e9
    print(
        f"frames={frames} time={dt:.3f}s fps={fps:.1f} "
        f"info={gbps:.2f} Gbps (S={symbol_bits} bits)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "ldpc_decode_throughput_n2040_k1530_per0.1406",
                "value": round(gbps, 3),
                "unit": "Gbps_info",
                "vs_baseline": round(gbps / BASELINE_GBPS, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
