"""On-chip sweep-schedule battery for the VMEM-resident peeling decoder.

Measures ``schedule="seq"`` (MATLAB Gauss-Seidel parity) vs
``schedule="jacobi"`` (MXU-count detection; ops/pallas_peel.py) at the
headline operating point — (2040, 1530), PER .1406, S=8192 — plus a b_tile
sweep, the GF(256) mode, and the wider-symbol points (S=16384/32768).
Throughput accounting matches bench.py (information bits, decoded values
consumed via XOR digest). Run on the real chip:

    python scripts/bench_schedules.py

Each leg is independent (a VMEM-OOM compile failure is reported and the
battery continues). Results land as flush=True lines; expect 1-4 min of
remote compile per new shape.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ldpc_erasure_codes_tpu import channel as ch
from ldpc_erasure_codes_tpu.codes import get_code
from ldpc_erasure_codes_tpu.ops import device_arrays
from ldpc_erasure_codes_tpu.ops.pallas_encode import encode_packed_vmem
from ldpc_erasure_codes_tpu.ops.pallas_peel import peel_decode_vmem

B, W, PER = 2048, 256, 0.1406
code = get_code("n2040_k1530")
arrays = device_arrays(code)
key = jax.random.key(0)


def run(schedule, bt, reps=10, per=PER, max_iters=50, W=W, B=B, w_chunk=0,
        code_name="n2040_k1530"):
    code = get_code(code_name)
    arrays = device_arrays(code)
    src = jax.random.bits(key, (B, code.k, W), dtype=jnp.uint32)
    # The encoder W-chunks like the decoder, so the tiled handoff works at
    # any (bt, W) the decoder runs. Unchunked baseline legs (w_chunk=-1)
    # must use a tile the UNCHUNKED kernels fit. If the encoder can't fit
    # the decoder's tile, encode at a safe tile and re-tile outside the
    # timed region (encode is not what these legs measure).
    try:
        cw = jax.block_until_ready(
            encode_packed_vmem(
                arrays, src, b_tile=bt, tiled_out=True, w_chunk=w_chunk
            )
        )
    except Exception as e:
        print(f"   (encoder fallback at bt={bt}: {type(e).__name__})",
              flush=True)
        from ldpc_erasure_codes_tpu.ops.pallas_peel import tile_wide
        cw = jax.block_until_ready(
            tile_wide(encode_packed_vmem(arrays, src, b_tile=16), bt)
        )
    del src

    @jax.jit
    def step(k, cw):
        mask = ch.iid_erasures(k, (B, code.n), per)
        values, erased, iters = peel_decode_vmem(
            arrays, cw, mask, max_iters=max_iters, early_stop_k=code.k,
            b_tile=bt, tiled=True, schedule=schedule, w_chunk=w_chunk,
        )
        digest = jnp.bitwise_xor.reduce(
            jnp.bitwise_xor.reduce(values, axis=1), axis=0
        )
        return jnp.sum(erased[:, : code.k], dtype=jnp.int32), jnp.max(iters), digest

    k0 = jax.random.fold_in(key, 7)
    t0 = time.perf_counter()
    out = jax.block_until_ready(step(k0, cw))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(reps):
        out = step(jax.random.fold_in(key, i), cw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    gbps = B * code.k * 32 * W / dt / 1e9
    print(
        f"{code_name} {schedule:6s} bt={bt:2d} per={per}: {dt*1e3:7.2f} ms  "
        f"{gbps:7.1f} Gbps  resid={int(out[0])} maxit={int(out[1])} "
        f"(compile {tc:.0f}s)",
        flush=True,
    )
    return dt


def run_nb(schedule, bt, reps=10, B=256, Wb=1024, tiled=False):
    nb = get_code("n2040_k1530").lift_to_gf256(seed=0)
    nba = device_arrays(nb)
    src = jax.random.bits(key, (B, nb.k, Wb), dtype=jnp.uint8)
    cw = jax.block_until_ready(
        encode_packed_vmem(
            nba, src, gf_order=256, b_tile=bt if tiled else 8,
            tiled_out=tiled,
        )
    )

    @jax.jit
    def step(k2, cw):
        mask = ch.iid_erasures(k2, (B, nb.n), PER)
        v, e, it = peel_decode_vmem(
            nba, cw, mask, max_iters=50, early_stop_k=nb.k, b_tile=bt,
            gf_order=256, schedule=schedule, tiled=tiled,
        )
        dig = jnp.bitwise_xor.reduce(jnp.bitwise_xor.reduce(v, axis=1), axis=0)
        return jnp.sum(e[:, : nb.k], dtype=jnp.int32), jnp.max(it), dig

    t0 = time.perf_counter()
    out = jax.block_until_ready(step(jax.random.fold_in(key, 999), cw))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(reps):
        out = step(jax.random.fold_in(key, i), cw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    gbps = B * nb.k * Wb * 8 / dt / 1e9
    print(
        f"NB {schedule:6s} bt={bt:2d}: {dt*1e3:7.2f} ms  {gbps:7.1f} Gbps  "
        f"resid={int(out[0])} (compile {tc:.0f}s)",
        flush=True,
    )


print("devices:", jax.devices(), flush=True)
_only = set(sys.argv[1:])


def leg(name, fn, *a, **kw):
    if _only and name not in _only:
        return
    print(f"-- leg {name}", flush=True)
    try:
        fn(*a, **kw)
    except Exception as e:
        print(f"LEG FAILED {name} {a} {kw}: {type(e).__name__}: {str(e)[:200]}",
              flush=True)


# Run all legs, or a subset by name: python scripts/bench_schedules.py j32 s64c
leg("s32", run, "seq", 32)  # production point: expect ~78 ms / 328 Gbps
leg("j32", run, "jacobi", 32)
leg("j16", run, "jacobi", 16)
leg("nbj32", run_nb, "jacobi", 32)  # seq NB baseline: 79.3 Gbps
# NB with the tile-major handoff + batch scaling (the two levers that took
# binary 194 -> 328): the NB record (79.3) was untiled at B=256.
leg("nbs32t", run_nb, "seq", 32, tiled=True)
leg("nbs32tB1k", run_nb, "seq", 32, B=1024, tiled=True)
leg("nbs32tB512", run_nb, "seq", 32, B=512, tiled=True)
# S=16384: auto W-chunking (wc=256) keeps bt=32 — expect near the headline
# rate; the unchunked bt=16 comparison leg measured 204.5 Gbps (seq).
leg("s32w512", run, "seq", 32, W=512, B=1024)
leg("j32w512", run, "jacobi", 32, W=512, B=1024)
leg("s16w512u", run, "seq", 16, W=512, B=1024, w_chunk=-1)  # unchunked base
leg("s40", run, "seq", 40)     # bt=48 known OOM; probe the VMEM edge
leg("j40", run, "jacobi", 40)
# W-chunking decouples bt from W even at the headline W=256: wc=128 halves
# the working window, fitting bt=48/64 (2x-4x the per-check scalar
# amortization) at the cost of running the mask sweep once per chunk.
leg("s48c", run, "seq", 48, w_chunk=128)
leg("s64c", run, "seq", 64, w_chunk=128)
leg("j64c", run, "jacobi", 64, w_chunk=128)
# Registry breadth: the other production-rate codes at their deep paper
# operating points ((2000,1000) PER .3438 = tex:202; (4000,2000) has no
# published numbers — VALIDATION.md's FER section covers it).
leg("c2000", run, "seq", 32, code_name="n2000_k1000", per=0.3438)
leg("c4000", run, "seq", 16, code_name="n4000_k2000", per=0.3438, B=1024)
# S=32768: chunked wc=256 keeps the headline tile at 4 chunks/frame.
leg("s32w1024", run, "seq", 32, W=1024, B=512)
leg("s8w1024u", run, "seq", 8, W=1024, B=512, w_chunk=-1)  # unchunked base
leg("j8w1024u", run, "jacobi", 8, W=1024, B=512, w_chunk=-1)
