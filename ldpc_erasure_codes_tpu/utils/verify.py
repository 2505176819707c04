"""On-chip PASSED/FAILED verification battery (VERDICT r4 missing #1).

The reference never reports a throughput without bit-exact hardware
verification in the same run: its host harness decodes on the device,
compares every output word against the golden vectors, and prints
PASSED/FAILED (OpenCL/host/src/main.cpp:298-305,413-425). This module is
that contract for the TPU build: every production decode tier runs on the
REAL chip (CI runs the same battery in interpret mode on CPU), end to end
— encode -> channel -> decode — and asserts the decoded values and masks
bit-exactly against the encoded input, plus oracle iteration counts where
the schedule matches the MATLAB sweep.

Tiers:
  binary_unrolled  production constant-topology program (+ fence_gate)
  binary_seq       dynamic-topology fallback kernel
  nb_unrolled      GF(256) constant-topology program
  hybrid_ge        peel + packed-bit GE at a GE-firing PER (every
                   non-failed frame must reproduce its codeword exactly —
                   the on-chip value-equality check ADVICE r4 #3 asked for)
  rs_wide          RS(255,192) wide decode across e = 1..63 erasures in
                   one batch, plus an e=64 frame that must flag failed
                   (MDS bound)

Each tier yields one JSON-able record with status PASSED/FAILED; the
driver artifact (VERIFY_r05.json) is the list of records.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np


def _tier(name: str, fn: Callable[[], dict]) -> dict:
    t0 = time.perf_counter()
    try:
        detail = fn()
        status = "PASSED" if detail.pop("_ok") else "FAILED"
    except Exception as exc:  # noqa: BLE001 — a crash is a FAILED tier
        detail = {"error": f"{type(exc).__name__}: {exc}"}
        status = "FAILED"
    return {
        "tier": name,
        "status": status,
        "elapsed_s": round(time.perf_counter() - t0, 2),
        **detail,
    }


def _small_code():
    # CI / --quick CPU shapes: the full-size unrolled program exhausts the
    # CPU LLVM backend; a small generated code exercises the same kernels.
    from ldpc_erasure_codes_tpu.codes import gen_row_wise

    return gen_row_wise(
        [(16, 6)], [(48, 2)], seed=3, max_tries=40, strict_tries=4
    )


def _binary_case(b: int, w: int, per: float, seed: int, bt: int, code=None):
    import jax
    import jax.numpy as jnp

    from ldpc_erasure_codes_tpu.codes import get_code
    from ldpc_erasure_codes_tpu.ops import device_arrays
    from ldpc_erasure_codes_tpu.ops.encode import encode_packed
    from ldpc_erasure_codes_tpu.ops.pallas_encode import encode_packed_vmem

    if code is None:
        code = get_code("n2040_k1530")
    arrays = device_arrays(code)
    key = jax.random.key(seed)
    src = jax.random.bits(key, (b, code.k, w), dtype=jnp.uint32)
    if w % 128 == 0 and jax.default_backend() != "cpu":
        cw = np.asarray(encode_packed_vmem(arrays, src, b_tile=bt))
    else:
        cw = np.asarray(encode_packed(arrays, src))
    mask = np.asarray(
        jax.random.uniform(jax.random.fold_in(key, 1), (b, code.n)) < per
    )
    return code, arrays, cw, mask


def _check_peel(code, cw, mask, v, e, iters, max_iters, n_oracle=8):
    """Bit-exact contract of a full (no early stop) peel decode."""
    from ldpc_erasure_codes_tpu.utils import oracle

    v, e, iters = map(np.asarray, (v, e, iters))
    b = cw.shape[0]
    # Resolved slots must hold the codeword; erased slots must hold zero
    # (the repo invariant); the mask must equal the oracle's fixed point.
    val_bad = int((np.where(e[:, :, None], 0, v) != np.where(
        e[:, :, None], 0, cw
    )).sum())
    zero_bad = int((v[e] != 0).sum())
    mask_bad = 0
    iter_bad = 0
    for f in range(min(b, n_oracle)):
        recv_bits = np.where(
            mask[f], oracle.ERASED, (cw[f, :, 0] & 1).astype(np.int64)
        )
        o_out, o_iters = oracle.peel_decode(
            code, recv_bits, max_iters=max_iters
        )
        mask_bad += int(((o_out == oracle.ERASED) != e[f]).sum())
        iter_bad += int(o_iters != iters[f])
    # Frames beyond the oracle sample still get the value/zero checks and
    # a mask consistency check: resolved first-k implies values match.
    return {
        "_ok": val_bad == 0 and zero_bad == 0 and mask_bad == 0
        and iter_bad == 0,
        "frames": b,
        "value_mismatches": val_bad,
        "erased_nonzero": zero_bad,
        "oracle_mask_mismatches": mask_bad,
        "oracle_iter_mismatches": iter_bad,
    }


def verify_binary(
    schedule: str = "unrolled",
    *,
    b: int = 64,
    w: int = 256,
    per: float = 0.1406,
    bt: int = 32,
    fence_gate: bool = False,
    interpret: bool = False,
    code=None,
) -> dict:
    import jax.numpy as jnp

    from ldpc_erasure_codes_tpu.ops.pallas_peel import (
        peel_decode_vmem,
        static_topology,
    )

    code, arrays, cw, mask = _binary_case(b, w, per, seed=11, bt=bt,
                                          code=code)
    topo = static_topology(arrays) if schedule == "unrolled" else None
    recv = jnp.where(jnp.asarray(mask)[:, :, None], jnp.uint32(0),
                     jnp.asarray(cw))
    max_iters = 50
    v, e, iters = peel_decode_vmem(
        arrays, recv, jnp.asarray(mask), max_iters=max_iters, b_tile=bt,
        schedule=schedule, static_topo=topo, fence_gate=fence_gate,
        interpret=interpret,
    )
    return _check_peel(code, cw, mask, v, e, iters, max_iters)


def verify_nb(
    *,
    b: int = 32,
    wb: int = 1024,
    per: float = 0.1406,
    bt: int = 32,
    interpret: bool = False,
    code=None,
) -> dict:
    import jax
    import jax.numpy as jnp

    from ldpc_erasure_codes_tpu.codes import get_code
    from ldpc_erasure_codes_tpu.ops import device_arrays
    from ldpc_erasure_codes_tpu.ops.encode import encode_packed
    from ldpc_erasure_codes_tpu.ops.pallas_peel import (
        peel_decode_vmem,
        static_topology,
    )
    from ldpc_erasure_codes_tpu.utils import oracle

    if code is None:
        code = get_code("n2040_k1530_gf256")
    arrays = device_arrays(code)
    key = jax.random.key(21)
    w32 = jax.random.bits(key, (b, code.k, wb // 4), dtype=jnp.uint32)
    src = jax.lax.bitcast_convert_type(w32, jnp.uint8).reshape(
        b, code.k, wb
    )
    cw = np.asarray(encode_packed(arrays, src, gf_order=256))
    mask = np.asarray(
        jax.random.uniform(jax.random.fold_in(key, 1), (b, code.n)) < per
    )
    recv = jnp.where(jnp.asarray(mask)[:, :, None], jnp.uint8(0),
                     jnp.asarray(cw))
    topo = static_topology(arrays)
    max_iters = 50
    v, e, iters = peel_decode_vmem(
        arrays, recv, jnp.asarray(mask), max_iters=max_iters,
        gf_order=256, b_tile=bt, schedule="unrolled", static_topo=topo,
        interpret=interpret,
    )
    v, e, iters = map(np.asarray, (v, e, iters))
    val_bad = int((np.where(e[:, :, None], 0, v) != np.where(
        e[:, :, None], 0, cw
    )).sum())
    zero_bad = int((v[e] != 0).sum())
    # NB oracle (byte 0 plane) for a sample of frames: mask + iters.
    mask_bad = iter_bad = 0
    for f in range(min(b, 4)):
        recv_b = np.where(
            mask[f], oracle.ERASED, cw[f, :, 0].astype(np.int64)
        )
        o_out, o_iters = oracle.peel_decode_nb(
            code, recv_b, max_iters=max_iters
        )
        mask_bad += int(((o_out == oracle.ERASED) != e[f]).sum())
        iter_bad += int(o_iters != iters[f])
    return {
        "_ok": val_bad == 0 and zero_bad == 0 and mask_bad == 0
        and iter_bad == 0,
        "frames": b,
        "value_mismatches": val_bad,
        "erased_nonzero": zero_bad,
        "oracle_mask_mismatches": mask_bad,
        "oracle_iter_mismatches": iter_bad,
    }


def verify_hybrid(
    *,
    b: int = 64,
    w: int = 256,
    per: float = 0.1875,
    bt: int = 32,
    emax: int = 192,
    interpret: bool = False,
    code=None,
) -> dict:
    """Hybrid peel + packed-bit GE at a GE-firing PER: every non-failed
    frame must reproduce its codeword bit-exactly (ADVICE r4 #3's on-chip
    value-equality check for the binary GE path)."""
    import jax.numpy as jnp

    from ldpc_erasure_codes_tpu.ops import hybrid_decode

    code, arrays, cw, mask = _binary_case(b, w, per, seed=31, bt=bt,
                                          code=code)
    # Mask evolution is value-independent: a host replay of the sequential
    # sweep tells exactly which frames the peeler leaves stuck, i.e. how
    # many frames the GE tier actually decodes in this run.
    vi = np.asarray(arrays.vlist_idx)
    vl = np.asarray(arrays.vlist_len)
    ge_frames = 0
    for f in range(b):
        er = np.append(mask[f].copy(), False)
        for _ in range(10):
            changed = False
            for c in range(code.m):
                nbrs = vi[c, : int(vl[c])]
                if er[nbrs].sum() == 1:
                    er[nbrs] = False
                    changed = True
            if not changed or not er.any():
                break
        ge_frames += bool(er.any())
    recv = jnp.where(jnp.asarray(mask)[:, :, None], jnp.uint32(0),
                     jnp.asarray(cw))
    impl = "gather" if interpret else "vmem"
    if impl == "vmem":
        # PRODUCTION configuration (bench_hybrid_values.py / CLAUDE.md):
        # tile-major layout riding straight through, constant-topology
        # unrolled peel, and the tile-direct GE branch with the baked
        # tiled syndrome kernel (ops/pallas_synd.py via
        # ge_solve_packed(static_topo=)) — so a Mosaic/layout regression
        # in ANY production stage fails this tier, not just the seq path.
        from ldpc_erasure_codes_tpu.ops import tile_wide, untile_wide
        from ldpc_erasure_codes_tpu.ops.pallas_peel import static_topology

        topo = static_topology(arrays)
        v, e, iters, failed = hybrid_decode(
            arrays, tile_wide(recv, bt), jnp.asarray(mask), peel_iters=10,
            emax=emax, impl=impl, ge_subbatch=min(b, 64), b_tile=bt,
            tiled=True, static_topo=topo,
        )
        v = untile_wide(v, b, code.n)
    else:
        v, e, iters, failed = hybrid_decode(
            arrays, recv, jnp.asarray(mask), peel_iters=10, emax=emax,
            impl=impl, ge_subbatch=min(b, 64), b_tile=bt,
        )
    v, e, failed = map(np.asarray, (v, e, failed))
    ok_f = ~failed
    val_bad = int((v[ok_f] != cw[ok_f]).sum())
    mask_bad = int(e[ok_f].sum())  # non-failed frames must be fully solved
    return {
        "_ok": val_bad == 0 and mask_bad == 0 and bool(ok_f.any())
        and ge_frames > 0,
        "frames": b,
        "ge_frames": ge_frames,
        "failed_frames": int(failed.sum()),
        "value_mismatches": val_bad,
        "residual_on_solved": mask_bad,
    }


def verify_rs(
    *,
    b: int = 64,
    wb: int = 1024,
    interpret: bool = False,
) -> dict:
    """RS(255,192) wide decode, e spread over 1..63 across the batch + one
    frame at e = 64 that must flag failed (the MDS bound)."""
    import jax
    import jax.numpy as jnp

    from ldpc_erasure_codes_tpu.ops import device_arrays
    from ldpc_erasure_codes_tpu.rs import rs_code, rs_decode_wide, rs_encode

    code = rs_code(255, 192)
    arrays = device_arrays(code)
    key = jax.random.key(41)
    w32 = jax.random.bits(key, (b, code.k, wb // 4), dtype=jnp.uint32)
    src = jax.lax.bitcast_convert_type(w32, jnp.uint8).reshape(
        b, code.k, wb
    )
    cw = np.asarray(rs_encode(arrays, src))
    rng = np.random.default_rng(5)
    mask = np.zeros((b, code.n), bool)
    want_fail = np.zeros(b, bool)
    for f in range(b):
        if f < b - 1:  # spread e over 1..63 (full coverage at b >= 64)
            e = 1 + round((b - 2 and f * 62 / (b - 2)) or 0)
        else:
            e = 64  # beyond the MDS bound: must flag failed
        mask[f, rng.choice(code.n, e, replace=False)] = True
        want_fail[f] = e > code.n - code.k
    recv = jnp.where(jnp.asarray(mask)[:, :, None], jnp.uint8(0),
                     jnp.asarray(cw))
    v, e_out, failed = rs_decode_wide(
        arrays, recv, jnp.asarray(mask)
    )
    v, failed = np.asarray(v), np.asarray(failed)
    flag_bad = int((failed != want_fail).sum())
    ok_f = ~failed
    val_bad = int((v[ok_f] != cw[ok_f]).sum())
    return {
        "_ok": val_bad == 0 and flag_bad == 0,
        "frames": b,
        "erasures": f"spread 1..63 over {b - 1} frames + one 64 (must fail)",
        "value_mismatches": val_bad,
        "failure_flag_mismatches": flag_bad,
    }


def run_battery(
    *,
    interpret: bool = False,
    quick: bool = False,
    fence_gate: bool = False,
) -> list[dict]:
    """Run every tier; returns the list of records (the driver artifact)."""
    kw = dict(interpret=interpret)
    if quick:
        small = _small_code()
        bin_kw = dict(
            b=16, w=128 if not interpret else 2, bt=8, per=0.25,
            code=small, **kw,
        )
        from ldpc_erasure_codes_tpu.codes import toy_code

        nb_kw = dict(
            b=8, wb=512 if not interpret else 8, bt=8, per=0.12,
            code=toy_code(n=96, k=64, seed=3, gf_order=256), **kw,
        )
        hy_kw = dict(
            b=16, w=128 if not interpret else 2, bt=8, per=0.25,
            emax=16, code=small, **kw,
        )
        rs_kw = dict(b=16, wb=512 if not interpret else 8, **kw)
    else:
        bin_kw, nb_kw, hy_kw, rs_kw = dict(**kw), dict(**kw), dict(**kw), dict(**kw)
    tiers = [
        (
            "binary_unrolled",
            lambda: verify_binary(
                "unrolled", fence_gate=fence_gate, **bin_kw
            ),
        ),
        ("binary_seq", lambda: verify_binary("seq", **bin_kw)),
        ("nb_unrolled", lambda: verify_nb(**nb_kw)),
        ("hybrid_ge", lambda: verify_hybrid(**hy_kw)),
        ("rs_wide", lambda: verify_rs(**rs_kw)),
    ]
    return [_tier(name, fn) for name, fn in tiers]
