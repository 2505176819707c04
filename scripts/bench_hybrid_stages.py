"""Stage anatomy of the GE-hot hybrid step at PER .2031 (real TPU).

VERDICT r4 weak #3 names the VMEM elimination (~39 ms) as the hybrid
bottleneck, but the full .2031 step is ~200+ ms at B=1024 — this script
times the pieces of the SAME jitted step so the round-5 optimization
(pallas_elim a_words work cuts) is attributed against a measured
breakdown, not a guess:

  peel       — tiled VMEM peel alone (10 sweeps at .2031)
  hybrid     — peel + compacted packed GE (the production step)
  ge_branch  — difference
  elim       — f2_eliminate alone at the production cube shape, with the
               batch's real residual-count distribution, a_words off/on

Run: python scripts/bench_hybrid_stages.py [--quick]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from ldpc_erasure_codes_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from ldpc_erasure_codes_tpu import channel as ch
    from ldpc_erasure_codes_tpu.codes import get_code
    from ldpc_erasure_codes_tpu.ops import device_arrays, hybrid_decode
    from ldpc_erasure_codes_tpu.ops.pallas_elim import f2_eliminate
    from ldpc_erasure_codes_tpu.ops.pallas_encode import encode_packed_vmem
    from ldpc_erasure_codes_tpu.ops.pallas_peel import (
        default_b_tile,
        peel_decode_vmem,
        static_topology,
    )

    quick = "--quick" in sys.argv
    code = get_code("n2040_k1530")
    arrays = device_arrays(code)
    b = 256 if quick else 1024
    per, emax, f_max, w = 0.2031, 512, 448, 256
    bt = default_b_tile(code.n, w)
    topo = static_topology(arrays)
    reps = 3 if quick else 8
    key = jax.random.key(0)
    src = jax.random.bits(key, (b, code.k, w), dtype=jnp.uint32)
    cw = jax.block_until_ready(
        encode_packed_vmem(arrays, src, b_tile=bt, tiled_out=True)
    )

    def digest(v):
        return jnp.bitwise_xor.reduce(
            jnp.bitwise_xor.reduce(v, axis=1), axis=0
        )

    def timed(name, fn, *args):
        out = jax.block_until_ready(fn(jax.random.fold_in(key, 999), *args))
        t0 = time.perf_counter()
        for i in range(reps):
            out = fn(jax.random.fold_in(key, i), *args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        gbps = b * code.k * 32 * w / dt / 1e9
        print(f"{name:28s} {dt * 1e3:8.2f} ms/step ({gbps:6.1f} Gbps)",
              flush=True)
        return dt

    @jax.jit
    def peel_only(k, cw):
        mask = ch.iid_erasures(k, (b, code.n), per)
        v, e, iters = peel_decode_vmem(
            arrays, cw, mask, max_iters=10, b_tile=bt, tiled=True,
            schedule="unrolled", static_topo=topo,
        )
        return digest(v), jnp.sum(e)

    @jax.jit
    def hyb(k, cw):
        mask = ch.iid_erasures(k, (b, code.n), per)
        v, e, iters, failed = hybrid_decode(
            arrays, cw, mask, peel_iters=10, emax=emax, impl="vmem",
            ge_subbatch=f_max, b_tile=bt, tiled=True, static_topo=topo,
        )
        return digest(v), jnp.sum(failed)

    t_peel = timed("peel only (10 sweeps)", peel_only, cw)
    t_hyb = timed("hybrid (peel + GE)", hyb, cw)
    print(f"{'ge branch (diff)':28s} {(t_hyb - t_peel) * 1e3:8.2f} ms/step",
          flush=True)

    # Elimination alone at the production cube shape with the REAL
    # residual-count distribution of this operating point.
    mask = ch.iid_erasures(jax.random.fold_in(key, 7), (b, code.n), per)
    _, e_peel, _ = peel_decode_vmem(
        arrays, cw, mask, max_iters=10, b_tile=bt, tiled=True,
        schedule="unrolled", static_topo=topo,
    )
    resid = np.asarray(jnp.sum(e_peel, axis=1))  # erased is (B, n) bool
    resid = np.sort(resid[resid > 0])[::-1][:f_max]
    nreal_np = np.zeros(512, np.int32)
    nreal_np[: resid.size] = np.minimum(resid, emax)
    print(
        f"residual dist: n={resid.size} med={int(np.median(resid))} "
        f"max={int(resid.max()) if resid.size else 0}",
        flush=True,
    )
    m = code.m
    m_pad = -(-m // 8) * 8
    wa, wt = emax // 32, -(-m // 32)
    C = wa + wt
    r = jax.random.bits(jax.random.key(3), (C, m_pad, 512), dtype=jnp.uint32)
    r = r.at[:, m:, :].set(0)
    nreal = jnp.asarray(nreal_np[None])

    for label, aw in (("elim a_words=0", 0), ("elim a_words=wa", wa)):
        @jax.jit
        def elim(k, r, nreal, aw=aw):
            r = r.at[0, 0, 0].set(
                jax.random.bits(k, (), dtype=jnp.uint32)
            )
            ro, piv, fail = f2_eliminate(
                r, nreal, emax=emax, b_tile=128, a_words=aw
            )
            return jnp.sum(ro[0, 0]), jnp.sum(fail)

        timed(label, elim, r, nreal)


if __name__ == "__main__":
    main()
