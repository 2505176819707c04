"""EXPERIMENT: fully-unrolled constant-topology peel sweep (real TPU).

Hypothesis: the production kernel's ~440 ns/check-visit is serialization —
dynamic-slice loads/stores whose aliasing Mosaic cannot disprove, plus
scalar-prefetch index loads — not op throughput (op-count reductions and
load hoisting both measured flat). Baking the Vlist into the program as
CONSTANT slice offsets removes every SMEM topology load AND lets the
compiler see which visits are independent, unlocking cross-visit
pipelining. Price: one (possibly enormous) Mosaic compile per code; this
script measures whether that compile finishes and what it buys.

Binary, headline shape only. Correctness: digest + residual cross-checked
against the production kernel on the same draws.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_unrolled(code, host_vlist, host_len, *, bt, w, max_iters, k_stop):
    n, m = code.n, code.m
    n1 = n + 1
    neigh = [
        [int(host_vlist[c, s]) for s in range(int(host_len[c]))]
        for c in range(m)
    ]

    def kernel(vals_hbm, emask_ref, er_ref, vals_out, er_out, iters_out,
               resid_scr, changed_scr, flag_smem, copy_sem):
        cp = pltpu.make_async_copy(
            vals_hbm.at[pl.ds(pl.program_id(0), 1)], vals_out, copy_sem
        )
        cp.start()
        cp.wait()
        vals_out[...] = jnp.where(
            emask_ref[...] != 0, jnp.uint32(0), vals_out[...]
        )
        er_out[...] = er_ref[...]
        iters_out[...] = jnp.zeros((1, bt), jnp.int32)
        flag_smem[0] = 0

        def visit(c):
            idxs = neigh[c]
            es = [er_out[i : i + 1, :] for i in idxs]
            cnt = es[0]
            for s in range(1, len(idxs)):
                cnt = cnt + es[s]
            deg1_i = (cnt == 1).astype(jnp.int32)
            rows = [vals_out[i * bt : (i + 1) * bt, :] for i in idxs]
            acc = rows[0]
            for s in range(1, len(idxs)):
                acc = acc ^ rows[s]
            conds = [deg1_i * es[s] for s in range(len(idxs))]
            conds_f = jnp.transpose(jnp.concatenate(conds, axis=0))
            changed_scr[...] = changed_scr[...] + deg1_i
            for s, i in enumerate(idxs):
                er_out[i : i + 1, :] = es[s] - conds[s]
                cond_f = conds_f[:, s : s + 1] != 0
                vals_out[i * bt : (i + 1) * bt, :] = jnp.where(
                    cond_f, acc, rows[s]
                )

        BLK = int(os.environ.get("EXP_BLK", "8"))

        def sweep_body(it, carry):
            @pl.when(flag_smem[0] == 0)
            def _():
                changed_scr[...] = jnp.zeros((1, bt), jnp.int32)
                # Constant-address visits, fenced into BLK-check predicated
                # regions so the scheduler's (now alias-free) hoisting can't
                # blow the register file (the unfenced version spilled 97 MB).
                for b0 in range(0, m, BLK):
                    @pl.when(flag_smem[0] < 1 + it)
                    def _(b0=b0):
                        for c in range(b0, min(b0 + BLK, m)):
                            visit(c)
                resid = jnp.sum(
                    er_out[pl.ds(0, k_stop), :], axis=0, keepdims=True,
                    dtype=jnp.int32,
                )
                resid_scr[...] = resid
                prev = iters_out[...]
                iters_out[...] = jnp.where(
                    (resid == 0) & (prev == 0), jnp.int32(it + 1), prev
                )
                ch = jnp.sum(changed_scr[...])
                flag_smem[0] = jnp.where(
                    (ch == 0) | (jnp.sum(resid) == 0), 1, 0
                ).astype(jnp.int32)

            return carry

        jax.lax.fori_loop(0, max_iters, sweep_body, 0)

    @jax.jit
    def decode(vt, erased):
        b = erased.shape[0]
        ntiles = vt.shape[0]
        bp = ntiles * bt
        epad = jnp.pad(erased, ((0, bp - b), (0, 1)))
        emask = epad.astype(jnp.int8).reshape(ntiles, bt, n1).swapaxes(
            1, 2
        ).reshape(ntiles, n1 * bt, 1)
        et = epad.astype(jnp.int32).reshape(ntiles, bt, n1).swapaxes(1, 2)
        map_tile = lambda i: (i, 0, 0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(ntiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((None, n1 * bt, 1), map_tile,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, n1, bt), map_tile,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((None, n1 * bt, w), map_tile,
                             memory_space=pltpu.VMEM,
                             pipeline_mode=pl.Buffered(buffer_count=1)),
                pl.BlockSpec((None, n1, bt), map_tile,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, 1, bt), map_tile,
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((1, bt), jnp.int32),
                pltpu.VMEM((1, bt), jnp.int32),
                pltpu.SMEM((3,), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        vals_t, er_t, iters_t = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((ntiles, n1 * bt, w), jnp.uint32),
                jax.ShapeDtypeStruct((ntiles, n1, bt), jnp.int32),
                jax.ShapeDtypeStruct((ntiles, 1, bt), jnp.int32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024,
            ),
        )(vt, emask, et)
        er = er_t.swapaxes(1, 2).reshape(bp, n1)[:b, :n] != 0
        iters = iters_t.reshape(bp)[:b]
        iters = jnp.where(iters == 0, jnp.int32(max_iters), iters)
        return vals_t, er, iters

    return decode


def main() -> None:
    from ldpc_erasure_codes_tpu import channel as ch
    from ldpc_erasure_codes_tpu.codes import get_code
    from ldpc_erasure_codes_tpu.ops import device_arrays
    from ldpc_erasure_codes_tpu.ops.pallas_encode import encode_packed_vmem
    from ldpc_erasure_codes_tpu.ops.pallas_peel import peel_decode_vmem

    code = get_code("n2040_k1530")
    arrays = device_arrays(code)
    b, w, bt, per, reps = 2048, 256, 32, 0.1406, 10
    key = jax.random.key(0)
    src = jax.random.bits(key, (b, code.k, w), dtype=jnp.uint32)
    cw = jax.block_until_ready(
        encode_packed_vmem(arrays, src, b_tile=bt, tiled_out=True)
    )
    host_vlist = np.asarray(arrays.vlist_idx)
    host_len = np.asarray(arrays.vlist_len)
    dec = make_unrolled(
        code, host_vlist, host_len, bt=bt, w=w, max_iters=50, k_stop=code.k
    )

    def digest_of(values):
        return jnp.bitwise_xor.reduce(
            jnp.bitwise_xor.reduce(values, axis=1), axis=0
        )

    @jax.jit
    def step(k, cw):
        mask = ch.iid_erasures(k, (b, code.n), per)
        values, erased, iters = dec(cw, mask)
        return (
            jnp.sum(erased[:, : code.k], dtype=jnp.int32),
            jnp.max(iters),
            digest_of(values),
        )

    @jax.jit
    def step_ref(k, cw):
        mask = ch.iid_erasures(k, (b, code.n), per)
        values, erased, iters = peel_decode_vmem(
            arrays, cw, mask, max_iters=50, early_stop_k=code.k,
            b_tile=bt, tiled=True,
        )
        return (
            jnp.sum(erased[:, : code.k], dtype=jnp.int32),
            jnp.max(iters),
            digest_of(values),
        )

    print("compiling unrolled kernel (this may take a while)...", flush=True)
    t0 = time.perf_counter()
    out = jax.block_until_ready(step(jax.random.fold_in(key, 999), cw))
    print(f"compile+run: {time.perf_counter() - t0:.1f}s "
          f"resid={int(out[0])} iters={int(out[1])}", flush=True)
    ref = jax.block_until_ready(step_ref(jax.random.fold_in(key, 999), cw))
    assert int(out[0]) == int(ref[0]) and int(out[1]) == int(ref[1])
    assert np.array_equal(np.asarray(out[2]), np.asarray(ref[2])), "digest!"
    print("matches production kernel bit-exactly", flush=True)

    t0 = time.perf_counter()
    for i in range(reps):
        out = step(jax.random.fold_in(key, i), cw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    gbps = b * code.k * 32 * w / dt / 1e9
    print(f"unrolled: {dt * 1e3:.2f} ms/step  {gbps:.1f} Gbps", flush=True)


if __name__ == "__main__":
    main()
