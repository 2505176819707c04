"""Pallas TPU kernel: VMEM-resident Gauss-Seidel peeling decoder.

The production wide value decode. The XLA symbol-major path
(:mod:`ops.peel_wide`) re-streams the whole edge-gather through HBM every
sweep (~3 passes/sweep, measured gather-bound and flat in batch —
docs/DESIGN.md); this kernel instead keeps a *tile of whole frames* resident
in VMEM across the entire decode loop, so HBM sees exactly one read and one
write of the codeword data regardless of iteration count. The sweep itself
is the MATLAB schedule run natively: a sequential scalar loop over check
rows (constant topology scalar-prefetched into SMEM), immediate in-VMEM
updates (Gauss-Seidel — roughly halves the sweep count vs the Jacobi XLA
path), per-frame vectorized over the tile's batch rows and the packed
symbol words on the VPU.

Schedule equivalence: identical to the NumPy oracle's sequential sweep
(``utils/oracle.peel_decode``, reference Matlab/My_LDPC_Erasure_Decoder.m:
18-47) — same fixed point AND same iteration counts (asserted bit-exactly in
tests/test_pallas_peel.py); the fixed point also equals every other peel
impl (``peel_decode``, ``peel_decode_wide``).

Layout: values live as (n1*bt, W) per grid step — symbol-major with the
bt frames of the tile contiguous under each symbol, so a check's neighbor
access is one sublane-aligned dynamic slice of shape (bt, W) and the per-
check scalar work is amortized over bt frames. The erasure state is an
int32 sidecar (n1*bt, 1). Erased slots are zeroed on copy-in (the channel
masking is fused into the kernel), maintaining the erased-is-zero invariant
the XOR accumulation relies on: a degree-1 check's recovered value is the
XOR of ALL its neighbors, no erasure test needed.

FPGA analog: the reference's production decoder also streams one frame into
on-chip RAM and iterates locally (decoder_perf_tests.cl:86-210); this is
that design point expressed for the TPU memory hierarchy, plus batching.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldpc_erasure_codes_tpu.ops.arrays import CodeArrays


def _make_kernel(
    *, n: int, k_stop: int, m: int, dmax: int, bt: int, max_iters: int,
    skip_idle: bool,
):
    n1 = n + 1

    def kernel(
        topo_ref,  # (m, dmax) int32 SMEM (scalar prefetch), pad = n
        vals_ref,  # (n1*bt, W) uint32 VMEM in
        er_ref,    # (n1*bt, 1) int32 VMEM in
        resid_ref,  # (bt, 1) int32 VMEM in: erasures among first k_stop cols
        vals_out,  # (n1*bt, W) uint32 VMEM out (working buffer)
        er_out,    # (n1*bt, 1) int32 VMEM out (working buffer)
        iters_out,  # (bt, 1) int32 VMEM out
        resid_scr,  # (bt, 1) int32 VMEM scratch
        changed_scr,  # (bt, 1) int32 VMEM scratch
        flag_smem,  # (2,) int32 SMEM scratch: [done, deg1_any]
    ):
        # Copy-in, fusing the erasure masking (erased slots forced to zero).
        er0 = er_ref[...]
        vals_out[...] = jnp.where(er0 != 0, jnp.uint32(0), vals_ref[...])
        er_out[...] = er0
        resid_scr[...] = resid_ref[...]
        iters_out[...] = jnp.zeros((bt, 1), jnp.int32)
        flag_smem[0] = 0

        def check_body(c, carry):
            idxs = [topo_ref[c, s] for s in range(dmax)]
            offs = [pl.multiple_of(i * bt, bt) for i in idxs]
            es = [er_out[pl.ds(o, bt), :] for o in offs]
            cnt = es[0]
            for s in range(1, dmax):
                cnt = cnt + es[s]
            deg1 = cnt == 1  # (bt, 1): exactly one erased neighbor

            def wide_work():
                rows = [vals_out[pl.ds(o, bt), :] for o in offs]
                acc = rows[0]
                for s in range(1, dmax):
                    acc = acc ^ rows[s]
                for s in range(dmax):
                    cond = deg1 & (es[s] != 0)  # this slot is the erased one
                    condi = cond.astype(jnp.int32)
                    vals_out[pl.ds(offs[s], bt), :] = jnp.where(
                        cond, acc, rows[s]
                    )
                    er_out[pl.ds(offs[s], bt), :] = es[s] - condi
                    in_k = jnp.where(
                        idxs[s] < k_stop, jnp.int32(1), jnp.int32(0)
                    )
                    resid_scr[...] = resid_scr[...] - condi * in_k
                    changed_scr[...] = changed_scr[...] + condi

            if skip_idle:
                # Idle checks (no degree-1 frame in the tile) skip all wide
                # VMEM traffic: one vector reduce + scalar branch.
                flag_smem[1] = jnp.sum(deg1.astype(jnp.int32))

                @pl.when(flag_smem[1] > 0)
                def _():
                    wide_work()
            else:
                wide_work()
            return carry

        def sweep_body(it, carry):
            @pl.when(flag_smem[0] == 0)
            def _():
                changed_scr[...] = jnp.zeros((bt, 1), jnp.int32)
                jax.lax.fori_loop(0, m, check_body, 0)
                resid = resid_scr[...]
                prev = iters_out[...]
                iters_out[...] = jnp.where(
                    (resid == 0) & (prev == 0), jnp.int32(it + 1), prev
                )
                ch = jnp.sum(changed_scr[...])
                rs = jnp.sum(resid)
                flag_smem[0] = jnp.where(
                    (ch == 0) | (rs == 0), jnp.int32(1), jnp.int32(0)
                )

            return carry

        jax.lax.fori_loop(0, max_iters, sweep_body, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iters", "early_stop_k", "b_tile", "skip_idle", "interpret"
    ),
)
def peel_decode_vmem(
    arrays: CodeArrays,
    values: jax.Array,
    erased: jax.Array,
    *,
    max_iters: int = 50,
    early_stop_k: int | None = None,
    b_tile: int = 8,
    skip_idle: bool = True,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """VMEM-resident peeling decode; sequential (MATLAB) schedule.

    Drop-in for :func:`ops.peel_wide.peel_decode_wide` (same signature and
    fixed point; iteration counts follow the sequential schedule, i.e. equal
    the oracle's, not the Jacobi path's).

    Args:
      values: (B, n, W) packed uint32 words. Erased slots may hold anything:
        masking is fused into the kernel (so the un-erased channel output can
        be passed directly, saving the apply_erasures HBM pass).
      erased: (B, n) bool.
      early_stop_k: stop a frame once its first ``early_stop_k`` symbols are
        resolved (None = all n).
      b_tile: frames held in VMEM per grid step. VMEM footprint is roughly
        ``3 * b_tile * (n+1) * W * 4`` bytes (in + out + pipeline buffers).

    Returns (values, erased, iters) — (B, n, W), (B, n) bool, (B,) int32.
    """
    b, n, w = values.shape
    m, dmax = arrays.vlist_idx.shape
    k_stop = n if early_stop_k is None else int(early_stop_k)
    bt = int(b_tile)
    n1 = n + 1
    ntiles = -(-b // bt)
    bp = ntiles * bt

    vpad = jnp.pad(values, ((0, bp - b), (0, 1), (0, 0)))
    epad = jnp.pad(erased, ((0, bp - b), (0, 1))).astype(jnp.int32)
    # Tile layout: (ntiles, n1*bt, W) with the tile's bt frames contiguous
    # under each symbol row.
    vt = vpad.reshape(ntiles, bt, n1, w).swapaxes(1, 2).reshape(
        ntiles, n1 * bt, w
    )
    et = epad.reshape(ntiles, bt, n1).swapaxes(1, 2).reshape(
        ntiles, n1 * bt, 1
    )
    resid = jnp.sum(
        epad[:, :k_stop], axis=1, dtype=jnp.int32
    ).reshape(ntiles, bt, 1)

    kernel = _make_kernel(
        n=n, k_stop=k_stop, m=m, dmax=dmax, bt=bt, max_iters=max_iters,
        skip_idle=skip_idle,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(
                (None, n1 * bt, w), lambda i, topo: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, n1 * bt, 1), lambda i, topo: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, bt, 1), lambda i, topo: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (None, n1 * bt, w), lambda i, topo: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, n1 * bt, 1), lambda i, topo: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, bt, 1), lambda i, topo: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((bt, 1), jnp.int32),
            pltpu.VMEM((bt, 1), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    vals_t, er_t, iters_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((ntiles, n1 * bt, w), jnp.uint32),
            jax.ShapeDtypeStruct((ntiles, n1 * bt, 1), jnp.int32),
            jax.ShapeDtypeStruct((ntiles, bt, 1), jnp.int32),
        ),
        interpret=interpret,
    )(arrays.vlist_idx, vt, et, resid)

    vals = vals_t.reshape(ntiles, n1, bt, w).swapaxes(1, 2).reshape(
        bp, n1, w
    )[:b, :n]
    er = (
        er_t.reshape(ntiles, n1, bt).swapaxes(1, 2).reshape(bp, n1)[:b, :n]
        != 0
    )
    iters = iters_t.reshape(bp)[:b]
    iters = jnp.where(iters == 0, jnp.int32(max_iters), iters)
    return vals, er, iters
