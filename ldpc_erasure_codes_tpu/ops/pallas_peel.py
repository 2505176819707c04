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
path), vectorized over the tile's frames and the packed symbol words on the
VPU. Checks with no degree-1 frame in the tile skip all wide VMEM traffic
(``skip_idle``).

Schedule equivalence: identical to the NumPy oracle's sequential sweep
(``utils/oracle.peel_decode``, reference Matlab/My_LDPC_Erasure_Decoder.m:
18-47) — same fixed point AND same iteration counts (asserted bit-exactly in
tests/test_pallas_peel.py); the fixed point also equals every other peel
impl (``peel_decode``, ``peel_decode_wide``).

Layouts (per grid step, one tile of ``bt`` frames):

* values ``(n1*bt, W)`` uint32 — symbol-major with the tile's frames
  contiguous under each symbol, so a check's neighbor access is one
  sublane-aligned dynamic slice of shape (bt, W) and per-check scalar work
  amortizes over bt frames.
* erasure state ``(n1, bt)`` int32 — frames on the LANE axis: a symbol's
  flags are a (1, bt) dynamic-sublane slice, and all mask arithmetic
  (counts, degree-1 tests, residuals) runs in cheap (1, bt) lane vectors.
  Only the value select crosses spaces (one tiny transpose per actual peel
  event).
* an int8 ``(n1*bt, 1)`` erasure sidecar is read once to fuse the channel
  masking into the copy-in (erased slots forced to zero — the invariant the
  XOR accumulation relies on: a degree-1 check's recovered value is the XOR
  of ALL its neighbors, no erasure test needed).

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


def _xtime(v):
    """SWAR multiply-by-x of four packed GF(256) bytes per uint32 lane
    (prim poly 0x171 — gf.ops._xtime_packed, restated for Mosaic). The
    VMEM kernels are pinned to the reference field: every shipped/liftable
    code uses DEFAULT_PRIM_POLY; the gf.ops ``prim_poly`` parameter is for
    field experimentation on the XLA paths only."""
    hi = (v >> 7) & jnp.uint32(0x01010101)
    return ((v << 1) & jnp.uint32(0xFEFEFEFE)) ^ (hi * jnp.uint32(0x71))


def _gf_mul_scalar(v, coef):
    """Packed-byte GF(256) multiply of a (bt, W) uint32 tile by a SCALAR
    coefficient (SMEM value): double-and-add over the coefficient's bits."""
    acc = jnp.zeros_like(v)
    cur = v
    for i in range(8):
        bit = ((coef >> i) & 1).astype(jnp.uint32)
        acc = acc ^ (cur * bit)
        if i < 7:
            cur = _xtime(cur)
    return acc


def tile_wide(values: jax.Array, b_tile: int) -> jax.Array:
    """(B, n, W) -> the kernel's tile-major layout (ntiles, (n+1)*bt, W).

    The on-accelerator wide-batch layout: frames grouped into ``b_tile``
    tiles, each tile symbol-major with its frames contiguous under every
    symbol, plus the shared zero pad row at slot n. ``encode_packed_vmem``
    emits this layout natively with ``tiled_out=True`` and
    ``peel_decode_vmem`` consumes it with ``tiled=True`` — chaining them in
    tile layout skips two full-batch HBM transpose passes (~26 ms/step at
    B=2048, W=256 on v5e; the single biggest non-sweep cost of the decode
    step). For GF(256) tile the PACKED uint32 form (4 bytes/word).
    """
    b, n, w = values.shape
    bt = int(b_tile)
    ntiles = -(-b // bt)
    vpad = jnp.pad(values, ((0, ntiles * bt - b), (0, 1), (0, 0)))
    return vpad.reshape(ntiles, bt, n + 1, w).swapaxes(1, 2).reshape(
        ntiles, (n + 1) * bt, w
    )


def default_b_tile(n: int, w: int, *, cap: int = 32) -> int:
    """Largest multiple-of-8 frame tile whose (n+1)*bt*wc*4-byte VMEM working
    buffer fits the device's peel budget (``utils.device.peel_vmem_budget``
    — derived from the queried TPU generation's VMEM size minus the
    v5e-calibrated ~58 MB pipeline reserve: bt=32 at n=2040/W=256 — 67 MB —
    compiles on the 128 MiB part; bt=48 — 100 MB — does not), capped at the
    measured-best headline tile (bt=32; larger never helped). Sizing uses
    the kernel's auto W-chunk (wc = 256 when W > 256 and divisible — see
    ``peel_decode_vmem(w_chunk=...)``), so wide symbols no longer force a
    smaller frame tile. Callers that pick a tile size without shape
    knowledge (CLI, drivers) should use this instead of hard-coding 32 —
    e.g. the (4000, 2000) registry code needs bt=16 at W=256."""
    from ldpc_erasure_codes_tpu.utils.device import peel_vmem_budget

    wc = 256 if (w > 256 and w % 256 == 0) else w
    budget_bytes = peel_vmem_budget()
    bt = (budget_bytes // ((n + 1) * wc * 4)) // 8 * 8
    if bt < 8:
        # Even the minimum tile exceeds VMEM: raise here with the actual
        # numbers rather than handing back a tile that fails minutes later
        # in the (remote) Mosaic compile with an opaque VMEM error. Callers
        # with a fallback path (CLI throughput) catch this and use impl=xla.
        raise ValueError(
            f"VMEM decoder does not fit: n={n}, W={w} needs "
            f"{(n + 1) * 8 * w * 4 / 1e6:.0f} MB at the minimum bt=8 tile "
            f"(budget ~{budget_bytes / 1e6:.0f} MB); use the XLA wide path"
        )
    return int(min(cap, bt))


def untile_wide(vt: jax.Array, b: int, n: int) -> jax.Array:
    """Inverse of :func:`tile_wide`: (ntiles, (n+1)*bt, W) -> (B, n, W)."""
    ntiles, rows, w = vt.shape
    n1 = n + 1
    bt = rows // n1
    return vt.reshape(ntiles, n1, bt, w).swapaxes(1, 2).reshape(
        ntiles * bt, n1, w
    )[:b, :n]


def _make_kernel(
    *, n: int, k_stop: int, m: int, dmax: int, bt: int, max_iters: int,
    skip_idle: bool, cond_stores: bool, gf_order: int, serpentine: bool,
    jacobi: bool, counted: bool, grouped: bool, ngroups: int, cmax: int,
    m_blk8: int, m_rows: int, m_pad: int, static_topo, interpret: bool,
    wc: int, w_chunks: int, unroll_blk: int = 32,
    fence_gate: bool = False, nf_pad: int = 0,
):
    n1 = n + 1
    if static_topo is not None:
        return _make_unrolled_kernel(
            n=n, k_stop=k_stop, m=m, bt=bt, max_iters=max_iters,
            gf_order=gf_order, topo=static_topo, interpret=interpret,
            wc=wc, w_chunks=w_chunks, blk=unroll_blk,
            gate=fence_gate, nf_pad=nf_pad,
        )
    if jacobi:
        return _make_jacobi_kernel(
            n=n, k_stop=k_stop, m=m, m_pad=m_pad, dmax=dmax, bt=bt,
            max_iters=max_iters, gf_order=gf_order, interpret=interpret,
            wc=wc, w_chunks=w_chunks,
        )
    if counted:
        return _make_counted_kernel(
            n=n, k_stop=k_stop, m=m, dmax=dmax, bt=bt, max_iters=max_iters,
            skip_idle=skip_idle, cond_stores=cond_stores, gf_order=gf_order,
            cmax=cmax, m_blk8=m_blk8, m_rows=m_rows,
            interpret=interpret, wc=wc, w_chunks=w_chunks,
        )
    if grouped:
        return _make_grouped_kernel(
            n=n, k_stop=k_stop, m=m, dmax=dmax, bt=bt, max_iters=max_iters,
            skip_idle=skip_idle, gf_order=gf_order, ngroups=ngroups,
            interpret=interpret, wc=wc, w_chunks=w_chunks,
        )

    def kernel(
        topo_ref,   # (dmax, m) int32 SMEM (scalar prefetch), pad = n
        coef_ref,   # (dmax, m) int32 SMEM: GF coefficients, pad = 0
                    #   ((1, 1) dummy for binary — never read)
        inv_ref,    # (dmax, m) int32 SMEM: inverse coefficients, pad = 0
                    #   ((1, 1) dummy for binary — never read)
                    # TRANSPOSED so the SMEM lane padding (minor dim padded
                    # to 128 words per sublane) lands on the long m axis:
                    # (m, dmax) costs m*128*4 bytes per operand — 1.5 MB for
                    # the three at m=1000, over the 1 MB scoped-SMEM budget
                    # (only the m=510 code compiled); (dmax, m) costs
                    # dmax*pad128(m)*4 ≈ 29-61 KB for every shipped code.
        clist_ref,  # (cmax, n1) int32 SMEM: checks adjacent to each symbol
                    #   (counted schedule only; (1, 1) dummy here)
        vals_hbm,   # (ntiles, n1*bt, W) uint32 ANY (stays in HBM; manual DMA)
        emask_ref,  # (n1*bt, 1) int8 VMEM in (copy-in masking only)
        er_ref,     # (n1, bt) int32 VMEM in
        resid_ref,  # (1, bt) int32 VMEM in: erasures among first k_stop cols
        vals_out,   # (n1*bt, W) uint32 VMEM out (working buffer)
        er_out,     # (n1, bt) int32 VMEM out (working buffer)
        iters_out,  # (1, bt) int32 VMEM out
        resid_scr,  # (1, bt) int32 VMEM scratch
        changed_scr,  # (1, bt) int32 VMEM scratch
        flag_smem,  # (3,) int32 SMEM scratch: [done, deg1_any, slot_bits]
        copy_sem,   # DMA semaphore for the manual copy-in
    ):
        # Manual copy-in: DMA the tile's values straight into the WORKING
        # buffer (the output window). Keeping the big operand out of the
        # pipeline halves the VMEM footprint vs a VMEM input operand —
        # that headroom buys larger b_tile, which amortizes the per-check
        # scalar work over more frames. The copy is ~40 us against ~1 ms of
        # decode per tile, so losing input double-buffering costs nothing.
        # Hardware window refs keep the leading singleton block dim (the DMA
        # shape check sees the raw (1, n1*bt, W) memref); the interpreter
        # squeezes it — slice the HBM source to match each.
        # With W-chunking (w_chunks > 1) the grid's minor axis walks wc-word
        # chunks of the symbol: the DMA slices the lane dim, and the mask
        # sweep repeats identically per chunk (mask evolution is
        # value-independent, so every chunk is an independent decode of the
        # same frame under the same schedule).
        if w_chunks > 1:
            wj = pl.multiple_of(pl.program_id(1) * wc, wc)
            if interpret:
                src = vals_hbm.at[pl.program_id(0), :, pl.ds(wj, wc)]
            else:
                src = vals_hbm.at[
                    pl.ds(pl.program_id(0), 1), :, pl.ds(wj, wc)
                ]
        elif interpret:
            src = vals_hbm.at[pl.program_id(0)]
        else:
            src = vals_hbm.at[pl.ds(pl.program_id(0), 1)]
        cp = pltpu.make_async_copy(src, vals_out, copy_sem)
        cp.start()
        cp.wait()
        # Fuse the erasure masking (erased slots forced to zero).
        vals_out[...] = jnp.where(
            emask_ref[...] != 0, jnp.uint32(0), vals_out[...]
        )
        er_out[...] = er_ref[...]
        resid_scr[...] = resid_ref[...]
        iters_out[...] = jnp.zeros((1, bt), jnp.int32)
        flag_smem[0] = 0

        def check_body(cc, rev):
            if serpentine:
                c = jnp.where(rev != 0, (m - 1) - cc, cc)
            else:
                c = cc
            idxs = [topo_ref[s, c] for s in range(dmax)]
            es = [er_out[pl.ds(idxs[s], 1), :] for s in range(dmax)]
            cnt = es[0]
            for s in range(1, dmax):
                cnt = cnt + es[s]
            deg1 = cnt == 1  # (1, bt): exactly one erased neighbor

            def wide_work():
                offs = [pl.multiple_of(idxs[s] * bt, bt) for s in range(dmax)]
                rows = [vals_out[pl.ds(o, bt), :] for o in offs]
                if gf_order == 2:
                    acc = rows[0]
                    for s in range(1, dmax):
                        acc = acc ^ rows[s]
                else:
                    # Horner over the coefficient bits: 8 packed xtimes of
                    # the ACCUMULATOR total (not per slot), one scalar-
                    # selected XOR per (bit, slot). acc = sum_s coef_s (x) v_s
                    # = each check's weighted syndrome; the erased slot holds
                    # zero and contributes nothing regardless of coefficient.
                    coefs = [coef_ref[s, c] for s in range(dmax)]
                    acc = jnp.zeros_like(rows[0])
                    for bit in range(7, -1, -1):
                        if bit < 7:
                            acc = _xtime(acc)
                        for s in range(dmax):
                            bv = ((coefs[s] >> bit) & 1).astype(jnp.uint32)
                            acc = acc ^ (rows[s] * bv)
                # conds[s]: this slot is the erased one. er flags are 0/1
                # int32, so the test collapses to ONE multiply per slot
                # (round 3: was cmp+and+cast — the per-visit op census in
                # scripts/bench_boundedness.py showed the sweep is vector-
                # op-ISSUE-bound, so every fused bookkeeping op is headline
                # throughput). The first-k residual accounting moved out of
                # the visit entirely: one (k_stop, bt) reduce per sweep end
                # replaces ~2*dmax per-visit ops (exact same value — resid
                # is only read at sweep end).
                deg1_i = deg1.astype(jnp.int32)
                conds = [deg1_i * es[s] for s in range(dmax)]
                # One batched lane->sublane transpose for ALL slots' event
                # flags (a per-slot (1,bt)->(bt,1) transpose is a cross-space
                # shuffle costing ~as much as the 32KB tile store it guards;
                # dmax of them dominated the eventful-check cost).
                conds_mat = jnp.concatenate(conds, axis=0)  # (dmax, bt)
                conds_f = jnp.transpose(conds_mat)          # (bt, dmax)
                changed_scr[...] = changed_scr[...] + deg1_i

                def slot_update(s):
                    condi = conds[s]
                    er_out[pl.ds(idxs[s], 1), :] = es[s] - condi
                    cond_f = conds_f[:, s : s + 1] != 0  # (bt, 1) frame space
                    if gf_order == 2:
                        val = acc
                    else:
                        # Solved symbol = inv(h_e) (x) weighted syndrome
                        # (My_LDPC_HybridML_NonBinary_Erasure_Decoder.m:44-48).
                        val = _gf_mul_scalar(acc, inv_ref[s, c])
                    vals_out[pl.ds(offs[s], bt), :] = jnp.where(
                        cond_f, val, rows[s]
                    )

                if cond_stores:
                    # Degree-1 means exactly one erased slot per frame, so
                    # only ~1 of dmax slots has any event across the tile:
                    # pack per-slot event flags into one scalar bitmask (a
                    # single vector->SMEM roundtrip) and store only the
                    # eventful slots. MEASURED NEGATIVE on v5e for binary
                    # (78.8 vs 98.5 Gbps) AND GF(256) (55.2 vs 64.0): the
                    # vector->SMEM->branch round trips stall the pipelines
                    # for more than the skipped stores / inverse multiplies
                    # cost. Default False; kept as a research knob.
                    bits = jnp.int32(0)
                    for s in range(dmax):
                        bits = bits + jnp.where(
                            jnp.sum(conds[s]) > 0, jnp.int32(1 << s), 0
                        )
                    flag_smem[2] = bits
                    ev_bits = flag_smem[2]
                    for s in range(dmax):
                        @pl.when(((ev_bits >> s) & 1) == 1)
                        def _(s=s):
                            slot_update(s)
                else:
                    for s in range(dmax):
                        slot_update(s)

            if skip_idle:
                # Idle checks (no degree-1 frame in the tile) skip all wide
                # VMEM traffic: one (1, bt) reduce + scalar branch.
                flag_smem[1] = jnp.sum(deg1.astype(jnp.int32))

                @pl.when(flag_smem[1] > 0)
                def _():
                    wide_work()
            else:
                wide_work()
            return rev

        def sweep_body(it, carry):
            @pl.when(flag_smem[0] == 0)
            def _():
                changed_scr[...] = jnp.zeros((1, bt), jnp.int32)
                # Serpentine: odd sweeps run the checks high-to-low, so
                # resolution chains pointing "up" the row order propagate in
                # one sweep instead of one row per sweep (fixed point is
                # schedule-invariant; iteration counts differ from the
                # MATLAB forward-only schedule).
                rev0 = (it % 2) if serpentine else 0
                jax.lax.fori_loop(0, m, check_body, rev0)
                # First-k residual recomputed once per sweep (one big
                # sublane reduce) instead of per-visit decrements.
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
                rs = jnp.sum(resid)
                flag_smem[0] = jnp.where(
                    (ch == 0) | (rs == 0), jnp.int32(1), jnp.int32(0)
                )

            return carry

        jax.lax.fori_loop(0, max_iters, sweep_body, 0)

    return kernel


def _make_jacobi_kernel(
    *, n: int, k_stop: int, m: int, m_pad: int, dmax: int, bt: int,
    max_iters: int, gf_order: int, interpret: bool, wc: int, w_chunks: int,
):
    """Jacobi-detection sweep: degree-1 detection from a per-sweep MXU count
    matrix instead of per-check erasure-row sums.

    The sequential kernel's count phase is the dominant cost at the headline
    shape (~17.5 ms of a ~65 ms decode per step at B=2048: every one of the
    m x ntiles check visits pays dmax SMEM index loads + dmax tiny dynamic
    (1, bt) slices + a reduce, ~550 ns/visit, even when idle). Here ALL check
    degrees are computed at sweep start with ONE matmul on the MXU —
    ``cnt = H_dense @ er`` ((m_pad, n1) bf16 x (n1, bt), ~33M MACs,
    microseconds — counts <= dmax are exact in bf16) — and the sweep scans
    ``cnt`` in 8-check sublane blocks: one (8, bt) load + compare + reduce +
    scalar branch retires 8 idle checks (~27x cheaper than the sequential
    count phase).

    Detection from sweep-start counts = the JACOBI schedule: events this
    sweep are exactly the checks with one erased neighbor at sweep start, so
    masks and iteration counts match the XLA ``peel_decode`` Jacobi paths
    bit-exactly (asserted in tests), not the MATLAB sequential schedule
    (more sweeps: <=8 vs <=5 at the headline point — but each extra sweep is
    the cheap mostly-idle kind). The fixed point and all resolved values are
    schedule-invariant (SURVEY §7).

    The sweep's bookkeeping is fully vectorized too — eventful checks do
    ONLY the wide value work:
      * the erased-slot ID per (check, frame) rides the same matmul: the
        stacked operand [H; Hs] (Hs[c, j] = slot index of j in check c)
        yields cnt and ``eid`` in one MXU pass — when cnt == 1, eid IS the
        erased slot, so the per-slot store conds are register compares
        (``deg1 & (eid == s)``), no per-slot erasure-row loads;
      * the erasure-state/residual updates happen once per sweep as
        elementwise passes: ``touch = H^T @ deg1`` counts the degree-1
        checks pointing at each symbol, ``resolved = er & (touch >= 1)``
        (a deg-1 check's one erased neighbor is resolved by definition),
        ``er -= resolved``; no per-slot er stores, no double counts;
      * value stores are double-resolve-safe by construction: the
        exclude-self value ``val_s = inv_s (x) acc_all  XOR  rows[s]``
        (binary: ``acc_all ^ rows[s]``) is exact whether row s still holds
        the erased zero (acc_all = coef_s (x) v_s, rows[s] = 0) or was
        already written by an earlier check this sweep (acc_all = 0,
        rows[s] = v_s) — monotone-erasure: every OTHER neighbor of a
        stale-deg1 check was known at sweep start and is never rewritten.
    """
    n1 = n + 1
    nblk = m_pad // 8

    def kernel(
        topo_ref,   # (dmax, m_pad) int32 SMEM, pad cols/slots = n
        coef_ref,   # (dmax, m_pad) int32 SMEM ((1, 1) dummy for binary)
        inv_ref,    # (dmax, m_pad) int32 SMEM ((1, 1) dummy for binary)
        clist_ref,  # (1, 1) int32 SMEM dummy (counted schedule only)
        vals_hbm,   # (ntiles, n1*bt, W) uint32 ANY (manual DMA)
        emask_ref,  # (n1*bt, 1) int8 VMEM in
        er_ref,     # (n1, bt) int32 VMEM in
        resid_ref,  # (1, bt) int32 VMEM in
        h2_ref,     # (2*m_pad, n1) bf16 VMEM in: [H support; slot-index
                    # weighted H], col n = 0, pad rows 0
        ht_ref,     # (n1, m_pad) bf16 VMEM in: H^T support
        vals_out,   # (n1*bt, W) uint32 VMEM out (working buffer)
        er_out,     # (n1, bt) int32 VMEM out (working buffer)
        iters_out,  # (1, bt) int32 VMEM out
        resid_scr,  # (1, bt) int32 VMEM scratch
        cnt_scr,    # (2*m_pad, bt) f32 VMEM scratch: [check degrees; eid]
        chk_v,      # (m_pad, 1) int32 VMEM scratch: per-check event flags
        chk_smem,   # (m_pad, 1) int32 SMEM: the same flags, DMA'd once per
                    # sweep so the scan is pure scalar loads + branches (a
                    # per-block vector->SMEM reduce/branch roundtrip measured
                    # ~2.9 us EACH — 11.8 ms/sweep at the headline shape,
                    # slower than the sequential count phase it replaced)
        flag_smem,  # (3,) int32 SMEM: [done, unused, unused]
        copy_sem,   # DMA semaphore (copy-in, then reused per sweep)
    ):
        # W-chunking: see the sequential kernel's copy-in note.
        if w_chunks > 1:
            wj = pl.multiple_of(pl.program_id(1) * wc, wc)
            if interpret:
                src = vals_hbm.at[pl.program_id(0), :, pl.ds(wj, wc)]
            else:
                src = vals_hbm.at[
                    pl.ds(pl.program_id(0), 1), :, pl.ds(wj, wc)
                ]
        elif interpret:
            src = vals_hbm.at[pl.program_id(0)]
        else:
            src = vals_hbm.at[pl.ds(pl.program_id(0), 1)]
        cp = pltpu.make_async_copy(src, vals_out, copy_sem)
        cp.start()
        cp.wait()
        vals_out[...] = jnp.where(
            emask_ref[...] != 0, jnp.uint32(0), vals_out[...]
        )
        er_out[...] = er_ref[...]
        resid_scr[...] = resid_ref[...]
        iters_out[...] = jnp.zeros((1, bt), jnp.int32)
        flag_smem[0] = 0

        def check_work(c, deg1, eid):
            # deg1, eid: (1, bt) from the sweep-start count matmul. Pure
            # wide value work — all mask bookkeeping is vectorized outside.
            idxs = [topo_ref[s, c] for s in range(dmax)]
            offs = [pl.multiple_of(idxs[s] * bt, bt) for s in range(dmax)]
            rows = [vals_out[pl.ds(o, bt), :] for o in offs]
            if gf_order == 2:
                acc = rows[0]
                for s in range(1, dmax):
                    acc = acc ^ rows[s]
            else:
                coefs = [coef_ref[s, c] for s in range(dmax)]
                acc = jnp.zeros_like(rows[0])
                for bit in range(7, -1, -1):
                    if bit < 7:
                        acc = _xtime(acc)
                    for s in range(dmax):
                        bv = ((coefs[s] >> bit) & 1).astype(jnp.uint32)
                        acc = acc ^ (rows[s] * bv)
            conds = [
                (deg1 & (eid == float(s))).astype(jnp.int32)
                for s in range(dmax)
            ]
            conds_mat = jnp.concatenate(conds, axis=0)  # (dmax, bt)
            conds_f = jnp.transpose(conds_mat)          # (bt, dmax)
            for s in range(dmax):
                cond_f = conds_f[:, s : s + 1] != 0  # (bt, 1) frame space
                if gf_order == 2:
                    val = acc ^ rows[s]
                else:
                    # inv_s (x) (acc XOR coef_s (x) rows[s]) simplifies to
                    # inv_s (x) acc XOR rows[s] since inv_s = coef_s^-1.
                    val = _gf_mul_scalar(acc, inv_ref[s, c]) ^ rows[s]
                vals_out[pl.ds(offs[s], bt), :] = jnp.where(
                    cond_f, val, rows[s]
                )

        def blk_body(blk, carry):
            # Pure scalar skip logic: flags live in SMEM (one DMA per
            # sweep), so idle blocks/checks cost scalar-core loads and
            # branches only — no vector->scalar pipeline stalls.
            base = blk * 8
            bsum = chk_smem[base, 0]
            for j in range(1, 8):
                bsum = bsum + chk_smem[base + j, 0]

            @pl.when(bsum > 0)
            def _():
                for j in range(8):

                    @pl.when(chk_smem[base + j, 0] > 0)
                    def _(j=j):
                        c = base + j
                        deg1 = cnt_scr[pl.ds(c, 1), :] == 1.0
                        eid = cnt_scr[pl.ds(m_pad + c, 1), :]
                        check_work(c, deg1, eid)

            return carry

        def sweep_body(it, carry):
            @pl.when(flag_smem[0] == 0)
            def _():
                # Check degrees AND erased-slot ids in one MXU pass (both
                # exact in bf16: counts <= dmax, slot-id sums <= dmax^2).
                er_bf = er_out[...].astype(jnp.bfloat16)
                cnt_scr[...] = jnp.dot(
                    h2_ref[...], er_bf, preferred_element_type=jnp.float32
                )
                deg1f = (
                    cnt_scr[pl.ds(0, m_pad), :] == 1.0
                )
                deg1i = deg1f.astype(jnp.int32)
                chk_v[...] = jnp.sum(deg1i, axis=1, keepdims=True)
                fcp = pltpu.make_async_copy(chk_v, chk_smem, copy_sem)
                fcp.start()
                # Vectorized mask/residual bookkeeping (overlaps the flag
                # DMA): a degree-1 check's single erased neighbor is
                # resolved by definition, so resolved = er & (touch >= 1).
                touch = jnp.dot(
                    ht_ref[...],
                    deg1f.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )  # (n1, bt)
                resolved = er_out[...] * (touch >= 1.0).astype(jnp.int32)
                er_out[...] = er_out[...] - resolved
                dec = jnp.sum(
                    resolved[:k_stop, :], axis=0, keepdims=True,
                    dtype=jnp.int32,
                )
                resid_scr[...] = resid_scr[...] - dec
                ch = jnp.sum(resolved)
                fcp.wait()
                jax.lax.fori_loop(0, nblk, blk_body, 0)
                resid = resid_scr[...]
                prev = iters_out[...]
                iters_out[...] = jnp.where(
                    (resid == 0) & (prev == 0), jnp.int32(it + 1), prev
                )
                rs = jnp.sum(resid)
                flag_smem[0] = jnp.where(
                    (ch == 0) | (rs == 0), jnp.int32(1), jnp.int32(0)
                )

            return carry

        jax.lax.fori_loop(0, max_iters, sweep_body, 0)

    return kernel


def _make_counted_kernel(
    *, n: int, k_stop: int, m: int, dmax: int, bt: int, max_iters: int,
    skip_idle: bool, cond_stores: bool, gf_order: int, cmax: int,
    m_blk8: int, m_rows: int, interpret: bool, wc: int, w_chunks: int,
):
    """Counted sequential sweep: the MATLAB Gauss-Seidel schedule (bit-exact,
    iteration counts included) with the count phase inverted.

    The plain sequential kernel recomputes every check's erasure count from
    its dmax neighbor rows at every visit — dmax (~14 at the headline code)
    tiny dynamic (1, bt) slices + adds per check per sweep, idle or not; the
    builder's round-2 profiling pinned this count phase as the dominant
    non-wide cost (~550 ns/visit). Here the counts are state, not derived:

    * a (m_rows, bt) int32 count matrix is initialized ONCE per tile from an
      XLA int8 matmul (``cnt0 = H @ er``, computed outside the kernel) and
      updated *incrementally* — when check c resolves symbol v in some
      frames, the count of every check adjacent to v (``clist_ref``, the
      symbol->checks adjacency) drops by 1 in those frames. The degree-1
      test collapses to ONE (1, bt) slice + compare per visit.
    * checks that cannot fire this sweep are skipped without any vector
      work: counts only decrease under peeling, so a check whose sweep-START
      count is 0 in every tile frame can never become degree-1 mid-sweep
      (VERDICT r2 next-round #1's semantics-exact skip). Per-sweep flags
      ``any(cnt > 0)`` are reduced in one vector pass, DMA'd to SMEM, and
      scanned in 8-check blocks as pure scalar loads + branches (the jacobi
      kernel's scan machinery) — an idle check costs ~1 scalar load.
    * checks that CAN fire run the exact sequential test on the live count
      row (Gauss-Seidel: mid-sweep resolutions propagate within the sweep,
      matching Matlab/My_LDPC_Erasure_Decoder.m:18-47 order exactly).

    Fixed point, masks, values, AND iteration counts are identical to
    ``schedule="seq"`` and the NumPy oracle (asserted in tests).
    """
    n1 = n + 1
    nblk = m_blk8 // 8

    def kernel(
        topo_ref,   # (dmax, m) int32 SMEM, pad = n
        coef_ref,   # (dmax, m) int32 SMEM ((1, 1) dummy for binary)
        inv_ref,    # (dmax, m) int32 SMEM ((1, 1) dummy for binary)
        clist_ref,  # (cmax, n1) int32 SMEM: checks adjacent to each symbol,
                    #   pad = m_blk8 (the dummy count row)
        vals_hbm,   # (ntiles, n1*bt, W) uint32 ANY (manual DMA)
        emask_ref,  # (n1*bt, 1) int8 VMEM in
        er_ref,     # (n1, bt) int32 VMEM in
        resid_ref,  # (1, bt) int32 VMEM in
        cnt0_ref,   # (m_rows, bt) int32 VMEM in: H @ er at decode start
        vals_out,   # (n1*bt, W) uint32 VMEM out (working buffer)
        er_out,     # (n1, bt) int32 VMEM out (working buffer)
        iters_out,  # (1, bt) int32 VMEM out
        resid_scr,  # (1, bt) int32 VMEM scratch
        changed_scr,  # (1, bt) int32 VMEM scratch
        cnt_scr,    # (m_rows, bt) int32 VMEM scratch: live per-check counts;
                    #   rows m..m_blk8-1 stay 0, row m_blk8 is the dummy
                    #   target for clist pad slots (garbage, never read)
        chk_v,      # (m_blk8, 1) int32 VMEM scratch: per-check sweep flags
        chk_smem,   # (m_blk8, 1) int32 SMEM: same flags for the scalar scan
        flag_smem,  # (3,) int32 SMEM: [done, deg1_any, unused]
        copy_sem,   # DMA semaphore (copy-in, then reused per sweep)
    ):
        # W-chunking: see the sequential kernel's copy-in note.
        if w_chunks > 1:
            wj = pl.multiple_of(pl.program_id(1) * wc, wc)
            if interpret:
                src = vals_hbm.at[pl.program_id(0), :, pl.ds(wj, wc)]
            else:
                src = vals_hbm.at[
                    pl.ds(pl.program_id(0), 1), :, pl.ds(wj, wc)
                ]
        elif interpret:
            src = vals_hbm.at[pl.program_id(0)]
        else:
            src = vals_hbm.at[pl.ds(pl.program_id(0), 1)]
        cp = pltpu.make_async_copy(src, vals_out, copy_sem)
        cp.start()
        cp.wait()
        vals_out[...] = jnp.where(
            emask_ref[...] != 0, jnp.uint32(0), vals_out[...]
        )
        er_out[...] = er_ref[...]
        resid_scr[...] = resid_ref[...]
        cnt_scr[...] = cnt0_ref[...]
        iters_out[...] = jnp.zeros((1, bt), jnp.int32)
        flag_smem[0] = 0

        def wide_work(c, deg1):
            idxs = [topo_ref[s, c] for s in range(dmax)]
            es = [er_out[pl.ds(idxs[s], 1), :] for s in range(dmax)]
            offs = [pl.multiple_of(idxs[s] * bt, bt) for s in range(dmax)]
            rows = [vals_out[pl.ds(o, bt), :] for o in offs]
            if gf_order == 2:
                acc = rows[0]
                for s in range(1, dmax):
                    acc = acc ^ rows[s]
            else:
                coefs = [coef_ref[s, c] for s in range(dmax)]
                acc = jnp.zeros_like(rows[0])
                for bit in range(7, -1, -1):
                    if bit < 7:
                        acc = _xtime(acc)
                    for s in range(dmax):
                        bv = ((coefs[s] >> bit) & 1).astype(jnp.uint32)
                        acc = acc ^ (rows[s] * bv)
            conds = [
                (deg1 & (es[s] != 0)).astype(jnp.int32)
                for s in range(dmax)
            ]
            conds_mat = jnp.concatenate(conds, axis=0)  # (dmax, bt)
            conds_f = jnp.transpose(conds_mat)          # (bt, dmax)
            dec = jnp.zeros_like(conds[0])
            for s in range(dmax):
                in_k = jnp.where(
                    idxs[s] < k_stop, jnp.int32(1), jnp.int32(0)
                )
                dec = dec + conds[s] * in_k
            resid_scr[...] = resid_scr[...] - dec
            changed_scr[...] = changed_scr[...] + deg1.astype(jnp.int32)

            def slot_update(s):
                condi = conds[s]
                er_out[pl.ds(idxs[s], 1), :] = es[s] - condi
                # Incremental count maintenance: every check adjacent to the
                # resolved symbol loses one erased neighbor in the resolved
                # frames (clist pad slots decrement the dummy row).
                for j in range(cmax):
                    t = clist_ref[j, idxs[s]]
                    cnt_scr[pl.ds(t, 1), :] = (
                        cnt_scr[pl.ds(t, 1), :] - condi
                    )
                cond_f = conds_f[:, s : s + 1] != 0  # (bt, 1) frame space
                if gf_order == 2:
                    val = acc
                else:
                    val = _gf_mul_scalar(acc, inv_ref[s, c])
                vals_out[pl.ds(offs[s], bt), :] = jnp.where(
                    cond_f, val, rows[s]
                )

            if cond_stores:
                # One vector->SMEM sync per fire gates ALL per-slot updates
                # (er store + cmax count RMWs + value store) on the slot
                # actually having an event in some frame: two chained
                # reduces pack the dmax any-event bits into one scalar.
                anyv = jnp.sum(conds_mat, axis=1, keepdims=True)  # (dmax, 1)
                w2 = jax.lax.broadcasted_iota(
                    jnp.int32, (dmax, 1), 0
                )
                bits = jnp.sum(
                    jnp.where(anyv > 0, jnp.int32(1) << w2, 0)
                )
                flag_smem[2] = bits
                ev_bits = flag_smem[2]
                for s in range(dmax):
                    @pl.when(((ev_bits >> s) & 1) == 1)
                    def _(s=s):
                        slot_update(s)
            else:
                for s in range(dmax):
                    slot_update(s)

        def visit(c):
            # Exact Gauss-Seidel degree-1 test on the LIVE count row
            # (mid-sweep resolutions already reflected).
            deg1 = cnt_scr[pl.ds(c, 1), :] == 1
            if skip_idle:
                flag_smem[1] = jnp.sum(deg1.astype(jnp.int32))

                @pl.when(flag_smem[1] > 0)
                def _():
                    wide_work(c, deg1)
            else:
                wide_work(c, deg1)

        def blk_body(blk, carry):
            # Pure scalar skip logic over the sweep-start flags in SMEM: an
            # idle 8-check block costs 8 scalar loads + one branch.
            base = blk * 8
            bsum = chk_smem[base, 0]
            for j in range(1, 8):
                bsum = bsum + chk_smem[base + j, 0]

            @pl.when(bsum > 0)
            def _():
                for j in range(8):

                    @pl.when(chk_smem[base + j, 0] > 0)
                    def _(j=j):
                        visit(base + j)

            return carry

        def sweep_body(it, carry):
            @pl.when(flag_smem[0] == 0)
            def _():
                changed_scr[...] = jnp.zeros((1, bt), jnp.int32)
                # Sweep-start flags: a check whose count is 0 in every frame
                # cannot become degree-1 mid-sweep (counts only decrease) —
                # skipping it is schedule-exact.
                chk_v[...] = jnp.sum(
                    (cnt_scr[pl.ds(0, m_blk8), :] > 0).astype(jnp.int32),
                    axis=1, keepdims=True,
                )
                fcp = pltpu.make_async_copy(chk_v, chk_smem, copy_sem)
                fcp.start()
                fcp.wait()
                jax.lax.fori_loop(0, nblk, blk_body, 0)
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


def static_topology(arrays, order: str = "natural") -> tuple:
    """Concrete per-check topology tuples for ``schedule="unrolled"``.

    Returns ``((idxs, coefs, invs), ...)`` — one entry per check, true
    degree only (no pad slots), all Python ints — hashable, so it rides the
    jit cache as a static argument. Must be built OUTSIDE any jit trace
    (host values); works on a :class:`CodeArrays` (or anything exposing
    vlist_idx / vlist_len / vlist_val / vlist_inv_val as concrete arrays).

    ``order`` permutes the baked visit sequence — the TPU form of the
    reference's 2-way check-partition schedule
    (OpenCL/device/ldpc_erasure_decoder_perf_tests.cl:95-203: two
    independent half-sweeps merged by union of known positions; tex:183).
    Any visit order reaches the same fixed point (every successful
    resolution writes the true codeword symbol, so resolutions commute);
    orders differ only in per-sweep dependence depth and convergence
    propagation:

    * ``"natural"`` — ROM order (the MATLAB/production sweep).
    * ``"split2"`` — interleave the two code halves [0, m/2, 1, m/2+1, ...]:
      adjacent program-order visits come from distant checks, which rarely
      share symbols, so Mosaic's (alias-decidable) scheduler can overlap
      them — the reference's split, refined to per-visit granularity.
    * ``"color"`` — greedy graph coloring: visits are emitted as runs of
      pairwise symbol-disjoint checks, making every run statically
      data-parallel inside its fence block.
    """
    import numpy as np

    vi = np.asarray(arrays.vlist_idx)
    vl = np.asarray(arrays.vlist_len)
    vv = np.asarray(arrays.vlist_val)
    iv = np.asarray(arrays.vlist_inv_val)
    m = vi.shape[0]
    if order == "natural":
        perm = range(m)
    elif order == "split2":
        h = -(-m // 2)
        perm = [c for i in range(h) for c in (i, h + i) if c < m]
    elif order == "color":
        # Greedy: repeatedly sweep the remaining checks in ROM order,
        # collecting a maximal run of pairwise symbol-disjoint checks.
        remaining = list(range(m))
        perm = []
        while remaining:
            seen: set[int] = set()
            run, rest = [], []
            for c in remaining:
                syms = set(int(x) for x in vi[c, : int(vl[c])])
                if seen.isdisjoint(syms):
                    run.append(c)
                    seen |= syms
                else:
                    rest.append(c)
            perm.extend(run)
            remaining = rest
    else:
        raise ValueError(f"unknown order {order!r}")
    out = []
    for c in perm:
        d = int(vl[c])
        out.append(
            (
                tuple(int(x) for x in vi[c, :d]),
                tuple(int(x) for x in vv[c, :d]),
                tuple(int(x) for x in iv[c, :d]),
            )
        )
    return tuple(out)


def _gf_mul_const(v, coef: int):
    """Packed GF(256) multiply by a COMPILE-TIME constant coefficient:
    only the set bits of ``coef`` emit ops."""
    acc = None
    cur = v
    for i in range(8):
        if (coef >> i) & 1:
            acc = cur if acc is None else acc ^ cur
        if i < 7 and (coef >> (i + 1)):
            cur = _xtime(cur)
    return jnp.zeros_like(v) if acc is None else acc


def _make_unrolled_kernel(
    *, n: int, k_stop: int, m: int, bt: int, max_iters: int, gf_order: int,
    topo: tuple, interpret: bool, wc: int, w_chunks: int, blk: int = 32,
    gate: bool = False, nf_pad: int = 0,
):
    """Fully-unrolled constant-topology sequential sweep — the round-3
    production schedule (522.8 Gbps at the headline point vs 341 for the
    dynamic-index kernel; bit-exact vs the oracle, iteration counts
    included).

    Every structural experiment on the dynamic kernel (counted incremental
    counts, grouped load-hoisting, cond_stores, jacobi detection) measured
    NEGATIVE: with runtime topology the compiler must serialize every
    dynamic-slice load against every prior dynamic store (aliasing is
    undecidable), so each of the ~147k check-visits per step costs ~440 ns
    of serialization no matter how few ops it contains. Baking the Vlist
    into the program as CONSTANT slice offsets makes aliasing decidable —
    Mosaic pipelines independent visits — and deletes every SMEM index load
    and pad slot (true degrees only). Two prices, both measured fine: one
    Mosaic compile per (code, shape) (~70 s at m=510; cached by jit), and a
    register-pressure ceiling handled by fencing the unrolled visits into
    8-check predicated blocks (the unfenced version spilled 97 MB of vregs).

    GF(256): the per-check Horner runs over compile-time coefficient bits —
    only set bits emit ops (~half the multiply work of the runtime kernel).

    ``gate`` (round 5, VERDICT r4 next #1 — fence-granularity idle
    skipping): the round-2/3 ``skip_idle``/``counted`` negatives were
    PER-VISIT branches whose vector->scalar sync cost more than the
    skipped work; here ONE predicate per ``blk``-visit fence gates the
    whole block, and all fence predicates are computed together at sweep
    start — ``act = F @ er`` on the MXU (F = the constant fence-by-symbol
    union-membership matrix, (nf_pad, n1) bf16) followed by one lane
    reduce and ONE flags DMA to SMEM per sweep, so an idle fence costs a
    scalar load + branch. Soundness: peeling only CLEARS erasure flags, so
    a fence whose symbol union holds no erasure at sweep start cannot
    produce a degree-1 event for the rest of the decode — skipping it is
    schedule-exact (bit-identical values, masks, AND iteration counts;
    asserted in tests). The fence predicate replaces the always-true
    opaque predicate, preserving the register-pressure fencing.
    Match: the FPGA's eventfulness economics — its sweeps also do wide
    work only for newly-resolvable checks
    (decoder_perf_tests.cl:86-88,205-210).
    """
    n1 = n + 1
    BLK = blk

    def kernel(*refs):
        # Positional refs; the ``gate`` variant adds one VMEM input (the
        # fence membership matrix) and two flag scratches.
        (
            topo_ref,   # (1, 1) dummies — topology is baked into the program
            coef_ref,
            inv_ref,
            aux_ref,
            vals_hbm,   # (ntiles, n1*bt, W) uint32 ANY (manual DMA)
            emask_ref,  # (n1*bt, 1) int8 VMEM in
            er_ref,     # (n1, bt) int32 VMEM in
            resid_ref,  # (1, bt) int32 VMEM in
        ) = refs[:8]
        if gate:
            fence_ref = refs[8]  # (nf_pad, n1) bf16 union membership
            (
                vals_out,   # (n1*bt, W) uint32 VMEM out (working buffer)
                er_out,     # (n1, bt) int32 VMEM out (working buffer)
                iters_out,  # (1, bt) int32 VMEM out
                resid_scr,  # (1, bt) int32 VMEM scratch
                changed_scr,  # (1, bt) int32 VMEM scratch
                fflag_v,    # (nf_pad, 1) int32 VMEM scratch: fence flags
                fflag_smem,  # (nf_pad, 1) int32 SMEM: same, for the scan
                flag_smem,  # (3,) int32 SMEM
                copy_sem,   # DMA semaphore
            ) = refs[9:]
        else:
            (
                vals_out,
                er_out,
                iters_out,
                resid_scr,
                changed_scr,
                flag_smem,
                copy_sem,
            ) = refs[8:]
        if w_chunks > 1:
            wj = pl.multiple_of(pl.program_id(1) * wc, wc)
            if interpret:
                src = vals_hbm.at[pl.program_id(0), :, pl.ds(wj, wc)]
            else:
                src = vals_hbm.at[
                    pl.ds(pl.program_id(0), 1), :, pl.ds(wj, wc)
                ]
        elif interpret:
            src = vals_hbm.at[pl.program_id(0)]
        else:
            src = vals_hbm.at[pl.ds(pl.program_id(0), 1)]
        cp = pltpu.make_async_copy(src, vals_out, copy_sem)
        cp.start()
        cp.wait()
        vals_out[...] = jnp.where(
            emask_ref[...] != 0, jnp.uint32(0), vals_out[...]
        )
        er_out[...] = er_ref[...]
        iters_out[...] = jnp.zeros((1, bt), jnp.int32)
        flag_smem[0] = 0

        def visit(c):
            idxs, coefs, invs = topo[c]
            d = len(idxs)
            es = [er_out[i : i + 1, :] for i in idxs]
            cnt = es[0]
            for s in range(1, d):
                cnt = cnt + es[s]
            deg1_i = (cnt == 1).astype(jnp.int32)
            rows = [vals_out[i * bt : (i + 1) * bt, :] for i in idxs]
            if gf_order == 2:
                acc = rows[0]
                for s in range(1, d):
                    acc = acc ^ rows[s]
            else:
                # Shared Horner over compile-time coefficient bits.
                acc = jnp.zeros_like(rows[0])
                for bit in range(7, -1, -1):
                    if bit < 7:
                        if all((cf >> (bit + 1)) == 0 for cf in coefs):
                            pass  # no higher bits anywhere: acc still zero
                        else:
                            acc = _xtime(acc)
                    for s in range(d):
                        if (coefs[s] >> bit) & 1:
                            acc = acc ^ rows[s]
            conds = [deg1_i * es[s] for s in range(d)]
            conds_f = jnp.transpose(jnp.concatenate(conds, axis=0))
            changed_scr[...] = changed_scr[...] + deg1_i
            for s, i in enumerate(idxs):
                er_out[i : i + 1, :] = es[s] - conds[s]
                cond_f = conds_f[:, s : s + 1] != 0
                if gf_order == 2:
                    val = acc
                else:
                    val = _gf_mul_const(acc, invs[s])
                vals_out[i * bt : (i + 1) * bt, :] = jnp.where(
                    cond_f, val, rows[s]
                )

        def sweep_body(it, carry):
            @pl.when(flag_smem[0] == 0)
            def _():
                changed_scr[...] = jnp.zeros((1, bt), jnp.int32)
                if gate:
                    # All fence predicates in one MXU pass + one flags DMA:
                    # act[f, frame] = erased count in fence f's symbol
                    # union (exact in bf16: counts <= blk * dmax << 256).
                    er_bf = er_out[...].astype(jnp.bfloat16)
                    act = jnp.dot(
                        fence_ref[...], er_bf,
                        preferred_element_type=jnp.float32,
                    )  # (nf_pad, bt)
                    fflag_v[...] = jnp.sum(
                        (act > 0.0).astype(jnp.int32), axis=1, keepdims=True
                    )
                    fcp = pltpu.make_async_copy(
                        fflag_v, fflag_smem, copy_sem
                    )
                    fcp.start()
                    fcp.wait()
                # Constant-address visits, fenced into BLK-check predicated
                # regions: the predicate bounds the scheduler's (alias-free)
                # hoisting window so it cannot blow the register file.
                # Ungated, it is dynamically opaque but always true; gated,
                # it additionally skips fences whose symbol union holds no
                # erasure in any tile frame (sound: erasures only clear).
                for fi, b0 in enumerate(range(0, m, BLK)):
                    pred = (
                        fflag_smem[fi, 0] > 0
                        if gate
                        else flag_smem[0] < 1 + it
                    )

                    @pl.when(pred)
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
                    (ch == 0) | (jnp.sum(resid) == 0),
                    jnp.int32(1),
                    jnp.int32(0),
                )

            return carry

        jax.lax.fori_loop(0, max_iters, sweep_body, 0)

    return kernel


def _make_grouped_kernel(
    *, n: int, k_stop: int, m: int, dmax: int, bt: int, max_iters: int,
    skip_idle: bool, gf_order: int, ngroups: int, interpret: bool,
    wc: int, w_chunks: int,
):
    """Grouped sequential sweep: the exact MATLAB Gauss-Seidel schedule with
    the visit loop restructured for ILP.

    The boundedness experiment (scripts/bench_boundedness.py) showed the
    sweep is op-issue/latency-bound, not VMEM-bandwidth-bound: halving the
    wide bytes (W=128 vs 256) barely moves the step time, and each check
    visit's ~30 stores serialize against the next visit's ~28 loads (the
    compiler cannot disprove aliasing of dynamic slices). Fix: the host
    groups CONSECUTIVE checks into pairwise-DISJOINT runs of <= 4
    (``CodeArrays.check_groups``). Disjoint checks commute under the
    sequential sweep — none reads or writes another's symbols — so the
    whole group's er/value loads are issued BEFORE any member's stores,
    giving the hardware up to 4 independent visit pipelines while computing
    the bit-identical result (values, masks, iteration counts) of the plain
    sequential order. Group padding slots point at the dummy check m (all
    pad-column neighbors) and are skipped by a scalar compare.
    """
    n1 = n + 1
    gsz = 4

    def kernel(
        topo_ref,   # (dmax, m+1) int32 SMEM, pad = n; col m = dummy check
        coef_ref,   # (dmax, m+1) int32 SMEM ((1, 1) dummy for binary)
        inv_ref,    # (dmax, m+1) int32 SMEM ((1, 1) dummy for binary)
        grp_ref,    # (4, ngroups) int32 SMEM: grouped check ids, pad = m
        vals_hbm,   # (ntiles, n1*bt, W) uint32 ANY (manual DMA)
        emask_ref,  # (n1*bt, 1) int8 VMEM in
        er_ref,     # (n1, bt) int32 VMEM in
        resid_ref,  # (1, bt) int32 VMEM in
        vals_out,   # (n1*bt, W) uint32 VMEM out (working buffer)
        er_out,     # (n1, bt) int32 VMEM out (working buffer)
        iters_out,  # (1, bt) int32 VMEM out
        resid_scr,  # (1, bt) int32 VMEM scratch
        changed_scr,  # (1, bt) int32 VMEM scratch
        flag_smem,  # (3,) int32 SMEM
        copy_sem,   # DMA semaphore
    ):
        if w_chunks > 1:
            wj = pl.multiple_of(pl.program_id(1) * wc, wc)
            if interpret:
                src = vals_hbm.at[pl.program_id(0), :, pl.ds(wj, wc)]
            else:
                src = vals_hbm.at[
                    pl.ds(pl.program_id(0), 1), :, pl.ds(wj, wc)
                ]
        elif interpret:
            src = vals_hbm.at[pl.program_id(0)]
        else:
            src = vals_hbm.at[pl.ds(pl.program_id(0), 1)]
        cp = pltpu.make_async_copy(src, vals_out, copy_sem)
        cp.start()
        cp.wait()
        vals_out[...] = jnp.where(
            emask_ref[...] != 0, jnp.uint32(0), vals_out[...]
        )
        er_out[...] = er_ref[...]
        resid_scr[...] = resid_ref[...]
        iters_out[...] = jnp.zeros((1, bt), jnp.int32)
        flag_smem[0] = 0

        def group_body(j, carry):
            cs = [grp_ref[a, j] for a in range(gsz)]
            idxs = [
                [topo_ref[s, cs[a]] for s in range(dmax)] for a in range(gsz)
            ]
            # ALL group loads before ANY member's stores: members are
            # pairwise disjoint, so every load still sees the exact
            # just-before-its-check state.
            es = [
                [er_out[pl.ds(idxs[a][s], 1), :] for s in range(dmax)]
                for a in range(gsz)
            ]
            offs = [
                [pl.multiple_of(idxs[a][s] * bt, bt) for s in range(dmax)]
                for a in range(gsz)
            ]
            rows = [
                [vals_out[pl.ds(o, bt), :] for o in offs[a]]
                for a in range(gsz)
            ]

            for a in range(gsz):
                cnt = es[a][0]
                for s in range(1, dmax):
                    cnt = cnt + es[a][s]
                deg1 = cnt == 1

                def work(a=a, deg1=deg1):
                    if gf_order == 2:
                        acc = rows[a][0]
                        for s in range(1, dmax):
                            acc = acc ^ rows[a][s]
                    else:
                        coefs = [coef_ref[s, cs[a]] for s in range(dmax)]
                        acc = jnp.zeros_like(rows[a][0])
                        for bit in range(7, -1, -1):
                            if bit < 7:
                                acc = _xtime(acc)
                            for s in range(dmax):
                                bv = ((coefs[s] >> bit) & 1).astype(
                                    jnp.uint32
                                )
                                acc = acc ^ (rows[a][s] * bv)
                    conds = [
                        (deg1 & (es[a][s] != 0)).astype(jnp.int32)
                        for s in range(dmax)
                    ]
                    conds_mat = jnp.concatenate(conds, axis=0)
                    conds_f = jnp.transpose(conds_mat)  # (bt, dmax)
                    dec = jnp.zeros_like(conds[0])
                    for s in range(dmax):
                        in_k = jnp.where(
                            idxs[a][s] < k_stop, jnp.int32(1), jnp.int32(0)
                        )
                        dec = dec + conds[s] * in_k
                    resid_scr[...] = resid_scr[...] - dec
                    changed_scr[...] = (
                        changed_scr[...] + deg1.astype(jnp.int32)
                    )
                    for s in range(dmax):
                        er_out[pl.ds(idxs[a][s], 1), :] = es[a][s] - conds[s]
                        cond_f = conds_f[:, s : s + 1] != 0
                        if gf_order == 2:
                            val = acc
                        else:
                            val = _gf_mul_scalar(acc, inv_ref[s, cs[a]])
                        vals_out[pl.ds(offs[a][s], bt), :] = jnp.where(
                            cond_f, val, rows[a][s]
                        )

                if skip_idle:
                    flag_smem[1] = jnp.sum(deg1.astype(jnp.int32))

                    @pl.when((cs[a] < m) & (flag_smem[1] > 0))
                    def _():
                        work()
                else:
                    # Scalar compare skips group-padding slots entirely.
                    @pl.when(cs[a] < m)
                    def _():
                        work()

            return carry

        def sweep_body(it, carry):
            @pl.when(flag_smem[0] == 0)
            def _():
                changed_scr[...] = jnp.zeros((1, bt), jnp.int32)
                jax.lax.fori_loop(0, ngroups, group_body, 0)
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
        "max_iters", "early_stop_k", "b_tile", "skip_idle",
        "cond_stores", "gf_order", "serpentine", "schedule", "tiled",
        "interpret", "w_chunk", "static_topo", "unroll_blk", "fence_gate",
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
    skip_idle: bool = False,
    cond_stores: bool | None = None,
    gf_order: int = 2,
    serpentine: bool = False,
    schedule: str = "seq",
    tiled: bool = False,
    interpret: bool = False,
    w_chunk: int = 0,
    static_topo: tuple | None = None,
    unroll_blk: int = 32,
    fence_gate: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """VMEM-resident peeling decode; sequential (MATLAB) schedule.

    Drop-in for :func:`ops.peel_wide.peel_decode_wide` (same signature and
    fixed point; iteration counts follow the sequential schedule, i.e. equal
    the oracle's, not the Jacobi path's).

    Args:
      values: (B, n, W) packed uint32 words for binary; (B, n, W) uint8
        byte symbols (W % 4 == 0) for gf_order=256, SWAR-packed 4-per-uint32
        internally via pure bitcast. Erased slots may hold anything:
        masking is fused into the kernel (so the un-erased channel output can
        be passed directly, saving the apply_erasures HBM pass).
      erased: (B, n) bool.
      early_stop_k: stop a frame once its first ``early_stop_k`` symbols are
        resolved (None = all n). With early stop the PARITY-region residual
        is stopping-schedule-dependent (this kernel stops per b_tile; the
        XLA paths stop per whole batch) — the first-k region and every
        resolved symbol's value are schedule-invariant and identical across
        all implementations (the FPGA's contract too,
        decoder_perf_tests.cl:205-210).
      b_tile: frames held in VMEM per grid step; must be a multiple of 8
        on hardware (Mosaic requires sublane-aligned dynamic slices — bt=4
        fails to compile; any value works in interpret mode). On hardware
        the symbol width must also be a multiple of 128 uint32 words
        (512 bytes for gf_order=256): the copy-in DMA slices the lane dim
        and Mosaic requires lane-tile-aligned slices. Narrow symbols take
        the XLA wide path instead.
        VMEM footprint is about
        ``2 * b_tile * (n+1) * W * 4`` bytes (double-buffered working
        window; the input stays in HBM and is DMA'd straight into the
        working buffer): b_tile=16, W=256, n=2040 → ~67 MB of the chip's
        128 MB; b_tile=32 fits single-buffered. b_tile=32 measured best
        at the headline shape (177 Gbps vs 142 at bt=16 on v5e).
      skip_idle: gate each check's wide work on a per-visit degree-1-any
        test (one (1, bt) reduce + scalar branch). MEASURED NEGATIVE at the
        event-dense production points on v5e (round 3: 75.1 vs 78.3 ms/step
        at the headline shape — the vector->scalar sync costs more than the
        skipped wide work; converged tiles already stop at the sweep level),
        so the default flipped to False in round 3. Useful only for
        mostly-idle regimes with many sweeps.
      serpentine: odd sweeps run the check loop high-to-low. Same fixed
        point (schedule-invariant); iteration counts differ from the
        forward-only MATLAB schedule. MEASURED NEGATIVE at the headline
        operating point on v5e (165 vs 177 Gbps at bt=32: the (2040,1530)
        code's resolution chains mostly point DOWN the row order — the
        direction the MATLAB schedule was designed for — so reversing
        every other sweep adds a sweep instead of saving one). Kept as a
        research knob.
      schedule: ``"seq"`` (default) runs the MATLAB sequential Gauss-Seidel
        sweep (bit-exact vs the oracle, iteration counts included);
        ``"counted"`` runs the SAME schedule (bit-exact, iteration counts
        included) with the count phase inverted: live per-check counts
        maintained incrementally via the symbol->checks adjacency (one
        (1, bt) slice per visit instead of dmax) and sweep-start ``cnt == 0``
        checks skipped with pure scalar branches (sound under monotone
        erasures — see ``_make_counted_kernel``);
        ``"jacobi"`` detects degree-1 checks from sweep-start counts
        computed in ONE MXU matmul per sweep and scans them in 8-check
        blocks — the idle-check cost drops ~27x, at the price of the
        Jacobi sweep count (<=8 vs <=5 at the headline point; masks AND
        iteration counts match the XLA ``peel_decode`` Jacobi paths
        bit-exactly, asserted in tests). Fixed point and all resolved
        values are schedule-invariant. ``"seq"`` is the MATLAB-parity
        schedule and the measured production default.
      tiled: ``values`` is already in the kernel's tile-major layout
        (:func:`tile_wide`; ``encode_packed_vmem(..., tiled_out=True)``
        emits it natively) — (ntiles, (n+1)*b_tile, W) uint32, ALREADY
        word-packed for gf_order=256. Skips the full-batch host transpose
        on the way in (~26 ms/step at the headline shape) and returns
        ``values`` in the same tiled layout (``untile_wide`` converts;
        pad-frame lanes are unspecified). The production layout for
        encode->channel->decode pipelines.
      w_chunk: symbols wider than this many uint32 words decode in
        wc-word chunks on a (ntiles, W/wc) grid: mask evolution is
        value-independent, so every chunk is an independent decode of the
        same frame — identical fixed point, masks, and iteration counts —
        while the VMEM working tile stays (n+1)*bt*wc, decoupling b_tile
        from the symbol width (W=512 previously forced bt=16 and lost
        ~38% throughput; chunked it keeps the headline bt=32 tile). The
        chunk DMA slices the lane axis of the SAME HBM buffer — no
        layout change, tiled handoff included. 0 (default) auto-chunks
        to 256 words when W > 256 and divisible; -1 disables; explicit
        values must divide W (and be lane-aligned on hardware). The mask
        sweep repeats per chunk, the same per-frame accounting as
        decoding the chunks as separate frames.
      unroll_blk: fence size of the unrolled schedule's predicated visit
        blocks (the unfenced program spilled 97 MB of vregs — round 3).
        Round-4 sweep at the headline point (scripts/bench_check_orders.py):
        8 -> 519-522 Gbps, 16 -> 534-540, **32 -> 550-551 (default)**,
        64 -> 543-551, 128 -> 492 (register pressure returns). Visit
        ORDER is irrelevant (natural/split2/color all within noise at
        equal blk) — the sweep is op-throughput-bound, not
        dependence-depth-bound, so only the fence width that bounds
        Mosaic's scheduling window matters. Unrolled schedule only.
      fence_gate: gate each ``unroll_blk``-visit fence of the unrolled
        program on a sweep-start "any erasure in this fence's symbol
        union" predicate — all predicates computed in one small MXU
        matmul + one flags DMA per sweep, each idle fence then costs a
        scalar load + branch instead of its full baked op payload. Sound
        (erasures only clear) and schedule-exact: values, masks, and
        iteration counts are bit-identical to the ungated program.
        Unrolled schedule only.

    Returns (values, erased, iters) — (B, n, W), (B, n) bool, (B,) int32;
    with ``tiled=True`` values is (ntiles, (n+1)*b_tile, W).
    """
    b, n = erased.shape
    m, dmax = arrays.vlist_idx.shape
    k_stop = n if early_stop_k is None else int(early_stop_k)
    bt = int(b_tile)
    n1 = n + 1
    ntiles = -(-b // bt)
    bp = ntiles * bt
    if tiled:
        if values.dtype != jnp.uint32:
            raise ValueError(
                "tiled=True expects uint32 (word-packed for gf_order=256)"
            )
        if values.shape != (ntiles, n1 * bt, values.shape[2]):
            raise ValueError(
                f"tiled values shape {values.shape} != "
                f"({ntiles}, {n1 * bt}, W) for B={b}, b_tile={bt}"
            )
        w = values.shape[2]
    else:
        if values.shape[:2] != (b, n):
            raise ValueError(
                f"values shape {values.shape} inconsistent with erased "
                f"{erased.shape}"
            )
        w = values.shape[2]
    if not interpret and jax.default_backend() == "cpu":
        # No Mosaic on the CPU backend — fall back to the interpreter so
        # callers (hybrid_decode, sims, tests) are backend-agnostic.
        interpret = True
    if not interpret and bt % 8 != 0:
        raise ValueError(
            f"b_tile={bt} must be a multiple of 8 on hardware (Mosaic "
            "sublane-aligned dynamic slices)"
        )
    w_eff = w // 4 if (gf_order == 256 and not tiled) else w
    if not interpret and w_eff % 128 != 0:
        raise ValueError(
            f"W={w_eff} uint32 words must be a multiple of 128 on hardware "
            "(the copy-in DMA slices the lane dim, and Mosaic requires "
            "lane-tile-aligned slices). Use peel_decode_wide for narrow "
            "symbols."
        )
    if cond_stores is None:
        # Measured on v5e: scalar-bitmask store skipping LOSES for both
        # binary (78.8 vs 98.5 Gbps) and GF(256) (55.2 vs 64.0 Gbps at
        # S=8192) — the vector->SMEM->branch round trips stall the pipelines
        # for more than the skipped stores / inverse multiplies cost. Kept
        # as a research knob.
        cond_stores = False
    if schedule not in ("seq", "unrolled", "counted", "grouped", "jacobi"):
        raise ValueError(
            "schedule must be 'seq', 'unrolled', 'counted', 'grouped' or "
            f"'jacobi', got {schedule!r}"
        )
    jacobi = schedule == "jacobi"
    counted = schedule == "counted"
    grouped = schedule == "grouped"
    unrolled = schedule == "unrolled"
    if unrolled:
        if static_topo is None:
            raise ValueError(
                "schedule='unrolled' needs static_topo="
                "pallas_peel.static_topology(arrays) resolved OUTSIDE jit "
                "(the constant-topology program cannot be built from traced "
                "arrays)"
            )
        if len(static_topo) != m:
            raise ValueError(
                f"static_topo has {len(static_topo)} checks, code has {m}"
            )
    elif static_topo is not None:
        raise ValueError("static_topo only applies to schedule='unrolled'")
    if fence_gate and not unrolled:
        raise ValueError("fence_gate only applies to schedule='unrolled'")
    if (jacobi or counted or grouped or unrolled) and serpentine:
        raise ValueError("serpentine applies to the plain sequential schedule")
    m_pad = -(-m // 8) * 8 if jacobi else m
    m_blk8 = -(-m // 8) * 8
    m_rows = m_blk8 + 8  # row m_blk8 = dummy decrement target for clist pads
    cmax = int(arrays.clist_idx.shape[1])

    packed_nb = gf_order == 256
    if packed_nb and not tiled:
        if values.dtype != jnp.uint8 or w % 4 != 0:
            raise ValueError(
                "gf_order=256 needs uint8 values with W a multiple of 4"
            )
        values = jax.lax.bitcast_convert_type(
            values.reshape(b, n, w // 4, 4), jnp.uint32
        )
        w = w // 4

    # W-chunking (uint32 words, i.e. post-packing for NB).
    if w_chunk == 0:
        wc = 256 if (w > 256 and w % 256 == 0) else w
    elif w_chunk < 0 or w_chunk >= w:
        wc = w
    else:
        wc = int(w_chunk)
        if w % wc != 0:
            raise ValueError(f"w_chunk={wc} must divide W={w} (uint32 words)")
        if not interpret and wc % 128 != 0:
            raise ValueError(
                f"w_chunk={wc} must be a multiple of 128 words on hardware"
            )
    w_chunks = w // wc

    epad = jnp.pad(erased, ((0, bp - b), (0, 1)))
    if tiled:
        vt = values
    else:
        # (ntiles, n1*bt, W), the tile's bt frames contiguous per symbol.
        vt = tile_wide(values, bt)
    # Copy-in mask sidecar, same row order as vt.
    emask = epad.astype(jnp.int8).reshape(ntiles, bt, n1).swapaxes(
        1, 2
    ).reshape(ntiles, n1 * bt, 1)
    # Working erasure state, frames on the lane axis.
    et = epad.astype(jnp.int32).reshape(ntiles, bt, n1).swapaxes(1, 2)
    resid = jnp.sum(
        epad[:, :k_stop], axis=1, dtype=jnp.int32
    ).reshape(ntiles, 1, bt)

    ngroups = int(arrays.check_groups.shape[0])
    nf_pad = 0
    fence_mat = None
    if fence_gate:
        # Constant fence-by-symbol union membership, built host-side from
        # the static topology (F[f, i] = 1 iff symbol i is a neighbor of
        # some check in fence f). Tiny: nf = ceil(m / unroll_blk) rows.
        import numpy as np

        nf = -(-m // unroll_blk)
        nf_pad = -(-nf // 8) * 8
        fm = np.zeros((nf_pad, n1), np.float32)
        for fi in range(nf):
            for c in range(fi * unroll_blk, min((fi + 1) * unroll_blk, m)):
                for sidx in static_topo[c][0]:
                    fm[fi, sidx] = 1.0
        fence_mat = jnp.asarray(fm, jnp.bfloat16)
    kernel = _make_kernel(
        n=n, k_stop=k_stop, m=m, dmax=dmax, bt=bt, max_iters=max_iters,
        skip_idle=skip_idle, cond_stores=cond_stores, gf_order=gf_order,
        serpentine=serpentine, jacobi=jacobi, counted=counted,
        grouped=grouped, ngroups=ngroups, cmax=cmax,
        m_blk8=m_blk8, m_rows=m_rows, m_pad=m_pad,
        static_topo=static_topo if unrolled else None,
        interpret=interpret, wc=wc, w_chunks=w_chunks,
        unroll_blk=unroll_blk, fence_gate=fence_gate, nf_pad=nf_pad,
    )
    # The big values operand stays in HBM (manual DMA straight into the
    # working/output window), so VMEM holds only the output copies. Large
    # tiles (W=512/bt=8, or bt=32 at W=256) exceed VMEM when the pipeline
    # double-buffers the output; drop those to single buffering (compute >>
    # copy time at these shapes, so the lost overlap is negligible).
    vals_bytes = n1 * bt * wc * 4
    from ldpc_erasure_codes_tpu.utils.device import kernel_vmem_limit
    dbl_budget = kernel_vmem_limit() - 16 * 1024 * 1024  # 96 MiB on v5e
    nbuf = 2 if 2 * vals_bytes <= dbl_budget else 1
    big_mode = None if nbuf == 2 else pl.Buffered(buffer_count=1)
    # Flat ceiling: the kernel's true footprint is nbuf*vals_bytes plus the
    # lane-padded small operands (the (X, 1) emask sidecar pads to 128
    # lanes); a tight per-shape bound buys nothing and under-estimating it
    # kills the compile. 7/8 of the generation's VMEM (112 MiB on v5e).
    from ldpc_erasure_codes_tpu.utils.device import kernel_vmem_limit

    vmem_limit = kernel_vmem_limit()
    # With W-chunking the grid grows a minor chunk axis: the mask-side
    # blocks ignore it (same block revisited for consecutive j — fetched
    # once, copied out after the last chunk; every chunk writes identical
    # mask results), only the values output indexes it.
    if w_chunks > 1:
        grid = (ntiles, w_chunks)
        map_tile = lambda i, j, topo, cf, iv, cl: (i, 0, 0)
        map_const = lambda i, j, topo, cf, iv, cl: (0, 0)
        map_vals = lambda i, j, topo, cf, iv, cl: (i, 0, j)
    else:
        grid = (ntiles,)
        map_tile = lambda i, topo, cf, iv, cl: (i, 0, 0)
        map_const = lambda i, topo, cf, iv, cl: (0, 0)
        map_vals = lambda i, topo, cf, iv, cl: (i, 0, 0)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(
            (None, n1 * bt, 1), map_tile,
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (None, n1, bt), map_tile,
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (None, 1, bt), map_tile,
            memory_space=pltpu.VMEM,
        ),
    ]
    if jacobi:
        # Dense [H; slot-weighted H] for the per-sweep MXU count/eid matmul
        # and H^T for the vectorized resolve pass (constant across the
        # grid; ~6 MB bf16 at the headline code) + the scratches they fill.
        in_specs.append(
            pl.BlockSpec(
                (2 * m_pad, n1), map_const,
                memory_space=pltpu.VMEM,
            )
        )
        in_specs.append(
            pl.BlockSpec(
                (n1, m_pad), map_const,
                memory_space=pltpu.VMEM,
            )
        )
        scratch_shapes = [
            pltpu.VMEM((1, bt), jnp.int32),
            pltpu.VMEM((2 * m_pad, bt), jnp.float32),
            pltpu.VMEM((m_pad, 1), jnp.int32),
            pltpu.SMEM((m_pad, 1), jnp.int32),
        ]
    elif counted:
        # Initial per-check counts (H @ er, computed by XLA outside) + the
        # live count matrix and sweep-flag scratches.
        in_specs.append(
            pl.BlockSpec(
                (None, m_rows, bt), map_tile,
                memory_space=pltpu.VMEM,
            )
        )
        scratch_shapes = [
            pltpu.VMEM((1, bt), jnp.int32),
            pltpu.VMEM((1, bt), jnp.int32),
            pltpu.VMEM((m_rows, bt), jnp.int32),
            pltpu.VMEM((m_blk8, 1), jnp.int32),
            pltpu.SMEM((m_blk8, 1), jnp.int32),
        ]
    else:
        scratch_shapes = [
            pltpu.VMEM((1, bt), jnp.int32),
            pltpu.VMEM((1, bt), jnp.int32),
        ]
        if fence_gate:
            # Fence membership matrix (constant across the grid) + the
            # per-sweep fence flags (vector side + SMEM copy for the
            # scalar fence-gate branches).
            in_specs.append(
                pl.BlockSpec(
                    (nf_pad, n1), map_const, memory_space=pltpu.VMEM
                )
            )
            scratch_shapes += [
                pltpu.VMEM((nf_pad, 1), jnp.int32),
                pltpu.SMEM((nf_pad, 1), jnp.int32),
            ]
    scratch_shapes += [
        pltpu.SMEM((3,), jnp.int32),
        pltpu.SemaphoreType.DMA,
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (None, n1 * bt, wc), map_vals,
                memory_space=pltpu.VMEM, pipeline_mode=big_mode,
            ),
            pl.BlockSpec(
                (None, n1, bt), map_tile,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, 1, bt), map_tile,
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=scratch_shapes,
    )
    if unrolled:
        # Topology (and GF coefficients) are baked into the program as
        # constants; all four prefetch slots shrink to 1x1 dummies.
        topo_t = coef_t = inv_t = jnp.zeros((1, 1), jnp.int32)
    else:
        topo_t = arrays.vlist_idx.T
        if gf_order == 2:
            # Coefficients are never read on the binary path — 1x1 dummies
            # keep their SMEM slots negligible.
            coef_t = inv_t = jnp.zeros((1, 1), jnp.int32)
        else:
            coef_t = arrays.vlist_val.astype(jnp.int32).T
            inv_t = arrays.vlist_inv_val.astype(jnp.int32).T
    if grouped:
        # Dummy check column m: all neighbors = the pad symbol (never fires;
        # group-padding slots also scalar-skip before any vector work).
        topo_t = jnp.pad(topo_t, ((0, 0), (0, 1)), constant_values=n)
        if gf_order != 2:
            coef_t = jnp.pad(coef_t, ((0, 0), (0, 1)))
            inv_t = jnp.pad(inv_t, ((0, 0), (0, 1)))
    if counted:
        # Symbol->checks adjacency, transposed like the other SMEM tables;
        # pad slots retarget from m to the kernel's dummy count row.
        cl = arrays.clist_idx.T.astype(jnp.int32)
        clist_t = jnp.where(cl >= m, jnp.int32(m_blk8), cl)
        # Pad column n (the shared zero pad symbol) also hits the dummy row.
        clist_t = jnp.pad(clist_t, ((0, 0), (0, 1)), constant_values=m_blk8)
    elif grouped:
        # The aux prefetch slot carries the grouped check ids instead.
        clist_t = arrays.check_groups.T.astype(jnp.int32)
    else:
        clist_t = jnp.zeros((1, 1), jnp.int32)
    operands = [vt, emask, et, resid]
    if fence_gate:
        operands.append(fence_mat)
    if counted:
        # Initial counts cnt0 = H @ er per tile (int8 MXU, fused by XLA into
        # the surrounding layout work; counts <= dmax fit comfortably).
        hp = jnp.pad(arrays.h.astype(jnp.int8), ((0, m_rows - m), (0, 1)))
        cnt0 = jnp.einsum(
            "mn,tnb->tmb", hp, et.astype(jnp.int8),
            preferred_element_type=jnp.int32,
        )
        operands.append(cnt0)
    if jacobi:
        if m_pad > m:
            # Pad checks: topology points at the always-unerased pad slot,
            # H rows are zero, so their counts are 0 and they never fire.
            topo_t = jnp.pad(topo_t, ((0, 0), (0, m_pad - m)),
                             constant_values=n)
            if gf_order != 2:
                coef_t = jnp.pad(coef_t, ((0, 0), (0, m_pad - m)))
                inv_t = jnp.pad(inv_t, ((0, 0), (0, m_pad - m)))
        hb = jnp.pad(
            arrays.h.astype(jnp.float32), ((0, m_pad - m), (0, 1))
        )  # (m_pad, n1), col n and pad rows zero
        # Slot-index weighted support: Hs[c, vlist_idx[c, s]] = s. Exact in
        # bf16 (row sums <= dmax^2 < 256).
        hs = jnp.zeros((m, n1), jnp.float32)
        hs = hs.at[
            jnp.arange(m)[:, None], arrays.vlist_idx
        ].set(jnp.broadcast_to(
            jnp.arange(dmax, dtype=jnp.float32)[None, :], (m, dmax)
        ))
        hs = hs.at[:, n].set(0.0)
        hs = jnp.pad(hs, ((0, m_pad - m), (0, 0)))
        operands.append(
            jnp.concatenate([hb, hs], axis=0).astype(jnp.bfloat16)
        )
        operands.append(hb.T.astype(jnp.bfloat16))
    vals_t, er_t, iters_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((ntiles, n1 * bt, w), jnp.uint32),
            jax.ShapeDtypeStruct((ntiles, n1, bt), jnp.int32),
            jax.ShapeDtypeStruct((ntiles, 1, bt), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit),
        ),
        interpret=interpret,
    )(
        topo_t,
        coef_t,
        inv_t,
        clist_t,
        *operands,
    )

    if tiled:
        vals = vals_t  # stay in tile layout (word-packed for NB)
    else:
        vals = untile_wide(vals_t, b, n)
        if packed_nb:
            vals = jax.lax.bitcast_convert_type(vals, jnp.uint8).reshape(
                b, n, 4 * w
            )
    er = (
        er_t.swapaxes(1, 2).reshape(bp, n1)[:b, :n] != 0
    )
    iters = iters_t.reshape(bp)[:b]
    iters = jnp.where(iters == 0, jnp.int32(max_iters), iters)
    return vals, er, iters
