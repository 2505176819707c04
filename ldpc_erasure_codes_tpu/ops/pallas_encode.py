"""Pallas TPU kernel: VMEM-resident systematic triangular encoder.

Companion to :mod:`ops.pallas_peel`: a tile of ``bt`` frames' source blocks
is staged into VMEM, the parity region is computed by one sequential pass
over the m parity rows — exactly the reference's back-substitution
p_i = H[i, :k+i] . v[:k+i] (Matlab/LDPCErasureCodes_MessagePassingAlgSim.m:
164-174; FPGA kernel OpenCL/device/ldpc_erasure_encoder.cl:72-84) — and the
finished codewords leave for HBM once. Each row's work is a handful of
sublane-aligned (bt, W) slice-XORs with indices scalar-prefetched from SMEM
(source-region neighbors from ``enc_src_idx``, strictly-lower parity
neighbors from ``enc_par_idx``); the XLA scan encoder re-streams its gather
through HBM instead and tops out ~10x lower (docs/DESIGN.md).

GF(256): each neighbor term is a packed-byte multiply by the edge
coefficient (Horner form over the coefficient bits, as the decode kernel)
and the row closes with a multiply by the inverse diagonal coefficient
(ErasureCodes_NonBinaryLDPCSim.m:172-182). Byte symbols ride 4-per-uint32
via pure bitcast — the same memory layout as binary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldpc_erasure_codes_tpu.ops.arrays import CodeArrays
from ldpc_erasure_codes_tpu.ops.pallas_peel import _gf_mul_const, _gf_mul_scalar


def static_enc_topology(arrays, k: int) -> tuple:
    """Concrete per-parity-row encode topology for the unrolled encoder.

    Returns ``((src_rows, src_coefs, par_rows, par_coefs, dinv), ...)`` with
    true degrees only (no pad slots), source neighbors already remapped to
    output-window rows (pad k -> n never appears — pads are dropped), parity
    neighbors as absolute output rows (k + pidx). Hashable Python ints; must
    be built OUTSIDE jit.
    """
    import numpy as np

    si = np.asarray(arrays.enc_src_idx)
    sv = np.asarray(arrays.enc_src_val)
    pi = np.asarray(arrays.enc_par_idx)
    pv = np.asarray(arrays.enc_par_val)
    dv = np.asarray(arrays.enc_diag_inv)
    m = si.shape[0]
    out = []
    for r in range(m):
        s_sel = si[r] < k
        p_sel = pi[r] < m
        out.append(
            (
                tuple(int(x) for x in si[r][s_sel]),
                tuple(int(x) for x in sv[r][s_sel]),
                tuple(int(k + x) for x in pi[r][p_sel]),
                tuple(int(x) for x in pv[r][p_sel]),
                int(dv[r]),
            )
        )
    return tuple(out)


def _make_unrolled_kernel(
    *, n: int, k: int, m: int, bt: int, gf_order: int, topo: tuple,
    wc: int, w_chunks: int, blk: int = 8,
):
    """Constant-topology unrolled back-substitution (round 3): the
    decoder's ``schedule="unrolled"`` lesson applied to the encoder. The
    dynamic row loop serializes every slice read against every prior parity
    store (aliasing undecidable); with the topology baked in, Mosaic sees
    the true ~27-level dependency DAG and pipelines independent rows. Rows
    are fenced into 8-row opaquely-predicated blocks to bound register
    pressure (width ``blk``; measured FLAT 8 vs 32 at the NB B=512 point
    — encode share 12.9 vs 14.1 ms, within noise: the encoder's true
    back-substitution DAG binds, not the fence width, so the decoder's
    round-4 fence win does not transfer). GF(256) coefficients
    multiply via compile-time bits (:func:`pallas_peel._gf_mul_const`) —
    only set bits emit ops."""
    BLK = blk

    def kernel(
        tab_ref,   # (1, 1) int32 dummy — topology baked into the program
        src_hbm,   # (ntiles, k*bt, W) uint32 ANY
        out_ref,   # ((n+1)*bt, W) uint32 VMEM out
        flag_smem,  # (1,) int32 SMEM: opaque always-zero fence predicate
        copy_sem,  # DMA semaphore
    ):
        if w_chunks > 1:
            src = src_hbm.at[
                pl.program_id(0), :,
                pl.ds(pl.multiple_of(pl.program_id(1) * wc, wc), wc)
            ]
        else:
            src = src_hbm.at[pl.program_id(0)]
        cp = pltpu.make_async_copy(
            src,
            out_ref.at[pl.ds(0, k * bt), :],
            copy_sem,
        )
        cp.start()
        cp.wait()
        out_ref[n * bt : (n + 1) * bt, :] = jnp.zeros(
            (bt, out_ref.shape[1]), jnp.uint32
        )
        flag_smem[0] = 0

        def row(i):
            src_rows, src_coefs, par_rows, par_coefs, dinv = topo[i]
            acc = None
            for rr, cf in zip(
                src_rows + par_rows, src_coefs + par_coefs
            ):
                term = out_ref[rr * bt : (rr + 1) * bt, :]
                if gf_order != 2:
                    term = _gf_mul_const(term, cf)
                acc = term if acc is None else acc ^ term
            if acc is None:
                acc = jnp.zeros((bt, out_ref.shape[1]), jnp.uint32)
            if gf_order != 2:
                acc = _gf_mul_const(acc, dinv)
            out_ref[(k + i) * bt : (k + i + 1) * bt, :] = acc

        for b0 in range(0, m, BLK):

            @pl.when(flag_smem[0] == 0)
            def _(b0=b0):
                for i in range(b0, min(b0 + BLK, m)):
                    row(i)

    return kernel


def _make_kernel(
    *, n: int, k: int, m: int, dmax: int, pmax: int, bt: int, gf_order: int,
    wc: int, w_chunks: int,
):
    # Row layout of the single prefetched topology table. One SMEM operand
    # (not five): a prefetch operand's SMEM cost is rows * pad128(cols) * 4
    # bytes — the minor dim pads to 128 words — so the table is stored
    # TRANSPOSED, (cols, m), putting the padding on the long m axis:
    # ~100-220 KB for every shipped code vs m*128*4 per operand the other
    # way (1 MB at m=2000, the whole scoped-SMEM budget).
    c_sidx, c_sval = 0, dmax
    c_pidx, c_pval = 2 * dmax, 2 * dmax + pmax
    c_dinv = 2 * dmax + 2 * pmax

    def kernel(
        tab_ref,   # (2*dmax + 2*pmax + 1, m) int32 SMEM:
                   # [src idx (pad n) | src coef | par idx | par coef | inv]
        src_hbm,   # (ntiles, k*bt, W) uint32 ANY (stays in HBM; manual DMA)
        out_ref,   # ((n+1)*bt, W) uint32 VMEM out; row n is the shared pad
        copy_sem,  # DMA semaphore
    ):
        # Systematic prefix: DMA the tile's source block straight into the
        # output window — the prefix copy IS the pass-through, and dropping
        # the separate source buffer halves the VMEM footprint (bt=32 fits;
        # source-neighbor reads below come from the prefix). The pad row
        # (slot n — target of BOTH the source-idx pad, remapped k -> n host
        # side, and the parity-idx pad) must be zero BEFORE the row loop:
        # binary pad terms XOR it in verbatim.
        # (A SLICED window ref drops the leading singleton block dim on
        # hardware — unlike the whole-window DMA target in pallas_peel — so
        # the squeezed source slice matches on both backends.)
        # With W-chunking (w_chunks > 1) the grid's minor axis walks wc-word
        # chunks of the symbol: lanes are independent, so each chunk is a
        # complete encode of its words (the row loop's scalar work repeats
        # per chunk — the same per-frame accounting as encoding the chunks
        # as separate frames).
        if w_chunks > 1:
            src = src_hbm.at[
                pl.program_id(0), :,
                pl.ds(pl.multiple_of(pl.program_id(1) * wc, wc), wc)
            ]
        else:
            src = src_hbm.at[pl.program_id(0)]
        cp = pltpu.make_async_copy(
            src,
            out_ref.at[pl.ds(0, k * bt), :],
            copy_sem,
        )
        cp.start()
        cp.wait()
        out_ref[pl.ds(n * bt, bt), :] = jnp.zeros(
            (bt, out_ref.shape[1]), jnp.uint32
        )

        def row_body(i, carry):
            acc = jnp.zeros((bt, out_ref.shape[1]), jnp.uint32)
            for s in range(dmax):
                idx = tab_ref[c_sidx + s, i]
                term = out_ref[pl.ds(pl.multiple_of(idx * bt, bt), bt), :]
                if gf_order != 2:
                    term = _gf_mul_scalar(term, tab_ref[c_sval + s, i])
                acc = acc ^ term
            for s in range(pmax):
                pidx = tab_ref[c_pidx + s, i]
                off = pl.multiple_of((k * bt) + pidx * bt, bt)
                term = out_ref[pl.ds(off, bt), :]
                if gf_order != 2:
                    term = _gf_mul_scalar(term, tab_ref[c_pval + s, i])
                acc = acc ^ term
            if gf_order != 2:
                acc = _gf_mul_scalar(acc, tab_ref[c_dinv, i])
            out_ref[pl.ds(pl.multiple_of((k + i) * bt, bt), bt), :] = acc
            return carry

        jax.lax.fori_loop(0, m, row_body, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "gf_order", "b_tile", "tiled_out", "interpret", "w_chunk",
        "static_topo", "unroll_blk",
    ),
)
def encode_packed_vmem(
    arrays: CodeArrays,
    source: jax.Array,
    *,
    gf_order: int = 2,
    b_tile: int = 8,
    tiled_out: bool = False,
    interpret: bool = False,
    w_chunk: int = 0,
    static_topo: tuple | None = None,
    unroll_blk: int = 8,
) -> jax.Array:
    """VMEM-resident packed systematic encode: (B, k, W) -> (B, n, W).

    Bit-identical to :func:`ops.encode.encode_packed` (asserted in
    tests/test_pallas_encode.py). ``source`` is uint32 words for binary, or
    uint8 byte symbols (W % 4 == 0) for gf_order=256. ``b_tile`` must be a
    multiple of 8 on hardware.

    ``tiled_out=True`` returns the kernel's NATIVE tile-major layout
    (ntiles, (n+1)*b_tile, W) uint32 (word-packed for gf_order=256; pad
    frames/rows zero) — exactly what ``peel_decode_vmem(..., tiled=True,
    b_tile=b_tile)`` consumes, skipping one full-batch HBM transpose on
    each side (:func:`ops.pallas_peel.tile_wide` documents the layout).

    ``w_chunk`` mirrors the decoder's W-chunking (lanes are independent):
    symbols wider than wc words encode in chunks on a (ntiles, W/wc) grid,
    so the VMEM tile — and therefore ``b_tile`` — is decoupled from the
    symbol width; identical output. 0 (default) auto-chunks to 256 words
    when W > 256 and divisible; -1 disables; explicit values must divide W.
    """
    b, k, w = source.shape
    m, dmax = arrays.enc_src_idx.shape
    pmax = arrays.enc_par_idx.shape[1]
    n = k + m
    bt = int(b_tile)
    ntiles = -(-b // bt)
    bp = ntiles * bt
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    if not interpret and bt % 8 != 0:
        raise ValueError(
            f"b_tile={bt} must be a multiple of 8 on hardware (Mosaic "
            "sublane-aligned dynamic slices)"
        )

    packed_nb = gf_order == 256
    if packed_nb:
        if source.dtype != jnp.uint8 or w % 4 != 0:
            raise ValueError(
                "gf_order=256 needs uint8 source with W a multiple of 4"
            )
        source = jax.lax.bitcast_convert_type(
            source.reshape(b, k, w // 4, 4), jnp.uint32
        )
        w = w // 4
    source = source.astype(jnp.uint32)

    # W-chunking (uint32 words, post-packing) — the decoder's auto rule.
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

    spad = jnp.pad(source, ((0, bp - b), (0, 0), (0, 0)))
    st = spad.reshape(ntiles, bt, k, w).swapaxes(1, 2).reshape(
        ntiles, k * bt, w
    )

    if static_topo is not None:
        # Constant-topology unrolled back-substitution (see
        # static_enc_topology; built outside jit, hashable, jit-cached).
        if len(static_topo) != m:
            raise ValueError(
                f"static_topo has {len(static_topo)} rows, code has {m}"
            )
        kernel = _make_unrolled_kernel(
            n=n, k=k, m=m, bt=bt, gf_order=gf_order, topo=static_topo,
            wc=wc, w_chunks=w_chunks, blk=unroll_blk,
        )
    else:
        kernel = _make_kernel(
            n=n, k=k, m=m, dmax=dmax, pmax=pmax, bt=bt, gf_order=gf_order,
            wc=wc, w_chunks=w_chunks,
        )
    out_bytes = (n + 1) * bt * wc * 4
    from ldpc_erasure_codes_tpu.utils.device import kernel_vmem_limit
    dbl_budget = kernel_vmem_limit() - 16 * 1024 * 1024  # 96 MiB on v5e
    nbuf = 2 if 2 * out_bytes <= dbl_budget else 1
    big_mode = None if nbuf == 2 else pl.Buffered(buffer_count=1)
    if static_topo is not None:
        tab = jnp.zeros((1, 1), jnp.int32)  # topology baked in
    else:
        # Source-idx pad remapped k -> n: source neighbors are read out of
        # the output window's systematic prefix, whose shared zero pad row
        # is slot n.
        src_idx = jnp.where(
            arrays.enc_src_idx == k, jnp.int32(n), arrays.enc_src_idx
        )
        tab = jnp.concatenate(
            [
                src_idx,
                arrays.enc_src_val.astype(jnp.int32),
                arrays.enc_par_idx,
                arrays.enc_par_val.astype(jnp.int32),
                arrays.enc_diag_inv.astype(jnp.int32)[:, None],
            ],
            axis=1,
        ).T
    if w_chunks > 1:
        grid = (ntiles, w_chunks)
        out_map = lambda i, j, tab: (i, 0, j)
    else:
        grid = (ntiles,)
        out_map = lambda i, tab: (i, 0, 0)
    scratch_shapes = (
        [pltpu.SMEM((1,), jnp.int32), pltpu.SemaphoreType.DMA]
        if static_topo is not None
        else [pltpu.SemaphoreType.DMA]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (None, (n + 1) * bt, wc),
            out_map,
            memory_space=pltpu.VMEM, pipeline_mode=big_mode,
        ),
        scratch_shapes=scratch_shapes,
    )
    out_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ntiles, (n + 1) * bt, w), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=kernel_vmem_limit(),
        ),
        interpret=interpret,
    )(tab, st)
    if tiled_out:
        return out_t  # native tile layout (word-packed for NB)
    cw = out_t.reshape(ntiles, n + 1, bt, w).swapaxes(1, 2).reshape(
        bp, n + 1, w
    )[:b, :n]
    if packed_nb:
        cw = jax.lax.bitcast_convert_type(cw, jnp.uint8).reshape(b, n, 4 * w)
    return cw
