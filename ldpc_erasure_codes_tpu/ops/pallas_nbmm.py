"""Pallas TPU kernel: fused GF(256) bit-image matvec for wide payloads.

The wide NB/RS solvers contract byte payloads against a constant GF(256)
matrix by lifting to the binary image: ``bits(y) @ img`` on the MXU
(ops/ge.py). The XLA formulation is VPU-bound: unpacking each payload byte
into 8 one-byte bit lanes costs several vector ops PER OUTPUT ELEMENT —
measured ~17 ms for the RS B=1024/1 KB syndrome against a <0.1 ms MXU
contraction on the bench chip.

This kernel gets the unpack to native SWAR width and the matmul to its
natural orientation; the same workload measures **0.05 ms** (~300x):

* the caller repacks the payload so the CONTRACTED byte axis is grouped
  into uint32 words on the SUBLANE axis — (B, n_pad/4, W) uint32;
* for each bit plane c, ``(w >> c) & 0x01010101`` extracts the c-th bit of
  all four packed bytes in ONE op, and ``pltpu.bitcast(..., uint8)``
  re-views the result as an (n_pad, W) byte array — byte b of the word at
  sublane s lands at sublane 4s+b (measured layout), i.e. exactly byte
  order along the sublane axis, with no per-element work;
* eight MXU contractions run in the standard (M, K) @ (K, N) orientation
  ``imgT[c] (8m_pad, n_pad) @ plane (n_pad, Wc)`` — the reversed
  orientation (contracting the LHS sublane axis) measured ~400x slower
  (internal int8 transposes); int32 accumulation in VMEM;
* parity (& 1) and the byte repack ``sum_r plane_r << r`` finish on
  sublane-aligned slices (m padded to a multiple of 8).

HBM sees the byte payload once in and the byte result once out.

Reference: the MATLAB table-gather row products this replaces
(Matlab/My_RS_Decode_Optimize_With_GFTables.m:61-67); the binary-image
lifting is the standard GF(2^8) -> GF(2) companion-matrix construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Raised scoped-VMEM ceiling for every kernel in this module (the Mosaic
# default is far smaller and OOMs the moment a constant operand is large:
# gf_matvec_wide's (8, 8*m_pad, n_pad) image is ~67 MB at the NB-LDPC
# m=510/n=2040 shape — "scoped allocation ... exceeded scoped vmem limit"
# at compile time on the real chip; ops/ge.py additionally guards the
# total footprint and falls back to XLA above ~100 MB).
_VMEM_LIMIT = 110 * 1024 * 1024


def _auto_wc(w: int, unit_bytes: int) -> int:
    """Largest lane-aligned chunk of ``w`` that divides it and whose int32
    accumulator (``unit_bytes`` per chunk column) fits a ~48 MB budget.

    Shared by every kernel in this module. Raises the divisibility
    ValueError instead of decrementing to zero (``w % 0``) when ``w`` has
    no 128-aligned divisor under the budget — e.g. W not a multiple of
    128 (ADVICE r4: the silent decrement loop crashed with a confusing
    ZeroDivisionError for direct callers; production call sites in
    ops/ge.py gate alignment before reaching here).
    """
    budget = 48 * 1024 * 1024
    wc = min(w, max(128, (budget // unit_bytes) // 128 * 128))
    while wc > 0 and w % wc:
        wc -= 128
    if wc <= 0:
        raise ValueError(
            f"W={w} has no 128-lane-aligned chunk that divides it within "
            "the VMEM budget; pad the symbol width to a multiple of 128"
        )
    return wc


def _kernel(y_ref, img_ref, out_ref, *, m_pad: int, interpret: bool):
    # y_ref: (1, n_pad, Wc) uint8 payload block in its NATURAL layout;
    # img_ref: (8, 8*m_pad, n_pad) int8 (plane c's transposed image);
    # out_ref: (1, m_pad, Wc) uint8.
    out_ref[0] = _matmul_body(y_ref[0], img_ref, m_pad, interpret)


def _matmul_body(y8, imgt, m_pad, interpret):
    # y8: (K_pad, Wc) uint8 operand (contracted byte axis on sublanes,
    # K_pad % 4 == 0); imgt: (8, 8*m_pad, K_pad) int8 plane-major
    # transposed image; returns the (m_pad, Wc) uint8 product.
    if interpret:
        yw = jnp.transpose(
            jax.lax.bitcast_convert_type(
                jnp.transpose(y8).reshape(y8.shape[1], -1, 4), jnp.uint32
            ),
            (1, 0),
        )
    else:
        # Sublane-merge bitcast: word s = bytes at sublanes 4s..4s+3
        # (little-endian, measured layout) — the byte->word packing with
        # zero vector ops and, crucially, zero XLA-side relayout of the
        # 268 MB payload (feeding a transposed tensor to the custom call
        # measured ~13 ms of physical relayout).
        yw = pltpu.bitcast(y8, jnp.uint32)  # (n_pad/4, Wc)
    wc = yw.shape[1]
    lane_mask = jnp.uint32(0x01010101)
    acc = jnp.zeros((8 * m_pad, wc), jnp.int32)
    for c in range(8):
        t = (yw >> c) & lane_mask  # bit c of each packed byte
        if interpret:
            # The interpreter lacks the TPU bitcast; expand via the XLA
            # bitcast (same LSB-first byte order along sublanes).
            plane = (
                jax.lax.bitcast_convert_type(jnp.transpose(t), jnp.uint8)
                .reshape(wc, -1)
                .T.astype(jnp.int8)
            )
        else:
            plane = pltpu.bitcast(t, jnp.int8)  # (n_pad, Wc) of 0/1
        acc = acc + jax.lax.dot_general(
            imgt[c],
            plane,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (8*m_pad, Wc)
    par = acc & 1
    res = par[0:m_pad]
    for r in range(1, 8):
        res = res + (par[r * m_pad : (r + 1) * m_pad] << r)
    return res.astype(jnp.uint8)


@functools.partial(
    jax.jit, static_argnames=("wc", "interpret", "out_layout")
)
def gf_matvec_wide(
    values: jax.Array,
    img: jax.Array,
    *,
    wc: int = 0,
    interpret: bool = False,
    out_layout: str = "wm",
) -> jax.Array:
    """y[b, :, w] @ M over GF(256), fused in VMEM.

    Args:
      values: (B, n, W) uint8 payloads (the CONTRACTED axis is n).
      img: (8n, 8m) int8 binary image of the (n, m) byte matrix M, in the
        ``ops.ge._bit_image_dev`` convention (``bits(u) @ img == bits(u @ M)``).
      wc: W-chunk per grid program (0 = auto: the largest lane-aligned
        chunk whose int32 accumulator fits a ~48 MB budget, capped at W);
        must divide W, and W must be a multiple of 128 on hardware.
      out_layout: "wm" returns (B, W, m); "mw" returns (B, ceil8(m), W) —
        the kernel's native layout, for chaining into
        :func:`gf_matmul_batched` with no relayout (rows m.. are zero).

    Returns:
      (B, W, m) uint8 product ("wm"), or (B, m_pad, W) ("mw").
    """
    b, nv, w = values.shape
    n = img.shape[0] // 8
    m8 = img.shape[1]
    m = m8 // 8
    m_pad = -(-m // 8) * 8
    n_pad = -(-n // 32) * 32
    if nv != n and nv < n_pad:
        raise ValueError(
            f"values rows {nv} must be n={n} or zero-padded to >= {n_pad}"
        )
    if wc <= 0:
        wc = _auto_wc(w, 8 * m_pad * 4)
    if w % wc:
        raise ValueError(f"wc={wc} must divide W={w}")
    # Transposed plane-major image: imgT[c, r*m_pad + i, j] = img[8j+c, 8i+r].
    img_t = jnp.pad(
        jnp.transpose(img.reshape(n, 8, m, 8), (1, 3, 2, 0)),
        ((0, 0), (0, 0), (0, m_pad - m), (0, n_pad - n)),
    ).reshape(8, 8 * m_pad, n_pad)
    # The payload enters in its NATURAL (B, n, W) layout (zero-padded on
    # n — callers that already hold a zero-padded (B, n_pad, W) tensor,
    # e.g. the GE solver's scatter base, pass it directly and skip this
    # pass); the byte->word grouping happens in-kernel via a sublane-merge
    # bitcast. An XLA-side repack measured ~13 ms of physical relayout at
    # the custom-call boundary; relying on block-spec edge masking instead
    # of the explicit pad measured a ~8 ms REGRESSION (non-divisible
    # blocks cost more than the pad pass).
    vp = (
        values
        if nv >= n_pad
        else jnp.pad(values, ((0, 0), (0, n_pad - n), (0, 0)))
    )
    kern = functools.partial(_kernel, m_pad=m_pad, interpret=interpret)
    out = pl.pallas_call(
        kern,
        grid=(b, w // wc),
        in_specs=[
            pl.BlockSpec(
                (1, n_pad, wc), lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, 8 * m_pad, n_pad), lambda i, j: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, m_pad, wc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, m_pad, w), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(vp, img_t)
    if out_layout == "mw":
        return out  # (B, m_pad, W), rows m.. are zero
    return jnp.transpose(out[:, :m, :], (0, 2, 1))  # (B, W, m)


def _imgt_from_bytes(t, prim_poly):
    # (e_pad, m_pad) uint8 matrix -> list of 8 plane-major transposed
    # images, imgt[c][r*e_pad + i, j] = bit r of (t[i, j] * x^c) — the
    # in-kernel replacement for an XLA-side image build (~5 ms and a 64x
    # HBM expansion at the RS B=1024 point vs ~256 vreg-ops here). All
    # arithmetic runs in int32: Mosaic cannot legalize 8-bit vector
    # shifts ('arith.shrui' on vector<..xi8>), and the matrix is tiny.
    t32 = t.astype(jnp.int32)
    imgt = []
    for c in range(8):
        if c:
            # xtime: shift-left with polynomial reduction, masked to a byte
            t32 = ((t32 << 1) ^ ((t32 >> 7) * (prim_poly & 0xFF))) & 0xFF
        imgt.append(
            jnp.concatenate(
                [((t32 >> r) & 1).astype(jnp.int8) for r in range(8)],
                axis=0,
            )  # (8*e_pad, m_pad): row r*e_pad + i = bit r of t[i]
        )
    return imgt


@functools.partial(
    jax.jit, static_argnames=("wc", "interpret", "prim_poly")
)
def gf_matmul_batched(
    rhs_mw: jax.Array,
    mats: jax.Array,
    *,
    wc: int = 0,
    interpret: bool = False,
    prim_poly: int = 0x171,
) -> jax.Array:
    """Per-frame x[b] = M_b . rhs[b] over GF(256), fused in VMEM.

    The batched companion of :func:`gf_matvec_wide` — each frame carries
    its OWN matrix (the GE transform apply, ops/ge.py): the grid's batch
    axis indexes both the payload block and the matrix block. The matrix
    enters as BYTES; its transposed plane-major binary image
    (imgt[c][r*e_pad + i, j] = bit r of (M_b[i, j] * x^c)) is built
    IN-KERNEL from the xtime chain — an XLA-side image build measured
    ~5 ms at the RS B=1024 point (the (B, 64*e_pad, m_pad) tensor is 64x
    the byte matrix, and the expansion is VPU shift/mask work XLA spreads
    over a padded 5-D intermediate), vs ~256 vreg-ops per program here,
    and HBM carries only the bytes.

    Args:
      rhs_mw: (B, m_pad, W) uint8 — the "mw" output of gf_matvec_wide
        (byte axis on sublanes, m_pad a multiple of 8, pad rows zero).
      mats: (B, e_pad, m_pad) uint8 per-frame byte matrices, e_pad a
        multiple of 8, pad rows/cols zero.
      wc: W-chunk per grid program (0 = auto); must divide W.
      prim_poly: GF(256) primitive polynomial (low byte used by xtime).

    Returns:
      (B, e_pad, W) uint8 per-frame products (rows e.. are the pad).
    """
    b, m_pad, w = rhs_mw.shape
    _, e_pad, m_pad2 = mats.shape
    if m_pad2 != m_pad or mats.shape[0] != b or e_pad % 8:
        raise ValueError(
            f"mats shape {mats.shape} incompatible with rhs {rhs_mw.shape} "
            "(need (B, e_pad, m_pad), e_pad % 8 == 0)"
        )
    e8 = 8 * e_pad
    if wc <= 0:
        wc = _auto_wc(w, e8 * 4)
    if w % wc:
        raise ValueError(f"wc={wc} must divide W={w}")

    def kern(y_ref, mat_ref, out_ref):
        imgt = _imgt_from_bytes(mat_ref[0], prim_poly)
        out_ref[0] = _matmul_body(y_ref[0], imgt, e_pad, interpret)

    return pl.pallas_call(
        kern,
        grid=(b, w // wc),
        in_specs=[
            pl.BlockSpec(
                (1, m_pad, wc), lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, e_pad, m_pad), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, e_pad, wc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, e_pad, w), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(rhs_mw, mats)


def _f2_matmul_body(y8, ht, interpret):
    # GF(2) companion of _matmul_body: y8 (K_pad, Wb) uint8 payload BYTES
    # (contracted symbol axis on sublanes), ht (M, K_pad) int8 0/1 matrix;
    # returns the (M, Wb) uint8 parity product. Byte-bit planes: output
    # bit c = parity(ht @ bit_c(y8)) — 8 MXU contractions of the SAME
    # matrix, bit extraction via the SWAR word trick (8-bit vector shifts
    # don't legalize; the uint32 re-view + 0x01010101 mask extracts bit c
    # of four bytes per op, and the double bitcast is elementwise).
    lane_mask = jnp.uint32(0x01010101)
    res = None
    for c in range(8):
        if interpret:
            plane = ((y8 >> c) & 1).astype(jnp.int8)
        else:
            yw = pltpu.bitcast(y8, jnp.uint32)
            plane = pltpu.bitcast((yw >> c) & lane_mask, jnp.int8)
        acc = jax.lax.dot_general(
            ht,
            plane,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (M, Wb)
        r = (acc & 1) << c
        res = r if res is None else res + r
    return res.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("wc", "interpret"))
def f2_matvec_wide(
    values: jax.Array,
    ht: jax.Array,
    *,
    wc: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """rhs[b] = H . y[b] over GF(2) on byte-viewed wide words, fused.

    The binary-solver companion of :func:`gf_matvec_wide`
    (ops/ge.py::ge_solve_packed's syndrome): the XLA neighbor-gather
    formulation materializes a (B, m, dmax, W) intermediate (~6 GB and
    28.9 ms at the hybrid PER-.2031 shape); here each of the 8 byte-bit
    planes rides one int8 MXU contraction in VMEM.

    Args:
      values: (B, n_pad, Wb) uint8 — wide uint32 words byte-viewed via an
        in-jit bitcast (free; a materialized uint8 HBM arg would pay a
        physical retile). Erased rows zero; pad rows n.. zero.
      ht: (m_pad, n_pad) int8 0/1 check matrix (H, row-major), pad zero.
      wc: byte chunk per grid program (0 = auto); must divide Wb.

    Returns:
      (B, m_pad, Wb) uint8 parity words (byte view), pad rows zero.
    """
    b, n_pad, wb = values.shape
    m_pad, n_pad2 = ht.shape
    if n_pad2 != n_pad or m_pad % 8:
        raise ValueError(f"ht {ht.shape} vs values {values.shape}")
    if n_pad % 4:
        # The in-kernel uint8->uint32 sublane bitcast merges rows 4s..4s+3.
        raise ValueError(f"values rows {n_pad} must be a multiple of 4")
    if wc <= 0:
        wc = _auto_wc(wb, m_pad * 4)
    if wb % wc:
        raise ValueError(f"wc={wc} must divide Wb={wb}")

    def kern(y_ref, ht_ref, out_ref):
        out_ref[0] = _f2_matmul_body(y_ref[0], ht_ref[...], interpret)

    return pl.pallas_call(
        kern,
        grid=(b, wb // wc),
        in_specs=[
            pl.BlockSpec(
                (1, n_pad, wc), lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (m_pad, n_pad), lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, m_pad, wc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, m_pad, wb), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(values, ht)


@functools.partial(jax.jit, static_argnames=("wc", "interpret"))
def f2_matmul_batched(
    rhs_mw: jax.Array,
    t_bits: jax.Array,
    *,
    wc: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Per-frame x[b] = T_b . rhs[b] over GF(2), fused in VMEM (no
    placement — the rows-only companion of :func:`f2_apply_scatter`, for
    callers that scatter solved rows into a DIFFERENT layout, e.g. the
    tile-major hybrid writeback).

    Args:
      rhs_mw: (B, m_pad, Wb) uint8 — :func:`f2_matvec_wide` output.
      t_bits: (B, e_pad, m_pad) int8 0/1 per-frame transform rows.

    Returns:
      (B, e_pad, Wb) uint8 per-frame products.
    """
    b, m_pad, wb = rhs_mw.shape
    _, e_pad, m_pad2 = t_bits.shape
    if m_pad2 != m_pad or e_pad % 8:
        raise ValueError(
            f"shapes incompatible: t_bits {t_bits.shape}, rhs {rhs_mw.shape}"
        )
    if wc <= 0:
        wc = _auto_wc(wb, e_pad * 4)
    if wb % wc:
        raise ValueError(f"wc={wc} must divide Wb={wb}")

    def kern(y_ref, t_ref, out_ref):
        out_ref[0] = _f2_matmul_body(y_ref[0], t_ref[0], interpret)

    return pl.pallas_call(
        kern,
        grid=(b, wb // wc),
        in_specs=[
            pl.BlockSpec(
                (1, m_pad, wc), lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, e_pad, m_pad), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, e_pad, wc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, e_pad, wb), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(rhs_mw, t_bits)


@functools.partial(jax.jit, static_argnames=("wc", "interpret"))
def f2_apply_scatter(
    values_p: jax.Array,
    rhs_mw: jax.Array,
    t_bits: jax.Array,
    idx: jax.Array,
    *,
    wc: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """GF(2) transform apply + one-hot MXU placement, fused.

    Binary companion of :func:`gf_apply_scatter`: per frame,
    ``x = T_b . rhs_b`` over GF(2) (byte-bit planes on the MXU), then
    ``out = values ^ onehot(idx) @ x`` places solved rows (erased slots
    are zero by invariant).

    Args:
      values_p: (B, n_pad, Wb) uint8 byte-viewed frames, zero in erased
        slots; rows n.. pad/dump.
      rhs_mw: (B, m_pad, Wb) uint8 — :func:`f2_matvec_wide` output.
      t_bits: (B, e_pad, m_pad) int8 0/1 per-frame transform rows (pad
        rows/cols zero).
      idx: (B, e_pad) int32 target rows in [0, n_pad); discarded slots
        point at a dump row >= the real n.
      wc: byte chunk per grid program (0 = auto); must divide Wb.

    Returns:
      (B, n_pad, Wb) uint8 — values with the solved rows placed.
    """
    b, n_pad, wb = values_p.shape
    _, m_pad, _ = rhs_mw.shape
    _, e_pad, m_pad2 = t_bits.shape
    if m_pad2 != m_pad or e_pad % 8 or idx.shape != (b, e_pad):
        raise ValueError(
            f"shapes incompatible: t_bits {t_bits.shape}, rhs "
            f"{rhs_mw.shape}, idx {idx.shape}"
        )
    if idx.dtype != jnp.int32:
        raise ValueError(f"idx must be int32, got {idx.dtype}")
    if wc <= 0:
        wc = _auto_wc(wb, e_pad * 4)
    if wb % wc:
        raise ValueError(f"wc={wc} must divide Wb={wb}")

    def kern(v_ref, y_ref, t_ref, idx_ref, out_ref):
        x = _f2_matmul_body(y_ref[0], t_ref[0], interpret)  # (e_pad, wc)
        rows = jax.lax.broadcasted_iota(jnp.int32, (n_pad, e_pad), 0)
        onehot = (rows == idx_ref[0]).astype(jnp.int8)
        placed = jax.lax.dot_general(
            onehot,
            x.astype(jnp.int8),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out_ref[0] = v_ref[0] ^ placed.astype(jnp.uint8)

    return pl.pallas_call(
        kern,
        grid=(b, wb // wc),
        in_specs=[
            pl.BlockSpec(
                (1, n_pad, wc), lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, m_pad, wc), lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, e_pad, m_pad), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, e_pad), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n_pad, wc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, wb), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(values_p, rhs_mw, t_bits, idx[:, None, :])


@functools.partial(
    jax.jit, static_argnames=("wc", "interpret", "prim_poly")
)
def gf_apply_scatter(
    values_p: jax.Array,
    rhs_mw: jax.Array,
    mats: jax.Array,
    idx: jax.Array,
    *,
    wc: int = 0,
    interpret: bool = False,
    prim_poly: int = 0x171,
) -> jax.Array:
    """values_p with rows idx[b, i] replaced by (M_b . rhs_b)[i], fused.

    The production tail of the wide GE solve: computes the per-frame
    transform apply (exactly :func:`gf_matmul_batched`) AND places the
    solved rows at their erased positions in the SAME kernel — the
    standalone XLA row scatter measured ~2.9 ms at the RS B=1024/1 KB
    point (and a gather-placement formulation ~4 ms slower still).
    Placement rides the MXU: erased slots of ``values_p`` are ZERO (the
    repo-wide invariant), so ``out = values ^ (onehot(idx) @ x)`` drops
    each solved row exactly into place — one small int8 contraction per
    program, no scatter. (Dynamic single-row uint8 VMEM stores are not
    an option: Mosaic requires statically-provable sublane alignment for
    8-bit stores — "index in dimension 1 is a multiple of 8".)

    Args:
      values_p: (B, n_pad, W) uint8 frames, ZERO in erased slots; rows
        n.. are pad/dump rows.
      rhs_mw: (B, m_pad, W) uint8 — gf_matvec_wide(..., out_layout="mw").
      mats: (B, e_pad, m_pad) uint8 per-frame byte matrices (pad zero).
      idx: (B, e_pad) int32 target row of each solved value, in
        [0, n_pad). Point discarded slots at a dump row (>= the real n):
        dump-row contents come out unspecified (integer row sums), but
        the row is never read. Distinct otherwise.
      wc: W-chunk per grid program (0 = auto); must divide W.

    Returns:
      (B, n_pad, W) uint8 — values_p with the solved rows placed.
    """
    b, n_pad, w = values_p.shape
    _, m_pad, _ = rhs_mw.shape
    _, e_pad, m_pad2 = mats.shape
    if m_pad2 != m_pad or e_pad % 8 or idx.shape != (b, e_pad):
        raise ValueError(
            f"shapes incompatible: mats {mats.shape}, rhs {rhs_mw.shape}, "
            f"idx {idx.shape} (need idx == (B, e_pad))"
        )
    if idx.dtype != jnp.int32:
        raise ValueError(f"idx must be int32, got {idx.dtype}")
    if wc <= 0:
        wc = _auto_wc(w, 8 * e_pad * 4)
    if w % wc:
        raise ValueError(f"wc={wc} must divide W={w}")

    def kern(v_ref, y_ref, mat_ref, idx_ref, out_ref):
        imgt = _imgt_from_bytes(mat_ref[0], prim_poly)
        x = _matmul_body(y_ref[0], imgt, e_pad, interpret)  # (e_pad, wc)
        rows = jax.lax.broadcasted_iota(jnp.int32, (n_pad, e_pad), 0)
        onehot = (rows == idx_ref[0]).astype(jnp.int8)  # (1,e_pad) bcast
        placed = jax.lax.dot_general(
            onehot,
            x.astype(jnp.int8),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (n_pad, wc); each real row has <= 1 contributing term
        out_ref[0] = v_ref[0] ^ placed.astype(jnp.uint8)

    return pl.pallas_call(
        kern,
        grid=(b, w // wc),
        in_specs=[
            pl.BlockSpec(
                (1, n_pad, wc), lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, m_pad, wc), lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, e_pad, m_pad), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, e_pad), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n_pad, wc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, w), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(values_p, rhs_mw, mats, idx[:, None, :])
