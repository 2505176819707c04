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


def _kernel(y_ref, img_ref, out_ref, *, m_pad: int, interpret: bool):
    # y_ref: (1, n_pad, Wc) uint8 payload block in its NATURAL layout;
    # img_ref: (8, 8*m_pad, n_pad) int8 (plane c's transposed image);
    # out_ref: (1, m_pad, Wc) uint8.
    _matmul_body(y_ref[0], img_ref, out_ref, m_pad, interpret)


def _matmul_body(y8, imgt, out_ref, m_pad, interpret):
    # y8: (K_pad, Wc) uint8 operand (contracted byte axis on sublanes,
    # K_pad % 4 == 0); imgt: (8, 8*m_pad, K_pad) int8 plane-major
    # transposed image; out_ref: (1, m_pad, Wc) uint8.
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
    out_ref[0] = res.astype(jnp.uint8)


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
        budget = 48 * 1024 * 1024
        wc = min(w, max(128, (budget // (8 * m_pad * 4)) // 128 * 128))
        while w % wc:
            wc -= 128
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
        interpret=interpret,
    )(vp, img_t)
    if out_layout == "mw":
        return out  # (B, m_pad, W), rows m.. are zero
    return jnp.transpose(out[:, :m, :], (0, 2, 1))  # (B, W, m)


@functools.partial(jax.jit, static_argnames=("wc", "interpret"))
def gf_matmul_batched(
    rhs_mw: jax.Array,
    imgs: jax.Array,
    *,
    wc: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Per-frame x[b] = M_b . rhs[b] over GF(256), fused in VMEM.

    The batched companion of :func:`gf_matvec_wide` — each frame carries
    its OWN matrix image (the GE transform apply, ops/ge.py): the grid's
    batch axis indexes both the payload block and the image block.

    Args:
      rhs_mw: (B, m_pad, W) uint8 — the "mw" output of gf_matvec_wide
        (byte axis on sublanes, m_pad a multiple of 8, pad rows zero).
      imgs: (B, 64*e_pad, m_pad) int8 — per-frame transposed plane-major
        images, rows flattened c-major:
        imgs[b, (c*8 + r)*e_pad + i, j] = bit r of (M_b[i, j] * x^c)
        (``ops.ge._bit_image_dev_tpm`` builds this layout directly).
      wc: W-chunk per grid program (0 = auto); must divide W.

    Returns:
      (B, e_pad, W) uint8 per-frame products (rows e.. are the pad).
    """
    b, m_pad, w = rhs_mw.shape
    e8 = imgs.shape[1] // 8
    e_pad = e8 // 8
    if imgs.shape != (b, 8 * e8, m_pad):
        raise ValueError(
            f"imgs shape {imgs.shape} != ({b}, {8 * e8}, {m_pad}) — pass the "
            "3-D (B, 64*e_pad, m_pad) layout (a 4-D block spec measured a "
            "~50x per-program stall)"
        )
    if wc <= 0:
        budget = 48 * 1024 * 1024
        wc = min(w, max(128, (budget // (e8 * 4)) // 128 * 128))
        while w % wc:
            wc -= 128
    if w % wc:
        raise ValueError(f"wc={wc} must divide W={w}")

    def kern(y_ref, img_ref, out_ref):
        _matmul_body(
            y_ref[0],
            [img_ref[0, c * e8 : (c + 1) * e8] for c in range(8)],
            out_ref,
            e_pad,
            interpret,
        )

    return pl.pallas_call(
        kern,
        grid=(b, w // wc),
        in_specs=[
            pl.BlockSpec(
                (1, m_pad, wc), lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8 * e8, m_pad), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, e_pad, wc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, e_pad, w), jnp.uint8),
        interpret=interpret,
    )(rhs_mw, imgs)
