"""Pallas TPU kernel: constant-topology tiled GF(2) syndrome.

The wide GE solver's syndrome ``rhs = H . y`` runs as a dense bit-plane
MXU contraction (ops/pallas_nbmm.py::f2_matvec_wide): at the GE-hot
hybrid shape (B=448, m=510, n_pad=2048, 1 KB payloads) that is a K=2048
dense contraction of a matrix with only E=6,628 nonzeros — measured
27 ms at ~36% MXU utilization, the largest single piece of the GE
branch. Sparsity-by-worklist is a recorded negative (data-dependent
gathers), but H is CONSTANT: this kernel bakes the Vlist into the
program exactly like the production peel schedule
(ops/pallas_peel.py::_make_unrolled_kernel), so every check's syndrome
row is a short chain of constant-offset (bt, W) slice-XORs over a
tile-major frame block — the access pattern the peel kernel already
proves efficient (visits pipeline because aliasing is decidable; 32-
visit predicated fences bound register pressure).

Layout: frames are tiled ``(T, (n+1)*bt, W)`` uint32 (pallas_peel
.tile_wide — the pad symbol row n is zero, so pad slots in no-op);
output ``(T, m_pad*bt, W)`` with each check's bt-frame block contiguous
(pad check rows zeroed). The caller untiles to the (B, m_pad, W) layout
the transform-apply kernel consumes.

Reference: the syndrome accumulation inside
Matlab/My_LDPC_HybridML_Erasure_Decoder.m:48-56 (H_known . y_known —
erased slots are zero here, so the full-H product equals the known-only
sum, the repo invariant).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(
    jax.jit,
    static_argnames=("topo", "bt", "m_pad", "blk", "interpret"),
)
def f2_syndrome_tiled(
    vt: jax.Array,
    *,
    topo: tuple,
    bt: int,
    m_pad: int,
    blk: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """Tiled constant-topology syndrome: (T, (n+1)*bt, W) -> (T, m_pad*bt, W).

    Args:
      vt: tile-major frames (``pallas_peel.tile_wide``), uint32, erased
        slots ZERO (the repo invariant — no erasure masking needed).
      topo: ``pallas_peel.static_topology(arrays)`` (built OUTSIDE jit).
      bt: frames per tile (multiple of 8 on hardware).
      m_pad: output check rows per frame (>= len(topo); pad rows zero).
      blk: predicated fence width (the peel kernel's register-pressure
        fences; always-true opaque predicate).

    Returns:
      (T, m_pad*bt, W) uint32 — check c's syndrome words for the tile's
      frames at rows [c*bt, (c+1)*bt).
    """
    t, rows, w = vt.shape
    m = len(topo)
    n1 = rows // bt
    if rows != n1 * bt:
        raise ValueError(f"rows {rows} not a multiple of bt={bt}")
    if m_pad < m or m_pad % 8:
        raise ValueError(f"m_pad={m_pad} must be >= m={m} and % 8 == 0")

    def kernel(vals_ref, out_ref, flag_smem):
        flag_smem[0] = 0
        # Zero the pad check rows once (they must not carry stale data).
        for c in range(m, m_pad):
            out_ref[c * bt : (c + 1) * bt, :] = jnp.zeros(
                (bt, w), jnp.uint32
            )
        for b0 in range(0, m, blk):

            @pl.when(flag_smem[0] == 0)
            def _(b0=b0):
                for c in range(b0, min(b0 + blk, m)):
                    idxs = topo[c][0]
                    acc = vals_ref[idxs[0] * bt : (idxs[0] + 1) * bt, :]
                    for i in idxs[1:]:
                        acc = acc ^ vals_ref[i * bt : (i + 1) * bt, :]
                    out_ref[c * bt : (c + 1) * bt, :] = acc

    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(
                (None, n1 * bt, w), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
                pipeline_mode=pl.Buffered(buffer_count=1),
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, m_pad * bt, w), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
            pipeline_mode=pl.Buffered(buffer_count=1),
        ),
        out_shape=jax.ShapeDtypeStruct((t, m_pad * bt, w), jnp.uint32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(vt)


def syndrome_from_topo(
    values: jax.Array,
    *,
    topo: tuple,
    m_pad: int,
    bt: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """(B, n, W) uint32 frames -> (B, m_pad, 4W) uint8 syndrome (the
    ``f2_matvec_wide`` "mw" contract), via the tiled constant-topology
    kernel. B must be a multiple of ``bt``; erased slots must be zero.
    """
    from ldpc_erasure_codes_tpu.ops.pallas_peel import tile_wide, untile_wide

    b, n, w = values.shape
    if b % bt:
        raise ValueError(f"B={b} must be a multiple of bt={bt}")
    vt = tile_wide(values, bt)
    st = f2_syndrome_tiled(
        vt, topo=topo, bt=bt, m_pad=m_pad, interpret=interpret
    )
    # Untile (m_pad plays the symbol role; no pad row was added, so
    # reshape/transpose directly rather than via untile_wide's n+1).
    rhs = st.reshape(b // bt, m_pad, bt, w).swapaxes(1, 2).reshape(
        b, m_pad, w
    )
    return jax.lax.bitcast_convert_type(rhs, jnp.uint8).reshape(
        b, m_pad, 4 * w
    )
