"""Pallas TPU kernel: fused on-device erasure channel + value masking.

TPU-native analog of the FPGA's ``data_in`` kernel, which draws erasure
patterns with an on-device Threefry counter RNG and feeds masked symbols
straight to the decoder without a host round trip
(OpenCL/device/ldpc_erasure_decoder_top.cl:84-116, vendored Random123
threefry.h). The TPU core's hardware PRNG generates one word per code
symbol, the PER = numerator/64 comparison on the bottom six bits reproduces
the FPGA's parameterization (granularity 1/64, paper tex:222), and the
erased value slots are zeroed in the same pass — mask draw, compare, and
apply fused in VMEM.

Grid: (batch tiles of 8) x (symbol tiles of 128·t) to satisfy the (8, 128)
vector-register tiling; each tile seeds its own PRNG stream from
(seed, tile coordinates), so results are deterministic for a given seed and
shape regardless of grid scheduling.

This is an alternative stream to ``channel.iid_erasures_per64`` (hardware
PRNG vs jax.random's counter PRNG): statistically equivalent, bitwise
different. The jax.random path remains the default for cross-backend
reproducibility; this kernel removes the separate mask materialization pass
on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_B_BLK = 8
_N_BLK = 256


def _kernel(seed_ref, num_ref, vals_ref, out_vals_ref, mask_ref):
    tile = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    pltpu.prng_seed(seed_ref[0], tile)
    bits = pltpu.bitcast(
        pltpu.prng_random_bits(mask_ref.shape), jnp.uint32
    )
    num = num_ref[0].astype(jnp.uint32)
    erased = (bits & 63) < num  # PER = numerator / 64
    mask_ref[:] = erased
    # Mosaic cannot broadcast an i1 vector into a new minor dim; mask with a
    # 32-bit all-ones/all-zeros word instead (values are packed uint32).
    keep = jnp.where(erased, jnp.uint32(0), jnp.uint32(0xFFFFFFFF))
    out_vals_ref[:] = vals_ref[:] & keep[:, :, None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def channel_apply_per64(
    values: jax.Array,
    seed: jax.Array,
    per_numerator: jax.Array,
    *,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Draw PER=numerator/64 erasures on device and zero the erased slots.

    Args:
      values: (B, n, W) packed codeword symbols.
      seed: () int32 — per-call seed; tile coordinates are folded in.
      per_numerator: () int32 in [0, 64].

    Returns:
      (received values (B, n, W), erasure mask (B, n) bool).
    """
    b, n, w = values.shape
    grid = (pl.cdiv(b, _B_BLK), pl.cdiv(n, _N_BLK))
    out_vals, mask = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (_B_BLK, _N_BLK, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (_B_BLK, _N_BLK, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_B_BLK, _N_BLK), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, w), values.dtype),
            jax.ShapeDtypeStruct((b, n), jnp.bool_),
        ),
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        jnp.asarray(per_numerator, jnp.int32).reshape(1),
        values,
    )
    return out_vals, mask
