"""GF(2^8) arithmetic: host-side table construction and device-side kernels."""

from ldpc_erasure_codes_tpu.gf.tables import (
    DEFAULT_PRIM_POLY,
    GFTables,
    bit_image,
    build_tables,
    gf_inv_matrix_np,
    gf_inv_np,
    gf_matmul_np,
    gf_matvec_np,
    gf_mul_np,
)
from ldpc_erasure_codes_tpu.gf.ops import (
    bits_to_bytes,
    bytes_to_bits,
    gf_add,
    gf_inv,
    gf_matmul_bitimage,
    gf_mul,
    gf_mul_arith,
    gf_mul_log,
    gf_mul_table,
    int_matmul,
    mod2_matmul,
)

__all__ = [
    "DEFAULT_PRIM_POLY",
    "GFTables",
    "bit_image",
    "build_tables",
    "gf_inv_matrix_np",
    "gf_inv_np",
    "gf_matmul_np",
    "gf_matvec_np",
    "gf_mul_np",
    "bits_to_bytes",
    "bytes_to_bits",
    "gf_add",
    "gf_inv",
    "gf_matmul_bitimage",
    "gf_mul",
    "gf_mul_arith",
    "gf_mul_log",
    "gf_mul_table",
    "int_matmul",
    "mod2_matmul",
]
