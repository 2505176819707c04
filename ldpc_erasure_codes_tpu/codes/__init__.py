"""Code registry, construction, and serialization."""

from ldpc_erasure_codes_tpu.codes.registry import LDPCCode, from_h_dense
from ldpc_erasure_codes_tpu.codes.io import (
    get_code,
    list_codes,
    load_code,
    load_mat_code,
    parse_vlist_header,
    save_code,
)

__all__ = [
    "LDPCCode",
    "from_h_dense",
    "get_code",
    "list_codes",
    "load_code",
    "load_mat_code",
    "parse_vlist_header",
    "save_code",
]
