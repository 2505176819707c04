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
from ldpc_erasure_codes_tpu.codes.generate import (
    CycleCensus,
    cycle_census,
    expand_profile,
    gen_column_wise,
    gen_row_wise,
    grid_code,
    weight_histograms,
)
from ldpc_erasure_codes_tpu.codes.toy import toy_code

__all__ = [
    "CycleCensus",
    "LDPCCode",
    "cycle_census",
    "expand_profile",
    "from_h_dense",
    "gen_column_wise",
    "gen_row_wise",
    "get_code",
    "grid_code",
    "list_codes",
    "load_code",
    "load_mat_code",
    "parse_vlist_header",
    "save_code",
    "toy_code",
    "weight_histograms",
]
