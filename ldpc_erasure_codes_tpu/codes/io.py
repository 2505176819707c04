"""Code serialization: npz archive format, Vlist C-header parsing, .mat import.

The shipped artifacts live in ``ldpc_erasure_codes_tpu/data/codes/*.npz``;
they are produced from the reference's generated data by
``scripts/import_reference_codes.py`` and are pure data (no generated C code
is vendored).

Header format parsed here (reference: OpenCL/device/LDPC_Vlist_data.h):
  * ``ldpc_params[N][6]`` rows = {n, k, first Vlist row, last Vlist row,
    RS_n equivalent, RS_k equivalent} (LDPC_Vlist_data.h:10-14)
  * ``parity_check_mat_Vlist_master[R][W]`` rows = [check degree, 1-based
    neighbor column indices..., 0 padding] (LDPC_Vlist_data.h:20); kernels
    subtract 1 (OpenCL/device/ldpc_erasure_decoder.cl:74).
"""

from __future__ import annotations

import os
import re

import numpy as np

from ldpc_erasure_codes_tpu.codes.registry import LDPCCode, from_h_dense

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "codes")


def save_code(code: LDPCCode, path: str) -> None:
    np.savez_compressed(
        path,
        name=np.array(code.name),
        n=code.n,
        k=code.k,
        vlist_idx=code.vlist_idx,
        vlist_len=code.vlist_len,
        vlist_val=code.vlist_val,
        rs_n=code.rs_n,
        rs_k=code.rs_k,
        gf_order=code.gf_order,
    )


def load_code(path: str) -> LDPCCode:
    with np.load(path) as z:
        return LDPCCode(
            name=str(z["name"]),
            n=int(z["n"]),
            k=int(z["k"]),
            vlist_idx=z["vlist_idx"],
            vlist_len=z["vlist_len"],
            vlist_val=z["vlist_val"],
            rs_n=int(z["rs_n"]),
            rs_k=int(z["rs_k"]),
            gf_order=int(z["gf_order"]),
        )


def _parse_int_table(text: str, name: str) -> np.ndarray:
    """Extract a 2-D C integer array initializer ``name[..][..] = { {..}, .. }``."""
    m = re.search(rf"{name}\s*\[\s*\d+\s*\]\s*\[\s*\d+\s*\]\s*=\s*\{{(.*?)\}}\s*;", text, re.S)
    if not m:
        raise ValueError(f"array {name} not found")
    body = m.group(1)
    rows = []
    for rm in re.finditer(r"\{([^{}]*)\}", body):
        vals = [int(v) for v in rm.group(1).replace("\n", " ").split(",") if v.strip()]
        rows.append(vals)
    width = max(len(r) for r in rows)
    out = np.zeros((len(rows), width), dtype=np.int64)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return out


def parse_vlist_header(path: str) -> list[LDPCCode]:
    """Parse an OpenCL Vlist data header into LDPCCode objects.

    Supports both the master multi-code layout (``ldpc_params[N][6]`` +
    ``parity_check_mat_Vlist_master``) and the single-code device layout
    (``ldpc_params[N][2]`` + ``parity_check_mat_Vlist``,
    reference: OpenCL/device/n2000_k1000_no6cycle_ldpc_Vlist_device.h:6-16).
    """
    with open(path) as f:
        text = f.read()
    params = _parse_int_table(text, "ldpc_params")
    try:
        vlist = _parse_int_table(text, "parity_check_mat_Vlist_master")
    except ValueError:
        vlist = _parse_int_table(text, "parity_check_mat_Vlist")
    codes = []
    for row in params:
        if params.shape[1] >= 6:
            n, k, first, last, rs_n, rs_k = (int(v) for v in row[:6])
        else:
            # Single-code device layout: the Vlist holds only the code whose
            # row count matches; other params rows are informational.
            n, k = int(row[0]), int(row[1])
            if n - k != vlist.shape[0]:
                continue
            first, last, rs_n, rs_k = 0, n - k - 1, 0, 0
        block = vlist[first : last + 1]
        degs = block[:, 0].astype(np.int32)
        dmax = int(degs.max())
        idx = block[:, 1 : dmax + 1].astype(np.int32) - 1  # to 0-based
        pad = np.arange(dmax)[None, :] >= degs[:, None]
        idx[pad] = n
        vals = np.where(pad, 0, 1).astype(np.uint8)
        codes.append(
            LDPCCode(
                name=f"n{n}_k{k}",
                n=n,
                k=k,
                vlist_idx=idx,
                vlist_len=degs,
                vlist_val=vals,
                rs_n=rs_n,
                rs_k=rs_k,
                gf_order=2,
            )
        )
    return codes


def load_mat_code(path: str, name: str | None = None, rs_n: int = 0, rs_k: int = 0) -> LDPCCode:
    """Load a code from a MATLAB ``.mat`` file holding ``H_sparse``
    (and optionally ``H_sparse_nb``)."""
    import scipy.io as sio

    d = sio.loadmat(path)
    key = "H_sparse_nb" if "H_sparse_nb" in d else "H_sparse"
    h = d[key]
    if hasattr(h, "toarray"):
        h = h.toarray()
    if name is None:
        m, n = h.shape
        name = f"n{n}_k{n - m}"
    return from_h_dense(h, name=name, rs_n=rs_n, rs_k=rs_k)


_REGISTRY_CACHE: dict[str, LDPCCode] = {}


def get_code(name: str) -> LDPCCode:
    """Fetch a shipped code by name (e.g. ``n2040_k1530``), with caching.

    ``<name>_gf256`` returns the deterministic (seed 0) non-binary lift of the
    shipped binary code.
    """
    if name in _REGISTRY_CACHE:
        return _REGISTRY_CACHE[name]
    if name.endswith("_gf256"):
        code = get_code(name[: -len("_gf256")]).lift_to_gf256(seed=0)
    else:
        path = os.path.join(DATA_DIR, f"{name}.npz")
        if not os.path.exists(path):
            raise KeyError(
                f"unknown code {name!r}; shipped codes: {sorted(list_codes())}"
            )
        code = load_code(path)
    _REGISTRY_CACHE[name] = code
    return code


def list_codes() -> list[str]:
    if not os.path.isdir(DATA_DIR):
        return []
    return [f[: -len(".npz")] for f in os.listdir(DATA_DIR) if f.endswith(".npz")]
