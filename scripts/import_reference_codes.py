"""Import the reference's shipped code artifacts into npz data files.

Reads the generated Vlist ROM header (OpenCL/device/LDPC_Vlist_data.h) and the
.mat H matrices from the read-only reference checkout and writes pure-data
``.npz`` archives into ``ldpc_erasure_codes_tpu/data/codes/``. Run once at
build time; the framework itself never touches the reference tree.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ldpc_erasure_codes_tpu.codes import io as code_io  # noqa: E402
from ldpc_erasure_codes_tpu.codes.registry import from_h_dense  # noqa: E402

REFERENCE = os.environ.get("LDPC_REFERENCE_DIR", "/root/reference")


def main():
    os.makedirs(code_io.DATA_DIR, exist_ok=True)
    # The two production codes, from the Vlist master ROM.
    header = os.path.join(REFERENCE, "OpenCL", "device", "LDPC_Vlist_data.h")
    for code in code_io.parse_vlist_header(header):
        code.validate()
        out = os.path.join(code_io.DATA_DIR, f"{code.name}.npz")
        code_io.save_code(code, out)
        print(f"wrote {out}: n={code.n} k={code.k} dmax={code.dmax} "
              f"rs=({code.rs_n},{code.rs_k}) triangular={code.is_triangular}")

    # Cross-check the (2000,1000) header code against the .mat copy.
    import scipy.io as sio

    mat = sio.loadmat(
        os.path.join(REFERENCE, "Matlab", "n2000_k1000_no6cycles_triangleForm_OpenCL_H.mat")
    )["H_sparse"].toarray()
    hdr_code = code_io.load_code(os.path.join(code_io.DATA_DIR, "n2000_k1000.npz"))
    assert np.array_equal(hdr_code.h_dense, mat.astype(np.uint8)), \
        "header-derived H != .mat H for n2000_k1000"
    print("n2000_k1000 header H == .mat H: OK")

    mat2 = sio.loadmat(
        os.path.join(REFERENCE, "Matlab", "n2040_k1530_irreg_H_no6cycles_triangleForm.mat")
    )["H_sparse"].toarray()
    hdr_code2 = code_io.load_code(os.path.join(code_io.DATA_DIR, "n2040_k1530.npz"))
    if np.array_equal(hdr_code2.h_dense, mat2.astype(np.uint8)):
        print("n2040_k1530 header H == .mat H: OK")
    else:
        print("n2040_k1530 header H != .mat H (independent constructions; keeping header version)")

    # The larger research code only exists as .mat.
    big = code_io.load_mat_code(
        os.path.join(REFERENCE, "Matlab", "n4000_k2000_no6cycles_triangleForm.mat"),
        rs_n=250,
        rs_k=125,
    )
    big.validate()
    out = os.path.join(code_io.DATA_DIR, f"{big.name}.npz")
    code_io.save_code(big, out)
    print(f"wrote {out}: n={big.n} k={big.k} dmax={big.dmax} triangular={big.is_triangular}")


if __name__ == "__main__":
    main()
