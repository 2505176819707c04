"""Golden-vector protocol: the MATLAB <-> accelerator integration test.

Reproduces the reference's de-facto integration test (SURVEY §4.1): the
oracle ("MATLAB side") writes encoder-input / encoder-output /
decoder-noisy-input / decoder-output text vector files, the accelerator side
reads them, runs the device kernels, and compares bit-exactly, printing
PASSED/FAILED (Matlab/data_gen_for_OpenCL_erasure_codec.m:53-91,
OpenCL/host/src/main.cpp:274-305,413-425).

File format: one decimal uint16 per line; a 0 in the decoder input marks an
erasure (in-band, main.cpp:380-387 — so golden sources are drawn nonzero);
each value expands to a wide symbol by replication across all 16-bit lanes.
"""

from __future__ import annotations

import dataclasses
import os
import pathlib

import numpy as np

from ldpc_erasure_codes_tpu.codes.registry import LDPCCode
from ldpc_erasure_codes_tpu.utils import native, oracle

ENC_IN = "encoder_input.txt"
ENC_OUT = "encoder_output.txt"
DEC_IN = "decoder_noisy_input.txt"
DEC_OUT = "decoder_output.txt"


@dataclasses.dataclass
class GoldenSet:
    """One golden frame set on disk (frames concatenated per file)."""

    directory: pathlib.Path
    code_name: str
    n: int
    k: int
    frames: int


def generate_golden(
    code: LDPCCode,
    directory: str | os.PathLike,
    *,
    frames: int = 4,
    per: float = 0.2,
    seed: int = 0,
) -> GoldenSet:
    """Oracle side: draw nonzero 16-bit sources, encode with the NumPy
    MATLAB-semantics encoder, erase i.i.d., decode with the oracle hybrid
    decoder, and write all four vector files."""
    if code.gf_order != 2:
        raise ValueError("golden protocol covers binary codes")
    d = pathlib.Path(directory)
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    enc_in = []
    enc_out = []
    dec_in = []
    dec_out = []
    attempts = 0
    max_attempts = 50 * frames
    while len(enc_in) < frames:
        if attempts >= max_attempts:
            raise RuntimeError(
                f"generate_golden: only {len(enc_in)}/{frames} decodable "
                f"frames after {attempts} draws at per={per} — lower the "
                "erasure rate"
            )
        attempts += 1
        src = rng.integers(1, 1 << 16, size=code.k, dtype=np.uint16)
        # Bit-plane encode through the oracle: replication means every bit
        # plane of a symbol is either the value's bit or zero, so encoding
        # the 16 planes independently equals encoding the replicated symbol.
        src_bits = ((src[None, :] >> np.arange(16)[:, None]) & 1).astype(np.uint8)
        cw_bits = np.stack(
            [oracle.encode_triangular(code, p) for p in src_bits]
        )  # (16, n)
        cw = np.zeros(code.n, dtype=np.uint16)
        for b in range(16):
            cw |= (cw_bits[b].astype(np.uint16) << b)
        erased = rng.random(code.n) < per
        noisy = np.where(erased, 0, cw).astype(np.uint16)
        # Oracle decode of the erasure pattern on every bit plane.
        dec_bits = np.zeros_like(cw_bits)
        ok_all = True
        for b in range(16):
            recv = np.where(erased, -1, cw_bits[b].astype(np.int64))
            out, _, singular = oracle.hybrid_ml_decode(code, recv, peel_iters=10)
            if singular or np.any(out < 0):
                ok_all = False
            dec_bits[b] = np.maximum(out, 0).astype(np.uint8)
        dec = np.zeros(code.n, dtype=np.uint16)
        for b in range(16):
            dec |= (dec_bits[b].astype(np.uint16) << b)
        if not ok_all:
            # Keep golden sets decodable: re-draw this frame (the while
            # loop keeps drawing until the requested count is reached).
            continue
        enc_in.append(src)
        enc_out.append(cw)
        dec_in.append(noisy)
        dec_out.append(dec)
    frames = len(enc_in)
    native.write_vector_file(d / ENC_IN, np.concatenate(enc_in))
    native.write_vector_file(d / ENC_OUT, np.concatenate(enc_out))
    native.write_vector_file(d / DEC_IN, np.concatenate(dec_in))
    native.write_vector_file(d / DEC_OUT, np.concatenate(dec_out))
    return GoldenSet(d, code.name, code.n, code.k, frames)


def verify_golden(
    code: LDPCCode,
    directory: str | os.PathLike,
    *,
    words: int = 8,
    peel_iters: int = 10,
    emax: int = 128,
) -> tuple[bool, str]:
    """Accelerator side: read the vector files, run the device packed
    encoder and hybrid decoder, compare bit-exactly.

    Returns (passed, report). Mirrors the host harness verify_output()
    (main.cpp:298-305,413-425) for both the encode and decode directions.
    """
    import jax.numpy as jnp

    from ldpc_erasure_codes_tpu.ops import device_arrays, encode_packed, hybrid_decode

    d = pathlib.Path(directory)
    n, k = code.n, code.k
    enc_in = native.read_vector_file(d / ENC_IN).reshape(-1, k)
    enc_out = native.read_vector_file(d / ENC_OUT).reshape(-1, n)
    dec_in = native.read_vector_file(d / DEC_IN).reshape(-1, n)
    dec_out = native.read_vector_file(d / DEC_OUT).reshape(-1, n)
    frames = enc_in.shape[0]
    arrays = device_arrays(code)

    # Encode direction.
    src = np.stack([native.expand_symbols(f, words)[0] for f in enc_in])
    cw = np.asarray(encode_packed(arrays, jnp.asarray(src)))
    cw_vals = np.stack([native.collapse_symbols(f) for f in cw])
    enc_ok = np.array_equal(cw_vals, enc_out)

    # Decode direction.
    sym = np.stack([native.expand_symbols(f, words)[0] for f in dec_in])
    er = np.stack([native.expand_symbols(f, words)[1] for f in dec_in])
    v, e, iters, failed = hybrid_decode(
        arrays,
        jnp.asarray(sym),
        jnp.asarray(er),
        peel_iters=peel_iters,
        emax=emax,
    )
    v = np.asarray(v)
    dec_vals = np.stack([native.collapse_symbols(f) for f in v])
    dec_ok = (not bool(np.asarray(failed).any())) and np.array_equal(
        dec_vals, dec_out
    )

    passed = bool(enc_ok and dec_ok)
    report = (
        f"golden {code.name}: frames={frames} encode="
        f"{'PASSED' if enc_ok else 'FAILED'} decode="
        f"{'PASSED' if dec_ok else 'FAILED'}"
    )
    return passed, report
