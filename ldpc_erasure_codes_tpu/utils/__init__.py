"""Host-side utilities: oracles, golden vectors, native IO, streaming,
profiling, and the CLI.

Submodules (imported lazily where heavy):

* ``oracle`` — NumPy MATLAB-semantics reference implementations of every
  algorithm (the dual-implementation test pattern, SURVEY §4.2).
* ``golden`` — the MATLAB↔accelerator golden-vector protocol (SURVEY §4.1).
* ``native`` — ctypes loader for the C++ IO library (vector files, symbol
  expansion, bit-plane transpose, Vlist ROM headers).
* ``streaming`` — FEC packet block assembly (reorder buffer → decode batches).
* ``profiling`` — timing/throughput helpers + jax.profiler wrapper.
* ``cli`` — the command-line interface (``python -m
  ldpc_erasure_codes_tpu.utils.cli``).
"""

from ldpc_erasure_codes_tpu.utils import native, profiling, streaming

__all__ = ["native", "profiling", "streaming"]
