"""Multi-host (multi-process) execution.

The reference is single-FPGA; scaling beyond one accelerator is new surface
defined by the north star (>=80% codewords/s efficiency at >=2 hosts). The
workload is embarrassingly parallel per codeword and the inputs are generated
on device, so multi-host efficiency reduces to: replicate the code arrays,
shard the PRNG stream by process, psum tiny counter pytrees over DCN.

Usage on each host (one process per host, standard JAX multi-process setup):

    from ldpc_erasure_codes_tpu.parallel import multihost
    multihost.initialize()          # jax.distributed.initialize()
    mesh = multihost.global_mesh()  # 1-D data mesh over ALL devices
    step = shard_sim_step(make_sim_step(code, cfg), mesh)
    stats = step(jax.random.key(0), per)   # identical replicated result

``shard_sim_step`` folds ``jax.lax.axis_index`` into the key, so every
device — local or remote — draws an independent Monte-Carlo stream and the
psum'd statistics are bitwise identical on all hosts. No per-frame data ever
crosses DCN; the all-reduce payload is O(max_iters) int32s per step.
"""

from __future__ import annotations

import jax

from ldpc_erasure_codes_tpu.parallel.mesh import BATCH_AXIS, make_mesh


def initialize(**kwargs) -> None:
    """``jax.distributed.initialize`` passthrough (coordinator address etc.
    from the standard env vars when omitted). Call before any computation."""
    jax.distributed.initialize(**kwargs)


def global_mesh():
    """1-D data-parallel mesh spanning every device of every process."""
    devices = jax.devices()
    return make_mesh((len(devices),), (BATCH_AXIS,), devices)


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
