"""Multi-process worker: one OS process of a real distributed run.

Run as ``python -m ldpc_erasure_codes_tpu.parallel._mp_worker`` once per
process (see tests/test_multihost.py and the ``scaling`` CLI). Each worker

1. initializes the JAX distributed runtime via
   :func:`parallel.multihost.initialize` (coordinator on localhost for the
   in-CI two-process run; on real clusters the standard env vars apply),
2. builds the GLOBAL mesh spanning every process's devices
   (:func:`parallel.multihost.global_mesh`),
3. runs the sharded Monte-Carlo step (``shard_sim_step`` — per-device PRNG
   folds, psum over DCN/gloo), and
4. writes its replicated SimStats as JSON.

Because the statistics are psum-reduced over the *global* batch axis, every
process must report bitwise-identical numbers — and those numbers must equal
a single-process run over the same total device count (the fold of
``axis_index`` depends only on global device order). Both properties are
asserted by tests/test_multihost.py. North star: BASELINE.md:28 (>=80%
codewords/s efficiency at >=2 hosts); reference context SURVEY.md §2.7.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True, help="host:port")
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--local-devices", type=int, default=4)
    p.add_argument("--out", required=True, help="JSON output path")
    p.add_argument("--code", default="n2000_k1000")
    p.add_argument("--batch", type=int, default=32, help="per-DEVICE batch")
    p.add_argument("--per", type=float, default=0.3)
    p.add_argument("--steps", type=int, default=2)
    args = p.parse_args(argv)

    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from ldpc_erasure_codes_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    info = multihost.process_info()
    mesh = multihost.global_mesh()

    import jax.numpy as jnp

    from ldpc_erasure_codes_tpu.codes import get_code
    from ldpc_erasure_codes_tpu.parallel.mesh import shard_sim_step
    from ldpc_erasure_codes_tpu.sim import DecoderConfig, SimConfig
    from ldpc_erasure_codes_tpu.sim.driver import make_sim_step

    code = get_code(args.code)
    cfg = SimConfig(
        code=args.code,
        batch=args.batch,
        track_values=False,
        decoder=DecoderConfig(kind="peel", max_iters=20, early_stop_k=True),
    )
    step = shard_sim_step(make_sim_step(code, cfg), mesh)
    per = jnp.asarray(args.per, jnp.float32)
    key = jax.random.key(0)
    total = None
    for i in range(args.steps):
        stats = jax.block_until_ready(step(jax.random.fold_in(key, i), per))
        total = stats if total is None else jax.tree.map(
            lambda a, b: a + b, total, stats
        )
    payload = {
        "info": info,
        "mesh_devices": int(mesh.devices.size),
        "stats": {
            k: (v.tolist() if hasattr(v, "tolist") else int(v))
            for k, v in total._asdict().items()
        },
    }
    with open(args.out, "w") as f:
        json.dump(payload, f)
    print(json.dumps(payload), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
