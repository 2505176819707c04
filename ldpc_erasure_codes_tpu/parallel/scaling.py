"""Scaling-efficiency measurement over a device mesh.

The north-star target is >= 80% codewords/s scaling efficiency at >= 2 hosts
(BASELINE.json). This utility measures it: run the same per-device workload
on growing sub-meshes and report throughput and efficiency relative to
linear scaling from the single-device rate. Because the Monte-Carlo step
generates its inputs on device and only psums tiny counters, efficiency on
real multi-chip hardware is expected near 1.0; on the CPU virtual mesh the
numbers exercise the measurement path, not real interconnect behavior.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp

from ldpc_erasure_codes_tpu.parallel.mesh import BATCH_AXIS, make_mesh, shard_sim_step


@dataclasses.dataclass
class ScalePoint:
    devices: int
    frames: int
    seconds: float
    frames_per_sec: float
    efficiency: float  # vs linear scaling of the 1-device rate


def measure_scaling(
    code,
    cfg,
    per: float,
    *,
    device_counts: list[int] | None = None,
    reps: int = 4,
) -> list[ScalePoint]:
    """Throughput of the sharded sim step on growing sub-meshes.

    ``cfg.batch`` is the per-device batch (weak scaling, the production
    regime: each chip keeps its own full batch).
    """
    from ldpc_erasure_codes_tpu.sim.driver import make_sim_step

    devs = jax.devices()
    if device_counts is None:
        device_counts = sorted(
            {1, 2, len(devs) // 2, len(devs)} - {0}
        )
    step_local = make_sim_step(code, cfg)
    per_arr = jnp.asarray(per, jnp.float32)
    points: list[ScalePoint] = []
    base_rate = None
    for nd in device_counts:
        if nd > len(devs):
            continue
        mesh = make_mesh((nd,), (BATCH_AXIS,), devs[:nd])
        step = shard_sim_step(step_local, mesh)
        key = jax.random.key(0)
        jax.block_until_ready(step(key, per_arr))  # compile
        t0 = time.perf_counter()
        out = None
        for i in range(reps):
            out = step(jax.random.fold_in(key, i), per_arr)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        frames = int(out.frames) * reps
        rate = frames / dt
        if base_rate is None:
            base_rate = rate
        points.append(
            ScalePoint(
                devices=nd,
                frames=frames,
                seconds=dt,
                frames_per_sec=rate,
                efficiency=rate / (base_rate * nd / device_counts[0]),
            )
        )
    return points
